"""LLM-data-pipeline text queries over `documents`, with DuckDB oracles
where SQL-expressible (BASELINE.json north-star operators).

The md5-based hashing (fingerprints, minhash, winnowing) was chosen
specifically so every stage mirrors into ANSI SQL — the oracle runs the
IDENTICAL hash pipeline, so even LSH's probabilistic misses are
bit-for-bit reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    minhash,
    simhash,
    text,
)
from group_2_shopware_enterprise_data_engineering_project_spark.registry import register
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table

# Shared tokenization fragment (DuckDB side).
_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_STOPLIST = "('" + "', '".join(text.STOPWORDS) + "')"


# --- text stats -----------------------------------------------------------

T1_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         {_TOKS} AS t,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_no_space,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(chars_no_space AS DOUBLE) / len(t) AS avg_token_len,
       CAST(len(list_filter(t, x -> x IN {_STOPLIST})) AS DOUBLE) / len(t)
           AS stopword_ratio,
       CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio
FROM base
"""


@register(
    "t1_text_stats",
    T1_ORACLE,
    doc="per-doc token/char stats, stopword + punctuation ratios "
    "(LLM-pipeline text analysis; north star)",
)
def t1_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(table(spark, sf_dir, "documents"))


# --- quality scoring ------------------------------------------------------

T2_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         {_TOKS} AS t,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_no_space,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
  FROM documents
), stats AS (
  SELECT doc_id, n_chars,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(chars_no_space AS DOUBLE) / len(t) AS avg_token_len,
         CAST(len(list_filter(t, x -> x IN {_STOPLIST})) AS DOUBLE) / len(t)
             AS stopword_ratio,
         CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio
  FROM base
)
SELECT *,
       CAST((n_tokens BETWEEN 20 AND 2000)::INT
          + (stopword_ratio <= 0.6)::INT
          + (punct_ratio <= 0.2)::INT
          + (avg_token_len BETWEEN 2.0 AND 15.0)::INT AS BIGINT) AS quality_score,
       ((n_tokens BETWEEN 20 AND 2000)::INT
          + (stopword_ratio <= 0.6)::INT
          + (punct_ratio <= 0.2)::INT
          + (avg_token_len BETWEEN 2.0 AND 15.0)::INT) = 4 AS is_quality
FROM stats
"""


@register(
    "t2_quality_score",
    T2_ORACLE,
    doc="pretraining-style quality gate: 4 checks -> 0-4 score + flag",
)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(text.text_stats(table(spark, sf_dir, "documents")))


# --- language id ----------------------------------------------------------

_LANG_SCORES_SQL = ", ".join(
    f"CAST(len(list_filter({_TOKS}, x -> x IN ('"
    + "', '".join(markers)
    + f"'))) AS BIGINT) AS score_{lang}"
    for lang, markers in sorted(text.LANG_MARKERS.items())
)
_LANGS = sorted(text.LANG_MARKERS)
_MAXEXPR = "greatest(" + ", ".join(f"score_{lang}" for lang in _LANGS) + ")"
_PRED_SQL = (
    "CASE WHEN " + _MAXEXPR + " = 0 THEN 'unknown' "
    + " ".join(
        f"WHEN score_{lang} = {_MAXEXPR} THEN '{lang}'" for lang in _LANGS
    )
    + " END"
)

T3_ORACLE = f"""
WITH scored AS (SELECT doc_id, {_LANG_SCORES_SQL} FROM documents)
SELECT doc_id, {', '.join(f'score_{lang}' for lang in _LANGS)},
       {_PRED_SQL} AS predicted_lang
FROM scored
"""


@register(
    "t3_lang_id",
    T3_ORACLE,
    doc="marker-token language-ID heuristic with deterministic "
    "alphabetical tiebreak",
)
def t3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(table(spark, sf_dir, "documents"))


# --- exact dedup via fingerprint ------------------------------------------

T4_ORACLE = """
SELECT md5(text) AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
GROUP BY 1
"""


@register(
    "t4_exact_dedup",
    T4_ORACLE,
    doc="exact dedup by md5 fingerprint over a dup-seeded corpus "
    "(hash-groupBy; shuffle carries 32-hex keys, not texts)",
)
def t4_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.exact_dedup(docs.unionAll(docs))


# --- winnowing fingerprints -----------------------------------------------

T5_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         [md5(array_to_string(t[i:i+2], ' '))
          FOR i IN generate_series(1, greatest(len(t) - 2, 0))] AS h
  FROM toks
), minima AS (
  SELECT doc_id,
         list_sort(list_distinct(
           [list_min(h[i:i+3]) FOR i IN generate_series(1, greatest(len(h) - 3, 0))]
         )) AS fps
  FROM sh
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       md5(array_to_string(fps, ',')) AS fp_digest
FROM minima
"""


@register(
    "t5_winnow_fingerprints",
    T5_ORACLE,
    doc="winnowing local fingerprints (Schleimer et al. 2003): k=3 "
    "shingle md5s, window-4 minima, distinct",
)
def t5_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    wf = text.winnow_fingerprints(table(spark, sf_dir, "documents"), k=3, window=4)
    return wf.select(
        "doc_id",
        F.size("fingerprints").cast("long").alias("n_fingerprints"),
        F.md5(F.array_join("fingerprints", ",")).alias("fp_digest"),
    )


# --- minhash LSH near-dup --------------------------------------------------

def _minhash_oracle(src: str = "documents") -> str:
    p, r = minhash.NUM_PERM, minhash.BAND_ROWS
    mh_cols = ",\n         ".join(
        f"list_min([md5('{i}:' || s) FOR s IN shingles]) AS mh{i}" for i in range(p)
    )
    pipe_concat = " || '|' || "
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_idx, md5({expr}) AS band_hash FROM sig".format(
            b=b, expr=pipe_concat.join(f"mh{b * r + j}" for j in range(r))
        )
        for b in range(p // r)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM {src}
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        FOR i IN generate_series(1, greatest(len(t) - 2, 0))]) AS shingles
  FROM toks
), sig AS (
  SELECT doc_id,
         {mh_cols}
  FROM sh
), buckets AS (
{band_selects}
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), sizes AS (
  SELECT doc_id, len(shingles) AS sz FROM sh
), inter AS (
  SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS i
  FROM ex x JOIN ex y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) AS jaccard
FROM cands c
JOIN inter i ON i.da = c.doc_a AND i.db = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= 0.4
ORDER BY c.doc_a, c.doc_b
"""


@register(
    "dedup_minhash_lsh",
    _minhash_oracle(),
    doc=f"MinHash({minhash.NUM_PERM} perms) + LSH({minhash.NUM_PERM // minhash.BAND_ROWS} "
    "bands) near-dup candidates, exact-Jaccard verified >= 0.4; md5 hash "
    "family makes the oracle reproduce LSH bit-for-bit",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash.minhash_lsh_dedup(table(spark, sf_dir, "documents"), threshold=0.4)


# --- all-pairs n-gram jaccard ----------------------------------------------

T7_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        FOR i IN generate_series(1, greatest(len(t) - 2, 0))]) AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), sizes AS (
  SELECT doc_id, len(shingles) AS sz FROM sh
), inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
  FROM ex x JOIN ex y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i) >= 0.4
ORDER BY i.doc_a, i.doc_b
"""


@register(
    "dedup_ngram_jaccard",
    T7_ORACLE,
    doc="exact all-pairs 3-gram Jaccard >= 0.4 via shingle inverted-"
    "index join (ground-truth path; LSH is the scale path)",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash.allpairs_jaccard_dedup(table(spark, sf_dir, "documents"), threshold=0.4)


# --- simhash ---------------------------------------------------------------
#
# The oracle reproduces the ENTIRE SimHash pipeline in DuckDB SQL: token
# hashes via md5_number_upper (== little-endian uint64 of the first 8 md5
# bytes, the exact hash the Pandas UDF computes), 64-bit bit-voting via
# nested list comprehensions, the 4x16-bit band self-join, and the
# bit_count(xor) Hamming verify — bit-for-bit parity, not a weaker proxy.

SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), hs AS (
  SELECT doc_id, [md5_number_upper(tok) FOR tok IN t] AS h, len(t) AS n FROM toks
), sig AS (
  SELECT doc_id,
    CAST(CASE WHEN n = 0 THEN 0 ELSE
      list_sum([
        CASE WHEN 2 * list_sum([CAST((x >> b) & 1 AS BIGINT) FOR x IN h]) > n
             THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT) ELSE CAST(0 AS HUGEINT) END
        FOR b IN generate_series(0, 63)])
    END AS UBIGINT) AS usig
  FROM hs
), bands AS (
  SELECT doc_id, usig, band_idx, (usig >> (band_idx * 16)) & 65535 AS band_key
  FROM sig, unnest([0,1,2,3]) AS u(band_idx)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.usig AS sa, b.usig AS sb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= 3
ORDER BY doc_a, doc_b
"""


@register(
    "dedup_simhash",
    SIMHASH_ORACLE,
    doc="SimHash(64-bit, Pandas-UDF signatures) near-pairs at Hamming<=3 "
    "via 4x16-bit band join; oracle mirrors the full bit-voting pipeline "
    "in DuckDB (md5_number_upper == the UDF's little-endian token hash)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash.simhash_dedup(table(spark, sf_dir, "documents"))


# --- token counting (whitespace + BPE-ish regex) --------------------------

T6_ORACLE = rf"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_words,
       CAST(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}', 0)) AS BIGINT)
           AS n_bpe_tokens
FROM documents
"""


@register(
    "t6_token_counts",
    T6_ORACLE,
    doc="token counting two ways: whitespace words and a BPE-ish "
    "pre-tokenizer regex (letter runs | single digits | single marks) — "
    "the corpus-scale training-cost estimator, one narrow projection",
)
def t6_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_counts(table(spark, sf_dir, "documents"))


# --- within-doc repetition signals (Gopher/C4-style) -----------------------
#
# Mirrors operators/text.py:repetition_signals exactly: same token split,
# same distinct-vs-raw shingle ratios, same argmax-count for the top
# token, same symbol regex. All divisions are int/int -> DOUBLE in both
# engines, so the hash comparison is bit-exact.

REPETITION_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, text, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id, text, t,
         [array_to_string(t[i:i+1], ' ')
          FOR i IN generate_series(1, greatest(len(t) - 1, 0))] AS g2,
         [array_to_string(t[i:i+2], ' ')
          FOR i IN generate_series(1, greatest(len(t) - 2, 0))] AS g3
  FROM toks
), sig AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CASE WHEN len(t) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
         END AS unique_token_frac,
         CASE WHEN len(t) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(list_max([len(list_filter(t, y -> y = x))
                                  FOR x IN list_distinct(t)]) AS DOUBLE) / len(t)
         END AS top_token_frac,
         CASE WHEN len(g2) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE 1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
         END AS dup_2gram_frac,
         CASE WHEN len(g3) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE 1 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
         END AS dup_3gram_frac,
         CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                        AS DOUBLE) / length(text)
         END AS symbol_ratio
  FROM sh
)
SELECT *,
       (unique_token_frac >= 0.5 AND top_token_frac <= 0.2
        AND dup_2gram_frac <= 0.2 AND dup_3gram_frac <= 0.18
        AND symbol_ratio <= 0.1) AS repetition_keep
FROM sig
"""


@register(
    "t7_repetition_signals",
    REPETITION_ORACLE,
    doc="Gopher/C4-style within-doc repetition quality signals: unique-"
    "token frac, most-common-token frac, dup 2-/3-gram fracs, symbol "
    "ratio, and the combined keep flag — pure codegen projection, zero "
    "shuffles",
)
def t7_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.repetition_signals(table(spark, sf_dir, "documents"))


# --- t8: corpus-wide duplicate n-gram profile ------------------------------

T8_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), g AS (
  SELECT doc_id,
         md5(unnest(list_distinct(
           [array_to_string(t[i:i+2], ' ')
            FOR i IN generate_series(1, len(t) - 2)]))) AS h
  FROM toks
), c AS (
  SELECT h, count(*) AS df FROM g GROUP BY h
), p AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE c.df > 1) AS BIGINT) AS n_shared_grams
  FROM g JOIN c USING (h) GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
       CASE WHEN coalesce(p.n_grams, 0) > 0
            THEN CAST(p.n_shared_grams AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
            ELSE 0.0 END AS dup_gram_frac
FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
"""


@register(
    "t8_corpus_dup_ngrams",
    T8_ORACLE,
    doc="corpus-wide duplicate 3-gram profile (Gopher-style boilerplate "
    "signal): per doc, fraction of its distinct 3-grams appearing in "
    "other docs - inverted-index shape, shuffle carries md5+doc_id "
    "only; complements t7 (within-doc) and m5 (token doc frequency)",
)
def t8_corpus_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.corpus_dup_ngrams(table(spark, sf_dir, "documents"))


_SW = text.SPAN_WORDS

T9_ORACLE = f"""
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), spans AS (
  SELECT doc_id, i AS span_idx,
         array_to_string(
           list_slice(w, i * {_SW} + 1, (i + 1) * {_SW}), ' ') AS span
  FROM s, unnest(range(CAST(ceil(len(w) / {_SW}.0) AS BIGINT))) t(i)
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY span ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                           ORDER BY span_idx), '') AS clean_text,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_dropped
FROM ranked GROUP BY doc_id
"""


@register(
    "t9_dedup_spans",
    T9_ORACLE,
    doc="CCNet-style duplicate-span removal (Wenzek et al. 2020): "
    "every 10-word span keeps only its first corpus occurrence "
    "(doc_id, span_idx order) and documents are reassembled from "
    "surviving spans - removes cross-document boilerplate that "
    "document-level dedup cannot; ranking shuffles span digests, "
    "reassembly shuffles doc_id",
)
def t9_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.dedup_spans(table(spark, sf_dir, "documents"))


T10_ORACLE = """
WITH ex AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM ex GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf AS DOUBLE)
           * CAST((SELECT count(*) + 1 FROM documents) AS DOUBLE)
           / (CAST(dfreq.df AS DOUBLE) + CAST(1.0 AS DOUBLE)) AS weight
  FROM tf JOIN dfreq USING (term)
)
SELECT doc_id, term, tf, df, weight, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY weight DESC, term) AS rank
  FROM scored
) WHERE rank <= 3
"""


@register(
    "t10_tfidf_top_terms",
    T10_ORACLE,
    doc="top-3 characteristic terms per doc by smoothed TF-IDF weight "
    "tf*(N+1)/(df+1) - the rational form instead of ln(N/df) because "
    "ln is not bit-identical across engines (measured 145/2000 inputs "
    "differ in the last ulp) while integer-valued doubles divide "
    "exactly; same monotone rarer-is-heavier ordering",
)
def t10_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.tfidf_top_terms(table(spark, sf_dir, "documents"), k=3)


# --- t13: Bernoulli Naive Bayes lang classifier (train + predict) -------

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (  # noqa: E402
    nbayes,
)

_NB_VOCAB = sorted(
    {t for marks in text.LANG_MARKERS.values() for t in marks}
)
_NB_VOCAB_SQL = "[" + ", ".join(f"'{t}'" for t in _NB_VOCAB) + "]"

T13_ORACLE = f"""
WITH v AS (
  SELECT unnest({_NB_VOCAB_SQL}) AS term
), toks AS (
  SELECT doc_id, lang, {_TOKS} AS t FROM documents
), nc AS (
  SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_c
  FROM documents GROUP BY 1
), nt AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
), dfct AS (
  SELECT d.lang AS label, v.term,
         CAST(sum(CASE WHEN list_contains(d.t, v.term) THEN 1 ELSE 0 END)
              AS BIGINT) AS df_ct
  FROM toks d, v GROUP BY 1, 2
), model AS (
  SELECT label, term,
         (CAST(df_ct AS DOUBLE) + 1.0) / (CAST(n_c AS DOUBLE) + 2.0) AS p,
         CAST(n_c AS DOUBLE) / CAST(n AS DOUBLE) AS prior
  FROM dfct JOIN nc USING (label), nt
), scored AS (
  SELECT d.doc_id, d.lang, m.label,
         max(m.prior) * list_reduce(
           list_transform(
             list_sort(list(struct_pack(
               term := m.term,
               p := CASE WHEN list_contains(d.t, m.term)
                         THEN m.p ELSE 1.0 - m.p END))),
             s -> s.p),
           (a, b) -> a * b) AS score
  FROM toks d, model m
  GROUP BY d.doc_id, d.lang, m.label
), pred AS (
  SELECT doc_id, lang, label AS predicted, score,
         row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
  FROM scored
)
SELECT doc_id, lang, predicted, score, predicted = lang AS correct
FROM pred WHERE rn = 1
ORDER BY doc_id
"""


@register(
    "t13_nb_classifier",
    T13_ORACLE,
    doc="Bernoulli Naive Bayes lang classifier, trained AND scored in "
    "DataFrame ops: exact-count Laplace likelihoods over the 12 "
    "language-marker stopwords, scores as raw probability PRODUCTS "
    "folded in term-sorted order (no ln — 16 bounded factors cannot "
    "underflow, and IEEE multiplication is exactly rounded, so the "
    "oracle's list_reduce reproduces the fold bit-for-bit); inference "
    "is a zero-shuffle broadcast-model map",
)
def t13_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    model = nbayes.nb_train(docs, _NB_VOCAB)
    return nbayes.nb_predict(docs, model)


# --- t14: compression-ratio redundancy signal (rows-only check) ---------


# zlib has no SQL equivalent, so the oracle uses the m13 bounds-audit
# pattern: the EXACT byte count (strlen = utf-8 bytes in DuckDB) hashes
# against the operator's n_bytes, and the oracle's literal TRUE columns
# hash against per-document bound-check booleans the Spark side genuinely
# computes from the zlib output — any document whose compressed size or
# ratio accounting violates its analytic bound flips a boolean and fails
# the driver's exact hash. compressed_ok encodes DEFLATE's worst case
# (stored blocks: ~5 bytes per 16 KiB + 2-byte header + 4-byte adler;
# 64 bytes of slack covers any corpus); ratio_ok encodes internal
# consistency (ratio = n_compressed/n_bytes to 1e-12) plus the <=1.25
# repetition-signal ceiling for docs big enough (>=256 B) that fixed
# overhead can't dominate.
T14_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       TRUE AS compressed_ok,
       TRUE AS ratio_ok
FROM documents
"""


@register(
    "t14_compression_ratio",
    T14_ORACLE,
    doc="zlib-ratio redundancy signal (Gopher/FineWeb-style cheap "
    "quality filter): repetitive boilerplate compresses far below "
    "prose; Arrow-batched mapInPandas because DEFLATE has no native "
    "expression — one of the three sanctioned Python surfaces. "
    "Hashable oracle via the m13 bounds-audit pattern: exact utf-8 "
    "byte counts + per-doc within-bound booleans (DEFLATE worst-case "
    "size, ratio accounting to 1e-12, repetition ceiling) hash "
    "against oracle-side exact strlen + literal TRUE; planted "
    "known-ratio probes with analytic bounds (constant repeat <0.02 "
    "via LZ77; sha256-derived printable noise >0.78, below the "
    "entropy floor no compressor can beat; 16x-repeated prose "
    "strictly between, and below the same prose once) RAISE on "
    "violation",
)
def t14_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.compression_ratio(table(spark, sf_dir, "documents"))
    # planted probes THROUGH the same operator, with ANALYTICALLY
    # bounded expected ratios (not just relative ordering):
    #  - constant repeat: one LZ77 back-reference repeated; DEFLATE
    #    takes 64 KiB of 'x' to a few hundred bytes (measured 0.0013).
    #    Bound <0.02 holds for any conforming DEFLATE at level 6.
    #  - pseudo-random printable text (sha256-derived, ~6.55 bits/char
    #    true entropy over 94 symbols): NO compressor can go below
    #    entropy, 6.55/8 = 0.819 of raw (measured 0.828). Bound >0.78
    #    (margin for the mod-94 non-uniformity), <1.0 (it must still
    #    shave the unused 1.45 bits/char).
    #  - prose repeated 16x must fall strictly between (and below the
    #    same prose once — the original monotonicity check).
    import hashlib

    base = "the quick brown fox jumps over the lazy dog 0123456789 "
    rnd_chars: list[str] = []
    for i in range(256):
        digest = hashlib.sha256(f"t14:{i}".encode()).digest()
        rnd_chars.extend(chr(33 + (b % 94)) for b in digest)
    probe = spark.createDataFrame(
        [(0, base), (1, base * 16), (2, "x" * 65536), (3, "".join(rnd_chars))],
        "doc_id long, text string",
    )
    probe_rows = (  # bounded-collect: probe is the 4-row literal frame above
        text.compression_ratio(probe).collect()
    )
    pr = {r.doc_id: r.ratio for r in probe_rows}
    ok = (
        pr[1] < pr[0]
        and pr[2] < 0.02
        and 0.78 < pr[3] < 1.0
        and pr[2] < pr[1] < pr[3]
    )
    if not ok:
        raise AssertionError(f"t14 known-ratio probe failed: {pr}")
    # bounds-audited hashable surface (see T14_ORACLE note above): the
    # booleans are computed from the real zlib output, so a broken
    # operator flips them and the driver's exact hash goes red.
    return out.select(
        "doc_id",
        "n_bytes",
        (
            (F.col("n_compressed") > 0)
            & (F.col("n_compressed") <= F.col("n_bytes") + F.lit(64))
        ).alias("compressed_ok"),
        (
            (F.col("ratio") > 0)
            & (
                F.abs(
                    F.col("ratio")
                    - F.col("n_compressed").cast("double")
                    / F.greatest(F.col("n_bytes"), F.lit(1)).cast("double")
                )
                <= F.lit(1e-12)
            )
            & ((F.col("n_bytes") < 256) | (F.col("ratio") <= 1.25))
        ).alias("ratio_ok"),
    )


# --- t15: distributed BPE tokenizer training (full SQL oracle) ----------

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (  # noqa: E402
    bpe,
)

_T15_MERGES = 8


def _bpe_oracle_sql(n_iters: int) -> str:
    """BPE training unrolled as chained CTEs — a REAL DuckDB oracle for
    the iterative merge loop. Each word is a chr(31)-wrapped symbol
    string (``•a••b••c••</w>•``); per iteration: split → adjacent-pair
    counts weighted by word frequency → best pair (max n, lexicographic
    (a, b) tiebreak, exactly ``bpe.bpe_train``'s ordering) → apply the
    merge via ``replace`` on the wrapped form. SQL ``replace`` scans
    left-to-right non-overlapping, which IS the greedy BPE application
    rule, and the per-symbol wrapping keeps boundaries unambiguous for
    multi-char merged symbols. Max pair count is non-increasing across
    BPE iterations, so the final ``pair_count >= 2`` filter reproduces
    the operator's early stop exactly."""
    parts = _bpe_chain_parts(n_iters)
    union = "\nUNION ALL\n".join(
        f'SELECT CAST({i} AS BIGINT) AS rank, a AS "left", b AS "right", '
        f"n AS pair_count FROM B{i}"
        for i in range(1, n_iters + 1)
    )
    return (
        "WITH "
        + "".join(parts)
        + f"\nSELECT * FROM (\n{union}\n) WHERE pair_count >= 2 ORDER BY rank"
    )


def _bpe_chain_parts(n_iters: int) -> list[str]:
    """The unrolled training chain (W0/R0, then S/P/B/R per iteration)
    shared by the t15 train oracle and the t19 encode oracle."""
    s, ss = "chr(31)", "chr(31)||chr(31)"
    parts = [
        f"""
W0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS word FROM documents)
  GROUP BY word
),
R0 AS (
  SELECT {s} || regexp_replace(word, '(.)', '\\1' || {ss}, 'g')
             || '</w>' || {s} AS r, cnt
  FROM W0
)"""
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f""",
S{i} AS (
  SELECT cnt, string_split(substr(r, 2, length(r) - 2), {ss}) AS syms
  FROM R{i - 1}
),
P{i} AS (
  SELECT p['a'] AS a, p['b'] AS b, CAST(sum(cnt) AS BIGINT) AS n
  FROM (
    SELECT cnt,
           unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])
                  ::STRUCT(a VARCHAR, b VARCHAR)[]) AS p
    FROM S{i}
  )
  GROUP BY 1, 2
),
B{i} AS (SELECT a, b, n FROM P{i} ORDER BY n DESC, a ASC, b ASC LIMIT 1),
R{i} AS (
  SELECT replace(r, {s} || B{i}.a || {ss} || B{i}.b || {s},
                    {s} || B{i}.a || B{i}.b || {s}) AS r, cnt
  FROM R{i - 1}, B{i}
)"""
        )
    return parts


@register(
    "t15_bpe_train",
    _bpe_oracle_sql(_T15_MERGES),
    doc="distributed BPE tokenizer training: corpus read ONCE into the "
    "word-frequency table, then each merge iteration runs on |vocab| rows "
    "— native pair counting (zip/explode, map-side combined), one-row "
    "TakeOrdered merge selection (the merge table is a model), "
    "Arrow-batched vocab rewrite. Oracle: the merge loop unrolled as "
    "chained DuckDB CTEs over a separator-wrapped symbol encoding — a "
    "full value check on the learned merge table, upgraded from the "
    "r1-r4 rows-only status",
)
def t15_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, n_merges=_T15_MERGES)
    rows = [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, pair_count long"
    )


# --- t16: PII redaction (scrubbing stage) --------------------------------

# Deterministic PII is synthesized into every document (the testdata
# corpus itself is PII-free), so the redactor has real work on every
# row: a per-doc email, a phone, and a per-doc IPv4. Counts are taken
# sequentially on the text as each class is scanned — the oracle
# mirrors the same count-then-replace cascade with RE2's 'g' flag
# (Spark's regexp_replace is always global).
T16_ORACLE = """
WITH enriched AS (
  SELECT doc_id,
         coalesce(text, '') || ' reach user' || CAST(doc_id AS VARCHAR)
              || '@example.com call 555-867-5309 ip 10.0.0.'
              || CAST(doc_id % 256 AS VARCHAR) AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_email,
         regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t
  FROM enriched
), s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b'))
              AS BIGINT) AS n_phone,
         regexp_replace(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS t
  FROM s1
)
SELECT doc_id, n_email, n_phone,
       CAST(len(regexp_extract_all(t,
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
           AS n_ipv4,
       regexp_replace(t,
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')
           AS redacted
FROM s2
"""


@register(
    "t16_pii_redact",
    T16_ORACLE,
    doc="PII scrubbing (email/phone/IPv4 count-then-redact cascade) "
    "over documents with deterministic synthesized PII per row; pure "
    "JVM regex Column expressions, zero shuffle, linear scan — the "
    "redaction stage an LLM data pipeline runs before text leaves "
    "quarantine",
)
def t16_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-867-5309 ip 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return text.pii_redact(enriched)


# --- t17: HTML/markup stripping ------------------------------------------

# The corpus is plain text, so each doc is deterministically wrapped in
# markup first (title header, split paragraphs, a script block whose
# CONTENT must vanish) — then stripped through the real operator. The
# oracle mirrors the wrap + the three-stage strip with RE2's 'g' flag.
T17_ORACLE = """
WITH wrapped AS (
  SELECT doc_id,
         '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR)
           || '</h1><p class="b">'
           || replace(coalesce(text, ''), '. ', '.</p><p>')
           || '</p><script>var secret_' || CAST(doc_id AS VARCHAR)
           || ' = 1;</script></body></html>' AS html
  FROM documents
), stripped AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(html,
               '(?s)<(script|style)\\b[^>]*>.*?</(script|style)>', ' ', 'g'),
             '<[^>]+>', ' ', 'g'),
           '\\s+', ' ', 'g')) AS clean_text
  FROM wrapped
)
SELECT doc_id, n_tags,
       CAST(length(clean_text) AS BIGINT) AS clean_len,
       clean_text
FROM stripped
"""


@register(
    "t17_strip_markup",
    T17_ORACLE,
    doc="HTML/markup stripping (web-corpus visible-text extraction): "
    "script/style blocks removed WITH their contents, remaining tags "
    "dropped, whitespace collapsed — over documents deterministically "
    "wrapped in markup (header, sentence-split paragraphs, a script "
    "block that must vanish); zero-shuffle regex cascade",
)
def t17_strip_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit('</h1><p class="b">'),
            F.replace(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(". "),
                F.lit(".</p><p>"),
            ),
            F.lit("</p><script>var secret_"),
            F.col("doc_id").cast("string"),
            F.lit(" = 1;</script></body></html>"),
        ).alias("html"),
    )
    return text.strip_markup(wrapped)


# --- t18: URL extraction + canonicalization + domain rollup ---------------

# Deterministic URLs are synthesized into every document (the corpus
# has none): a mixed-case https URL with explicit :443 and a #fragment
# (both must canonicalize away) and, on every 3rd doc, a second http
# URL on another domain. The oracle mirrors extraction and the
# backreference-free canonicalization cascade.
T18_ORACLE = """
WITH wrapped AS (
  SELECT doc_id,
         coalesce(text, '') || ' see HTTPS://Shop-' || CAST(doc_id % 20 AS VARCHAR)
              || '.Example.COM:443/p/' || CAST(doc_id AS VARCHAR)
              || '?q=1#frag'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' and http://blog.example.org:80/a/'
                           || CAST(doc_id % 7 AS VARCHAR)
                      ELSE '' END AS text
  FROM documents
), urls AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text,
             '(?i)https?://[A-Za-z0-9.\\-:_/?=&#%]+')) AS url
  FROM wrapped
), low AS (
  SELECT doc_id, regexp_replace(lower(url), '#.*', '') AS u
  FROM urls
), parts AS (
  SELECT doc_id,
         regexp_extract(u, '^(https?)://', 1) AS scheme,
         regexp_extract(u, '^https?://([^/:?#]+)', 1) AS host,
         regexp_extract(u, '^https?://[^/:?#]+(:[^/?#]*)', 1) AS portpart,
         regexp_replace(u, '^https?://[^/?#]+', '') AS rest
  FROM low
), canon AS (
  SELECT doc_id,
         scheme || '://' || host ||
         CASE WHEN (scheme = 'https' AND portpart = ':443')
                OR (scheme = 'http' AND portpart = ':80')
              THEN '' ELSE portpart END || rest AS canon_url
  FROM parts
), dom AS (
  SELECT doc_id, canon_url,
         regexp_extract(canon_url, '^https?://([^/:?#]+)', 1) AS domain
  FROM canon
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM dom GROUP BY domain
"""


@register(
    "t18_url_stats",
    T18_ORACLE,
    doc="URL extraction + canonicalization (lowercase, fragment strip, "
    "scheme-aware default-port strip via decompose-and-rebuild — "
    "backreference- and lookahead-free so the cascade mirrors into "
    "RE2-based ANSI SQL) + per-domain rollup over documents with "
    "deterministic synthesized URLs; zero-shuffle extraction, one "
    "map-side-combined domain exchange",
)
def t18_url_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" see HTTPS://Shop-"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".Example.COM:443/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?q=1#frag"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" and http://blog.example.org:80/a/"),
                    (F.col("doc_id") % 7).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return text.url_stats(wrapped)


# --- D7: incremental-ingestion near-dup (new shard vs corpus index) ------

# Semantics = the full-union minhash dedup MINUS existing-existing
# pairs; the oracle states it exactly that way (the operator's plan
# differs where scale demands: history contributes only its bucket
# index, history text is read only for candidate ids, and the
# bipartite bucket join is skew-salted).
D7_ORACLE = f"""
SELECT t.doc_a, t.doc_b, t.jaccard,
       CAST((t.doc_a % 2 = 0) OR (t.doc_b % 2 = 0) AS INT) AS vs_existing
FROM ({_minhash_oracle()}) t
WHERE NOT ((t.doc_a % 2 = 0) AND (t.doc_b % 2 = 0))
"""


@register(
    "d7_incremental_dedup",
    D7_ORACLE,
    doc="incremental-ingestion near-dup: the odd-id half of documents "
    "arrives as a NEW shard and is verified against the even-id "
    "history via its stored bucket index (ids + digests only — "
    "history text is touched only for candidate ids) plus the usual "
    "capped self-join within the shard; new-vs-existing bucket join "
    "is skew-salted (bipartite analogue of the salt-split). Oracle = "
    "full-union dedup minus existing-existing pairs",
)
def d7_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return minhash.incremental_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.4,
    )


# --- t19: BPE encode (apply the trained tokenizer to the corpus) --------


def _bpe_encode_oracle_sql(n_iters: int) -> str:
    """Tokenizer APPLICATION unrolled over the same trained chain: each
    document becomes one chr(31)-wrapped symbol stream (per-word forms
    concatenate cleanly — every word form starts and ends with a single
    separator, so the juncture is exactly the ``••`` symbol gap), then
    the learned merges replay in training order via the same
    left-to-right non-overlapping ``replace``. A merge is applied only
    when its pair_count >= 2 — the operator's early stop; pair counts
    are non-increasing so the CASE guard reproduces it exactly. No
    learned merge can fire across a word boundary: a pair whose left
    symbol contains ``</w>`` is never adjacent WITHIN a word, so it can
    never be selected by training."""
    s, ss = "chr(31)", "chr(31)||chr(31)"
    parts = _bpe_chain_parts(n_iters)
    parts.append(
        f""",
DR0 AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             list_filter(string_split(coalesce(text, ''), ' '), x -> x <> ''),
             w -> {s} || regexp_replace(w, '(.)', '\\1' || {ss}, 'g')
                      || '</w>' || {s}
           ), ''
         ) AS dr
  FROM documents
)"""
    )
    for i in range(1, n_iters + 1):
        parts.append(
            f""",
DR{i} AS (
  SELECT doc_id,
         CASE WHEN B{i}.n >= 2
              THEN replace(dr, {s} || B{i}.a || {ss} || B{i}.b || {s},
                               {s} || B{i}.a || B{i}.b || {s})
              ELSE dr END AS dr
  FROM DR{i - 1}, B{i}
)"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"""
SELECT doc_id,
       CAST(CASE WHEN dr = '' THEN 0
            ELSE len(string_split(substr(dr, 2, length(dr) - 2), {ss}))
            END AS BIGINT) AS n_tokens,
       CASE WHEN dr = '' THEN ''
            ELSE array_to_string(
              string_split(substr(dr, 2, length(dr) - 2), {ss}), ',')
            END AS tokens
FROM DR{n_iters}
ORDER BY doc_id
"""
    )


@register(
    "t19_bpe_encode",
    _bpe_encode_oracle_sql(_T15_MERGES),
    doc="BPE tokenizer APPLICATION: train the t15 merge table, then "
    "encode the whole corpus in ONE Arrow-batched pass (the merge "
    "list is a broadcast closure constant; per-word greedy rewrite is "
    "inherently sequential, embarrassingly parallel across docs — the "
    "shape real tokenizers run at 100 TB). Oracle: the trained chain "
    "plus per-document merge replay via the same separator-wrapped "
    "replace encoding — exact value check of every token sequence",
)
def t19_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, n_merges=_T15_MERGES)
    return bpe.bpe_encode(docs, merges)


# --- m35: bigram-coverage quality proxy (LM-score stand-in) ---------------

_M35_MIN_DF = 5

M35_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+1], ' ')
                        FOR i IN generate_series(1, greatest(len(t) - 1, 0))])
             AS bgs
  FROM toks
), ex AS (
  SELECT doc_id, unnest(bgs) AS bg FROM sh
), dfc AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY bg
), per AS (
  SELECT e.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(CASE WHEN d.df >= {_M35_MIN_DF} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_covered
  FROM ex e JOIN dfc d USING (bg)
  GROUP BY e.doc_id
)
SELECT s.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       coalesce(p.n_covered, 0) AS n_covered,
       CASE WHEN p.n_bigrams > 0
            THEN CAST(p.n_covered AS DOUBLE) / p.n_bigrams END AS coverage
FROM sh s LEFT JOIN per p USING (doc_id)
"""


@register(
    "m35_bigram_coverage",
    M35_ORACLE,
    doc="bigram-coverage quality proxy (integer-exact KenLM stand-in): "
    f"share of each doc's distinct bigrams seen in >= {_M35_MIN_DF} "
    "docs corpus-wide; doc-frequency is a map-side-combined groupBy, "
    "the coverage join shuffles (bigram, doc_id) pairs only, coverage "
    "is one exact division (NULL for <2-word docs)",
)
def m35_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bigram_coverage(
        table(spark, sf_dir, "documents"), min_df=_M35_MIN_DF
    )


# --- t20: C4-style line-quality filtering ----------------------------------

# Deterministic multi-line pages are synthesized around each document
# (the corpus text itself has no newlines — same synthesis pattern as
# t18's URLs): the doc text with a terminal '.' (kept when long
# enough), one blocklisted boilerplate line, one too-short line, and
# two doc_id-gated lines exercising the keep and no-terminal-punct
# branches.
T20_ORACLE = """
WITH pages AS (
  SELECT doc_id,
         coalesce(text, '') || '.'
           || chr(10) || 'Read the full privacy policy and cookie notice here.'
           || chr(10) || 'Too short.'
           || CASE WHEN doc_id % 2 = 0
                   THEN chr(10) ||
                        'This sentence is long enough to keep and ends properly.'
                   ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                   THEN chr(10) ||
                        'no terminal punctuation so this line is dropped despite length'
                   ELSE '' END AS page
  FROM documents
), split AS (
  SELECT doc_id,
         string_split(page, chr(10)) AS lines
  FROM pages
), kept AS (
  SELECT doc_id, lines,
         list_filter(lines, x ->
             regexp_matches(x, '[.!?"]$')
             AND len(list_filter(string_split(x, ' '), w -> w <> '')) >= 5
             AND NOT contains(lower(x), 'cookie')
             AND NOT contains(lower(x), 'javascript')
             AND NOT contains(lower(x), 'privacy policy')
             AND NOT contains(lower(x), 'lorem ipsum')) AS k
  FROM split
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(k) AS BIGINT) AS n_kept,
       CAST(length(array_to_string(k, chr(10))) AS BIGINT) AS kept_chars,
       md5(array_to_string(k, chr(10))) AS kept_digest,
       CAST(len(k) >= 2 AS INT) AS page_kept
FROM kept
"""


@register(
    "t20_line_quality_filter",
    T20_ORACLE,
    doc="C4-style line-level cleaning (terminal punctuation + >=5 "
    "words + boilerplate blocklist per line, >=2 surviving lines per "
    "page) over deterministic synthesized multi-line pages; pure "
    "codegen projection — no explode, no shuffle; kept text compared "
    "via md5 digest",
)
def t20_line_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("."),
            F.lit("\nRead the full privacy policy and cookie notice here."),
            F.lit("\nToo short."),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit(
                    "\nThis sentence is long enough to keep and ends properly."
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(
                    "\nno terminal punctuation so this line is dropped despite length"
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return text.c4_line_filter(pages)


# --- t22: tokenizer fertility per language ---------------------------------

_T22_BPE_RE = text.BPE_ISH_PATTERN

T22_ORACLE = f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len({_TOKS}) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '{_T22_BPE_RE}')) AS BIGINT)
             AS n_bpe
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE)
           AS fertility
FROM per_doc
GROUP BY lang
"""


@register(
    "t22_tokenizer_fertility",
    T22_ORACLE,
    doc="tokenizer-fertility audit per language (subword tokens per "
    "word — the multilingual tokenizer-fairness metric): exact BIGINT "
    "word and BPE-ish token sums per lang, fertility as ONE division "
    "of the exact sums; a pure map-side-combined groupBy over a "
    "codegen projection",
)
def t22_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    counts = text.token_counts(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return counts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        (
            F.sum("n_bpe_tokens").cast("double")
            / F.sum("n_words").cast("double")
        ).alias("fertility"),
    )


# --- m37: cross-source overlap matrix (dedup-priority planning) -------------

M37_ORACLE = f"""
WITH toks AS (
  SELECT source, {_TOKS} AS t FROM documents
), sb AS (
  SELECT DISTINCT source AS src, bg
  FROM toks, unnest([array_to_string(t[i:i+1], ' ')
                     FOR i IN generate_series(1, greatest(len(t) - 1, 0))])
       AS u(bg)
), sizes AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n FROM sb GROUP BY 1
), pairs AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM sb a JOIN sb b ON a.bg = b.bg AND a.src < b.src
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b,
       sa.n AS n_a, sb2.n AS n_b, p.n_common,
       CAST(p.n_common AS DOUBLE)
         / CAST(sa.n + sb2.n - p.n_common AS DOUBLE) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.src = p.src_a
JOIN sizes sb2 ON sb2.src = p.src_b
"""


@register(
    "m37_source_overlap",
    M37_ORACLE,
    doc="cross-source corpus-overlap matrix: exact Jaccard of each "
    "source pair's distinct-bigram vocabularies — orders cross-source "
    "dedup work; shuffle carries (source, bigram) pairs only, hot "
    "bigrams bounded at O(S^2) pair rows (S = source count), one "
    "exact division per pair",
)
def m37_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.source_overlap(table(spark, sf_dir, "documents"))


# --- t23: Unicode-script mix detection --------------------------------------

# The corpus is ASCII, so script content is synthesized
# deterministically (t18/t20 pattern): CJK tokens on every 3rd doc,
# Cyrillic on every 5th, and every 11th doc replaced by a pure-CJK
# page so the dominant-script branch actually flips.
_T23_GREATEST = "greatest(n_latin, n_cjk, n_cyrillic, n_arabic)"

T23_ORACLE = f"""
WITH pages AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN repeat('汉', 50)
              ELSE coalesce(text, '')
                || CASE WHEN doc_id % 3 = 0 THEN ' 汉字测试' ELSE '' END
                || CASE WHEN doc_id % 5 = 0 THEN ' привет' ELSE '' END
         END AS t
  FROM documents
), counts AS (
  SELECT doc_id,
         CAST(length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS n_latin,
         CAST(length(t) - length(regexp_replace(t, '[\\x{{4E00}}-\\x{{9FFF}}]', '', 'g'))
              AS BIGINT) AS n_cjk,
         CAST(length(t) - length(regexp_replace(t, '[\\x{{0400}}-\\x{{04FF}}]', '', 'g'))
              AS BIGINT) AS n_cyrillic,
         CAST(length(t) - length(regexp_replace(t, '[\\x{{0600}}-\\x{{06FF}}]', '', 'g'))
              AS BIGINT) AS n_arabic
  FROM pages
)
SELECT doc_id, n_latin, n_cjk, n_cyrillic, n_arabic,
       CASE WHEN {_T23_GREATEST} = 0 THEN 'none'
            WHEN n_latin = {_T23_GREATEST} THEN 'latin'
            WHEN n_cjk = {_T23_GREATEST} THEN 'cjk'
            WHEN n_cyrillic = {_T23_GREATEST} THEN 'cyrillic'
            ELSE 'arabic' END AS dominant_script
FROM counts
"""


@register(
    "t23_script_mix",
    T23_ORACLE,
    doc="Unicode-script composition per doc (multilingual routing "
    "before lang-ID; mixed-script spam gate): code-point counts for "
    "latin/CJK/cyrillic/arabic ranges + first-at-max dominant script; "
    "pure codegen projection over deterministically synthesized "
    "script content — Java and RE2 spell the ranges differently but "
    "count identically",
)
def t23_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit("汉" * 50))
        .otherwise(
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.when(F.col("doc_id") % 3 == 0, F.lit(" 汉字测试")).otherwise(
                    F.lit("")
                ),
                F.when(F.col("doc_id") % 5 == 0, F.lit(" привет")).otherwise(
                    F.lit("")
                ),
            )
        )
        .alias("text"),
    )
    return text.script_mix(pages)


# --- t24: near-dup pair evidence (audit/explanation) ------------------------

T24_ORACLE = f"""
WITH toks24 AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh24 AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        FOR i IN generate_series(1, greatest(len(t) - 2, 0))])
             AS shingles
  FROM toks24
), ex24 AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh24
), pairs24 AS (
  SELECT * FROM ({_minhash_oracle()})
), shared24 AS (
  SELECT p.doc_a, p.doc_b, p.jaccard, a.s
  FROM pairs24 p
  JOIN ex24 a ON a.doc_id = p.doc_a
  JOIN ex24 b ON b.doc_id = p.doc_b AND b.s = a.s
)
SELECT doc_a, doc_b, jaccard,
       CAST(count(*) AS BIGINT) AS n_shared,
       array_to_string(list_slice(list_sort(list(s)), 1, 3), ',')
           AS top_shared
FROM shared24
GROUP BY 1, 2, 3
"""


@register(
    "t24_pair_evidence",
    T24_ORACLE,
    doc="near-dup pair EVIDENCE (the audit layer over "
    "dedup_minhash_lsh): per verified pair, the exact shared-shingle "
    "count and the first-3 shared shingles — capped BEFORE collection "
    "via a rank window on the pair partition (t12's postings-cap "
    "pattern), so per-pair state is O(3) under boilerplate floods; "
    "the count still aggregates the full set on the same shuffle",
)
def t24_pair_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash.pair_evidence(table(spark, sf_dir, "documents"))


# --- t25: language-ID confusion matrix (in-engine classifier eval) -----------

T25_ORACLE = f"""
WITH scored AS (SELECT doc_id, lang, {_LANG_SCORES_SQL} FROM documents)
SELECT lang AS actual, {_PRED_SQL} AS predicted,
       CAST(count(*) AS BIGINT) AS n_docs
FROM scored
GROUP BY 1, 2
"""


@register(
    "t25_langid_confusion",
    T25_ORACLE,
    doc="language-ID confusion matrix — classifier eval IN the engine "
    "(per (actual, predicted) doc counts over t3's marker heuristic): "
    "the quality report that decides whether the cheap lang gate is "
    "trustworthy per language; scoring is a codegen projection, the "
    "rollup one map-side-combined groupBy",
)
def t25_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pred = text.lang_id(docs).select("doc_id", "predicted_lang")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy(
            F.col("lang").alias("actual"),
            F.col("predicted_lang").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# --- m44: feature hashing (fastText/VW featurizer) ---------------------------

_M44_D = 1024

M44_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
)
SELECT doc_id,
       CAST(('0x' || substring(md5(tok), 1, 4))::BIGINT % {_M44_D}
            AS BIGINT) AS feature_idx,
       CAST(count(*) AS BIGINT) AS n
FROM toks
GROUP BY 1, 2
"""


@register(
    "m44_feature_hashing",
    M44_ORACLE,
    doc="feature hashing (the hashing trick, fastText/VW input "
    f"encoding): token -> md5_16 mod {_M44_D} index, counts per "
    "(doc, index) — fixed-dimension sparse features with NO vocabulary "
    "pass or broadcast; narrow explode + one map-side-combined groupBy",
)
def m44_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.feature_hashing(table(spark, sf_dir, "documents"), _M44_D)


# --- m45: n-gram LM counts (the count-based LM training artifact) ------------

_M45_MIN_N = 3

M45_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), bgl AS (
  SELECT unnest([struct_pack(w1 := t[i], w2 := t[i+1])
                 FOR i IN generate_series(1, greatest(len(t) - 1, 0))]) AS p
  FROM toks
), bg AS (
  SELECT p.w1 AS w1, p.w2 AS w2 FROM bgl
), counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2
), totals AS (
  SELECT w1, CAST(sum(n) AS BIGINT) AS n_w1 FROM counts GROUP BY 1
)
SELECT c.w1, c.w2, c.n, t.n_w1,
       CAST(c.n AS DOUBLE) / CAST(t.n_w1 AS DOUBLE) AS cond_p
FROM counts c JOIN totals t USING (w1)
WHERE c.n >= {_M45_MIN_N}
"""


@register(
    "m45_ngram_lm_counts",
    M45_ORACLE,
    doc="count-based bigram LM table (the KenLM/SRILM training "
    "artifact): per (w1, w2) raw counts, per-w1 totals (computed over "
    "ALL bigrams, so conditional probabilities stay true after the "
    f"n>={_M45_MIN_N} frequency cut), cond_p as ONE exact division; "
    "token-position bigrams (not distinct-per-doc) — the LM statistic, "
    "unlike m35's coverage sets; two map-side-combined groupBys "
    "sharing the w1 key",
)
def m45_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = text.tokens("text")
    bg = docs.select(
        F.explode(text.shingles(toks, k=2, distinct=False)).alias("b")
    ).select(
        F.split(F.col("b"), " ")[0].alias("w1"),
        F.split(F.col("b"), " ")[1].alias("w2"),
    )
    counts = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("w1").agg(F.sum("n").cast("long").alias("n_w1"))
    return (
        counts.join(totals, "w1")
        .filter(F.col("n") >= _M45_MIN_N)
        .select(
            "w1",
            "w2",
            "n",
            "n_w1",
            (F.col("n").cast("double") / F.col("n_w1").cast("double")).alias(
                "cond_p"
            ),
        )
    )


# --- t26: normalized exact dedup ----------------------------------------------

# Case/whitespace-normalized fingerprints: catches the near-trivial
# duplicates raw-md5 dedup (t4) misses — same text re-crawled with
# different casing or spacing. Dup pressure is synthesized (t4's
# doubled-corpus pattern, but with case+whitespace mutations so the
# raw fingerprints differ while the normalized ones collide).
T26_ORACLE = """
WITH variants AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents
), norm AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             AS norm_fingerprint
  FROM variants
)
SELECT norm_fingerprint,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM norm GROUP BY 1
"""


@register(
    "t26_normalized_dedup",
    T26_ORACLE,
    doc="normalized exact dedup: md5 over casefolded, whitespace-"
    "collapsed text — catches recrawl variants raw-md5 dedup (t4) "
    "misses; proven on a corpus doubled with case/whitespace mutants "
    "(every group collapses to n_copies=2); hash-groupBy, 32-hex "
    "keys shuffle, never texts",
)
def t26_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    variants = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.upper(F.col("text")), F.lit("  ")).alias("text"),
        )
    )
    norm = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    return (
        variants.select("doc_id", norm.alias("norm_fingerprint"))
        .groupBy("norm_fingerprint")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
    )


# --- t27: OCR/extraction-noise signal -----------------------------------------

# Synthesized noise (the corpus is clean prose-shaped tokens): every
# 4th doc gets hyphen-broken words and scattered single chars appended
# — the two classic OCR/PDF-extraction artifacts.
T27_ORACLE = f"""
WITH pages AS (
  SELECT doc_id,
         coalesce(text, '')
           || CASE WHEN doc_id % 4 = 0
                   THEN ' exam- ple bro- ken l i n e s x q z'
                   ELSE '' END AS t
  FROM documents
), toks AS (
  SELECT doc_id, t,
         list_filter(string_split(t, ' '), x -> x <> '') AS w
  FROM pages
)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(w, x -> length(x) = 1)) AS BIGINT)
           AS n_single_char,
       CAST(len(list_filter(w, x -> x LIKE '%-')) AS BIGINT)
           AS n_hyphen_breaks,
       CAST(len(list_filter(w, x -> length(x) = 1)) AS DOUBLE)
           / len(w) AS single_char_ratio,
       CAST((CAST(len(list_filter(w, x -> length(x) = 1)) AS DOUBLE)
                 / len(w) > 0.05
             OR len(list_filter(w, x -> x LIKE '%-')) >= 2) AS INT)
           AS ocr_suspect
FROM toks
"""


@register(
    "t27_ocr_noise_signal",
    T27_ORACLE,
    doc="OCR/PDF-extraction noise gate: single-character-token ratio + "
    "trailing-hyphen word-break count (the two classic artifacts, "
    "synthesized onto every 4th doc), suspect flag from either signal "
    "— the cheap filter run before expensive quality models on "
    "scanned-document corpora; pure codegen projection",
)
def t27_ocr_noise_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(" exam- ple bro- ken l i n e s x q z"),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    w = text.tokens("t")
    n_tok = F.size(w).cast("long")
    n_single = F.size(F.filter(w, lambda x: F.length(x) == 1)).cast("long")
    n_hyphen = F.size(F.filter(w, lambda x: x.endswith("-"))).cast("long")
    ratio = n_single.cast("double") / n_tok
    return pages.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_single.alias("n_single_char"),
        n_hyphen.alias("n_hyphen_breaks"),
        ratio.alias("single_char_ratio"),
        ((ratio > 0.05) | (n_hyphen >= 2)).cast("int").alias("ocr_suspect"),
    )


# --- t28: within-doc repetition signal (Gopher-style gates) -------------------

T28_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest([t[i] || ' ' || t[i+1]
                 FOR i IN generate_series(1, greatest(len(t) - 1, 0))]) AS b
  FROM toks
), bgc AS (
  SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2
), bga AS (
  SELECT doc_id,
         CAST(sum(n) AS BIGINT) AS n_bigrams,
         CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
         CAST(max(n) AS BIGINT) AS top_bigram_n
  FROM bgc GROUP BY 1
), w AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_words
  FROM toks
)
SELECT w.doc_id, w.n_words, w.n_distinct_words,
       CAST(coalesce(bga.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(bga.n_distinct_bigrams, 0) AS BIGINT)
           AS n_distinct_bigrams,
       CAST(coalesce(bga.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       CAST(CASE WHEN coalesce(bga.n_bigrams, 0) >= 10
                  AND coalesce(bga.top_bigram_n, 0) * 100
                      > coalesce(bga.n_bigrams, 0) * 18
                 THEN 1 ELSE 0 END AS BIGINT) AS rep_flag
FROM w LEFT JOIN bga USING (doc_id)
"""


@register(
    "t28_bigram_repetition_gate",
    T28_ORACLE,
    doc="most-frequent-bigram share gate (Gopher A1.1's top-2gram "
    "filter — the one repetition gate t7 omits): word/bigram "
    "cardinalities + top-bigram count per doc, "
    "flag = top-bigram share > 18% by integer cross-multiplication — "
    "catches boilerplate, template spam, decode-loop degeneration. "
    "Per-doc bigram mode via two map-side-combined groupBys (LINEAR in "
    "doc length; an array-expression mode would be quadratic)",
)
def t28_bigram_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bigram_repetition_gate(table(spark, sf_dir, "documents"))


# --- t29: bigram-LM OOV quality filter ----------------------------------------

_T29_MIN_REF = 2
_T29_MAX_OOV_PCT = 20

T29_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), bg AS (
  SELECT doc_id,
         unnest([t[i] || ' ' || t[i+1]
                 FOR i IN generate_series(1, greatest(len(t) - 1, 0))]) AS b
  FROM toks
), ref AS (
  SELECT b FROM bg WHERE doc_id % 2 = 0
  GROUP BY b HAVING count(*) >= {_T29_MIN_REF}
), scored AS (
  SELECT bg.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(count(ref.b) AS BIGINT) AS n_hit
  FROM bg LEFT JOIN ref ON bg.b = ref.b
  WHERE bg.doc_id % 2 = 1
  GROUP BY bg.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(coalesce(s.n_bigrams, 0) - coalesce(s.n_hit, 0) AS BIGINT)
           AS n_oov,
       CAST(CASE WHEN (coalesce(s.n_bigrams, 0) - coalesce(s.n_hit, 0)) * 100
                      <= coalesce(s.n_bigrams, 0) * {_T29_MAX_OOV_PCT}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN scored s USING (doc_id)
"""


@register(
    "t29_lm_oov_filter",
    T29_ORACLE,
    doc="count-LM quality gate (CCNet/KenLM shape, counts not probs): "
    f"reference bigram vocab from even docs (count >= {_T29_MIN_REF}), "
    "odd docs scored by OOV-bigram share, keep when OOV <= "
    f"{_T29_MAX_OOV_PCT}% via integer cross-multiplication. Reference "
    "joins on the bigram KEY (shuffle join — a real LM vocab is "
    "GB-scale, never broadcast); both roll-ups map-side combined",
)
def t29_lm_oov_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return text.lm_oov_score(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        min_ref_count=_T29_MIN_REF,
        max_oov_pct=_T29_MAX_OOV_PCT,
    )


# --- m50: vocabulary coverage curve -------------------------------------------

_M50_KS = (5, 15, 30)

M50_ORACLE = f"""
WITH counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  GROUP BY tok
), ranked AS (
  SELECT n,
         row_number() OVER (ORDER BY n DESC, tok) AS k,
         CAST(sum(n) OVER (ORDER BY n DESC, tok
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS covered
  FROM counts
), total AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_tokens FROM counts
)
SELECT CAST(k AS BIGINT) AS k, covered, total_tokens
FROM ranked CROSS JOIN total
WHERE k IN {_M50_KS}
"""


@register(
    "m50_vocab_coverage",
    M50_ORACLE,
    doc="vocabulary coverage curve (tokenizer vocab sizing / OOV "
    f"budgeting): corpus token occurrences covered by the top-k types "
    f"at k in {_M50_KS}. Partial top-k (TakeOrderedAndProject — no "
    "global vocab sort), cumulative window over the bounded max(k)-row "
    "frame, corpus total broadcast; all counts exact",
)
def m50_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.vocab_coverage(table(spark, sf_dir, "documents"), ks=_M50_KS)


# --- d9: MinHash-vs-exact calibration report ----------------------------------

def _d9_oracle() -> str:
    p, r = minhash.NUM_PERM, minhash.BAND_ROWS
    mh_cols = ",\n         ".join(
        f"list_min([md5('{i}:' || s) FOR s IN shingles]) AS mh{i}"
        for i in range(p)
    )
    pipe_concat = " || '|' || "
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_idx, md5({expr}) AS band_hash FROM sig".format(
            b=b, expr=pipe_concat.join(f"mh{b * r + j}" for j in range(r))
        )
        for b in range(p // r)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(p)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        FOR i IN generate_series(1, greatest(len(t) - 2, 0))]) AS shingles
  FROM toks
), sig AS (
  SELECT doc_id,
         {mh_cols}
  FROM sh
), buckets AS (
{band_selects}
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
), ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
), sizes AS (
  SELECT doc_id, len(shingles) AS sz FROM sh
), inter AS (
  SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS i
  FROM ex x JOIN ex y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST({agree} AS BIGINT) AS n_agree,
       CAST(coalesce(i.i, 0) AS BIGINT) AS inter_n,
       CAST(za.sz + zb.sz - coalesce(i.i, 0) AS BIGINT) AS union_n
FROM cands c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
LEFT JOIN inter i ON i.da = c.doc_a AND i.db = c.doc_b
JOIN sizes za ON za.doc_id = c.doc_a
JOIN sizes zb ON zb.doc_id = c.doc_b
"""


@register(
    "d9_minhash_calibration",
    _d9_oracle(),
    doc="MinHash calibration report (sketch-quality audit for tuning "
    f"num_perm/band geometry): per LSH candidate pair, the signature "
    "agreement count (the unbiased Jaccard estimator numerator) next "
    "to exact intersection/union cardinalities — all-integer output, "
    "division left to the reader. One signature evaluation feeds "
    "buckets AND the agreement join (candidate_pairs' persist + eager "
    "checkpoint discipline); exact leg restricted to candidate docs "
    "before joining; md5 hash family reproduced bit-for-bit in SQL",
)
def d9_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash.calibration(table(spark, sf_dir, "documents"))


# --- t30: learned boilerplate-line removal --------------------------------------

_T30_PCT = 30

# Synthesis (t20's pattern — corpus text has no newlines): every doc of
# a source carries that source's footer (100% share -> learned
# boilerplate), every 4th doc carries a newsletter line (25% < 30% ->
# kept), and each doc has a unique ref line (never boilerplate).
T30_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, source,
         coalesce(text, '')
           || chr(10) || 'Visit the ' || source || ' homepage for more articles.'
           || CASE WHEN doc_id % 4 = 0
                   THEN chr(10) || 'Subscribe to our newsletter today.'
                   ELSE '' END
           || chr(10) || 'ref ' || CAST(doc_id AS VARCHAR) AS page
  FROM documents
), split AS (
  SELECT doc_id, source, string_split(page, chr(10)) AS lines FROM pages
), lines AS (
  SELECT doc_id, source, gs.i AS pos, lines[gs.i] AS line
  FROM split,
       LATERAL (SELECT unnest(generate_series(1, len(lines))) AS i) gs
), totals AS (
  SELECT source, count(*) AS n_docs FROM pages GROUP BY 1
), boiler AS (
  SELECT l.source, l.line
  FROM (SELECT DISTINCT source, line, doc_id FROM lines) l
  JOIN totals t USING (source)
  WHERE t.n_docs >= 2
  GROUP BY l.source, l.line, t.n_docs
  HAVING count(*) * 100 >= t.n_docs * {_T30_PCT}
), tagged AS (
  SELECT li.doc_id, li.pos, li.line,
         CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END AS is_boiler
  FROM lines li
  LEFT JOIN boiler b ON b.source = li.source AND b.line = li.line
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(is_boiler) AS BIGINT) AS n_boiler,
       CAST(sum(1 - is_boiler) AS BIGINT) AS n_kept,
       md5(coalesce(
           string_agg(CASE WHEN is_boiler = 0 THEN line END, chr(10)
                      ORDER BY pos),
           '')) AS kept_digest
FROM tagged GROUP BY doc_id
"""


@register(
    "t30_boilerplate_lines",
    T30_ORACLE,
    doc="learned cross-document boilerplate removal (corpus-level "
    "complement of t20's static blocklist): a line appearing in >= "
    f"{_T30_PCT}% of a source's docs is template chrome and drops "
    "from every doc of that source. Frequencies aggregate on "
    "(source, line-fp) — 16-byte fingerprints shuffle, never line "
    "text; verdict joins back on the same key; per-doc reassembly is "
    "one doc-key groupBy with in-aggregation position sort. "
    "Synthesized footers: per-source 100% (dropped), 25% newsletter "
    "(kept), unique ref line (kept)",
)
def t30_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\nVisit the "),
            F.col("source"),
            F.lit(" homepage for more articles."),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\nSubscribe to our newsletter today."),
            ).otherwise(F.lit("")),
            F.concat(F.lit("\nref "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return text.boilerplate_lines(pages, min_share_pct=_T30_PCT)


# --- t31: RAKE keyword extraction ------------------------------------------------

_T31_K = 20

T31_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), pos AS (
  SELECT doc_id, gs.i AS pos, t[gs.i] AS w
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) gs
), seg AS (
  SELECT doc_id, pos, w,
         sum(CASE WHEN w IN {_STOPLIST} THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g,
         w IN {_STOPLIST} AS is_stop
  FROM pos
), run_words AS (
  SELECT doc_id, g, pos, w FROM seg WHERE NOT is_stop
), phrases AS (
  SELECT doc_id, g,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM run_words GROUP BY 1, 2
), word_stats AS (
  SELECT rw.w,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(p.plen) AS BIGINT) AS degree
  FROM run_words rw JOIN phrases p USING (doc_id, g)
  GROUP BY rw.w
), phrase_occ AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences FROM phrases
  GROUP BY 1
), scored AS (
  SELECT po.phrase, po.n_occurrences,
         CAST(sum(ws.degree) AS BIGINT) AS sum_degree,
         CAST(sum(ws.freq) AS BIGINT) AS sum_freq
  FROM phrase_occ po,
       LATERAL (SELECT unnest(string_split(po.phrase, ' ')) AS w) u
  JOIN word_stats ws ON ws.w = u.w
  GROUP BY 1, 2
)
SELECT phrase, n_occurrences, sum_degree, sum_freq,
       CAST(sum_degree AS DOUBLE) / CAST(sum_freq AS DOUBLE) AS score,
       CAST(row_number() OVER (
           ORDER BY CAST(sum_degree AS DOUBLE) / CAST(sum_freq AS DOUBLE)
                    DESC, phrase) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {_T31_K}
ORDER BY rank
"""


@register(
    "t31_rake_keywords",
    T31_ORACLE,
    doc=f"RAKE keyword extraction (Rose et al. 2010), corpus top-"
    f"{_T31_K}: stopword-free token runs are candidate phrases, words "
    "accumulate freq + co-occurrence degree, phrases rank by "
    "sum(degree)/sum(freq) — ONE exact BIGINT division (classic "
    "RAKE's per-word ratio SUM is float-fold-order-dependent across "
    "engines, so the ratio-of-sums variant is the reproducible form). "
    "One doc-key window + run groupBy share a shuffle; vocabulary-"
    "sized word stats; partial top-k cut",
)
def t31_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.rake_keywords(table(spark, sf_dir, "documents"), k=_T31_K)


# --- t32: classic RAKE (textbook per-word-ratio sum) ------------------------------

T32_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), pos AS (
  SELECT doc_id, gs.i AS pos, t[gs.i] AS w
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) gs
), seg AS (
  SELECT doc_id, pos, w,
         sum(CASE WHEN w IN {_STOPLIST} THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g,
         w IN {_STOPLIST} AS is_stop
  FROM pos
), run_words AS (
  SELECT doc_id, g, pos, w FROM seg WHERE NOT is_stop
), phrases AS (
  SELECT doc_id, g,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen
  FROM run_words GROUP BY 1, 2
), word_stats AS (
  SELECT rw.w,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(p.plen) AS BIGINT) AS degree
  FROM run_words rw JOIN phrases p USING (doc_id, g)
  GROUP BY rw.w
), ratio AS (
  SELECT w, CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) AS r
  FROM word_stats
), phrase_occ AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences FROM phrases
  GROUP BY 1
), scored AS (
  SELECT po.phrase, po.n_occurrences,
         CAST(count(*) AS BIGINT) AS n_words,
         list_reduce(list(ratio.r ORDER BY u.p), (x, y) -> x + y) AS score
  FROM phrase_occ po,
       LATERAL (SELECT unnest(string_split(po.phrase, ' ')) AS w,
                       generate_subscripts(string_split(po.phrase, ' '), 1)
                           AS p) u
  JOIN ratio ON ratio.w = u.w
  GROUP BY 1, 2
)
SELECT phrase, n_occurrences, n_words, score,
       CAST(row_number() OVER (ORDER BY score DESC, phrase) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {_T31_K}
ORDER BY rank
"""


@register(
    "t32_rake_classic",
    T32_ORACLE,
    doc=f"textbook RAKE (Rose et al. 2010), corpus top-{_T31_K}: "
    "score(phrase) = SUM over the phrase's token occurrences of "
    "degree(w)/freq(w) — the per-word-ratio form whose rankings "
    "DIVERGE from t31's ratio-of-sums (classic boosts phrases with a "
    "rare long-phrase word; ratio-of-sums freq-weights it down). The "
    "float sum hashes EXACTLY cross-engine anyway: each ratio is one "
    "exact IEEE division and both engines LEFT-FOLD in phrase token "
    "order (Spark F.aggregate over a pos-sorted array, DuckDB "
    "list_reduce over list(ORDER BY pos)) — identical addition tree, "
    "bit-identical double. Same shuffle shape as t31 plus one "
    "vocabulary-bounded phrase-key groupBy",
)
def t32_rake_classic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.rake_keywords(
        table(spark, sf_dir, "documents"), k=_T31_K, classic=True
    )


# --- m58: fuzzy (near-dup) eval-set decontamination ------------------------------

# Eval set = every 10th doc; the contamination verdict derives from the
# SAME banded-LSH pair set as d7 (full-union dedup restricted to
# train x eval pairs), so the oracle reuses _minhash_oracle verbatim.
M58_ORACLE = f"""
SELECT CASE WHEN t.doc_a % 10 = 0 THEN t.doc_b ELSE t.doc_a END AS train_id,
       CAST(count(*) AS BIGINT) AS n_eval_matches,
       max(t.jaccard) AS best_jaccard
FROM ({_minhash_oracle()}) t
WHERE (t.doc_a % 10 = 0) <> (t.doc_b % 10 = 0)
GROUP BY 1
"""


@register(
    "m58_fuzzy_contamination",
    M58_ORACLE,
    doc="fuzzy eval-set decontamination — the NEAR-DUP strengthening "
    "of m14's exact n-gram screen (a contaminated doc that was "
    "lightly paraphrased or re-wrapped defeats exact matching; "
    "FineWeb/GPT-3-style decontamination is fuzzy for this reason): "
    "train docs sharing an LSH band bucket with any eval doc verify "
    "by exact Jaccard >= 0.4 and report match count + best score. "
    "Rides minhash.incremental_dedup with the EVAL set as the stored "
    "index — eval is tiny, so the index broadcasts and train text is "
    "never self-joined; the salted bipartite bucket join bounds any "
    "boilerplate band. Oracle = the d7 pair algebra restricted to "
    "train x eval pairs",
)
def m58_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    pairs = minhash.incremental_dedup(train, eval_docs, threshold=0.4).filter(
        F.col("vs_existing") == 1
    )
    train_id = F.when(
        F.col("doc_a") % 10 == 0, F.col("doc_b")
    ).otherwise(F.col("doc_a"))
    return pairs.select(train_id.alias("train_id"), "jaccard").groupBy(
        "train_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_matches"),
        F.max("jaccard").alias("best_jaccard"),
    )


# --- t33: per-source term concentration (HHI) ------------------------------------

T33_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({_TOKS}) AS tok FROM documents
), tf AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(sum(n * n) AS BIGINT) AS sum_sq,
       CAST(sum(n * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
           / CAST(sum(n) AS DOUBLE) AS hhi
FROM tf GROUP BY source
"""


@register(
    "t33_term_concentration",
    T33_ORACLE,
    doc="per-source term concentration: the Herfindahl-Hirschman index "
    "over term frequencies (sum of squared token shares) — the "
    "repetitiveness/diversity screen that catches template-generated "
    "or boilerplate-heavy sources (HHI -> 1) that per-doc gates like "
    "t7 miss because each document looks fine in isolation. EXACT "
    "algebra, overflow-LOUD (ADVICE r10): sum(n^2) accumulates in "
    "DECIMAL(38,0) — exact like BIGINT, but Spark's silent long "
    "wraparound is impossible — and assert_true raises if it exceeds "
    "the BIGINT output column, exactly where DuckDB's HUGEINT->BIGINT "
    "cast raises; hhi divides by total TWICE (never forms total^2), "
    "so the ratio has no overflow surface at any corpus size. Both "
    "engines round the same exact integers to double then divide in "
    "the same order — bit parity preserved. total_tokens itself "
    "cannot overflow (2^63 tokens is a yottabyte-scale corpus). "
    "Scale: one explode + two map-side-combined groupBys; only "
    "(source, term, count) triples ever shuffle",
)
def t33_term_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(text.tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sum_sq_dec = F.sum(F.col("n").cast("decimal(38,0)") * F.col("n"))
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("n").cast("long").alias("total_tokens"),
        _stats.guarded_bigint(sum_sq_dec, "t33: sum(n^2)").alias("sum_sq"),
        (
            sum_sq_dec.cast("double")
            / F.sum("n").cast("double")
            / F.sum("n").cast("double")
        ).alias("hhi"),
    )


# --- t34: per-source document-length Gini -----------------------------------

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (  # noqa: E402
    stats as _stats,
)

# Independent formulation on purpose: the oracle ranks every document
# with row_number() and sums i*n directly (the textbook definition),
# while the operator never sorts the corpus — it reconstructs the same
# S1 from per-(source, length) frequency blocks in closed form. The
# rank sum is tie-invariant (equal lengths contribute v * [sum of the
# block's ranks] under ANY tie order), so the oracle's nondeterministic
# tie order cannot diverge. HUGEINT sums mirror the operator's
# DECIMAL(38,0) accumulation; one final double division each side.
T34_ORACLE = f"""
WITH d AS (
  SELECT source, CAST(len({_TOKS}) AS BIGINT) AS n FROM documents
), r AS (
  SELECT source, n,
         CAST(row_number() OVER (PARTITION BY source ORDER BY n) AS HUGEINT)
             AS i
  FROM d
), a AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         sum(i * n) AS s1
  FROM r GROUP BY source
)
SELECT source, n_docs, total_tokens,
       CASE WHEN n_docs * total_tokens = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(2 * s1 - (CAST(n_docs AS HUGEINT) + 1) * total_tokens
                      AS DOUBLE)
                 / CAST(CAST(n_docs AS HUGEINT) * total_tokens AS DOUBLE)
       END AS gini
FROM a
"""


@register(
    "t34_length_gini",
    T34_ORACLE,
    doc="per-source Gini over document token counts — the length-"
    "inequality screen t33's term-HHI misses (a source whose mass "
    "sits in a few mega-docs skews packing, budget selection, and "
    "per-doc gates while its term mix looks fine). Sort-free: "
    "(source, length) frequencies are the only corpus shuffle; S1 "
    "is reconstructed from frequency blocks in closed form and the "
    "prefix window runs over the value-cardinality frame (bounded by "
    "max doc length, never corpus size). DECIMAL(38,0) accumulation "
    "(S1 ~ N^2*v overflows BIGINT at ~1e9 docs), one double division; "
    "oracle uses the independent row_number() textbook formulation "
    "(rank sums are tie-invariant). Hand-solved + brute-force tests "
    "in tests/test_shared_algebra.py",
)
def t34_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stats.length_gini(table(spark, sf_dir, "documents"))
