"""Training-data preparation queries (beyond-reference family: the
reference's pipelines stop at KPI aggregation — these are the ops an
LLM-scale data pipeline adds on the same tables), each with an exact
DuckDB oracle.

Determinism discipline: hash-based assignment (md5), integer-cents
float sums, total-order tiebreaks on every rank/limit — so the oracle
reproduces each result bit-for-bit.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    minhash,
    prep,
)
from group_2_shopware_enterprise_data_engineering_project_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
)
from group_2_shopware_enterprise_data_engineering_project_spark.operators.components import (
    dedup_verdicts,
)
from group_2_shopware_enterprise_data_engineering_project_spark.queries import (
    text_pipeline,
)
from group_2_shopware_enterprise_data_engineering_project_spark.registry import register
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table

# --- m1: deterministic train/val/test split -------------------------------

_T1, _T2 = prep.split_thresholds((0.9, 0.05, 0.05))

M1_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < '{_T1}' THEN 'train'
            WHEN bucket < '{_T2}' THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


@register(
    "m1_split_assign",
    M1_ORACLE,
    doc="deterministic 90/5/5 train/val/test assignment by md5 hex-"
    "prefix range: stable under corpus growth, zero-shuffle projection",
)
def m1_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return prep.split_assign(docs, "doc_id").select("doc_id", "bucket", "split")


# --- m2: gap-based sessionization -----------------------------------------

M2_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
  FROM seq
)
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms,
       CAST(sum(CAST(floor(value * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                     AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS total_value
FROM s
GROUP BY user_id, session_seq
"""


@register(
    "m2_sessionize",
    M2_ORACLE,
    doc="inactivity-gap sessionization (30 min) over raw events — the "
    "engine-derived generalization of ST6's pre-assigned sessions; one "
    "shuffle (window partitioning reused by the per-session groupBy)",
)
def m2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.sessionize(table(spark, sf_dir, "events"), gap_sec=1800)


# --- m3: PII redaction -----------------------------------------------------

# The synthetic corpus carries no PII, so both engines seed identical
# synthetic contact strings on every 7th doc, then count+redact them.
_SEED_SQL = """
  SELECT doc_id,
         text || CASE WHEN doc_id % 7 = 0
                      THEN ' Contact: user' || CAST(doc_id AS VARCHAR)
                           || '@example.com or +1 555 123-4567.'
                      ELSE '' END AS text
  FROM documents
"""

M3_ORACLE = rf"""
WITH seeded AS ({_SEED_SQL}),
red AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
              '{prep.EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text,
              '{prep.PHONE_PATTERN}')) AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(text,
              '{prep.EMAIL_PATTERN}', '[EMAIL]', 'g'),
              '{prep.PHONE_PATTERN}', '[PHONE]', 'g') AS redacted_text
  FROM seeded
)
SELECT doc_id, n_emails, n_phones,
       CAST(length(redacted_text) AS BIGINT) AS redacted_len,
       md5(redacted_text) AS redacted_digest
FROM red
"""


@register(
    "m3_pii_redact",
    M3_ORACLE,
    doc="email/phone PII counting + placeholder redaction (regex "
    "dialect restricted to the Java-regex/RE2 common subset); "
    "zero-shuffle codegen projection",
)
def m3_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" Contact: user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1 555 123-4567."),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return prep.pii_redact(seeded).select(
        "doc_id",
        "n_emails",
        "n_phones",
        "redacted_len",
        F.md5("redacted_text").alias("redacted_digest"),
    )


# --- m4: group-wise top-k --------------------------------------------------

M4_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT)
           AS rank_in_group
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_group
FROM ranked WHERE rank_in_group <= 3
"""


@register(
    "m4_topk_per_group",
    M4_ORACLE,
    doc="top-3 orders per customer by price (row_number window, "
    "deterministic tiebreak) — per-group top-k, the grouped sibling "
    "of O1's global TakeOrderedAndProject",
)
def m4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return prep.topk_per_group(
        orders, "o_custkey", "o_totalprice", "o_orderkey", k=3
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_group")


# --- m5: document frequency / IDF -----------------------------------------

M5_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS t
  FROM documents
), ex AS (
  SELECT doc_id, unnest(t) AS term FROM toks
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY term
)
SELECT term, df,
       CAST((SELECT count(*) FROM documents) AS DOUBLE) / df AS idf_ratio
FROM dfreq
ORDER BY df DESC, term ASC
LIMIT 50
"""


@register(
    "m5_doc_frequency",
    M5_ORACLE,
    doc="top-50 terms by document frequency with exact IDF ratio; "
    "shuffle carries (term, partial count) after map-side combine, "
    "corpus count broadcast, top-n via TakeOrderedAndProject",
)
def m5_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.doc_frequency(table(spark, sf_dir, "documents"), top_n=50)


# --- m6: stratified sampling ----------------------------------------------

M6_ORACLE = """
WITH r AS (
  SELECT lang, doc_id,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id)
           AS BIGINT) AS sample_rank,
         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_stratum
  FROM documents
)
SELECT lang, doc_id, sample_rank, n_stratum
FROM r WHERE sample_rank * 5 <= n_stratum * 1
"""


@register(
    "m6_stratified_sample",
    M6_ORACLE,
    doc="deterministic 1/5 quota sample per language stratum (md5 "
    "rank, integer-arithmetic quota) — the data-mixing/rebalancing "
    "primitive; one shuffle shared by rank and stratum-count windows",
)
def m6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.stratified_sample(
        table(spark, sf_dir, "documents"), frac=Fraction(1, 5)
    )


# --- m7: as-of join --------------------------------------------------------

# Both engines pre-dedup the right side to one order per (custkey,
# date) — DuckDB's ASOF JOIN is nondeterministic when several right
# rows share the matched timestamp, so tie-free input is part of the
# operator contract here.
M7_ORACLE = """
WITH ranked AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey, o_orderdate
           ORDER BY o_orderkey DESC) AS rn
  FROM orders
), r AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM ranked WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_totalprice
FROM events e ASOF JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


@register(
    "m7_asof_join",
    M7_ORACLE,
    doc="point-in-time join: each event attributed to its user's most "
    "recent prior order — single-shuffle union+window formulation vs "
    "DuckDB's native ASOF JOIN as the oracle",
)
def m7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return asof_join(
        events,
        latest,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=("o_orderkey", "o_totalprice"),
    )


# --- m8: dedup clustering (connected components) ---------------------------

# The oracle embeds the full MinHash-LSH pair derivation (bit-for-bit
# identical to dedup_minhash_lsh) and resolves clusters with a
# recursive CTE: labels propagate along symmetric edges; min reachable
# id == component representative.
M8_ORACLE = f"""
WITH RECURSIVE pairs AS ({text_pipeline._minhash_oracle()}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
)
SELECT id AS doc_id,
       CAST(min(label) AS BIGINT) AS cluster_rep,
       min(label) = id AS is_keep
FROM reach GROUP BY id
"""


@register(
    "m8_dedup_clusters",
    M8_ORACLE,
    doc="near-dup pairs -> connected clusters -> one kept doc per "
    "cluster (iterative min-label propagation; oracle = recursive CTE "
    "over the identical MinHash-LSH pair set)",
)
def m8_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash.minhash_lsh_dedup(docs, threshold=0.4).select("doc_a", "doc_b")
    return dedup_verdicts(docs, pairs)


# --- m9: native session_window parity -------------------------------------

# Pins Spark's NATIVE gap-session operator (the one Structured
# Streaming uses for stream sessionization) against an independent SQL
# derivation. Boundary semantics (pinned by test_prep.py): an event at
# EXACTLY last_ts + gap still merges — a new session starts only when
# the gap is strictly exceeded — and the comparison runs at full
# microsecond precision, hence epoch_us and strict >.
M9_ORACLE = """
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts) AS BIGINT) AS session_seq
  FROM seq
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end_gap,
       CAST(count(*) AS BIGINT) AS n_events
FROM s
GROUP BY user_id, session_seq
"""


@register(
    "m9_session_window_native",
    M9_ORACLE,
    doc="Spark's native session_window(gap=30min) — the operator "
    "streaming sessionization uses — verified against an independent "
    "lag/cumsum SQL derivation at microsecond precision",
)
def m9_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end_gap"),
            "n_events",
        )
    )


# --- m10: exact grouped percentiles ---------------------------------------

# Spark `percentile` and DuckDB `quantile_cont` share the linear-
# interpolation definition (h = (n-1)q; v = a + (h-floor(h))(b-a)) and
# produce bit-identical doubles (probed on this corpus before
# registering) — so EXACT percentiles are oracle-checkable; no
# approx-sketch escape hatch needed.
M10_ORACLE = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "m10_percentiles",
    M10_ORACLE,
    doc="exact p50/p90/p99 order value per status (single shuffle, "
    "per-group sort inside the percentile aggregate); the latency/"
    "value-distribution reporting primitive",
)
def m10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )


# --- m11: semi-structured JSON extraction ---------------------------------

M11_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS max_k
FROM events
GROUP BY event_type
"""


@register(
    "m11_json_extract",
    M11_ORACLE,
    doc="typed JSON extraction from the semi-structured props column "
    "(from_json with an explicit schema — JVM-side JacksonParser, no "
    "Python; the scan prunes to two columns) aggregated per event type",
)
def m11_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.from_json("props", "k long").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# --- m12: text normalization ----------------------------------------------

# Canonicalization before hashing/dedup: lowercase, strip punctuation
# to spaces, collapse whitespace runs, trim. Exactly mirrored in SQL,
# so the normalized digest is cross-engine stable — the precondition
# for cross-system dedup joins.
M12_ORACLE = """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id,
       CAST(length(norm_text) AS BIGINT) AS norm_len,
       md5(norm_text) AS norm_digest
FROM norm
"""


@register(
    "m12_text_normalize",
    M12_ORACLE,
    doc="canonicalizing text normalization (lower, punct->space, "
    "whitespace collapse, trim) + stable digest — zero-shuffle "
    "codegen projection, the pre-hash step of every dedup family",
)
def m12_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length(norm).cast("long").alias("norm_len"),
        F.md5(norm).alias("norm_digest"),
    )


# --- flagship: end-to-end corpus curation ---------------------------------

from group_2_shopware_enterprise_data_engineering_project_spark.pipelines.curation import (  # noqa: E402
    curate_corpus,
)

# Split into CTE body + final SELECT so pipe_llm_prep can splice the
# identical curation chain ahead of its pack/layout stages.
_CURATION_CTES = f"""
WITH RECURSIVE exact AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), surv1 AS (
  SELECT d.* FROM documents d JOIN exact e ON d.doc_id = e.doc_id
), pairs AS ({text_pipeline._minhash_oracle(src="surv1")}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(id, label) AS (
  SELECT doc_id, doc_id FROM surv1
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
), verdict AS (
  SELECT id AS doc_id FROM reach GROUP BY id HAVING min(label) = id
), surv2 AS (
  SELECT s.* FROM surv1 s JOIN verdict v ON s.doc_id = v.doc_id
), base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         {text_pipeline._TOKS} AS t,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_no_space,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT)
             AS n_punct
  FROM surv2
), stats AS (
  SELECT doc_id, n_chars,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(chars_no_space AS DOUBLE) / len(t) AS avg_token_len,
         CAST(len(list_filter(t, x -> x IN {text_pipeline._STOPLIST}))
              AS DOUBLE) / len(t) AS stopword_ratio,
         CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio
  FROM base
), quality AS (
  SELECT doc_id, n_tokens,
         CAST((n_tokens BETWEEN 20 AND 2000)::INT
            + (stopword_ratio <= 0.6)::INT
            + (punct_ratio <= 0.2)::INT
            + (avg_token_len BETWEEN 2.0 AND 15.0)::INT AS BIGINT)
             AS quality_score
  FROM stats
), passed AS (
  SELECT * FROM quality WHERE quality_score = 4
), rsh AS (
  SELECT s.doc_id, s.text, {text_pipeline._TOKS} AS t,
         [array_to_string({text_pipeline._TOKS}[i:i+1], ' ')
          FOR i IN generate_series(1, greatest(len({text_pipeline._TOKS}) - 1, 0))] AS g2,
         [array_to_string({text_pipeline._TOKS}[i:i+2], ' ')
          FOR i IN generate_series(1, greatest(len({text_pipeline._TOKS}) - 2, 0))] AS g3
  FROM surv2 s JOIN passed p USING (doc_id)
), rkeep AS (
  SELECT doc_id FROM rsh
  WHERE len(t) > 0
    AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.5
    AND CAST(list_max([len(list_filter(t, y -> y = x))
                       FOR x IN list_distinct(t)]) AS DOUBLE) / len(t) <= 0.2
    AND (len(g2) = 0 OR
         1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) <= 0.2)
    AND (len(g3) = 0 OR
         1 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) <= 0.18)
    AND CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
        / length(text) <= 0.1
)"""

_CURATION_SELECT = f"""
SELECT doc_id, n_tokens, quality_score,
       CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{_T1}' THEN 'train'
            WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{_T2}' THEN 'val'
            ELSE 'test' END AS split
FROM passed JOIN rkeep USING (doc_id)
"""

_CURATION_ORACLE = _CURATION_CTES + _CURATION_SELECT


_PREP_CAP, _PREP_SHARDS = 1024, 8

# Curation chain spliced verbatim, then the m15-style pack recurrence
# computed OVER THE SURVIVOR SET (shard = doc_id % shards, running sum
# ordered by doc_id within shard) — all-integer, exactly
# prep.sequence_pack's layout.
_PREP_ORACLE = (
    _CURATION_CTES
    + ", curated AS ("
    + _CURATION_SELECT
    + f"""), surv3 AS (
  SELECT d.doc_id, d.text FROM documents d JOIN curated c USING (doc_id)
), tk AS (
  SELECT doc_id, doc_id % {_PREP_SHARDS} AS shard,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tok,
         md5(text) AS _tie
  FROM surv3
), cum AS (
  SELECT *,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id, _tie
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
             AS cum_before
  FROM tk
)
SELECT c.doc_id, c.n_tokens, c.quality_score, c.split, cum.shard,
       CAST(cum.cum_before // {_PREP_CAP} AS BIGINT) AS pack_id,
       CAST(cum.cum_before % {_PREP_CAP} AS BIGINT) AS pack_offset,
       CAST((cum.cum_before % {_PREP_CAP}) + cum.n_tok > {_PREP_CAP} AS INTEGER)
           AS spans_boundary
FROM curated c JOIN cum USING (doc_id)
"""
)


@register(
    "pipe_llm_prep",
    _PREP_ORACLE,
    doc="curation v2 end-to-end: the pipe_llm_curation chain (exact "
    "dedup -> MinHash-LSH clusters -> quality + repetition gates -> "
    "split) composed with writer-facing sequence-pack layout over the "
    "survivors (shard, pack_id, pack_offset, boundary flag) — the "
    "direct input of a tokenize-and-shard training-data writer; "
    "composed oracle splices the curation CTEs ahead of the m15 pack "
    "recurrence",
)
def pipe_llm_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.pipelines.curation import (
        curate_and_pack,
    )

    return curate_and_pack(
        table(spark, sf_dir, "documents"), cap=_PREP_CAP, shards=_PREP_SHARDS
    )


@register(
    "pipe_llm_curation",
    _CURATION_ORACLE,
    doc="flagship end-to-end corpus curation: exact dedup -> MinHash-"
    "LSH near-dup clusters (connected components keep one per "
    "cluster) -> 4-check quality gate -> hash-stable train/val/test "
    "split; every stage oracle-verified standalone AND composed",
)
def pipe_llm_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(table(spark, sf_dir, "documents"))


# --- m13: sketch aggregates, bounds-audited so the oracle CAN hash them ----

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (  # noqa: E402
    analytics as _analytics,
)

# An approximation can't hash-match exact SQL — but a BOUND on it can.
# The Spark side recomputes the exact stats next to the sketches and
# emits within-bound booleans; the oracle emits the same exact counts
# and literal TRUEs, so any sketch outside its error bound fails the
# driver's hash. (Accuracy magnitudes additionally pinned by
# tests/test_prep.py rank-error assertions.)
M13_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       TRUE AS users_within_bound,
       TRUE AS p50_rank_ok,
       TRUE AS p99_rank_ok
FROM events
GROUP BY event_type
"""


@register(
    "m13_approx_stats",
    M13_ORACLE,
    doc="HLL++ distinct users + KLL-style approx percentiles per event "
    "type — the constant-memory 100 TB replacements for exact "
    "countDistinct / percentile — audited against their error bounds "
    "in-query: the oracle hashes exact counts + within-bound booleans",
)
def m13_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _analytics.sketch_accuracy_report(table(spark, sf_dir, "events"))


# --- m7b: bucketed as-of join (same semantics, hot-key-safe plan) ----------


@register(
    "m7b_asof_join_bucketed",
    M7_ORACLE,  # identical semantics to m7 — same oracle, different plan
    doc="as-of join, bounded-memory formulation: partitions by (key, "
    "time-bucket) with cross-bucket carry summaries, so a hot key's "
    "history never lands in one task sort; equivalence to the plain "
    "plan pinned by tests AND by sharing m7's oracle",
)
def m7b_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    events = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return asof_join_bucketed(
        events,
        latest,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=("o_orderkey", "o_totalprice"),
        bucket_sec=86400 * 30,
    )


# --- m14: train/eval contamination detection -------------------------------

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (  # noqa: E402
    contamination as _contamination,
)

_M14_K = 4  # testdata docs are short; production decontamination uses 8-13

M14_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text,
         substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
  FROM documents
), toks AS (
  SELECT doc_id, bucket, {text_pipeline._TOKS} AS t FROM b
), sh AS (
  SELECT doc_id, bucket,
         list_distinct([array_to_string(t[i:i+{_M14_K - 1}], ' ')
                        FOR i IN generate_series(1, greatest(len(t) - {_M14_K - 1}, 0))]) AS shingles
  FROM toks
), ev AS (
  SELECT DISTINCT md5(unnest(shingles)) AS ngram_md5 FROM sh WHERE bucket >= '{_T2}'
), ex AS (
  SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
         md5(unnest(shingles)) AS ngram_md5
  FROM sh WHERE bucket < '{_T1}'
)
SELECT e.doc_id,
       max(e.n_shingles) AS n_shingles,
       CAST(count(*) AS BIGINT) AS n_overlap,
       CAST(count(*) AS DOUBLE) / max(e.n_shingles) AS contamination_ratio
FROM ex e JOIN ev ON e.ngram_md5 = ev.ngram_md5
GROUP BY e.doc_id
"""


@register(
    "m14_contamination",
    M14_ORACLE,
    doc="train/eval verbatim n-gram contamination check (GPT-3-style "
    "decontamination): eval n-gram digests broadcast, corpus probed "
    "map-side — flags train-split docs sharing any k-gram with the "
    "test split, with hit counts and contaminated fraction",
)
def m14_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = prep.split_assign(table(spark, sf_dir, "documents"), "doc_id")
    return _contamination.contamination_report(
        docs.filter(F.col("split") == "train"),
        docs.filter(F.col("split") == "test"),
        k=_M14_K,
    )


# --- m15: sequence packing (concat-and-chunk plan) -------------------------

_M15_CAP, _M15_SHARDS = 1024, 8

M15_ORACLE = f"""
WITH t AS (
  SELECT doc_id, doc_id % {_M15_SHARDS} AS shard,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             AS n_tokens,
         md5(text) AS _tie
  FROM documents
), c AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, _tie
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS cum_before
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST(cum_before // {_M15_CAP} AS BIGINT) AS pack_id,
       CAST(cum_before % {_M15_CAP} AS BIGINT) AS pack_offset,
       CAST((cum_before % {_M15_CAP}) + n_tokens > {_M15_CAP} AS INTEGER)
           AS spans_boundary
FROM c
"""


@register(
    "m15_sequence_pack",
    M15_ORACLE,
    doc=f"GPT-2/T5-style concat-and-chunk packing plan (cap={_M15_CAP} "
    f"tokens, {_M15_SHARDS} shards): per-doc pack id, intra-pack offset, "
    "boundary-span flag; sharded running sum so no global single-task "
    "window exists in the plan",
)
def m15_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.sequence_pack(
        table(spark, sf_dir, "documents"), cap=_M15_CAP, shards=_M15_SHARDS
    )


# --- m16: domain mixture weights (temperature sampling) --------------------

M16_ORACLE = """
WITH per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT *, CAST(sum(n_tokens) OVER () AS BIGINT) AS total FROM per
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / total AS token_share,
       sqrt(CAST(n_tokens AS DOUBLE) / total) AS alpha_weight_unnorm,
       1 / sqrt(CAST(n_tokens AS DOUBLE) / total) AS rel_upsample
FROM tot
"""


@register(
    "m16_mixture_weights",
    M16_ORACLE,
    doc="temperature-scaled domain mixture stats (alpha=0.5, XLM-R/GPT-3 "
    "style): per-source token share, sqrt alpha-weight, relative "
    "up-sample factor — exact-rounded ops only, so the oracle is "
    "bit-for-bit",
)
def m16_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.mixture_weights(table(spark, sf_dir, "documents"))


@register(
    "m14b_contamination_bloom",
    M14_ORACLE,
    doc="same contamination semantics via the bloom scale path: eval "
    "n-gram bloom bitmap (DataFrame-built array<bigint>, broadcast one "
    "row) pre-filters corpus n-grams map-side; exact digest join runs "
    "only on survivors — identical output (no false negatives), "
    "~1.2 bytes/item broadcast instead of 8+",
)
def m14b_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = prep.split_assign(table(spark, sf_dir, "documents"), "doc_id")
    return _contamination.contamination_report_bloom(
        docs.filter(F.col("split") == "train"),
        docs.filter(F.col("split") == "test"),
        k=_M14_K,
        m_bits=1 << 20,
    )


# --- m17: token-budget corpus selection ------------------------------------

_M17_BUDGET = 20_000

M17_ORACLE = f"""
WITH stats AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             AS n_tokens,
         text
  FROM documents
), scored AS (
  SELECT doc_id, n_tokens,
         CAST((n_tokens BETWEEN 20 AND 2000) AS INT)
         + CAST((CAST(len(list_filter(string_split(text, ' '), x -> x = 'a'))
                      + len(list_filter(string_split(text, ' '), x -> x = 'value'))
                      + len(list_filter(string_split(text, ' '), x -> x = 'row'))
                      + len(list_filter(string_split(text, ' '), x -> x = 'table'))
                 AS DOUBLE) / n_tokens <= 0.6) AS INT)
         + CAST((CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                 / length(text) <= 0.2) AS INT)
         + CAST((CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_tokens
                 BETWEEN 2.0 AND 15.0) AS INT) AS quality_score
  FROM stats
), bands AS (
  SELECT quality_score, CAST(sum(n_tokens) AS BIGINT) AS band_tokens
  FROM scored GROUP BY quality_score
), band_cum AS (
  SELECT quality_score, band_tokens,
         CAST(sum(band_tokens) OVER (ORDER BY quality_score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - band_tokens
              AS BIGINT) AS band_cum_before
  FROM bands
), banded AS (
  SELECT s.*, b.band_tokens, b.band_cum_before
  FROM scored s JOIN band_cum b USING (quality_score)
), fullb AS (
  SELECT doc_id, CAST(quality_score AS BIGINT) AS quality_score, n_tokens,
         'full_band' AS band_rule
  FROM banded WHERE band_cum_before + band_tokens <= {_M17_BUDGET}
), partialb AS (
  SELECT doc_id, CAST(quality_score AS BIGINT) AS quality_score, n_tokens,
         'partial_band' AS band_rule
  FROM (
    SELECT *, sum(n_tokens) OVER (PARTITION BY quality_score
              ORDER BY md5('sel:' || CAST(doc_id AS VARCHAR)), doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_in_band
    FROM banded
    WHERE band_cum_before < {_M17_BUDGET}
      AND band_cum_before + band_tokens > {_M17_BUDGET}
  ) WHERE band_cum_before + cum_in_band <= {_M17_BUDGET}
)
SELECT * FROM fullb UNION ALL SELECT * FROM partialb
"""


@register(
    "m17_token_budget_select",
    M17_ORACLE,
    doc=f"best-docs-under-a-token-budget selection ({_M17_BUDGET} tokens): "
    "whole quality bands accepted/rejected via a 5-row band prefix sum "
    "(broadcast back, no per-doc ordering); only the straddling band "
    "pays a hash-ordered window",
)
def m17_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.token_budget_select(
        table(spark, sf_dir, "documents"), budget_tokens=_M17_BUDGET
    )


# --- m18: sequence-length bucketing ----------------------------------------

_M18_CASE = "CASE " + " ".join(
    f"WHEN n_tokens <= {b} THEN {b}" for b in prep.LENGTH_BUCKETS
) + f" ELSE {prep.LENGTH_BUCKETS[-1]} END"

M18_ORACLE = f"""
WITH n AS (
  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
), b AS (
  SELECT n_tokens, CAST({_M18_CASE} AS BIGINT) AS bucket_cap_tokens FROM n
)
SELECT bucket_cap_tokens,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(bucket_cap_tokens - n_tokens) AS BIGINT) AS pad_tokens,
       CAST(sum(n_tokens) AS DOUBLE) / CAST(sum(bucket_cap_tokens) AS DOUBLE)
           AS pack_efficiency
FROM b GROUP BY 1
"""


@register(
    "m18_length_buckets",
    M18_ORACLE,
    doc="sequence-length bucketing stats (power-of-two caps): per-bucket "
    "doc/token/padding counts and packing efficiency - the "
    "bucketed-batching costing step of a dataloader prep pipeline; one "
    "map-side-combining groupBy onto ~11 rows",
)
def m18_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.length_buckets(table(spark, sf_dir, "documents"))


# --- m19: document chunking ------------------------------------------------

_M19_W, _M19_O = 32, 8
_M19_S = _M19_W - _M19_O

M19_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
), c AS (
  SELECT doc_id,
         unnest([{{'idx': i - 1,
                   'txt': array_to_string(t[((i-1)*{_M19_S}+1):((i-1)*{_M19_S}+{_M19_W})], ' '),
                   'n': len(t[((i-1)*{_M19_S}+1):((i-1)*{_M19_S}+{_M19_W})])}}
                 FOR i IN generate_series(1,
                   CASE WHEN len(t) <= {_M19_W} THEN 1
                        ELSE 1 + (len(t) - {_M19_W} + {_M19_S - 1}) // {_M19_S}
                   END)]) AS ch
  FROM toks
)
SELECT doc_id,
       CAST(ch.idx AS BIGINT) AS chunk_idx,
       ch.txt AS chunk_text,
       CAST(ch.n AS BIGINT) AS n_tokens
FROM c
"""


@register(
    "m19_chunk_documents",
    M19_ORACLE,
    doc="RAG/pretraining chunker: fixed 32-token windows with 8-token "
    "overlap (stride 24), integer-exact window counts, short final "
    "window, one chunk for short docs; tokenize -> sequence explode, "
    "shuffle-free",
)
def m19_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.chunk_documents(
        table(spark, sf_dir, "documents"), chunk_tokens=_M19_W, overlap_tokens=_M19_O
    )


_M20_N = prep.N_SHARDS

M20_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         md5('shard:' || CAST(doc_id AS VARCHAR)) AS h,
         ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           % {_M20_N} AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (
           PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS shard_pos
FROM h
"""


@register(
    "m20_shard_assign",
    M20_ORACLE,
    doc="deterministic global shuffle + sharding for training writes: "
    "shard = md5 mod N (pure projection, no shuffle), shard_pos = "
    "hash-order rank within shard (one shuffle) - the reproducible "
    "random order data loaders need, stable under corpus growth",
)
def m20_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = prep.shard_assign(table(spark, sf_dir, "documents"), "doc_id")
    return out.select("doc_id", "shard", "shard_pos")


# --- m21: per-source quantile quality filter ------------------------------

M21_ORACLE = """
WITH th AS (
  SELECT source, quantile_cont(n_chars, 0.25) AS q_threshold
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars, th.q_threshold,
       CAST(d.n_chars AS DOUBLE) >= th.q_threshold AS keep
FROM documents d JOIN th ON d.source IS NOT DISTINCT FROM th.source
"""


@register(
    "m21_source_quantile_filter",
    M21_ORACLE,
    doc="per-source adaptive quality cut: each doc keeps iff its "
    "length clears its OWN source's exact P25 (per-domain thresholds "
    "a la CCNet, vs a global cut that over-prunes strict sources); "
    "threshold table is one row per source and broadcasts - the "
    "corpus never reshuffles",
)
def m21_source_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return prep.group_quantile_filter(docs, "n_chars", "source", q=0.25)


# --- m24: scalable dense id assignment ------------------------------------

M24_ORACLE = """
SELECT doc_id, source,
       CAST(row_number() OVER (ORDER BY source, doc_id) - 1 AS BIGINT)
           AS dense_id
FROM documents
ORDER BY dense_id
"""


@register(
    "m24_dense_ids",
    M24_ORACLE,
    doc="contiguous example-id assignment by total order (source, "
    "doc_id) — range-partition + per-partition rank + exclusive "
    "prefix offsets from an O(partitions) count collect; the scalable "
    "replacement for a single-partition row_number() OVER () window",
)
def m24_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    return prep.dense_ids(docs, ["source", "doc_id"])


# --- m25: event transition matrix (Markov chain estimation) ---------------

M25_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total FROM pairs GROUP BY 1
)
SELECT p.from_type, p.to_type, p.n,
       CAST(p.n AS DOUBLE) / CAST(t.row_total AS BIGINT) AS prob
FROM pairs p JOIN tot t USING (from_type)
ORDER BY from_type, to_type
"""


@register(
    "m25_transition_matrix",
    M25_ORACLE,
    doc="first-order Markov transition estimates over per-user event "
    "sequences ((ts,event_id)-ordered): one shuffle for the lead "
    "window, transition counts map-side combined, probabilities as "
    "exact-count IEEE divisions",
)
def m25_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("row_total").cast("double")).alias("prob"),
    )


# --- m26: time-series resampling with forward fill ------------------------

M26_ORACLE = """
WITH bounds AS (
  SELECT user_id,
         date_trunc('day', min(ts)) AS d0,
         date_trunc('day', max(ts)) AS d1
  FROM events GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS bucket
  FROM bounds
), daily AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), joined AS (
  SELECT s.user_id, s.bucket, d.n_events
  FROM spine s LEFT JOIN daily d
    ON s.user_id = d.user_id AND s.bucket = d.bucket
)
SELECT user_id, bucket,
       coalesce(n_events, CAST(0 AS BIGINT)) AS n_events,
       CAST(n_events IS NULL AS BOOLEAN) AS gap_filled,
       last_value(n_events IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
FROM joined
ORDER BY user_id, bucket
"""


@register(
    "m26_resample_ffill",
    M26_ORACLE,
    doc="per-key time-series resampling: generate each user's daily "
    "spine (sequence+explode — no cross join against a global "
    "calendar), left-join observed buckets, forward-fill with "
    "last_value(IGNORE NULLS) — the gap-filling primitive Spark has "
    "no native resample for; one window shuffle on the key",
)
def m26_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    bounds = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("bucket"),
    )
    daily = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    joined = spine.join(daily, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        F.col("n_events").isNull().alias("gap_filled"),
        F.last("n_events", ignorenulls=True).over(w).alias("carried"),
    )


# --- m29: temperature-mixture resampling ------------------------------------

M29_ORACLE = """
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
), sized AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS wgt
  FROM per
), tot AS (
  SELECT source, n_docs, wgt,
         CAST(sum(wgt) OVER () AS BIGINT) AS wsum,
         CAST(sum(n_docs) OVER () AS BIGINT) AS n_total
  FROM sized
), q AS (
  SELECT source, n_docs, wgt, wsum,
         n_total // 4 AS k,
         ((n_total // 4) * wgt) // wsum AS base_q,
         ((n_total // 4) * wgt) % wsum AS rem
  FROM tot
), q2 AS (
  SELECT source, n_docs, base_q, rem,
         k - CAST(sum(base_q) OVER () AS BIGINT) AS leftover,
         row_number() OVER (ORDER BY rem DESC, source ASC) AS rrank
  FROM q
), quota AS (
  SELECT source,
         CAST(least(base_q + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END,
                    n_docs) AS BIGINT) AS quota
  FROM q2
), ranked AS (
  SELECT d.source, d.doc_id, q.quota,
         CAST(row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5('mix:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS BIGINT) AS mix_rank
  FROM documents d JOIN quota q ON d.source = q.source
)
SELECT source, doc_id, mix_rank, quota FROM ranked WHERE mix_rank <= quota
"""


@register(
    "m29_temperature_resample",
    M29_ORACLE,
    doc="APPLIES the alpha=0.5 temperature mixture m16 only prices: "
    "integer-exact largest-remainder quotas (isqrt weights, BIGINT "
    "div/mod, source-name tie-break) filled per source by md5 rank — "
    "no float sum anywhere, so the oracle is bit-for-bit; quota math "
    "runs on the D-row per-source frame, quotas broadcast back",
)
def m29_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.temperature_resample(
        table(spark, sf_dir, "documents"), sample_div=4
    )


# --- m30: time-series resampling with linear interpolation ------------------

M30_ORACLE = """
WITH bounds AS (
  SELECT user_id,
         date_trunc('day', min(ts)) AS d0,
         date_trunc('day', max(ts)) AS d1
  FROM events GROUP BY 1
), spine AS (
  SELECT user_id, d0, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS bucket
  FROM bounds
), daily AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), joined AS (
  SELECT s.user_id, s.bucket,
         CAST(date_diff('day', s.d0, s.bucket) AS BIGINT) AS day_idx,
         d.n_events
  FROM spine s LEFT JOIN daily d
    ON s.user_id = d.user_id AND s.bucket = d.bucket
), ctx AS (
  SELECT user_id, bucket, day_idx, n_events,
         last_value(n_events IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_val,
         last_value(CASE WHEN n_events IS NOT NULL THEN day_idx END
                    IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_idx,
         first_value(n_events IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_val,
         first_value(CASE WHEN n_events IS NOT NULL THEN day_idx END
                     IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_idx
  FROM joined
)
SELECT user_id, bucket,
       coalesce(n_events, CAST(0 AS BIGINT)) AS n_events,
       CAST(n_events IS NULL AS BOOLEAN) AS gap_filled,
       CASE
         WHEN n_events IS NOT NULL THEN CAST(n_events AS DOUBLE)
         WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
           CAST(prev_val AS DOUBLE)
           + (CAST(next_val - prev_val AS DOUBLE)
              * CAST(day_idx - prev_idx AS DOUBLE))
             / CAST(next_idx - prev_idx AS DOUBLE)
       END AS interpolated
FROM ctx
ORDER BY user_id, bucket
"""


@register(
    "m30_resample_interpolate",
    M30_ORACLE,
    doc="per-key resampling with LINEAR interpolation (completing "
    "m26's ffill): gaps take prev + (next-prev) * frac along the "
    "daily spine, leading/trailing gaps stay NULL. Two window passes "
    "(backward + forward IGNORE NULLS fill of value and day index) "
    "over ONE user_id shuffle; the arithmetic is int-exact until a "
    "single pinned a + (b*c)/d double expression, identical on both "
    "engines",
)
def m30_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    bounds = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        "user_id",
        "d0",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("bucket"),
    )
    daily = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    joined = spine.join(daily, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.datediff(F.col("bucket"), F.col("d0")).cast("long").alias("day_idx"),
        "n_events",
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_idx = F.when(F.col("n_events").isNotNull(), F.col("day_idx"))
    ctx = (
        joined.withColumn("prev_val", F.last("n_events", ignorenulls=True).over(wb))
        .withColumn("prev_idx", F.last(obs_idx, ignorenulls=True).over(wb))
        .withColumn("next_val", F.first("n_events", ignorenulls=True).over(wf))
        .withColumn("next_idx", F.first(obs_idx, ignorenulls=True).over(wf))
    )
    interp = F.col("prev_val").cast("double") + (
        (F.col("next_val") - F.col("prev_val")).cast("double")
        * (F.col("day_idx") - F.col("prev_idx")).cast("double")
    ) / (F.col("next_idx") - F.col("prev_idx")).cast("double")
    return ctx.select(
        "user_id",
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        F.col("n_events").isNull().alias("gap_filled"),
        F.when(F.col("n_events").isNotNull(), F.col("n_events").cast("double"))
        .otherwise(
            F.when(
                F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
                interp,
            )
        )
        .alias("interpolated"),
    )


# --- D8: canonical-document selection per near-dup cluster -----------------

# The industrial dedup endgame: m8 finds WHO is duplicated, this
# decides WHAT to keep — the highest-quality member of each cluster
# (t2's integer 0-4 score), not the arbitrary min-id. The oracle
# re-derives the identical MinHash-LSH pair set, resolves components
# with the recursive CTE, scores quality with t2's SQL, and ranks —
# every stage bit-for-bit shared with an already-green query.
D8_ORACLE = f"""
WITH RECURSIVE pairs AS ({{pairs_sql}}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
), clusters AS (
  SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster_rep
  FROM reach GROUP BY id
), tbase AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         list_filter(string_split(text, ' '), x -> x <> '') AS t,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars_no_space,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT)
             AS n_punct
  FROM documents
), q AS (
  SELECT doc_id,
         CAST((CAST(len(t) AS BIGINT) BETWEEN 20 AND 2000)::INT
            + (CAST(len(list_filter(t, x -> x IN {{stoplist}})) AS DOUBLE)
                   / len(t) <= 0.6)::INT
            + (CAST(n_punct AS DOUBLE) / n_chars <= 0.2)::INT
            + (CAST(chars_no_space AS DOUBLE) / len(t)
                   BETWEEN 2.0 AND 15.0)::INT AS BIGINT) AS quality_score
  FROM tbase
), ranked AS (
  SELECT c.doc_id, c.cluster_rep, q.quality_score,
         row_number() OVER (PARTITION BY c.cluster_rep
             ORDER BY q.quality_score DESC, c.doc_id) AS rn
  FROM clusters c JOIN q USING (doc_id)
)
SELECT doc_id, cluster_rep, quality_score,
       CAST(rn = 1 AS INT) AS is_canonical
FROM ranked
"""


def _d8_oracle() -> str:
    return D8_ORACLE.format(
        pairs_sql=text_pipeline._minhash_oracle(),
        stoplist=text_pipeline._STOPLIST,
    )


@register(
    "d8_canonical_selection",
    _d8_oracle(),
    doc="canonical-doc selection per near-dup cluster (the dedup "
    "endgame m8 stops short of): MinHash-LSH pairs -> connected "
    "components -> keep the HIGHEST-QUALITY member (t2's integer 0-4 "
    "score, doc_id tie-break), not the arbitrary min-id. One doc_id "
    "join + one per-cluster window over bounded cluster sizes; "
    "cluster_rep labels come from the O(log n) large/small-star "
    "rounds, raw text never shuffles past the scoring projection",
)
def d8_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        text as _text,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = minhash.minhash_lsh_dedup(docs, threshold=0.4).select("doc_a", "doc_b")
    clusters = dedup_verdicts(docs, pairs).select("doc_id", "cluster_rep")
    quality = _text.quality_score(_text.text_stats(docs)).select(
        "doc_id", "quality_score"
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        clusters.join(quality, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_rep",
            "quality_score",
            (F.col("rn") == 1).cast("int").alias("is_canonical"),
        )
    )


# --- pipe_llm_audit: drop-attribution over the curation cascade ------------

_AUDIT_ORACLE = (
    _CURATION_CTES
    + """
SELECT d.doc_id,
       CASE WHEN e2.doc_id IS NULL THEN 'exact_dup'
            WHEN v.doc_id IS NULL THEN 'near_dup'
            WHEN p.doc_id IS NULL THEN 'quality'
            WHEN rk.doc_id IS NULL THEN 'repetition'
            ELSE 'kept' END AS drop_stage
FROM documents d
LEFT JOIN exact e2 ON d.doc_id = e2.doc_id
LEFT JOIN verdict v ON d.doc_id = v.doc_id
LEFT JOIN passed p ON d.doc_id = p.doc_id
LEFT JOIN rkeep rk ON d.doc_id = rk.doc_id
"""
)


@register(
    "pipe_llm_audit",
    _AUDIT_ORACLE,
    doc="drop-attribution audit of the curation cascade: every input "
    "doc labeled with the FIRST stage that dropped it (exact_dup / "
    "near_dup / quality / repetition) or 'kept' — the review report "
    "behind pipe_llm_curation's survivor set. Stage id sets are "
    "computed once on the already-shrunk survivor chain (identical "
    "plans to curate_corpus); attribution itself is doc_id-sized "
    "left joins, so the audit costs the same one corpus pass",
)
def pipe_llm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.pipelines.curation import (
        curation_audit,
    )

    return curation_audit(table(spark, sf_dir, "documents"))


# --- m33: deterministic multi-epoch shuffle ---------------------------------

_M33_EPOCHS = 3

M33_ORACLE = f"""
WITH e AS (
  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
         md5('epoch' || CAST(epoch AS VARCHAR) || ':'
             || CAST(doc_id AS VARCHAR)) AS h,
         ('0x' || substr(md5('epoch' || CAST(epoch AS VARCHAR) || ':'
             || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           % {prep.N_SHARDS} AS shard
  FROM documents, generate_series(0, {_M33_EPOCHS - 1}) AS t(epoch)
)
SELECT epoch, doc_id, shard,
       CAST(row_number() OVER (
           PARTITION BY epoch, shard ORDER BY h, doc_id) AS BIGINT) AS shard_pos
FROM e
"""


@register(
    "m33_epoch_shuffle",
    M33_ORACLE,
    doc=f"deterministic multi-epoch reshuffle ({_M33_EPOCHS} epochs): "
    "each epoch re-derives shard AND within-shard order from an "
    "epoch-salted md5 (m20's machinery with salt='epoch<e>'), so "
    "every epoch is a DIFFERENT reproducible permutation of the same "
    "corpus — the training-loop requirement (fresh order per epoch, "
    "bit-replayable for debugging) without materializing permuted "
    "copies. Per-epoch cost is identical to m20: one projection + "
    "one shard shuffle; epochs are independent and can be planned "
    "lazily per epoch rather than unioned",
)
def m33_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per_epoch = [
        prep.shard_assign(docs, "doc_id", salt=f"epoch{e}")
        .select(
            F.lit(e).cast("long").alias("epoch"), "doc_id", "shard", "shard_pos"
        )
        for e in range(_M33_EPOCHS)
    ]
    out = per_epoch[0]
    for df in per_epoch[1:]:
        out = out.unionByName(df)
    return out


# --- m34: preference-pair construction (DPO/RLHF prep) ---------------------

_M34_GROUPS = 200

M34_ORACLE = f"""
WITH c AS (
  SELECT doc_id % {_M34_GROUPS} AS prompt_id, doc_id, n_chars,
         row_number() OVER (
             PARTITION BY doc_id % {_M34_GROUPS}
             ORDER BY n_chars DESC, doc_id DESC) AS rh,
         row_number() OVER (
             PARTITION BY doc_id % {_M34_GROUPS}
             ORDER BY n_chars ASC, doc_id ASC) AS rl
  FROM documents
)
SELECT ch.prompt_id,
       ch.doc_id AS chosen_id,
       rj.doc_id AS rejected_id,
       CAST(ch.n_chars - rj.n_chars AS BIGINT) AS margin
FROM (SELECT * FROM c WHERE rh = 1) ch
JOIN (SELECT * FROM c WHERE rl = 1) rj USING (prompt_id)
WHERE ch.doc_id <> rj.doc_id
"""


@register(
    "m34_preference_pairs",
    M34_ORACLE,
    doc="DPO/RLHF preference-pair prep: within each prompt group "
    f"(doc_id % {_M34_GROUPS}), pair the best-scored candidate "
    "(chosen) with the worst (rejected) under a TOTAL (score, id) "
    "ordering, emit the integer score margin; single-candidate groups "
    "yield no pair. One group-key shuffle serves both rank windows",
)
def m34_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _M34_GROUPS).alias("prompt_id"),
        "doc_id",
        "n_chars",
    )
    return prep.preference_pairs(docs, "prompt_id", "doc_id", "n_chars")


# --- m36: conversation linearization (SFT-example assembly) -----------------

_M36_CAP = 32

M36_ORACLE = f"""
WITH turns AS (
  SELECT user_id, ts, event_id,
         event_type || '#'
           || CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR)
             AS turn,
         row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), capped AS (
  SELECT * FROM turns WHERE rn <= {_M36_CAP}
), agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         string_agg(turn, chr(10) ORDER BY ts, event_id) AS convo
  FROM capped GROUP BY user_id
)
SELECT user_id, n_turns,
       CAST(length(convo) AS BIGINT) AS convo_chars,
       md5(convo) AS convo_digest
FROM agg
"""


@register(
    "m36_conversation_linearize",
    M36_ORACLE,
    doc="SFT-example assembly: per user, the first "
    f"{_M36_CAP} event turns (event_type#value-cents) linearized into "
    "one newline-joined string in strict (ts, event_id) order — "
    "per-key collect state CAPPED by a rank window sharing the same "
    "shuffle, turn order enforced by in-aggregation array_sort "
    "(partitioning-invariant); text compared via md5 digest",
)
def m36_conversation_linearize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.concat(
            F.col("event_type"),
            F.lit("#"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").cast("string"),
        ).alias("turn"),
    )
    return prep.linearize_conversations(ev, max_turns=_M36_CAP)


# --- m38: dataset card (corpus summary bundle) ------------------------------

# One long-format (metric, dimension, value) table — the "dataset
# card" a curation pipeline publishes next to every corpus release.
# Every value is an exact BIGINT (token totals ride as counts, the
# exact-dup rate as a dup-row count, not a ratio), so the whole card
# hashes.
M38_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, source, md5(text) AS fp,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
), dups AS (
  SELECT CAST(sum(c - 1) AS BIGINT) AS extra
  FROM (SELECT count(*) AS c FROM toks GROUP BY fp)
)
SELECT 'corpus' AS metric, 'docs' AS dimension,
       CAST(count(*) AS BIGINT) AS value FROM toks
UNION ALL
SELECT 'corpus', 'words', CAST(sum(n_words) AS BIGINT) FROM toks
UNION ALL
SELECT 'corpus', 'chars', CAST(sum(n_chars) AS BIGINT) FROM toks
UNION ALL
SELECT 'corpus', 'exact_dup_rows', extra FROM dups
UNION ALL
SELECT 'lang_docs', lang, CAST(count(*) AS BIGINT) FROM toks GROUP BY lang
UNION ALL
SELECT 'lang_words', lang, CAST(sum(n_words) AS BIGINT) FROM toks GROUP BY lang
UNION ALL
SELECT 'source_docs', source, CAST(count(*) AS BIGINT) FROM toks GROUP BY source
"""


@register(
    "m38_dataset_card",
    M38_ORACLE,
    doc="dataset-card generator: the corpus release summary as one "
    "long-format (metric, dimension, value) table — doc/word/char "
    "totals, exact-dup row count (md5 groupBy), per-lang and "
    "per-source breakdowns; ALL values exact BIGINTs so the whole "
    "card hashes; one tokenizing scan feeds every branch via an "
    "eager narrow projection",
)
def m38_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.text import (
        token_count,
    )

    docs = table(spark, sf_dir, "documents")
    # narrow per-doc stats materialized once — the union branches below
    # would each re-run the tokenize scan on the lazy plan
    base = docs.select(
        "lang",
        "source",
        F.md5("text").alias("fp"),
        token_count("text").cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
    ).localCheckpoint(eager=True)

    def _row(metric, dim_col, value_col, grouped):
        if grouped is None:
            return (
                base.agg(value_col.alias("value"))
                .select(
                    F.lit(metric).alias("metric"),
                    F.lit(dim_col).alias("dimension"),
                    "value",
                )
            )
        return (
            base.groupBy(grouped)
            .agg(value_col.alias("value"))
            .select(
                F.lit(metric).alias("metric"),
                F.col(grouped).alias("dimension"),
                "value",
            )
        )

    dups = (
        base.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg((F.sum(F.col("c") - 1)).cast("long").alias("value"))
        .select(
            F.lit("corpus").alias("metric"),
            F.lit("exact_dup_rows").alias("dimension"),
            "value",
        )
    )
    out = (
        _row("corpus", "docs", F.count(F.lit(1)).cast("long"), None)
        .unionByName(_row("corpus", "words", F.sum("n_words").cast("long"), None))
        .unionByName(_row("corpus", "chars", F.sum("n_chars").cast("long"), None))
        .unionByName(dups)
        .unionByName(_row("lang_docs", None, F.count(F.lit(1)).cast("long"), "lang"))
        .unionByName(_row("lang_words", None, F.sum("n_words").cast("long"), "lang"))
        .unionByName(
            _row("source_docs", None, F.count(F.lit(1)).cast("long"), "source")
        )
    )
    return out


# --- m39: semantic sequence packing (related-doc long-context layout) -------

from group_2_shopware_enterprise_data_engineering_project_spark.queries.embeddings_sim import (  # noqa: E402
    _DOT as _M39_DOT,
    _NORM as _M39_NORM,
    N_CENTROIDS as _M39_C,
)

_M39_CAP = 1024

M39_ORACLE = f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS cv
  FROM embeddings WHERE vec_id < {_M39_C}
), scored AS (
  SELECT e.vec_id, c.centroid_id,
         {_M39_DOT.format(a='e.embedding', b='c.cv')}
         / ({_M39_NORM.format(v='e.embedding')} * {_M39_NORM.format(v='c.cv')})
             AS c_sim
  FROM embeddings e CROSS JOIN c
), assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY c_sim DESC, centroid_id) AS rn
    FROM scored
  ) WHERE rn = 1
), tk AS (
  SELECT d.doc_id, a.centroid_id AS shard,
         CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         md5(d.text) AS _tie
  FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
), cum AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, _tie
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS cum_before
  FROM tk
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
       CAST(cum_before // {_M39_CAP} AS BIGINT) AS pack_id,
       CAST(cum_before % {_M39_CAP} AS BIGINT) AS pack_offset,
       CAST((cum_before % {_M39_CAP}) + n_tokens > {_M39_CAP} AS INTEGER)
           AS spans_boundary
FROM cum
"""


@register(
    "m39_semantic_pack",
    M39_ORACLE,
    doc="semantic sequence packing (related-document long-context "
    "layout): docs are clustered by their embedding's nearest of "
    f"{_M39_C} broadcast centroids (cosine argmin, e5's quantizer), "
    "then the m15 pack recurrence runs PER CLUSTER — every pack holds "
    "topically-related docs, the long-context training layout; "
    "per-shard running sum, no global window, oracle CASTs all "
    "HUGEINT-widened columns",
)
def m39_semantic_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        similarity,
    )

    emb = table(spark, sf_dir, "embeddings")
    assigned = similarity.ivf_assign(emb).select(
        F.col("vec_id").alias("doc_id"), "centroid_id"
    )
    docs = table(spark, sf_dir, "documents").join(assigned, "doc_id")
    return prep.sequence_pack(docs, cap=_M39_CAP, shard_col="centroid_id")


# --- j7: as-of join with tolerance (attribution window) ---------------------

_J7_TOL = 1800  # 30-minute attribution window

J7_ORACLE = f"""
WITH v AS (
  SELECT user_id AS v_user, ts AS view_ts, event_id AS view_id
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT p.event_id, p.user_id, p.ts, v.view_ts, v.view_id
  FROM p ASOF JOIN v
    ON p.user_id = v.v_user AND p.ts >= v.view_ts
)
SELECT event_id, user_id, ts, view_id, view_ts AS matched_ts
FROM m
WHERE epoch_us(ts) - epoch_us(view_ts) <= {_J7_TOL * 1_000_000}
"""


@register(
    "j7_asof_tolerance",
    J7_ORACLE,
    doc="as-of join with a freshness bound (pandas merge_asof "
    "tolerance semantics): each purchase attributed to the user's "
    "most recent prior view, pair DROPPED — not replaced — when "
    f"staler than {_J7_TOL}s; exact epoch-microsecond filter, no "
    "extra shuffle over the plain as-of plan. DuckDB ASOF JOIN + "
    "tolerance WHERE as the oracle",
)
def j7_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.asof import (
        asof_join_tolerance,
    )

    return asof_join_tolerance(
        purchases,
        views,
        left_key="user_id",
        right_key="v_user",
        left_ts="ts",
        right_ts="view_ts",
        payload_cols=("view_id",),
        tolerance_sec=_J7_TOL,
        right_tiebreak="view_id",
    )


# --- m41: packing-efficiency report ------------------------------------------

M41_ORACLE = f"""
WITH t AS (
  SELECT doc_id % {_M15_SHARDS} AS shard,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
), per AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM t GROUP BY 1
)
SELECT shard, n_docs, total_tokens,
       CAST((total_tokens + {_M15_CAP - 1}) // {_M15_CAP} AS BIGINT) AS n_packs,
       CAST(((total_tokens + {_M15_CAP - 1}) // {_M15_CAP}) * {_M15_CAP}
            - total_tokens AS BIGINT) AS waste_tokens
FROM per
"""


@register(
    "m41_packing_efficiency",
    M41_ORACLE,
    doc="packing-efficiency report over the m15 layout: per shard, doc "
    "and token totals, pack count (ceil(total/cap) — the concat-and-"
    "chunk stream is gapless, so the closed form is exact), and "
    "tail-waste tokens; the metric a training-data writer publishes "
    "next to every packed shard set. One map-side-combined groupBy",
)
def m41_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.text import (
        token_count,
    )

    docs = table(spark, sf_dir, "documents")
    per = (
        docs.select(
            (F.col("doc_id") % _M15_SHARDS).alias("shard"),
            token_count("text").cast("long").alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    n_packs = F.expr(f"(total_tokens + {_M15_CAP - 1}) div {_M15_CAP}")
    return per.select(
        "shard",
        "n_docs",
        "total_tokens",
        n_packs.alias("n_packs"),
        (n_packs * _M15_CAP - F.col("total_tokens"))
        .cast("long")
        .alias("waste_tokens"),
    )


# --- m42: dedup cluster-size distribution ------------------------------------

_M42_ORACLE_TMPL = """
WITH RECURSIVE pairs AS ({pairs_sql}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
), clusters AS (
  SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster_rep
  FROM reach GROUP BY id
), sizes AS (
  SELECT cluster_rep, CAST(count(*) AS BIGINT) AS cluster_size
  FROM clusters GROUP BY 1
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * (cluster_size - 1) AS BIGINT) AS removable_docs
FROM sizes GROUP BY 1
"""


def _m42_oracle() -> str:
    return _M42_ORACLE_TMPL.format(pairs_sql=text_pipeline._minhash_oracle())


@register(
    "m42_dedup_cluster_stats",
    _m42_oracle(),
    doc="near-dup cluster-size distribution (the dedup IMPACT report: "
    "how much of the corpus is removable, and whether one mega-cluster "
    "dominates — the signal that a boilerplate flood, not organic "
    "duplication, is at work): MinHash-LSH pairs -> components -> "
    "size histogram + removable-doc counts; two map-side-combined "
    "groupBys past the component labels",
)
def m42_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash.minhash_lsh_dedup(docs, threshold=0.4).select(
        "doc_a", "doc_b"
    )
    clusters = dedup_verdicts(docs, pairs).select("doc_id", "cluster_rep")
    sizes = clusters.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.count(F.lit(1)) * (F.col("cluster_size") - 1))
        .cast("long")
        .alias("removable_docs"),
    )


# --- m43: train/test near-dup leakage report ---------------------------------

_M43_ORACLE_TMPL = f"""
WITH pairs AS ({{pairs_sql}}
), sp AS (
  SELECT doc_id,
         CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{_T1}' THEN 'train'
              WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{_T2}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), tagged AS (
  SELECT p.doc_a, p.doc_b, p.jaccard,
         least(a.split, b.split) AS split_lo,
         greatest(a.split, b.split) AS split_hi
  FROM pairs p
  JOIN sp a ON a.doc_id = p.doc_a
  JOIN sp b ON b.doc_id = p.doc_b
)
SELECT split_lo, split_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaking
FROM tagged
GROUP BY 1, 2
"""


def _m43_oracle() -> str:
    return _M43_ORACLE_TMPL.format(pairs_sql=text_pipeline._minhash_oracle())


@register(
    "m43_split_leakage",
    _m43_oracle(),
    doc="train/test near-dup LEAKAGE report — the eval-integrity check "
    "every split must pass (a test doc with a train near-dup inflates "
    "eval scores exactly like m14's direct contamination): MinHash-LSH "
    "pairs tagged with both members' hash-stable splits, rolled up per "
    "split pair with cross-split counts; two broadcast-side split "
    "joins past the pair set",
)
def m43_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash.minhash_lsh_dedup(docs, threshold=0.4).select(
        "doc_a", "doc_b", "jaccard"
    )
    sp = prep.split_assign(docs, "doc_id").select("doc_id", "split")
    tagged = (
        pairs.join(
            sp.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("_sa")
            ),
            "doc_a",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("_sb")
            ),
            "doc_b",
        )
        .select(
            F.least("_sa", "_sb").alias("split_lo"),
            F.greatest("_sa", "_sb").alias("split_hi"),
        )
    )
    return tagged.groupBy("split_lo", "split_hi").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(F.col("split_lo") != F.col("split_hi"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("n_leaking"),
    )


# --- m46: fixed-k deterministic per-group sample ------------------------------

_M46_K = 20

M46_ORACLE = f"""
WITH r AS (
  SELECT lang, doc_id,
         md5('evalset:' || CAST(doc_id AS VARCHAR)) AS h,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY md5('evalset:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS pick
  FROM documents
)
SELECT lang, doc_id, CAST(pick AS BIGINT) AS pick
FROM r WHERE pick <= {_M46_K}
"""


@register(
    "m46_fixed_k_sample",
    M46_ORACLE,
    doc=f"fixed-size eval-set builder: exactly min(k={_M46_K}, n) docs "
    "per language, chosen by salted-md5 rank — the deterministic "
    "reservoir replacement (same k members across runs, engines, and "
    "corpus partitionings; adding docs displaces at most the hash "
    "boundary). One group-key shuffle; unlike m5's FRACTION quota "
    "this pins the absolute subset size evals need",
)
def m46_fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("evalset:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        docs.select("lang", "doc_id")
        .withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= _M46_K)
    )


# --- m47: pack attention-span metadata (block-diagonal mask spans) -----------

M47_ORACLE = f"""
WITH t AS (
  SELECT doc_id, doc_id % {_M15_SHARDS} AS shard,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             AS n_tokens,
         md5(text) AS _tie
  FROM documents
), c AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, _tie
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS cum_before
  FROM t
), spans AS (
  SELECT shard,
         CAST(cum_before // {_M15_CAP} AS BIGINT) AS pack_id,
         CAST(cum_before % {_M15_CAP} AS BIGINT) AS off,
         n_tokens
  FROM c
)
SELECT CAST(shard AS BIGINT) AS shard, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(CAST(off AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR),
                  ',' ORDER BY off) AS mask_spans
FROM spans
GROUP BY 1, 2
"""


@register(
    "m47_pack_attention_spans",
    M47_ORACLE,
    doc="block-diagonal attention-mask metadata for the m15 packing "
    "layout: per (shard, pack) the ordered 'offset:len' span list — "
    "what a packed-training writer emits so attention never crosses "
    "document boundaries; span strings assembled with in-aggregation "
    "ordering (m36's array_sort pattern), counts exact",
)
def m47_pack_attention_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = prep.sequence_pack(
        table(spark, sf_dir, "documents"), cap=_M15_CAP, shards=_M15_SHARDS
    )
    span = F.concat(
        F.col("pack_offset").cast("string"),
        F.lit(":"),
        F.col("n_tokens").cast("string"),
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("pack_offset").alias("o"), span.alias("s")))
        ),
        lambda x: x["s"],
    )
    return packed.groupBy(
        F.col("shard").cast("long").alias("shard"), "pack_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.array_join(ordered, ",").alias("mask_spans"),
    )


# --- m48: leakage-free (cluster-aware) split assignment -----------------------

_M48_ORACLE_TMPL = f"""
WITH RECURSIVE pairs AS ({{pairs_sql}}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
), clusters AS (
  SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster_rep
  FROM reach GROUP BY id
)
SELECT doc_id, cluster_rep,
       CASE WHEN substring(md5('split:' || CAST(cluster_rep AS VARCHAR)), 1, 4)
                 < '{_T1}' THEN 'train'
            WHEN substring(md5('split:' || CAST(cluster_rep AS VARCHAR)), 1, 4)
                 < '{_T2}' THEN 'val'
            ELSE 'test' END AS split
FROM clusters
"""


def _m48_oracle() -> str:
    return _M48_ORACLE_TMPL.format(pairs_sql=text_pipeline._minhash_oracle())


@register(
    "m48_leakage_free_split",
    _m48_oracle(),
    doc="leakage-free split assignment — the FIX for what m43 detects: "
    "the hash-stable split keys on the near-dup CLUSTER representative "
    "instead of the doc id, so every near-dup cluster lands whole in "
    "one split and cross-split leakage is structurally zero (two "
    "cluster members in different splits would need different reps — "
    "impossible). Same zero-shuffle split projection, applied after "
    "the component labels",
)
def m48_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash.minhash_lsh_dedup(docs, threshold=0.4).select(
        "doc_a", "doc_b"
    )
    clusters = dedup_verdicts(docs, pairs).select("doc_id", "cluster_rep")
    return prep.split_assign(clusters, "cluster_rep").select(
        "doc_id", "cluster_rep", "split"
    )


# --- m49: SFT loss-mask spans -------------------------------------------------

M49_ORACLE = f"""
WITH turns AS (
  SELECT user_id, ts, event_id,
         event_type || '#'
           || CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS VARCHAR)
             AS turn,
         row_number() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), capped AS (
  SELECT * FROM turns WHERE rn <= {_M36_CAP}
), offs AS (
  SELECT user_id, rn, CAST(length(turn) AS BIGINT) AS len,
         CAST(SUM(length(turn)) OVER (
                  PARTITION BY user_id ORDER BY rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - length(turn) + (rn - 1) AS BIGINT) AS off
  FROM capped
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN rn % 2 = 0 THEN len ELSE 0 END) AS BIGINT)
           AS n_loss_chars,
       coalesce(
           string_agg(CAST(off AS VARCHAR) || ':' || CAST(len AS VARCHAR),
                      ',' ORDER BY off) FILTER (WHERE rn % 2 = 0),
           '') AS loss_spans
FROM offs GROUP BY user_id
"""


@register(
    "m49_loss_mask_spans",
    M49_ORACLE,
    doc="SFT loss-mask metadata over the m36 conversation "
    "linearization: per user, the char-offset 'offset:len' spans of "
    "COMPLETION turns (even rank — the user/assistant alternation "
    "after dialogue flattening) in the newline-joined convo string, "
    "plus the exact loss-char total — what a supervised-finetune "
    "writer emits so the loss never trains on prompt tokens. ONE "
    "user-key shuffle serves rank cap, running offset, and span "
    "assembly (m47's ordered span-string pattern)",
)
def m49_loss_mask_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.concat(
            F.col("event_type"),
            F.lit("#"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").cast("string"),
        ).alias("turn"),
    )
    return prep.loss_mask_spans(ev, max_turns=_M36_CAP).select(
        "user_id", "n_turns", "n_loss_chars", "loss_spans"
    )


# --- m51: dedup-aware token accounting ----------------------------------------

M51_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, md5(text) AS fp,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{_T1}' THEN 'train'
              WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{_T2}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), canon AS (
  SELECT fp, min(doc_id) AS keep_id FROM t GROUP BY fp
), j AS (
  SELECT t.*, CASE WHEN t.doc_id = c.keep_id THEN 1 ELSE 0 END AS is_canon
  FROM t JOIN canon c USING (fp)
)
SELECT split, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_canon) AS BIGINT) AS n_canonical,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       CAST(sum(CASE WHEN is_canon = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
           AS tokens_canonical
FROM j GROUP BY 1, 2
"""


@register(
    "m51_token_accounting",
    M51_ORACLE,
    doc="dedup-aware token accounting ('how many training tokens do we "
    "ACTUALLY have'): per (split, source), doc and token totals next "
    "to their post-exact-dedup canonical counts — the budget sheet "
    "behind epoch and mixture planning, where raw token counts "
    "overstate unique data by the dup rate. Canonical = min doc_id per "
    "md5(text) (mm1's rule); split = the m1 hash projection. One "
    "fp-key shuffle + one map-side-combined rollup; token counting "
    "never leaves codegen",
)
def m51_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import text as _text

    docs = table(spark, sf_dir, "documents")
    t = prep.split_assign(docs, "doc_id").select(
        "doc_id",
        "source",
        "split",
        F.md5("text").alias("fp"),
        F.size(_text.tokens("text")).cast("long").alias("n_tokens"),
    )
    canon = t.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    j = t.join(canon, "fp").withColumn(
        "is_canon", (F.col("doc_id") == F.col("keep_id")).cast("long")
    )
    return j.groupBy("split", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_canon").cast("long").alias("n_canonical"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        F.sum(F.when(F.col("is_canon") == 1, F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tokens_canonical"),
    )


# --- m52: hashed-feature importance selection (DSIR-lite) ----------------------

_M52_D = 1024

M52_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source = 'src0' AS is_t, unnest({{toks}}) AS tok
  FROM documents
), ff AS (
  SELECT doc_id, is_t,
         CAST(CAST(concat('0x', substring(md5(tok), 1, 4)) AS BIGINT)
              % {_M52_D} AS BIGINT) AS feature_idx,
         CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY 1, 2, 3
), pf AS (
  SELECT feature_idx,
         CAST(coalesce(sum(CASE WHEN is_t THEN n END), 0) AS BIGINT) AS tc,
         CAST(coalesce(sum(CASE WHEN NOT is_t THEN n END), 0) AS BIGINT) AS rc
  FROM ff GROUP BY 1
), tot AS (
  SELECT CAST(sum(tc) AS BIGINT) AS tt, CAST(sum(rc) AS BIGINT) AS tr FROM pf
), lean AS (
  SELECT feature_idx FROM pf CROSS JOIN tot WHERE tc * tr > rc * tt
)
SELECT ff.doc_id,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(coalesce(sum(CASE WHEN l.feature_idx IS NOT NULL THEN n END), 0)
            AS BIGINT) AS n_leaning,
       CAST(CASE WHEN 2 * coalesce(sum(CASE WHEN l.feature_idx IS NOT NULL
                                            THEN n END), 0) >= sum(n)
                 THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM ff LEFT JOIN lean l USING (feature_idx)
WHERE NOT is_t
GROUP BY ff.doc_id
""".format(toks="list_filter(string_split(text, ' '), x -> x <> '')")


@register(
    "m52_importance_selection",
    M52_ORACLE,
    doc="hashed-feature importance selection (DSIR shape, Xie et al. "
    "2023, with integer evidence instead of log-ratios): features are "
    f"m44's hashing-trick indexes (md5_16 mod {_M52_D}); a feature is "
    "target-leaning when over-represented in the target domain "
    "(source=src0) by exact cross-multiplication (tc*tr > rc*tt); a "
    "raw-pool doc is kept when >= half its token occurrences hash to "
    "target-leaning features. The per-feature table is bounded by D "
    "-> the leaning set BROADCASTS; corpus pays one explode + two "
    "map-side-combined groupBys; no vocabulary pass, no floats",
)
def m52_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import text as _text

    docs = table(spark, sf_dir, "documents")
    feats = _text.feature_hashing(docs, _M52_D)
    flags = docs.select("doc_id", (F.col("source") == "src0").alias("is_t"))
    ff = feats.join(flags, "doc_id")
    pf = ff.groupBy("feature_idx").agg(
        F.coalesce(F.sum(F.when(F.col("is_t"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("tc"),
        F.coalesce(F.sum(F.when(~F.col("is_t"), F.col("n"))), F.lit(0))
        .cast("long")
        .alias("rc"),
    )
    tot = pf.agg(
        F.sum("tc").cast("long").alias("tt"),
        F.sum("rc").cast("long").alias("tr"),
    )
    lean = (
        pf.join(F.broadcast(tot))
        .filter(F.col("tc") * F.col("tr") > F.col("rc") * F.col("tt"))
        .select("feature_idx", F.lit(1).alias("_lean"))
    )
    scored = (
        ff.filter(~F.col("is_t"))
        .join(F.broadcast(lean), "feature_idx", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("_lean") == 1, F.col("n"))), F.lit(0)
            )
            .cast("long")
            .alias("n_leaning"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "n_leaning",
        (2 * F.col("n_leaning") >= F.col("n_tokens"))
        .cast("long")
        .alias("keep_flag"),
    )


# --- m53: span-corruption targets (T5/UL2 denoising prep) ----------------------

_M53_CHUNK = 20
_M53_SPAN = 3
_M53_SLOTS = _M53_CHUNK - _M53_SPAN + 1  # 18 start slots per chunk

M53_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n
  FROM documents
), spans AS (
  SELECT doc_id, n, gs.c AS span_idx
  FROM t,
       LATERAL (SELECT unnest(generate_series(0,
           CAST(n // {_M53_CHUNK} - 1 AS BIGINT))) AS c) gs
  WHERE n >= {_M53_CHUNK}
)
SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
       CAST(span_idx * {_M53_CHUNK}
            + CAST(CAST(concat('0x', substring(md5(
                  'span:' || CAST(doc_id AS VARCHAR) || ':'
                          || CAST(span_idx AS VARCHAR)), 1, 4)) AS BIGINT)
                   % {_M53_SLOTS} AS BIGINT) AS BIGINT) AS start_tok,
       CAST({_M53_SPAN} AS BIGINT) AS span_len
FROM spans
"""


@register(
    "m53_span_corruption",
    M53_ORACLE,
    doc="span-corruption target layout (T5/UL2 denoising prep): one "
    f"{_M53_SPAN}-token corruption span per {_M53_CHUNK}-token chunk "
    f"(15% noise density), start slot hash-placed (md5_16 mod "
    f"{_M53_SLOTS}) so masks are deterministic across runs, engines, "
    "and partitionings — no RNG state to checkpoint. Pure projection "
    "+ explode, ZERO shuffles: corrupting 100 TB costs one codegen "
    "pass; the sentinel-id is the span_idx itself",
)
def m53_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import text as _text

    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(_text.tokens("text")).cast("long").alias("n")
    ).filter(F.col("n") >= _M53_CHUNK)
    spans = t.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), (F.floor(F.col("n") / _M53_CHUNK) - 1).cast("long")
            )
        ).alias("span_idx"),
    )
    slot = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("span:"),
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("span_idx").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(_M53_SLOTS),
    )
    return spans.select(
        "doc_id",
        F.col("span_idx").cast("long").alias("span_idx"),
        (F.col("span_idx") * _M53_CHUNK + slot).cast("long").alias("start_tok"),
        F.lit(_M53_SPAN).cast("long").alias("span_len"),
    )


# --- m54: water-filling token-budget allocation across sources --------------

_M54_PCT = 60

M54_ORACLE = f"""
WITH t AS (
  SELECT source,
         CAST(sum(len({text_pipeline._TOKS})) AS BIGINT) AS total_tokens
  FROM documents GROUP BY 1
), ranked AS (
  SELECT source, total_tokens,
         CAST(row_number() OVER (ORDER BY total_tokens, source) AS BIGINT)
             AS i,
         CAST(sum(total_tokens) OVER (ORDER BY total_tokens, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS p,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(sum(total_tokens) OVER () AS BIGINT) AS grand
  FROM t
), sol AS (
  SELECT max(CASE WHEN (p - total_tokens) + (n - i + 1) * total_tokens
                       <= (grand * {_M54_PCT}) // 100
             THEN i ELSE 0 END) AS k,
         max(CASE WHEN (p - total_tokens) + (n - i + 1) * total_tokens
                       <= (grand * {_M54_PCT}) // 100
             THEN p ELSE 0 END) AS pk,
         max(n) AS n_src,
         max(grand) AS grand,
         max(total_tokens) AS max_total
  FROM ranked
), capped AS (
  SELECT CAST(CASE WHEN k >= n_src THEN max_total
              ELSE ((grand * {_M54_PCT}) // 100 - pk) // (n_src - k)
              END AS BIGINT) AS cap_tokens
  FROM sol
)
SELECT r.source, r.total_tokens, c.cap_tokens,
       CAST(least(r.total_tokens, c.cap_tokens) AS BIGINT) AS alloc_tokens,
       CAST(r.total_tokens > c.cap_tokens AS INT) AS capped
FROM ranked r CROSS JOIN capped c
"""


@register(
    "m54_budget_waterfill",
    M54_ORACLE,
    doc=f"water-filling token-budget allocation ({_M54_PCT}% of corpus "
    "tokens): the unique integer cap C with sum(min(total_s, C)) "
    "exhausting the budget — small sources keep everything, dominant "
    "sources clip at the common waterline (the exact max-min-fairness "
    "answer that temperature resampling approximates). Closed form via "
    "the monotone feasibility predicate: one groupBy(source) reduces "
    "the corpus to a source-cardinality frame, then rank + one MAX + a "
    "broadcast join back — all-BIGINT arithmetic, no iteration, table "
    "scanned once",
)
def m54_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.budget_waterfill(
        table(spark, sf_dir, "documents"), budget_pct=_M54_PCT
    )


# --- m55: fill-in-the-middle (FIM) example construction ---------------------

M55_ORACLE = """
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS txt FROM documents
), c AS (
  SELECT doc_id, txt, length(txt) AS n,
         ('0x' || substring(md5('fim:' || CAST(doc_id AS VARCHAR)), 1, 4))
             ::BIGINT % (length(txt) + 1) AS ca,
         ('0x' || substring(md5('fim:' || CAST(doc_id AS VARCHAR)), 5, 4))
             ::BIGINT % (length(txt) + 1) AS cb
  FROM d
), s AS (
  SELECT doc_id, txt, n, least(ca, cb) AS lo, greatest(ca, cb) AS hi FROM c
)
SELECT doc_id,
       CAST(lo AS BIGINT) AS n_prefix,
       CAST(hi - lo AS BIGINT) AS n_middle,
       CAST(n - hi AS BIGINT) AS n_suffix,
       '<|fim_prefix|>' || substring(txt, 1, CAST(lo AS INT))
       || '<|fim_suffix|>'
       || substring(txt, CAST(hi + 1 AS INT), CAST(n - hi AS INT))
       || '<|fim_middle|>'
       || substring(txt, CAST(lo + 1 AS INT), CAST(hi - lo AS INT)) AS fim_text
FROM s
"""


@register(
    "m55_fim_transform",
    M55_ORACLE,
    doc="fill-in-the-middle (FIM, Bavarian et al. 2022) example "
    "construction: each doc splits at two md5-derived points into "
    "(prefix, middle, suffix) and re-serializes in PSM sentinel order "
    "so a causal LM learns infilling from next-token prediction. Pure "
    "deterministic projection — zero shuffles, zero Python, exact "
    "cross-engine hash (both engines' substring/length are "
    "character-based and the cut points are integer md5 slices)",
)
def m55_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.fim_transform(table(spark, sf_dir, "documents"))


# --- m57: effective (post-dedup) mixture weights per source -----------------

M57_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len({text_pipeline._TOKS}) AS BIGINT) AS n_tokens,
         md5(COALESCE(text, '')) AS fp
  FROM documents
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM t
), per_src AS (
  SELECT source,
         CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
         CAST(sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS effective_tokens
  FROM ranked GROUP BY 1
), tot AS (
  SELECT CAST(sum(effective_tokens) AS BIGINT) AS total_eff FROM per_src
)
SELECT source, raw_tokens, effective_tokens,
       CASE WHEN raw_tokens > 0
            THEN CAST(raw_tokens - effective_tokens AS DOUBLE)
                 / CAST(raw_tokens AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS dup_token_share,
       CAST(effective_tokens AS DOUBLE)
           / CAST(t.total_eff AS DOUBLE) AS effective_weight
FROM per_src CROSS JOIN tot t
"""


@register(
    "m57_effective_mixture",
    M57_ORACLE,
    doc="effective (post-dedup) mixture weights: raw per-source token "
    "mass vs the mass surviving exact dedup (first doc per content "
    "fingerprint wins, so a duplicate shared across sources credits "
    "only the canonical's source — the double-counting that makes "
    "RAW mixture weights lie about heavily-mirrored sources). "
    "dup_token_share and effective_weight are single exact divisions "
    "of BIGINT sums. Two shuffles: the fingerprint window (digest "
    "keys only) and the source rollup; the 1-row total broadcasts "
    "back",
)
def m57_effective_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.text import (
        token_count,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        token_count(F.coalesce(F.col("text"), F.lit("")))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(w))
    per_src = ranked.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("raw_tokens"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("effective_tokens"),
    )
    tot = per_src.agg(
        F.sum("effective_tokens").cast("long").alias("total_eff")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "raw_tokens",
        "effective_tokens",
        # guard the 0/0 case (a source whose docs are all empty): IEEE
        # double division would yield NaN while DuckDB yields NULL —
        # define dup_token_share as 0.0 when there are no raw tokens
        F.when(
            F.col("raw_tokens") > 0,
            (F.col("raw_tokens") - F.col("effective_tokens")).cast("double")
            / F.col("raw_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_share"),
        (
            F.col("effective_tokens").cast("double")
            / F.col("total_eff").cast("double")
        ).alias("effective_weight"),
    )


# --- m59: per-chunk gather manifest (writer-side inverse of m15) ---------------

_M59_CAP, _M59_SHARDS = 1024, 8

M59_ORACLE = f"""
WITH t AS (
  SELECT doc_id, doc_id % {_M59_SHARDS} AS shard,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             AS n_tokens,
         md5(text) AS _tie
  FROM documents
), c AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, _tie
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
             AS cum_before
  FROM t
), s AS (
  SELECT * FROM c WHERE n_tokens > 0
), x AS (
  SELECT shard, doc_id, n_tokens, cum_before, gs.ch AS chunk_id
  FROM s, LATERAL (SELECT unnest(generate_series(
      CAST(cum_before // {_M59_CAP} AS BIGINT),
      CAST((cum_before + n_tokens - 1) // {_M59_CAP} AS BIGINT))) AS ch) gs
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       doc_id,
       CAST(greatest(chunk_id * {_M59_CAP} - cum_before, 0) AS BIGINT)
           AS slice_start,
       CAST(least(cum_before + n_tokens, (chunk_id + 1) * {_M59_CAP})
            - greatest(cum_before, chunk_id * {_M59_CAP}) AS BIGINT)
           AS slice_len
FROM x
"""


@register(
    "m59_chunk_manifest",
    M59_ORACLE,
    doc=f"per-chunk gather manifest (cap={_M59_CAP}, {_M59_SHARDS} "
    "shards) — the writer-side INVERSE of m15's packing plan: one row "
    "per (doc, chunk) overlap with the exact token slice each doc "
    "contributes, so a shard writer can gather every output sequence "
    "without re-deriving offsets. Same sharded-running-sum layout "
    "contract as m15 (no global window); the explode is output-linear "
    "(<= ceil(n/cap)+1 rows per doc), zero joins. Slice-tiling "
    "invariants property-tested in tests/test_prep.py",
)
def m59_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.chunk_manifest(
        table(spark, sf_dir, "documents"), cap=_M59_CAP, shards=_M59_SHARDS
    )


# --- m60: doc-level budget selection under the m54 waterline -------------------

M60_ORACLE = f"""
WITH alloc AS (
  {M54_ORACLE}
), d AS (
  SELECT doc_id, source,
         CAST(len({text_pipeline._TOKS}) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_tokens
  FROM d
)
SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens,
       CAST(CASE WHEN a.cap_tokens IS NULL THEN 0
                 ELSE CAST(c.cum_tokens <= a.cap_tokens AS INT)
            END AS INT) AS keep_flag
FROM c LEFT JOIN alloc a USING (source)
"""


@register(
    "m60_budget_select",
    M60_ORACLE,
    doc="doc-level realization of m54's waterfill allocation: per "
    "source, keep the greedy id-ordered prefix of documents whose "
    "cumulative tokens fit the source's cap — deterministic and "
    "append-stable (new docs never un-keep old ones), with EVERY doc "
    "emitted alongside its running total so drops are auditable "
    "(left join: a source with no allocation surfaces as keep_flag 0, "
    "never silently vanishes). The solve runs on the source-"
    "cardinality frame and broadcasts back; the corpus running sum is "
    "SHARDED — per-(source, id-range-bucket) windows plus a broadcast "
    "bucket-cardinality carry frame (chunk_manifest's carried-offset "
    "idiom), so a hot source never becomes one task's sort. The "
    "oracle keeps the single-window form (same algebra, oracle-scale "
    "data); bucket_width=128 makes sf0.01 exercise ~4 buckets/source. "
    "All-BIGINT",
)
def m60_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.budget_select(
        table(spark, sf_dir, "documents"),
        budget_pct=_M54_PCT,
        bucket_width=128,
    )


# --- m61: soft-dedup training weights ------------------------------------------

M61_ORACLE = f"""
WITH RECURSIVE pairs AS ({text_pipeline._minhash_oracle()}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
), cc AS (
  SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster_rep
  FROM reach GROUP BY id
), sz AS (
  SELECT cluster_rep, CAST(count(*) AS BIGINT) AS cluster_size
  FROM cc GROUP BY 1
)
SELECT cc.doc_id, cc.cluster_rep, sz.cluster_size,
       CAST(1.0 AS DOUBLE) / CAST(sz.cluster_size AS DOUBLE) AS weight
FROM cc JOIN sz USING (cluster_rep)
"""


@register(
    "m61_softdedup_weights",
    M61_ORACLE,
    doc="soft dedup: instead of DROPPING near-duplicates (m8's keep "
    "list), every document stays with training weight 1/cluster_size "
    "— each near-dup cluster contributes one document's worth of "
    "gradient mass however many copies exist (the downweighting "
    "alternative the SlimPajama/D4 line of work measures against hard "
    "dedup). Weight = one exact division per row; cluster sizes come "
    "from ONE groupBy over the (doc, rep) verdict frame joined back "
    "on the rep key. Oracle = m8's recursive-CTE clustering extended "
    "with the size join",
)
def m61_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash.minhash_lsh_dedup(docs, threshold=0.4).select(
        "doc_a", "doc_b"
    )
    cc = dedup_verdicts(docs, pairs).select("doc_id", "cluster_rep")
    sz = cc.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return cc.join(sz, "cluster_rep").select(
        "doc_id",
        "cluster_rep",
        "cluster_size",
        (F.lit(1.0) / F.col("cluster_size").cast("double")).alias("weight"),
    )


# --- m62: head+tail truncation plan ---------------------------------------------

_M62_HEAD, _M62_TAIL = 48, 16

M62_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len({text_pipeline._TOKS}) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id,
       n AS n_tokens,
       least(n, {_M62_HEAD}) AS head_len,
       n - greatest(least(CAST({_M62_TAIL} AS BIGINT), n - {_M62_HEAD}), 0)
           AS tail_start,
       greatest(least(CAST({_M62_TAIL} AS BIGINT), n - {_M62_HEAD}), 0)
           AS tail_len,
       least(n, {_M62_HEAD} + {_M62_TAIL}) AS kept_tokens,
       n - least(n, {_M62_HEAD} + {_M62_TAIL}) AS dropped_tokens
FROM d
"""


@register(
    "m62_head_tail_truncate",
    M62_ORACLE,
    doc="head+tail truncation plan for long documents (keep the lead "
    f"{_M62_HEAD} and trailing {_M62_TAIL} tokens, cut the middle — "
    "the standard long-context policy): emits disjoint token-slice "
    "coordinates that tile min(n, H+T), so the tokenizer runs once "
    "downstream on exactly the kept spans. Closed-form BIGINT "
    "arithmetic per row — zero shuffles, zero joins, scan-linear",
)
def m62_head_tail_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.head_tail_truncate(
        table(spark, sf_dir, "documents"),
        head_tokens=_M62_HEAD,
        tail_tokens=_M62_TAIL,
    )


# --- m64: deterministic per-source downsample ---------------------------------

_M64_CAP = 10
_M64_M = (1 << 31) - 1
_M64_A = 2654435761 % _M64_M

M64_ORACLE = f"""
WITH n AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_src
  FROM documents GROUP BY source
), t AS (
  SELECT source, ({_M64_M} * CAST({_M64_CAP} AS BIGINT)) // n_src AS thr
  FROM n
)
SELECT d.doc_id, d.source,
       CAST(((d.doc_id % {_M64_M}) * {_M64_A}) % {_M64_M} < t.thr AS INT)
           AS keep_flag
FROM documents d JOIN t ON d.source IS NOT DISTINCT FROM t.source
"""


@register(
    "m64_deterministic_downsample",
    M64_ORACLE,
    doc=f"per-source downsample to ~{_M64_CAP} expected docs via pure "
    "modular-BIGINT Knuth multiplicative hashing (keep iff "
    "hash(id) < (M*cap) div n_source) — deterministic across runs, "
    "engines, and partitionings with NO rand(), NO engine hash "
    "builtin, NO floats; small sources (n <= cap) keep everything. "
    "Every doc emits its keep_flag (audit contract). Scale: one "
    "map-side count per source + a broadcast source-cardinality "
    "threshold frame + a scan-linear filter — the corpus never "
    "shuffles",
)
def m64_deterministic_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.deterministic_downsample(
        table(spark, sf_dir, "documents"), cap_per_source=_M64_CAP
    )
