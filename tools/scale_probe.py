"""Width-scaling probe for the heavy LLM-pipeline operators.

Replicates the sf corpus k-fold with CONTENT-DECORRELATED replicas
(the shape a cluster absorbs by adding executors: more distinct data,
same per-key density) and measures wall-clock at 1x vs kx:

  - documents: replica i suffixes every token with ``_r<i>`` — the
    shingle STRUCTURE of each doc (count, within-replica overlaps,
    Jaccard between any two docs) is exactly the original's, but every
    shingle string differs across replicas, so MinHash buckets scale
    in COUNT, not size, and no cross-replica near-dup pairs exist.
    (A first attempt that INSERTED an ``r<i>`` token between words
    collapsed trigram shingles into effective bigrams — entropy loss
    that manufactured a 2450-doc bucket and 6.7M genuinely-similar
    pairs at 4x. The probe transform must preserve similarity
    structure or it measures its own artifact.)
  - embeddings: replica i multiplies each component by a deterministic
    per-(replica, component) ±1 sign mask — WITHIN a replica every
    pairwise cosine is exactly preserved (both vectors see the same
    mask), while ACROSS replicas the random relative signs decorrelate
    dot products toward 0, so SRP buckets gain width, not density.

  - part (pair-emitting ER family): replica i applies a per-replica
    Caesar rotation to ``p_name``'s letters (``translate`` with a
    rotated alphabet) — a character BIJECTION, so within a replica
    every q-gram equality, blocking key, and Levenshtein distance is
    exactly the original's, while across replicas gram CONTENT
    differs (same-source grams map to different strings; residual
    cross-replica gram collisions are pseudo-random and fall below
    min_shared). Candidate-pair volume must therefore scale LINEARLY
    in k; super-linear growth is a quadratic blowup the caps failed
    to contain. (A first attempt that SUFFIXED tokens with ``_r<i>``
    left every token-interior gram identical across replicas — pair
    volume went ~k^2 and the probe measured its own artifact; the
    transform must decorrelate gram content, not just append to it.)

Probed operators (the r4/r5 scale-engineered set):
  minhash   — minhash_lsh_dedup (banded LSH + capped buckets + verify)
  near_dup  — embedding_near_dup_pairs (SRP buckets + salt-split cap)
  pack      — sequence_pack (sharded running sum)
  mix       — temperature_resample (per-source rank; sources grow
              k-fold wide, quota frame stays D rows)
  redact    — pii_redact (zero-shuffle regex cascade)
  qgram     — er.qgram_pairs (inverted q-gram index + stop-gram cut)
  er_block  — er.blocked_pairs (blocking keys + Levenshtein verify)

A width-scaled operator should grow sub-linearly in wall-clock on a
fixed local[32] (fixed parallelism absorbs width until cores
saturate); anything super-linear indicates density-coupled work — the
100 TB red flag this probe exists to catch.

Usage: python tools/scale_probe.py [--ops a,b,c] [sf_dir] [factor]
Prints one JSON line {"factor": k, "ops": {name: {"t1": s, "tk": s,
"ratio": r, "rows1": n, "rowsk": n}}}. ``--ops`` restricts to a
comma-separated subset (e.g. the pair family at 32x/64x, where the
non-pair ops would just re-measure what the 8x probe already proved).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    minhash,
    prep,
    similarity,
    stats,
    text,
)
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table


def _docs_k(docs: DataFrame, k: int) -> DataFrame:
    n = 10**9
    parts = []
    for i in range(k):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1_r{i}").alias("text"),
                # unchanged per replica: each source grows k-fold wide,
                # the per-source-rank scaling axis the mix op probes
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _docs_translate_k(docs: DataFrame, k: int) -> DataFrame:
    """Length-preserving widening for the quality-gated curation ops:
    replica i > 0 letter-permutes the text (seeded bijection, as in
    _part_k), which PRESERVES every quality-gate statistic (token
    count, token lengths, punctuation share) while decorrelating
    content across replicas — `_docs_k`'s token-suffix transform grows
    avg_token_len past the gate and collapses the 8x survivor set to
    zero, silently shortening every post-gate stage. Stopword ratios
    only DROP under permutation (toward the passing side of the gate),
    so replica pass rates track replica 0."""
    import random

    n = 10**9
    alpha = "abcdefghijklmnopqrstuvwxyz"
    parts = []
    for i in range(k):
        if i == 0:
            text = F.col("text")
        else:
            chars = list(alpha)
            random.Random(i).shuffle(chars)
            text = F.translate("text", alpha, "".join(chars))
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                text.alias("text"),
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _emb_k(emb: DataFrame, k: int) -> DataFrame:
    n = 10**9
    parts = []
    def _mask(i: int):
        # factory keeps the lambda binary — F.transform inspects arity
        def sign(x, j):
            flip = (
                F.pmod(
                    F.xxhash64(F.concat_ws("_", F.lit(f"rep{i}"), j.cast("string"))),
                    F.lit(2),
                )
                == 0
            )
            return F.when(flip, x).otherwise(-x)

        return sign

    for i in range(k):
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                F.transform("embedding", _mask(i)).alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _part_k(part: DataFrame, k: int) -> DataFrame:
    import random

    n = 10**9
    alpha = "abcdefghijklmnopqrstuvwxyz"
    parts = []
    for i in range(k):
        if i == 0:
            mapped = alpha  # replica 0 is the original corpus verbatim
        else:
            # seeded permutation: 26! bijections, so any k gets a
            # distinct mapping (plain Caesar has only 25 and collides
            # at k > 25, silently re-creating cross-replica duplicates)
            chars = list(alpha)
            random.Random(i).shuffle(chars)
            mapped = "".join(chars)
        parts.append(
            part.select(
                (F.col("p_partkey") + F.lit(i * n)).alias("p_partkey"),
                F.translate("p_name", alpha, mapped).alias("p_name"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _events_k(events: DataFrame, k: int) -> DataFrame:
    """Width axis for per-user operators: replica i shifts user_id and
    event_id, so the USER population grows k-fold while every user's
    per-key history (turn count, ordering, state size) is exactly the
    original's — the shape a cluster absorbs by adding executors."""
    n = 10**9
    parts = []
    for i in range(k):
        parts.append(
            events.select(
                (F.col("event_id") + F.lit(i * n)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * n)).alias("user_id"),
                "event_type",
                "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _turns(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        "ts",
        "event_id",
        F.concat(
            F.col("event_type"),
            F.lit("#"),
            F.floor(F.col("value") * 100.0 + 0.5).cast("long").cast("string"),
        ).alias("turn"),
    )


def _t33_shape(docs: DataFrame) -> DataFrame:
    """t33's plan shape over an arbitrary docs frame (the registered
    query binds the documents table; the probe re-binds the replicas)."""
    tf = (
        docs.select("source", F.explode(text.tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
        (
            F.sum(F.col("n") * F.col("n")).cast("double")
            / (F.sum("n") * F.sum("n")).cast("double")
        ).alias("hhi"),
    )


def _scene_shape(docs: DataFrame) -> DataFrame:
    """mm8's operator over frame streams synthesized from docs: one
    video per doc, frames = token_count capped at 60, per-video scene
    period from the id — the video POPULATION grows k-fold while each
    video's frame count stays fixed (the per-key window axis)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        multimodal,
    )

    frames = docs.select(
        F.col("doc_id").alias("media_id"),
        F.explode(
            F.sequence(
                F.lit(0), F.least(text.token_count("text"), F.lit(60))
            )
        ).alias("frame_idx"),
    )
    fp = F.md5(
        F.concat(
            F.col("media_id").cast("string"),
            F.lit(":"),
            F.expr("frame_idx div (media_id % 4 + 2)").cast("string"),
        )
    )
    return multimodal.scene_segments(frames.withColumn("frame_fp", fp))


def _run(make) -> tuple[float, int]:
    # time CONSTRUCTION + count: several operators materialize eagerly
    # inside construction (localCheckpoint cache-release pattern), so
    # timing only .count() would miss the actual work
    t0 = time.time()
    n = make().count()
    return time.time() - t0, n


def main() -> None:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--ops" in argv:
        i = argv.index("--ops")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    k = int(argv[1]) if len(argv) > 1 else 4

    spark = get_spark("shopware-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import er
    from group_2_shopware_enterprise_data_engineering_project_spark.pipelines.curation import (
        curate_corpus,
        curation_audit,
    )

    ops = {
        "minhash": lambda d, e, p: minhash.minhash_lsh_dedup(d),
        "near_dup": lambda d, e, p: similarity.embedding_near_dup_pairs(e),
        "pack": lambda d, e, p: prep.sequence_pack(d),
        "mix": lambda d, e, p: prep.temperature_resample(d),
        "redact": lambda d, e, p: text.pii_redact(d),
        "qgram": lambda d, e, p: er.qgram_pairs(
            p, "p_partkey", "p_name", q=3, min_shared=4
        ),
        "er_block": lambda d, e, p: er.blocked_pairs(
            p, id_col="p_partkey", name_col="p_name", max_distance=3, max_block=1000
        ),
        # the flagship curation pass and its drop-attribution audit:
        # the claim under test is that the audit costs the SAME single
        # corpus pass as curation (gate sets materialized once), not
        # one pass per attribution branch
        "curate": lambda d, e, p: curate_corpus(d),
        "audit": lambda d, e, p: curation_audit(d),
        # r7 additions: the three new shuffle-bearing ops. bigram's
        # corpus-df join and overlap's (source, bigram) self-join are
        # the scale surfaces; convo probes the capped per-user collect
        # as the user population (not per-user history) grows.
        "bigram": lambda d, e, p: text.bigram_coverage(d),
        "overlap": lambda d, e, p: text.source_overlap(d),
        # r8 additions: rep's doc-keyed bigram mode, lm_oov's bigram-KEY
        # vocab join (ref vocab grows k-fold wide under the suffix
        # transform — the scale surface), boiler's (source, line-fp)
        # frequency join, calib's agreement+exact legs over the LSH
        # candidate set (replicas are content-decorrelated, so
        # candidates scale in COUNT, not density).
        "rep": lambda d, e, p: text.bigram_repetition_gate(d),
        "lm_oov": lambda d, e, p: text.lm_oov_score(
            d.filter(F.col("doc_id") % 2 == 1),
            d.filter(F.col("doc_id") % 2 == 0),
        ),
        "boiler": lambda d, e, p: text.boilerplate_lines(
            d.select(
                "doc_id",
                "source",
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")),
                    F.lit("\nVisit the "),
                    F.col("source"),
                    F.lit(" homepage for more articles."),
                    F.concat(F.lit("\nref "), F.col("doc_id").cast("string")),
                ).alias("text"),
            )
        ),
        "calib": lambda d, e, p: minhash.calibration(d),
        # r9 additions: waterfill's scale surface is the corpus-wide
        # groupBy(source) (source count stays fixed under _docs_k, so
        # the solve frame must NOT grow); hll_analyze's is the
        # (col, bucket) register shuffle (fixed 65-row-per-column
        # output regardless of k); fim is a zero-shuffle projection
        # and should track the scan linearly.
        "waterfill": lambda d, e, p: prep.budget_waterfill(d),
        "fim": lambda d, e, p: prep.fim_transform(d),
        "hll_analyze": lambda d, e, p: stats.analyze_columns_hll(
            d, ("doc_id",), ("source", "text")
        ),
        # r10 additions: coreset's ONE groupBy must shuffle at most one
        # struct-MIN candidate per (bucket, task) — buckets scale in
        # COUNT under the sign-mask transform, so wall tracks the scan.
        # decontam (m58's shape): the EVAL index is pinned to replica 0
        # (fixed) while train grows k-fold — the claim is one corpus
        # pass over train with candidate volume bounded by true
        # near-dups (content-decorrelated replicas add no cross pairs).
        "coreset": lambda d, e, p: similarity.diversity_coreset(e),
        # r10 query additions. hhi: one explode + two map-side-combined
        # groupBys — (source, term, count) triples are the only shuffle
        # and the suffix transform decorrelates term keys across
        # replicas, so the tf frame scales in COUNT. manifest: per-shard
        # window + output-linear explode. select: waterfill solve on
        # the fixed source frame + per-source window. recall_curve:
        # candidates per probed list grow with the corpus (N/C per
        # list); queries pinned to replica 0. scene: per-video window
        # over synthesized frame streams — videos grow k-fold wide.
        "hhi": lambda d, e, p: _t33_shape(d),
        # r11: t34's corpus shuffle is (source, length, count) triples;
        # the suffix transform preserves every token count, so the
        # frequency frame keeps its row count and only the counts grow
        # — wall must track the scan.
        "gini": lambda d, e, p: stats.length_gini(d),
        "manifest": lambda d, e, p: prep.chunk_manifest(d),
        "select": lambda d, e, p: prep.budget_select(d),
        "recall_curve": lambda d, e, p: similarity.ivf_recall_curve(
            e, F.col("vec_id") < 10
        ),
        "scene": lambda d, e, p: _scene_shape(d),
        "decontam": lambda d, e, p: minhash.incremental_dedup(
            d.filter(F.col("doc_id") % 10 != 0),
            d.filter(
                (F.col("doc_id") < 10**9) & (F.col("doc_id") % 10 == 0)
            ),
            threshold=0.4,
        ).filter(F.col("vs_existing") == 1),
    }
    _special = {
        "incr", "convo", "concur", "rbo", "mor", "union",
        "select_hot", "manifest_hot", "union_hot", "reorder_hot",
    }
    if only:
        unknown = only - set(ops) - _special
        if unknown:
            sys.exit(
                f"unknown ops: {sorted(unknown)} "
                f"(have {sorted(ops) + sorted(_special)})"
            )
        ops = {n: f for n, f in ops.items() if n in only}

    if only and "concur" in only:
        # a36's scale axis: the boundary-event population grows k-fold
        # while the HOUR-bucket count stays fixed, so each per-bucket
        # window sorts k x more rows — the probe measures how that
        # intra-bucket sort tracks width (the bucket_us knob is the
        # stated mitigation: finer buckets bound per-task rows, the
        # offset frame stays tiny).
        from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
            rangejoin,
        )

        ev1c = table(spark, sf_dir, "events").localCheckpoint(eager=True)
        evkc = _events_k(ev1c, k).localCheckpoint(eager=True)

        def _concur(ev):
            iv = ev.select(
                F.unix_micros(F.col("ts")).alias("start_us"),
                (F.unix_micros(F.col("ts")) + F.lit(300_000_000)).alias(
                    "end_us"
                ),
            )
            return lambda: rangejoin.interval_concurrency(iv)

        _concur(ev1c)().count()  # warm
        t1, rows1 = _run(_concur(ev1c))
        tk, rowsk = _run(_concur(evkc))
        results_concur = {
            "t1": round(t1, 2), "tk": round(tk, 2),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
            "rows1": rows1, "rowsk": rowsk,
        }
        only.discard("concur")
        ops = {n: f for n, f in ops.items() if n in only}
    else:
        results_concur = None

    if only and "convo" in only:
        ev1 = table(spark, sf_dir, "events").localCheckpoint(eager=True)
        evk = _events_k(ev1, k).localCheckpoint(eager=True)

        def _convo(ev):
            return lambda: prep.linearize_conversations(_turns(ev), max_turns=32)

        _convo(ev1)().count()  # warm
        t1, rows1 = _run(_convo(ev1))
        tk, rowsk = _run(_convo(evk))
        results_convo = {
            "t1": round(t1, 2), "tk": round(tk, 2),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
            "rows1": rows1, "rowsk": rowsk,
        }
        only.discard("convo")
        ops = {n: f for n, f in ops.items() if n in only}
    else:
        results_convo = None

    if only and "union" in only:
        # j9's scale axis: the USER population grows k-fold while each
        # user's interval count stays fixed — both windows partition by
        # the key, so per-task state tracks per-user activity, not
        # corpus size.
        from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
            rangejoin,
        )

        ev1u = table(spark, sf_dir, "events").localCheckpoint(eager=True)
        evku = _events_k(ev1u, k).localCheckpoint(eager=True)

        def _union(ev):
            iv = ev.select(
                "user_id",
                F.unix_micros(F.col("ts")).alias("start_us"),
                (F.unix_micros(F.col("ts")) + F.lit(300_000_000)).alias(
                    "end_us"
                ),
            )
            return lambda: rangejoin.interval_union(iv)

        _union(ev1u)().count()  # warm
        t1, rows1 = _run(_union(ev1u))
        tk, rowsk = _run(_union(evku))
        results_union = {
            "t1": round(t1, 2), "tk": round(tk, 2),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
            "rows1": rows1, "rowsk": rowsk,
        }
        only.discard("union")
        ops = {n: f for n, f in ops.items() if n in only}
    else:
        results_union = None

    if only and "rbo" in only:
        # e21's scale surface: the overlap join and groupBy shuffle
        # O(K x n_queries) rows regardless of corpus size — the probe
        # grows the QUERY population k-fold (synthetic K-row rankings
        # keyed by the embeddings ids) and expects near-linear wall
        # with no corpus-coupled term.
        K = 10

        def _rank_frames(emb):
            base = emb.select(F.col("vec_id").alias("query_id"))
            r = base.select(
                "query_id",
                F.explode(F.sequence(F.lit(1), F.lit(K))).alias("rank"),
            )
            a = r.select(
                "query_id",
                (F.col("query_id") * 100 + F.col("rank")).alias("neighbor_id"),
                "rank",
            )
            # b overlaps a on odd ranks (permuted) and diverges on even
            b = r.select(
                "query_id",
                F.when(
                    F.col("rank") % 2 == 1,
                    F.col("query_id") * 100 + F.pmod(F.col("rank") * 3, F.lit(K)) + 1,
                )
                .otherwise(F.col("query_id") * 100 + 50 + F.col("rank"))
                .alias("neighbor_id"),
                "rank",
            )
            return a, b

        emb1r = table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
        embkr = _emb_k(emb1r, k).localCheckpoint(eager=True)

        def _rbo(emb):
            a, b = _rank_frames(emb)
            return lambda: similarity.rbo_overlap(a, b, k=K, p=0.9)

        _rbo(emb1r)().count()  # warm
        t1, rows1 = _run(_rbo(emb1r))
        tk, rowsk = _run(_rbo(embkr))
        results_rbo = {
            "t1": round(t1, 2), "tk": round(tk, 2),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
            "rows1": rows1, "rowsk": rowsk,
        }
        only.discard("rbo")
        ops = {n: f for n, f in ops.items() if n in only}
    else:
        results_rbo = None

    if only and "mor" in only:
        # k32/st27's scale axis: TOMBSTONE VOLUME. Base table fixed
        # (orders); the accumulated tombstone set grows k-fold. Claim
        # under test after the r10 size gate: read cost is dominated by
        # the base scan, not the tombstone count, and past the gate the
        # plan degrades to a shuffled anti-join instead of a driver
        # OOM (t_shuffled_k shows that path's cost at the same volume).
        import shutil

        from group_2_shopware_enterprise_data_engineering_project_spark.operators.merge import (
            MergeOnReadTable,
        )

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        mor_dir = os.path.join(repo_root, ".probe_mor")
        shutil.rmtree(mor_dir, ignore_errors=True)
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        ).localCheckpoint(eager=True)
        n_base = orders.count()
        n_t1 = max(n_base // 100, 1)

        def _mor(name, n_tomb, gate):
            t = MergeOnReadTable(
                spark, os.path.join(mor_dir, name), ("o_orderkey",),
                broadcast_max_bytes=gate,
            )
            t.create_or_overwrite(orders)
            t.delete_keys(
                orders.select("o_orderkey").limit(int(n_tomb))
            )
            t.read().count()  # warm
            t0 = time.time()
            n = t.read().count()
            return time.time() - t0, n

        t1, rows1 = _mor("b1", n_t1, 10 << 20)
        tk, rowsk = _mor("bk", min(n_t1 * k, n_base // 2), 10 << 20)
        tks, _ = _mor("sk", min(n_t1 * k, n_base // 2), 1)
        results_mor = {
            "t1": round(t1, 2), "tk": round(tk, 2),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
            "rows1": rows1, "rowsk": rowsk,
            "t_shuffled_k": round(tks, 2),
            "n_tomb_1": n_t1, "n_tomb_k": min(n_t1 * k, n_base // 2),
        }
        shutil.rmtree(mor_dir, ignore_errors=True)
        only.discard("mor")
        ops = {n: f for n, f in ops.items() if n in only}
    else:
        results_mor = None

    results_hot: dict[str, dict] = {}
    if only and (
        {"select_hot", "manifest_hot", "union_hot", "reorder_hot"} & only
    ):
        # r11 hot-KEY probes (r10 verdict item 4): every width probe in
        # this file grows the POPULATION (more keys, same per-key
        # density); these grow ONE key k-fold and report the per-task
        # row bound each mitigation actually delivers.
        from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
            rangejoin,
        )

        docs_h = table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        ).localCheckpoint(eager=True)

        if "select_hot" in only:
            # one source holds (k-1)/k of the corpus. Claim: the r11
            # sharded running sum bounds per-task rows by bucket_width
            # regardless of source heat; bucket_width=10**18 recreates
            # the old single-window-per-source plan for contrast.
            parts = [docs_h]
            for i in range(1, k):
                parts.append(
                    docs_h.select(
                        (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"),
                        F.lit("hot").alias("source"),
                        "text",
                    )
                )
            hot = parts[0]
            for pdf in parts[1:]:
                hot = hot.unionByName(pdf)
            hot = hot.localCheckpoint(eager=True)
            width = 1024

            def _sel(bw):
                return lambda: prep.budget_select(hot, bucket_width=bw)

            _sel(width)().count()  # warm
            t_shard, rows = _run(_sel(width))
            t_naive, _ = _run(_sel(10**18))
            mx_src = (
                hot.groupBy("source").count().agg(F.max("count")).first()[0]
            )
            mx_bkt = (
                hot.groupBy(
                    "source", F.expr(f"doc_id div {width}").alias("b")
                ).count().agg(F.max("count")).first()[0]
            )
            results_hot["select_hot"] = {
                "t_sharded": round(t_shard, 2),
                "t_single_window": round(t_naive, 2),
                "rows": rows,
                "max_rows_per_task_sharded": mx_bkt,
                "max_rows_per_task_single": mx_src,
            }

        if "manifest_hot" in only:
            # skewed id residues: every id ≡ 0 (mod 8), so shards=8
            # lands the WHOLE corpus in one shard's window; the shards
            # knob is the stated mitigation — shards=64 spreads the
            # same ids over 8 live shards (8x better bound).
            skew = docs_h.select(
                (F.col("doc_id") * 8).alias("doc_id"), "text"
            ).localCheckpoint(eager=True)

            def _man(sh):
                return lambda: prep.chunk_manifest(skew, shards=sh)

            _man(8)().count()  # warm
            t8, rows8 = _run(_man(8))
            t64, rows64 = _run(_man(64))
            mx8 = (
                skew.groupBy((F.col("doc_id") % 8).alias("s"))
                .count().agg(F.max("count")).first()[0]
            )
            mx64 = (
                skew.groupBy((F.col("doc_id") % 64).alias("s"))
                .count().agg(F.max("count")).first()[0]
            )
            results_hot["manifest_hot"] = {
                "t_shards8": round(t8, 2),
                "t_shards64": round(t64, 2),
                "rows8": rows8,
                "rows64": rows64,
                "max_rows_per_shard_8": mx8,
                "max_rows_per_shard_64": mx64,
            }

        if "reorder_hot" in only:
            # a42's per-customer window under one hot key: replicas
            # all belong to customer -1 with week-shifted dates, so the
            # hot task sorts k x one customer's orders while everyone
            # else is untouched.
            ord_h = table(spark, sf_dir, "orders").select(
                "o_custkey", "o_orderdate", "o_orderkey"
            )
            rparts = [ord_h]
            for i in range(1, k):
                rparts.append(
                    ord_h.select(
                        F.lit(-1).cast("long").alias("o_custkey"),
                        (
                            F.col("o_orderdate")
                            + F.expr(f"INTERVAL {7 * i} DAYS")
                        ).alias("o_orderdate"),
                        (F.col("o_orderkey") + F.lit(i * 10**9)).alias(
                            "o_orderkey"
                        ),
                    )
                )
            hot_o = rparts[0]
            for pdf in rparts[1:]:
                hot_o = hot_o.unionByName(pdf)
            hot_o = hot_o.localCheckpoint(eager=True)
            ord_c = ord_h.localCheckpoint(eager=True)

            def _gaps(frame):
                from pyspark.sql import Window as W

                w = W.partitionBy("o_custkey").orderBy(
                    "o_orderdate", "o_orderkey"
                )
                def run():
                    g = frame.select(
                        "o_custkey",
                        F.datediff(
                            F.col("o_orderdate"),
                            F.lag("o_orderdate").over(w),
                        ).alias("gap"),
                    ).filter(F.col("gap").isNotNull())
                    return g.groupBy("o_custkey").agg(
                        F.count(F.lit(1)).alias("n"),
                        F.avg("gap").alias("avg_gap"),
                    )
                return run

            _gaps(ord_c)().count()  # warm
            t1r, rows1r = _run(_gaps(ord_c))
            tkr, rowskr = _run(_gaps(hot_o))
            mx_cust = (
                hot_o.groupBy("o_custkey").count()
                .agg(F.max("count")).first()[0]
            )
            results_hot["reorder_hot"] = {
                "t1": round(t1r, 2),
                "t_hot": round(tkr, 2),
                "ratio": round(tkr / t1r, 2) if t1r > 0 else None,
                "rows1": rows1r,
                "rows_hot": rowskr,
                "max_orders_per_customer": mx_cust,
            }

        if "union_hot" in only:
            # one user owns k-fold the intervals of anyone else
            # (replicas time-shifted a week apart so islands never
            # merge across replicas). Per-task state for interval_union
            # is the hottest user's interval count — this measures what
            # that costs and records the bound.
            ev_h = table(spark, sf_dir, "events")
            iv = ev_h.select(
                "user_id",
                F.unix_micros(F.col("ts")).alias("start_us"),
                (F.unix_micros(F.col("ts")) + F.lit(300_000_000)).alias(
                    "end_us"
                ),
            )
            shift = 7 * 24 * 3600 * 1_000_000
            hparts = [iv]
            for i in range(1, k):
                hparts.append(
                    iv.select(
                        F.lit(-1).cast("long").alias("user_id"),
                        (F.col("start_us") + F.lit(i * shift)).alias(
                            "start_us"
                        ),
                        (F.col("end_us") + F.lit(i * shift)).alias("end_us"),
                    )
                )
            hot_iv = hparts[0]
            for pdf in hparts[1:]:
                hot_iv = hot_iv.unionByName(pdf)
            hot_iv = hot_iv.localCheckpoint(eager=True)
            iv_c = iv.localCheckpoint(eager=True)

            def _uni(frame):
                return lambda: rangejoin.interval_union(frame)

            _uni(iv_c)().count()  # warm
            t1u, rows1u = _run(_uni(iv_c))
            tku, rowsku = _run(_uni(hot_iv))
            mx_user = (
                hot_iv.groupBy("user_id").count()
                .agg(F.max("count")).first()[0]
            )
            results_hot["union_hot"] = {
                "t1": round(t1u, 2),
                "t_hot": round(tku, 2),
                "ratio": round(tku / t1u, 2) if t1u > 0 else None,
                "rows1": rows1u,
                "rows_hot": rowsku,
                "max_intervals_per_user": mx_user,
            }

        only -= {"select_hot", "manifest_hot", "union_hot", "reorder_hot"}
        ops = {n: f for n, f in ops.items() if n in only}

    docs1 = table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    emb1 = table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    part1 = table(spark, sf_dir, "part").localCheckpoint(eager=True)
    # the k-fold frames are EAGER materializations costing real minutes
    # at factor 8 — build only the ones a selected op actually consumes
    # (curate/audit use the gate-preserving docs_tk instead)
    generic = set(ops) - {"curate", "audit"}
    docsk = embk = partk = None
    if generic or (only and "incr" in only):
        docsk = _docs_k(docs1, k).localCheckpoint(eager=True)
    if generic:
        embk = _emb_k(emb1, k).localCheckpoint(eager=True)
        partk = _part_k(part1, k).localCheckpoint(eager=True)

    results = {}
    if results_concur is not None:
        results["concur"] = results_concur
    if results_convo is not None:
        results["convo"] = results_convo
    if results_union is not None:
        results["union"] = results_union
    if results_rbo is not None:
        results["rbo"] = results_rbo
    if results_mor is not None:
        results["mor"] = results_mor
    results.update(results_hot)
    if only and "incr" in only:
        # incremental_dedup has a different scaling axis than the width
        # ops: the SHARD stays fixed and the HISTORY grows k-fold (its
        # stored bucket index is prebuilt, untimed — the steady-state
        # ingestion shape). The 100 TB claim under test: shard-ingest
        # wall time tracks the shard + its candidates, NOT the history
        # size, because history text is shingled only for candidate ids
        # and candidate volume is bounded by true near-dups (replicas
        # are content-decorrelated, so candidates stay ~constant in k).
        # the shard carries the replica-0 transform so its TRUE-pair
        # volume against replica 0 (present in both histories) is
        # identical at 1x and kx — otherwise the kx run would verify
        # fewer candidates and flatter-than-real ratios would result
        hist1 = _docs_k(docs1, 1).localCheckpoint(eager=True)
        shard = (
            _docs_k(docs1, 1)
            .withColumn("doc_id", F.col("doc_id") + F.lit(5 * 10**11))
            .localCheckpoint(eager=True)
        )
        idx1 = minhash.bucket_index(hist1).localCheckpoint(eager=True)
        idxk = minhash.bucket_index(docsk).localCheckpoint(eager=True)

        def _incr(hist, idx):
            return lambda: minhash.incremental_dedup(shard, hist, index=idx)

        _incr(hist1, idx1)().count()  # warm codegen
        t1, rows1 = _run(_incr(hist1, idx1))
        tk, rowsk = _run(_incr(docsk, idxk))
        results["incr"] = {
            "t1": round(t1, 2),
            "tk": round(tk, 2),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
            "rows1": rows1,
            "rowsk": rowsk,
        }
        only.discard("incr")
        ops = {n: f for n, f in ops.items() if n in only}

    docs_tk = None
    if {"curate", "audit"} & set(ops):
        docs_tk = _docs_translate_k(docs1, k).localCheckpoint(eager=True)

    for name, fn in ops.items():
        dk = docs_tk if name in ("curate", "audit") else docsk
        fn(docs1, emb1, part1).count()  # warm codegen for this op shape
        t1, rows1 = _run(lambda: fn(docs1, emb1, part1))
        tk, rowsk = _run(lambda: fn(dk, embk, partk))
        results[name] = {
            "t1": round(t1, 2),
            "tk": round(tk, 2),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
            "rows1": rows1,
            "rowsk": rowsk,
        }

    print(json.dumps({"factor": k, "sf_dir": sf_dir, "ops": results}))


if __name__ == "__main__":
    main()
