"""Train/eval contamination detection — the decontamination stage of
an LLM training-data pipeline (the verbatim-overlap check described in
the GPT-3 appendix and most benchmark-hygiene writeups: a train doc is
contaminated if it shares any k-token n-gram with the eval set).

Beyond-reference operator (the reference's pipelines stop at KPI
aggregation); built from the same shingle primitives as the MinHash
dedup family (operators/text.py, operators/minhash.py).

Scale shape: the eval side of the join is a benchmark suite — a few
million n-grams at most, orders of magnitude smaller than a 100 TB
corpus — so its distinct n-gram digests BROADCAST and the corpus-side
probe is a map-side hash semi-join: the corpus never shuffles, never
materializes its exploded n-grams past the probe, and the only thing
that survives is (doc_id, hit) pairs for the per-doc rollup. For an
eval set too big to broadcast, `broadcast_eval=False` falls back to a
digest-keyed shuffle join (still digests, never text). n-grams join on
md5 digests, not raw strings, so row width is bounded regardless of
k — and md5 keeps every stage expressible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.functions.partitioning import (
    spread,
)
from group_2_shopware_enterprise_data_engineering_project_spark.operators.text import (
    shingles,
    tokens,
)


def eval_ngram_digests(
    eval_docs: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Distinct md5 digests of every k-token n-gram in the eval set —
    the (small) probe side of the contamination join."""
    return (
        eval_docs.select(F.explode(shingles(tokens(text_col), k)).alias("ngram"))
        .select(F.md5("ngram").alias("ngram_md5"))
        .distinct()
    )


def contamination_report(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-train-doc overlap with the eval n-gram set: docs with at
    least one verbatim k-gram hit, with hit counts and the contaminated
    fraction of the doc's n-grams (the usual drop/keep signal).

    Output: (doc_id, n_shingles, n_overlap, contamination_ratio).
    """
    evals = eval_ngram_digests(eval_docs, text_col, k)
    if broadcast_eval:
        evals = F.broadcast(evals)
    sh = spread(train_docs).select(
        F.col(id_col).alias("doc_id"),
        shingles(tokens(text_col), k).alias("shingles"),
    )
    exploded = sh.select(
        "doc_id",
        F.size("shingles").cast("long").alias("n_shingles"),
        F.explode("shingles").alias("ngram"),
    ).select("doc_id", "n_shingles", F.md5("ngram").alias("ngram_md5"))
    return (
        exploded.join(evals, "ngram_md5")
        .groupBy("doc_id")
        .agg(
            F.max("n_shingles").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_shingles")).alias(
                "contamination_ratio"
            ),
        )
    )
