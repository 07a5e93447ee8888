"""Embedding similarity search (ANN) over array<float> columns.

Two paths, per the standard ANN playbook:

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  query set, crossJoin the corpus, compute cosine with native
  higher-order array expressions (zip_with product + aggregate fold —
  JVM-side, no Python), rank per query with a window. O(|Q| x N) dot
  products; the right choice whenever |Q| is small, at any corpus
  size, because the corpus side never shuffles — it streams past the
  broadcast queries and only (query_id, neighbor_id, sim) survive.

- **Sign-random-projection LSH** (SimHash-for-vectors, Charikar 2002)
  — the scale path: H Rademacher hyperplanes (+-1 entries derived
  from md5, so fully deterministic and SQL-mirrorable), bucket =
  H-bit sign pattern; candidates share a bucket, then exact cosine
  verify + rank within candidates. The corpus shuffles once on the
  H-bit bucket key; recall tunes with H (and would use multi-probe /
  band OR-ing for production recall targets).

All math in double precision with a fixed left-to-right fold order so
results are bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.functions.partitioning import (
    spread,
)

NUM_PLANES = 8
DIM = 64


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def embedding_norms(emb: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return spread(emb).select(
        "vec_id", "label", l2_norm(v).alias("l2_norm")
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query vector (self excluded).

    Queries are broadcast; the corpus side is embarrassingly parallel.
    """
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    queries = F.broadcast(
        emb.filter(query_pred).select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
    )
    corpus = spread(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("nv"),
    )
    sims = (
        queries.crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("qv"), F.col("nv"))
                / (l2_norm(F.col("qv")) * l2_norm(F.col("nv")))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_signs(num_planes: int = NUM_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic Rademacher (+-1) hyperplanes: sign of component
    (p, d) = first hex digit of md5("p:d"). No RNG -> reproducible
    everywhere, including in SQL oracles."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "01234567" else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """H-bit sign-pattern bucket key, e.g. '01101001'."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(s) for s in row])
        d = dot(vec, plane)
        bits.append(F.when(d > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """ANN top-k within same-bucket candidates. Approximate: neighbors
    in other buckets are missed by design (recall ~ (1 - theta/pi)^H
    per Charikar's collision bound); determinism is exact."""
    planes = hyperplane_signs(num_planes)
    bucketed = spread(emb).select(
        F.col("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
        lsh_bucket(_as_double(F.col("embedding")), planes).alias("bucket"),
    )
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    queries = F.broadcast(
        bucketed.filter(query_pred).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("bucket").alias("qbucket"),
        )
    )
    cands = (
        queries.join(bucketed, queries["qbucket"] == bucketed["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qv"), F.col("v"))
                / (l2_norm(F.col("qv")) * l2_norm(F.col("v")))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def label_stats(emb: DataFrame) -> DataFrame:
    """Per-label corpus stats (count + norm extrema — order-independent
    aggregates only, so exactly reproducible)."""
    v = _as_double(F.col("embedding"))
    norms = emb.select("label", l2_norm(v).alias("n"))
    return (
        norms.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("n").alias("min_norm"),
            F.max("n").alias("max_norm"),
        )
        .orderBy("label")
    )
