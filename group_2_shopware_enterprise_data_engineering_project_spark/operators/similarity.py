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


N_CENTROIDS = 16


def ivf_assign(emb: DataFrame, n_centroids: int = N_CENTROIDS) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest
    centroid by cosine (ties -> lowest centroid id).

    Centroids are the first `n_centroids` vectors by id — a
    deterministic, training-free quantizer (production would k-means a
    sample; the list-partitioning mechanics are identical). The
    centroid set broadcasts (n_centroids x dim floats), so assignment
    is a map-side crossJoin + per-vector argmin: the corpus never
    shuffles to get partitioned into lists.
    """
    centroids = F.broadcast(
        emb.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid_id"),
            _as_double(F.col("embedding")).alias("cv"),
        )
    )
    scored = (
        spread(emb)
        .select(F.col("vec_id"), _as_double(F.col("embedding")).alias("v"))
        .crossJoin(centroids)
        .select(
            "vec_id",
            "v",
            "centroid_id",
            (
                dot(F.col("v"), F.col("cv"))
                / (l2_norm(F.col("v")) * l2_norm(F.col("cv")))
            ).alias("c_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "v", "centroid_id")
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
) -> DataFrame:
    """IVF-flat ANN: probe the query's own centroid list (n_probe=1)
    and rank exact cosine within it.

    The scale shape: the corpus shuffles ONCE on centroid_id into
    inverted lists; each query touches ~N/n_centroids vectors instead
    of N. Recall tunes with n_probe (probe the p nearest lists) — the
    mechanics here are the n_probe=1 case.
    """
    assigned = ivf_assign(emb, n_centroids).persist()
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    queries = F.broadcast(
        assigned.filter(query_pred).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("centroid_id").alias("qc"),
        )
    )
    cands = (
        queries.join(assigned, F.col("qc") == assigned["centroid_id"])
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


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup stage
    of a training-data pipeline): SRP-LSH buckets -> same-bucket
    candidate pairs -> exact cosine >= threshold.

    One shuffle on the H-bit bucket key; near-identical vectors agree
    on every hyperplane sign with probability ~(1 - theta/pi)^H, so
    high-threshold pairs are rarely missed. Output ordered for
    determinism.
    """
    planes = hyperplane_signs(num_planes)
    bucketed = spread(emb).select(
        F.col("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
        lsh_bucket(_as_double(F.col("embedding")), planes).alias("bucket"),
    ).persist()
    pairs = (
        bucketed.alias("a")
        .join(
            bucketed.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (l2_norm(F.col("a.v")) * l2_norm(F.col("b.v")))
            ).alias("cos_sim"),
        )
    )
    return pairs.filter(F.col("cos_sim") >= threshold).orderBy("vec_a", "vec_b")


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
