"""Lossless salt-split self-join: THE bounded-reducer pattern for
bucketed candidate generation, shared by every near-dup family
(embedding SRP buckets, semdedup clusters, MinHash band buckets).

A bucket of n > cap rows hashes its members into s = ceil(n/cap)
groups; each row is replicated into one task row per sub-task it
participates in — task (min(g, t), max(g, t)) for t in 0..s-1 — and
the self-join matches rows only within the same (bucket, i, j) task
with a canonical orientation, so:

  - every same-bucket pair meets in EXACTLY one task (the pair with
    groups (ga, gb) meets in task (min, max); same-group pairs order
    by id) — the pair SET is identical to the unsalted join;
  - no reducer ever materializes more than ~cap^2 candidates,
    regardless of skew (AQE skew-join only re-schedules partitions;
    it cannot bound join OUTPUT volume).

Buckets at or under the cap have s = 1 and degenerate to the plain
self-join row — the salt costs nothing on well-behaved data.

One implementation on purpose: the orientation clauses
(a._g == a._i, b._g == b._j, the i==j id-order tiebreak) are the
subtle part of the algebra, and three near-identical copies of them
had begun to accrete across the dedup operators.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_pair_tasks(
    bucketed: DataFrame,
    bucket_cap: int,
    bucket_cols: tuple[str, ...] = ("bucket",),
    id_col: str = "vec_id",
) -> DataFrame:
    """Explode each bucket's rows into self-join sub-task assignments
    (adds ``_g``, ``_i``, ``_j``).

    Bucket sizes come from a map-side-combined groupBy restricted to
    OVERSIZED buckets, broadcast back onto the rows — NOT from a
    ``count() over (partition by bucket)`` window. The window version
    full-row-shuffles and sorts every bucket row before the join (and
    a self-join evaluates that subtree once per side unless the
    exchange is reused); the agg shuffles only (bucket, count) pairs
    after partial aggregation, and the oversized list is tiny by
    construction (each entry represents > cap rows, so there are at
    most n/cap of them — broadcastable at any scale). Well-behaved
    buckets join against an empty broadcast and keep ``_s = 1``: the
    salt costs one scan of a 0-row side.

    NULL bucket keys: the broadcast join (like the downstream pair
    self-join) never matches NULL keys, so NULL-bucket rows keep
    ``_s = 1`` unsalted — harmless, because the pair join's equality
    condition can never pair them either."""
    oversized = (
        bucketed.groupBy(*[F.col(c) for c in bucket_cols])
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > bucket_cap)
        .select(
            *bucket_cols,
            F.ceil(F.col("_n") / F.lit(bucket_cap)).cast("int").alias("_s_over"),
        )
    )
    sized = bucketed.join(
        F.broadcast(oversized), list(bucket_cols), "left"
    ).withColumn("_s", F.coalesce(F.col("_s_over"), F.lit(1))).drop("_s_over")
    return (
        sized.withColumn("_g", F.pmod(F.xxhash64(id_col), F.col("_s")).cast("int"))
        .withColumn("_t", F.explode(F.sequence(F.lit(0), F.col("_s") - 1)))
        .withColumn("_i", F.least("_g", "_t"))
        .withColumn("_j", F.greatest("_g", "_t"))
        .drop("_t", "_s")
    )


def salted_join_cond(
    bucket_cols: tuple[str, ...], id_col: str
) -> Column:
    """Join condition over ``a``/``b`` aliases of a `salted_pair_tasks`
    frame: same bucket + same task, a in the i-group role, b in the
    j-group role, same-group tasks ordered by id — each pair meets
    exactly once."""
    cond = reduce(
        operator.and_,
        (F.col(f"a.{c}") == F.col(f"b.{c}") for c in bucket_cols),
    )
    return (
        cond
        & (F.col("a._i") == F.col("b._i"))
        & (F.col("a._j") == F.col("b._j"))
        & (F.col("a._g") == F.col("a._i"))
        & (F.col("b._g") == F.col("b._j"))
        & (
            (F.col("a._i") != F.col("a._j"))
            | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
    )


def salted_pair_join(
    tasks: DataFrame,
    bucket_cols: tuple[str, ...] = ("bucket",),
    id_col: str = "vec_id",
) -> DataFrame:
    """Self-join a `salted_pair_tasks` frame under `salted_join_cond`;
    callers select their pair columns via the ``a.``/``b.`` aliases."""
    a, b = tasks.alias("a"), tasks.alias("b")
    return a.join(b, salted_join_cond(bucket_cols, id_col))
