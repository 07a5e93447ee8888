"""Entity resolution: blocked candidate-pair generation with edit-
distance verification.

The all-pairs similarity join is O(n²) and never survives scale; the
standard ER answer is *blocking*: hash every record to one or more
cheap blocking keys, self-join only within a block, and verify the
expensive similarity (here Levenshtein) on the candidates only. The
join is then a plain equi-join on the blocking key — shuffle-
partitioned, AQE-skew-handled — and the pair count is Σ |block|²
instead of n².

Oversized blocks (a degenerate key that captures half the table) are
excluded by ``max_block`` instead of silently exploding: production
systems re-block those records with a finer key; here exclusion is
explicit, deterministic, and mirrored by the oracle, so the contract
is visible rather than an OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocking_key(name_col: str):
    """First token + first character of the last token + token count.
    Multi-feature blocking keeps blocks small (quadratic verify cost)
    at a known recall trade-off: candidates differing in the last
    token's initial are missed — the standard remedy is a second pass
    with a complementary key. Swap for soundex/prefix-qgrams per
    domain."""
    c = F.col(name_col)
    toks = F.filter(F.split(c, " "), lambda t: t != F.lit(""))
    return F.concat_ws(
        "|",
        F.element_at(toks, 1),
        F.substring(F.element_at(toks, -1), 1, 1),
        F.size(toks).cast("string"),
    )


def blocked_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 3,
    max_block: int = 1000,
) -> DataFrame:
    """Candidate duplicate pairs: same blocking key, Levenshtein
    distance <= ``max_distance``, each unordered pair emitted once
    (id_a < id_b).

    Levenshtein runs ONLY on within-block candidates — it is the
    verify step, never the generate step. Both Spark and DuckDB
    implement the standard unit-cost edit distance, so the oracle is
    exact.
    """
    keyed = records.select(
        F.col(id_col).cast("long").alias("rid"),
        F.col(name_col).alias("rname"),
        blocking_key(name_col).alias("bkey"),
    )
    # left_semi against the small-enough blocks; Catalyst picks
    # broadcast vs shuffle by the (bkey,count) table's actual size
    sizes = keyed.groupBy("bkey").agg(F.count(F.lit(1)).alias("bsize"))
    bounded = keyed.join(
        sizes.filter(F.col("bsize") <= max_block).select("bkey"),
        "bkey",
        "left_semi",
    )
    left = bounded.select(
        "bkey", F.col("rid").alias("id_a"), F.col("rname").alias("name_a")
    )
    right = bounded.select(
        "bkey", F.col("rid").alias("id_b"), F.col("rname").alias("name_b")
    )
    return (
        left.join(right, "bkey")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "bkey", "distance")
    )
