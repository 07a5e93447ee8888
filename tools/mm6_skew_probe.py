"""Skew probe for mm6's negative-pool construction (r7 VERDICT item 4).

The r7 shape ranked every document of a language inside ONE task
(`row_number() OVER (PARTITION BY lang)`) before the pool-size cut —
on a corpus where one language is 80% of 100 TB that is a
single-reducer sort. The r8 shape is a salted two-stage top-k: rank
within (lang, salt), keep pool-size per salt, re-rank the bounded
union (identical results — the global per-lang top-k is a subset of
the per-salt top-k union).

This probe synthesizes a corpus whose hot language holds N rows (the
sf0.1 documents table is only 5k docs — far too small for a
single-task sort to register; skew is a volume phenomenon, so the
probe generates volume directly with spark.range) plus 4 small
languages, and times pool construction under both shapes at N and
k*N hot rows. PASS criterion: the two-stage pool cost grows like the
parallel scan (flat-ish wall on fixed cores) while the single-stage
shape degrades with the hot language's size (one task sorts all of
it).

Usage: python tools/mm6_skew_probe.py [k=8] [base_n=1000000]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
POOL = 3
N_SALTS = 16


def pool_two_stage(cand: DataFrame) -> DataFrame:
    w_pre = Window.partitionBy("lang", "salt").orderBy("h", "neg_id")
    pre = (
        cand.withColumn("salt", F.pmod(F.xxhash64("neg_id"), F.lit(N_SALTS)))
        .withColumn("r", F.row_number().over(w_pre))
        .filter(F.col("r") <= POOL)
        .drop("salt", "r")
    )
    w = Window.partitionBy("lang").orderBy("h", "neg_id")
    return (
        pre.withColumn("pool_rank", F.row_number().over(w))
        .filter(F.col("pool_rank") <= POOL)
    )


def pool_single_stage(cand: DataFrame) -> DataFrame:
    w = Window.partitionBy("lang").orderBy("h", "neg_id")
    return (
        cand.withColumn("pool_rank", F.row_number().over(w))
        .filter(F.col("pool_rank") <= POOL)
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    base_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("mm6-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def skewed(mult: int) -> DataFrame:
        hot = spark.range(base_n * mult).select(
            F.lit("hot").alias("lang"), F.col("id").alias("neg_id")
        )
        cold = spark.range(2_000).select(
            F.concat(F.lit("l"), (F.col("id") % 4).cast("string")).alias(
                "lang"
            ),
            (F.col("id") + 1_000_000_000).alias("neg_id"),
        )
        return hot.unionByName(cold).withColumn(
            "h", F.md5(F.concat(F.lit("neg:"), F.col("neg_id").cast("string")))
        )

    def run(label: str, fn, cand: DataFrame) -> float:
        t0 = time.monotonic()
        n = fn(cand).count()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.2f}s ({n} pool rows)", flush=True)
        return dt

    for shape_name, fn in (("two-stage", pool_two_stage), ("single-stage", pool_single_stage)):
        # warmup then interleave 1x / kx, 2 reps each
        run(f"warmup {shape_name}", fn, skewed(1))
        for rep in range(2):
            t1 = run(f"{shape_name} 1x  ({base_n} hot rows) rep{rep}", fn, skewed(1))
            tk = run(f"{shape_name} {k}x hot lang rep{rep}", fn, skewed(k))
            print(f"  -> {shape_name} ratio {tk / t1:.2f}x", flush=True)


if __name__ == "__main__":
    main()
