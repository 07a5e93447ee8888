"""Multi-resolution time-series rollup cascade (hypertable-style
continuous aggregates).

The pattern behind TimescaleDB continuous aggregates / Druid rollups:
aggregate raw events once at the finest resolution, then derive each
coarser resolution FROM THE PREVIOUS ROLLUP, never from raw data. At
100 TB the raw table is scanned exactly once; the minute→hour→day
re-aggregations run over data that is already 3-6 orders of magnitude
smaller, and each cascade level is a map-side-combined groupBy on a
prefix of the previous level's key (bucket truncation is montone, so
a coarser bucket is a pure function of the finer bucket — no
re-reading raw timestamps).

Measures follow the exact-cents discipline (`analytics.sales_kpi`):
counts and integer cents sum associatively, so cascade == direct
recomputation bit-for-bit at every level — which is exactly what the
paired oracle proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _bucket(ts_col: str, seconds: int):
    s = F.lit(seconds).cast("long")
    return F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(ts_col)) / s) * s).cast("long")
    )


def rollup_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    resolutions: tuple[int, ...] = (60, 3600, 86400),
) -> DataFrame:
    """Cascading rollup of (count, exact-cents sum) at each resolution.

    ``resolutions`` must be ascending and each must divide the next
    (minute→hour→day), so every coarser bucket is a union of finer
    buckets and re-aggregation is lossless.

    Returns the union of all levels: (resolution_sec, bucket_start,
    n_events, total_value) with total_value reconstructed from exact
    cents.
    """
    for a, b in zip(resolutions, resolutions[1:]):
        if b % a != 0:
            raise ValueError(f"resolution {b} not a multiple of {a}")

    cents = F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5)).cast("long")
    finest = resolutions[0]
    level = events.groupBy(_bucket(ts_col, finest).alias("bucket_start")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(cents).alias("value_cents"),
    )
    # materialize each level before it branches (into the output union
    # AND the next coarser aggregation) — without this, Catalyst
    # re-derives every union branch from the raw scan, turning the
    # "scan raw once" cascade into k full scans + k-1 redundant
    # re-aggregations. A persisted minute level is orders of magnitude
    # smaller than raw; production continuous aggregates write it to a
    # table, which is the same trade expressed durably.
    # Cache lifetime is DELIBERATELY the returned plan's lifetime (not
    # released in-function): the result IS the union of the cached
    # levels, eager materialization would hide the single-raw-scan
    # plan shape tests/test_plans.py pins, and the levels are
    # aggregate-sized. ContextCleaner reclaims them when the plan is
    # dropped.
    level = level.persist(StorageLevel.MEMORY_AND_DISK)

    out = level.withColumn("resolution_sec", F.lit(finest).cast("long"))
    for res in resolutions[1:]:
        s = F.lit(res).cast("long")
        # re-bucket the PREVIOUS level, not the raw events
        level = level.groupBy(
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp(F.col("bucket_start")) / s) * s).cast("long")
            ).alias("bucket_start")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        out = out.unionByName(
            level.withColumn("resolution_sec", F.lit(res).cast("long"))
        )

    return out.select(
        "resolution_sec",
        "bucket_start",
        "n_events",
        (F.col("value_cents").cast("double") / F.lit(100.0)).alias("total_value"),
    )
