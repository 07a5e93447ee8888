"""Sinks: hour-partitioned parquet (K1), partitioned append/overwrite
(K2/K3), partition registration (K9). MERGE sinks (K4/K5) live in
operators/merge.py; quarantine/DLQ (K6/K7) in operators/validate.py.

K1 reference parity: the WEB/CRM lambdas group records by
(year, month, day, hour) of the event/ingestion time and write one
snappy parquet file per partition per micro-batch (reference
src/streaming/WEB/services/lambda/transformation.py:131-168,
src/streaming/CRM/services/consumer/lambda_function.py:159-195).
In Spark that is one ``partitionBy`` write — the dynamic partition
insert handles grouping, and Hive-style ``year=YYYY/month=MM/...``
directories come out identical to the reference layout.

K9: with a Hive-style layout the catalog needs new partitions
registered (reference src/streaming/WEB/services/lambda/s3toathena.py:67-76
issues ALTER TABLE ADD PARTITION per hour). Spark-side, MSCK REPAIR
discovers them all — or skip the problem entirely by reading the path.

Scale: a partitioned write shuffles nothing by itself, but thousands of
tasks x thousands of hour-partitions would emit a file per (task,
partition) pair. `compact=True` repartitions by the partition columns
first so each hour lands as one file per shuffle partition — the
many-small-files killer at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.functions.timefn import (
    hour_partition_cols,
)

HOUR_PARTITION_KEYS = ("year", "month", "day", "hour")


def with_hour_partitions(df: DataFrame, ts_col: str) -> DataFrame:
    """Add zero-padded (year, month, day, hour) columns from ts_col."""
    cols = hour_partition_cols(ts_col)
    for name, col in cols.items():
        df = df.withColumn(name, col)
    return df


def write_hour_partitioned(
    df: DataFrame,
    ts_col: str,
    path: str,
    mode: str = "append",
    compact: bool = True,
) -> None:
    """K1 — land rows under year=/month=/day=/hour= of `ts_col`."""
    out = with_hour_partitions(df, ts_col)
    if compact:
        out = out.repartition(*[F.col(k) for k in HOUR_PARTITION_KEYS])
    out.write.mode(mode).partitionBy(*HOUR_PARTITION_KEYS).parquet(path)


def read_hour_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a K1 layout back; partition columns come back as columns
    and partition-key equality predicates prune directories (P14).

    Partition-type inference is disabled for the read so `month=07`
    stays the zero-padded STRING the reference's layout defines
    (inference would parse it to int 7). Keeping the raw partition
    column — rather than re-deriving a padded string with lpad — is
    what keeps filters on it eligible for pruning: a predicate on a
    derived expression never reaches the scan's PartitionFilters.
    """
    conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        # partition schema discovery happens eagerly here, so the conf
        # can be restored immediately (other tables keep typed
        # partition columns, e.g. DATE)
        return spark.read.option("basePath", path).parquet(path)
    finally:
        spark.conf.set(conf_key, prev)


def write_partitioned(
    df: DataFrame, path: str, partition_by: tuple[str, ...], mode: str = "append"
) -> None:
    """K2 (append) / K3 (overwrite) — date-partitioned table writes
    (reference transfom_pos.py:156-168)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def register_partitions(spark: SparkSession, table_name: str) -> None:
    """K9 — sync the catalog with on-disk Hive-style partitions.
    One statement replaces the reference's per-hour ALTER TABLE loop."""
    spark.sql(f"MSCK REPAIR TABLE {table_name}")


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed catalog table: co-locates rows by join/agg key at
    WRITE time so repeated equi-joins and groupBys on the bucket key
    read back shuffle-free — both sides of a bucketed⋈bucketed join
    (same key, same bucket count) skip their Exchange entirely, the
    pre-partitioning strategy for fact⋈fact joins too big to broadcast.
    Pinned by tests/test_partitioning.py::test_bucketed_join_elides_both_exchanges.

    `sort_cols` additionally sorts within buckets (sort-merge joins then
    skip the per-task sort as well).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
