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
    and partition-key predicates prune directories (P14).

    Spark's partition-type inference parses `year=2023` as int — cast
    back to the reference's zero-padded string form (`month="07"`) so
    round-trips are lossless. Pruning still works: Catalyst pushes
    equality predicates through the cast to the integer partition key.
    """
    df = spark.read.option("basePath", path).parquet(path)
    pads = {"year": 4, "month": 2, "day": 2, "hour": 2}
    for k in HOUR_PARTITION_KEYS:
        df = df.withColumn(k, F.lpad(F.col(k).cast("string"), pads[k], "0"))
    return df


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
