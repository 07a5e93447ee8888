"""Row-transform operators (P8-P13) as native column expressions.

Reference equivalents are row-at-a-time Python in Glue/Lambda; here
each is a single projection — map-side only, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from group_2_shopware_enterprise_data_engineering_project_spark.functions.timefn import (
    derive_date,
    epoch_to_timestamp,
)


def enforce_schema(df: DataFrame, schema: T.StructType, strict: bool = False) -> DataFrame:
    """P8 — project to the declared schema and cast every column
    (reference inventory_validate.py:227-236: cast all columns to
    expected dtypes). Unknown columns are dropped (logged-and-ignored
    semantics, inventory_validate.py:222-225); missing ones become
    typed NULLs unless strict.
    """
    out = []
    for field in schema.fields:
        if field.name in df.columns:
            out.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif strict:
            raise ValueError(f"missing required column {field.name!r}")
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*out)


def extra_columns(df: DataFrame, schema: T.StructType) -> list[str]:
    """P2 — columns present in the data but not the declared schema;
    the reference routes such rows to a separate sink (api.py:125-135)."""
    declared = {f.name for f in schema.fields}
    return [c for c in df.columns if c not in declared]


def normalize_epoch(
    df: DataFrame,
    epoch_col: str,
    ts_col: str = "event_time",
    date_col: str | None = None,
    truncate_to_second: bool = False,
) -> DataFrame:
    """P9 + P10 — epoch float (s or ms, autodetected at 1e11) ->
    timestamp, plus optional derived date column (reference
    transformation.py:37-49, inventory_transform.py:403-410)."""
    df = df.withColumn(ts_col, epoch_to_timestamp(epoch_col, truncate_to_second))
    if date_col:
        df = df.withColumn(date_col, derive_date(ts_col))
    return df


def extract_partition_keys(df: DataFrame, path_col: str) -> DataFrame:
    """P13 — regex-extract hive partition keys from a path string
    (reference s3toathena.py:44-60: year=(\\d{4})/month=(\\d{2})/...)."""
    return (
        df.withColumn("year", F.regexp_extract(F.col(path_col), r"year=(\d{4})", 1))
        .withColumn("month", F.regexp_extract(F.col(path_col), r"month=(\d{2})", 1))
        .withColumn("day", F.regexp_extract(F.col(path_col), r"day=(\d{2})", 1))
        .withColumn("hour", F.regexp_extract(F.col(path_col), r"hour=(\d{2})", 1))
    )


def extract_date_from_filename(df: DataFrame, name_col: str) -> DataFrame:
    """P13 — date from `pos_YYYYMMDD_HHMMSS.csv`-style filenames
    (reference transfom_pos.py:80-87)."""
    raw = F.regexp_extract(F.col(name_col), r"_(\d{8})_", 1)
    return df.withColumn(
        "file_date", F.to_date(raw, "yyyyMMdd")
    )


def stamp_ingestion_time(df: DataFrame, fixed: str | None = None) -> DataFrame:
    """P12 — add ingestion_time to every row of the batch (reference
    lambda_function.py:266-268). `fixed` pins the stamp for
    deterministic tests; production uses the batch wall clock."""
    col = F.lit(fixed).cast("timestamp") if fixed else F.current_timestamp()
    return df.withColumn("ingestion_time", col)
