"""Time normalization column expressions.

All native Column expressions (JVM-side, codegen'd) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Epochs above this are interpreted as milliseconds. Matches the
# reference's autodetect (reference:
# src/streaming/WEB/services/lambda/transformation.py:37-49 — ">1e11 => ms").
MS_EPOCH_THRESHOLD = 1e11


def epoch_to_timestamp(col: Column | str, truncate_to_second: bool = False) -> Column:
    """Float epoch (seconds OR milliseconds, autodetected) -> timestamp.

    Reference behavior: transformation.py:37-49 (web),
    inventory_transform.py:403-406, transfom_pos.py:116,
    lambda_function.py:110-114 (crm).
    """
    c = F.col(col) if isinstance(col, str) else col
    secs = F.when(c > F.lit(MS_EPOCH_THRESHOLD), c / F.lit(1000.0)).otherwise(c)
    if truncate_to_second:
        # Integer-second semantics: deterministic across engines (no
        # float microsecond rounding).
        return F.timestamp_seconds(F.floor(secs).cast("long"))
    return F.timestamp_seconds(secs)


def derive_date(ts_col: Column | str) -> Column:
    """timestamp -> date (reference inventory_transform.py:407-410,
    transfom_pos.py:117)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.to_date(c)


def hour_partition_cols(ts_col: Column | str) -> dict[str, Column]:
    """Hive-style (year, month, day, hour) partition columns from an
    event-time column — the K1 hour-partitioned layout (reference
    transformation.py:163-166, lambda_function.py:163-167).

    Zero-padded strings to match the reference's `year=2025/month=07/...`
    directory names (s3toathena.py:58-60 zfill(2)).
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return {
        "year": F.date_format(c, "yyyy"),
        "month": F.date_format(c, "MM"),
        "day": F.date_format(c, "dd"),
        "hour": F.date_format(c, "HH"),
    }
