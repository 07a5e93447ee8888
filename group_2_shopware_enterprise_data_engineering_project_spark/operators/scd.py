"""Slowly-changing-dimension (SCD Type 2) history builder.

Turns a change log (one row per observed attribute state per key)
into validity-interval history rows — the dimension format that
`asof.asof_join` and point-in-time training joins consume. The
inverse pair matters for ML data too: feature stores are SCD2 tables,
and label leakage is exactly a join against is_current instead of the
interval containing the example's timestamp.

Scale shape: one shuffle on the key; both window passes (change
collapse, interval close) share the same (key, ts, tiebreak)
partitioning+ordering, so Catalyst plans a single Exchange + Sort.
Per-task memory is one key's sorted run — the sessionization bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """(key, attrs, valid_from, valid_to, is_current) history from a
    change log.

    Consecutive rows with identical attributes collapse (a no-op
    "change" must not split an interval — null-safe struct equality,
    so NULL attribute values compare stable). ``valid_to`` is the next
    change's ``valid_from`` (half-open intervals, the as-of-join
    convention); the latest row per key has valid_to NULL and
    is_current true. ``tiebreak_col`` must be unique within
    (key, ts) so same-timestamp changes order deterministically.
    """
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    collapsed = (
        changes.withColumn("_prev", F.lag(attrs).over(w))
        .filter(F.col("_prev").isNull() | ~attrs.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    hist = (
        collapsed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return hist.select(
        key_col, *attr_cols, "valid_from", "valid_to", "is_current"
    )
