"""Dedup operators (exact forms — approximate text dedup lives in
minhash.py).

Reference parity:
- D1 full-row distinct: transfom_pos.py:118 (dropDuplicates on POS rows)
- W1/D2 keep-latest by key: inventory_transform.py:483-484
  (row_number OVER (PARTITION BY inventory_id ORDER BY last_updated DESC))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_rows(df: DataFrame) -> DataFrame:
    """D1 — full-row distinct. Hash aggregation on all columns: partial
    dedup map-side, one shuffle on the row hash."""
    return df.dropDuplicates()


def keep_latest(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_col: str,
    *tiebreak_desc_cols: str,
) -> DataFrame:
    """W1 — keep the latest record per key (ranking window, rank 1).

    Tiebreak columns make the result deterministic when order_col ties
    (the reference relies on arbitrary tie order; an oracle can't).
    Single shuffle on the key; at scale prefer this over
    groupBy+max+self-join (one shuffle instead of two).
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_desc_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
