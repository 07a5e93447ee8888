"""As-of (backward-looking point-in-time) join.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive Spark
spelling — equi-join on key plus `r.ts <= l.ts` then keep the max —
explodes quadratically per key (every left row pairs with ALL earlier
right rows before the reduction). This implementation is the
single-shuffle formulation instead:

    union(right-tagged, left-tagged)
      -> window partitionBy(key) orderBy(ts, tag)
      -> last(right-payload struct, ignoreNulls) fills forward
      -> keep left rows

One hash exchange + one sort, rows never multiply, and per-key memory
is O(1) beyond the sort (WindowExec streams UnboundedPreceding..
CurrentRow frames with running state). That is what survives a 100 TB
event log where hot keys have millions of rows on both sides.

No counterpart in the reference (its joins are equi-joins,
crm_transform.py loyalty join) — this is the temporal-join primitive a
feature/training pipeline needs for point-in-time-correct attribute
lookup (no leakage from future rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach ``payload_cols`` from the latest
    right row of the same key with ``right_ts <= left_ts`` (backward
    as-of, inclusive). Left rows with no prior right row are dropped
    (inner as-of, matching DuckDB's ASOF JOIN default).

    Ties on (key, right_ts) are resolved to the row with the greatest
    ``right_tiebreak`` so the result is deterministic; pass a unique
    column (e.g. the right table's primary key).

    The payload travels as ONE struct, so all attached columns come
    from the same matched right row — per-column forward fill would
    silently mix rows whenever a payload field is NULL.
    """
    lcols = left.columns
    payload_t = T.StructType([right.schema[c] for c in payload_cols])

    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        *(
            [F.col(right_tiebreak).alias("_tie")]
            if right_tiebreak
            else [F.lit(0).alias("_tie")]
        ),
        F.struct(*payload_cols).alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(0).alias("_tie"),
        F.lit(None).cast(payload_t).alias("_p"),
        *lcols,
    )

    # Right rows sort BEFORE left rows at equal ts (_src 0 < 1), so an
    # exactly-coincident right row is visible to the left row; among
    # equal-ts right rows the greatest tiebreak sorts last and wins the
    # forward fill.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_src").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).withColumn(
        "_p", F.last("_p", ignorenulls=True).over(w)
    )
    return (
        filled.filter((F.col("_src") == 1) & F.col("_p").isNotNull())
        .select(*lcols, *[F.col(f"_p.{c}").alias(c) for c in payload_cols])
    )
