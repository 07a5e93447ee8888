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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    right_tiebreak: str | None = None,
    bucket_sec: int = 86400,
) -> DataFrame:
    """`asof_join` with bounded per-task memory: identical semantics,
    different physical shape for HOT keys.

    The plain formulation sorts each key's ENTIRE history in one task —
    a key with 10^8 rows is one 10^8-row sort spill. Here rows
    partition by (key, time-bucket) so a task sorts only one bucket of
    one key, and match information crosses buckets through a per-
    (key, bucket) summary table that is smaller than the data by the
    bucket size:

      1. forward-fill WITHIN each (key, bucket)         [big shuffle 1]
      2. per (key, bucket): last right row, as a one-row summary
         (reuses the same partitioning — no new exchange)
      3. carry: for each bucket, the last summary of any EARLIER
         bucket (window over summaries — rows per key = #buckets,
         tiny)                                          [small shuffle]
      4. join carry back on (key, bucket), coalesce local fill with
         carry-in                                       [small shuffle]

    Buckets with only left rows still get their carry because step 2
    emits a (payload-less) summary row for every occupied bucket, not
    just right-occupied ones. Choose ``bucket_sec`` so one key's rows
    per bucket fit a task sort (e.g. a day of a hot user's events).
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
    u = r.unionByName(l).withColumn(
        "_b", F.floor(F.unix_timestamp("_t") / F.lit(bucket_sec))
    )

    # 1. local forward fill inside (key, bucket)
    w_local = (
        Window.partitionBy("_k", "_b")
        .orderBy(F.col("_t").asc(), F.col("_src").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_p_local", F.last("_p", ignorenulls=True).over(w_local))

    # 2. one summary row per OCCUPIED (key, bucket): the last right
    # row's payload, or NULL if the bucket has no right rows. max() of
    # an ordering struct picks "last by (_t, _tie)" without a sort.
    summaries = u.groupBy("_k", "_b").agg(
        F.max(
            F.when(
                F.col("_p").isNotNull(), F.struct("_t", "_tie", "_p")
            )
        )["_p"].alias("_bucket_last")
    )

    # 3. carry-in per bucket: last summary of any strictly-earlier bucket
    w_carry = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.withColumn(
        "_carry", F.last("_bucket_last", ignorenulls=True).over(w_carry)
    ).select("_k", "_b", "_carry")

    # 4. resolve: local fill wins inside the bucket, else carry-in
    filled = u.join(carry, ["_k", "_b"]).withColumn(
        "_p_fin", F.coalesce(F.col("_p_local"), F.col("_carry"))
    )
    return (
        filled.filter((F.col("_src") == 1) & F.col("_p_fin").isNotNull())
        .select(*lcols, *[F.col(f"_p_fin.{c}").alias(c) for c in payload_cols])
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    tolerance_sec: int,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """`asof_join` with a match-freshness bound — pandas
    ``merge_asof(tolerance=...)`` semantics: the latest prior right row
    still wins, but the pair is DROPPED (not replaced by an older row)
    when it is staler than ``tolerance_sec`` — the attribution-window
    rule ("credit the last touch, but only within 30 minutes").

    Implemented as the plain as-of join with the matched ``right_ts``
    carried through the payload struct and one exact integer filter on
    epoch microseconds — no extra shuffle, no float time math. The
    matched timestamp column is emitted (as ``matched_ts``) so
    downstream audits can see HOW stale each surviving match was.
    """
    if right_ts == left_ts or right_ts in left.columns:
        raise ValueError(
            f"right_ts {right_ts!r} collides with a left column — rename "
            "the right timestamp before the call (the matched timestamp "
            "must survive next to the left one for the freshness filter)"
        )
    carried = tuple(dict.fromkeys((*payload_cols, right_ts)))
    out = asof_join(
        left,
        right,
        left_key,
        right_key,
        left_ts,
        right_ts,
        carried,
        right_tiebreak=right_tiebreak,
    )
    age_us = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))
    return (
        out.filter(age_us <= F.lit(int(tolerance_sec) * 1_000_000))
        .withColumnRenamed(right_ts, "matched_ts")
    )
