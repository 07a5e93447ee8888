"""Stream-stream joins and watermarked streaming dedup.

Completes the streaming operator family (ST1-ST9): correlating two
live streams (clicks->purchases attribution, order->shipment
matching) and bounded-state duplicate suppression.

State-size discipline — the thing that decides whether these survive
a week of uptime on a real cluster: every construct here REQUIRES a
watermark and a time-bounded join condition, so Spark can evict
state. An unbounded stream-stream join (no watermark, or no time
bound in the condition) accumulates every row ever seen on both
sides; Spark accepts it and then dies days later. These helpers make
the bounds mandatory arguments instead of optional conventions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    watermark_delay: str,
    within_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equi-keys plus the time bound

        left_ts <= right_ts < left_ts + within_seconds

    Both sides get ``watermark_delay`` watermarks; together with the
    interval condition this lets Spark evict join state older than
    watermark + within_seconds — per-key state is bounded by the rate
    within the window, not the stream's lifetime.

    Column ownership: key columns are kept from the left side; both
    timestamp columns survive (they differ by name).
    """
    if not on:
        raise ValueError("stream-stream join requires at least one equi-key")
    if within_seconds <= 0:
        raise ValueError("within_seconds must be positive")
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    lt, rt = F.col(left_ts), F.col(right_ts)
    # The bound must be a LITERAL interval: for outer joins Spark's
    # state-watermark analysis (StreamingJoinHelper) has to extract a
    # numeric bound from the range condition to know when an unmatched
    # row can be emitted, and it cannot fold make_dt_interval(...) —
    # inner joins accept it, leftOuter rejects the whole join.
    cond = (lt <= rt) & (
        rt < lt + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
    )
    for k in on:
        cond = cond & (lw[k] == rw[k])
    joined = lw.join(rw, cond, how)
    # drop the right-side duplicates of the equi-keys
    for k in on:
        joined = joined.drop(rw[k])
    return joined


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    watermark_delay: str,
) -> DataFrame:
    """Keep the first arrival per key among rows whose event times fall
    within the watermark horizon: ``dropDuplicatesWithinWatermark``
    evicts each key's dedup state once the watermark passes it —
    bounded state, unlike a plain streaming ``dropDuplicates`` whose
    key set grows forever. A duplicate arriving later than the delay
    is re-admitted; pick the delay to cover the source's real replay
    window (at-least-once producers re-deliver within minutes, not
    days).
    """
    if not keys:
        raise ValueError("dedup requires at least one key column")
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
