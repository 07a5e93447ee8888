"""Size-gated join hints.

A hard-coded ``F.broadcast`` on a dimension frame whose cardinality
grows with the dataset (customer, part, supplier, a distinct-key
aggregate) is a scale bug: the hint bypasses Spark's
``autoBroadcastJoinThreshold`` size checks entirely, so a frame that
is kilobytes at test scale becomes a driver/executor OOM (or trips
the 8 GiB broadcast hard cap) at the 100 TB design point.

``broadcast_if_small`` is the dataset-frame replacement for a bare
hint, on the same measured-bytes idiom as
``MergeOnReadTable.read`` (merge.py — tombstone broadcast gated on
``broadcast_max_bytes``), generalized to any DataFrame via Catalyst's
own size estimate:

- below the gate: the hint is applied — the join compiles straight to
  a broadcast join with no runtime dependency;
- above the gate (or when the estimate is unknown, which Catalyst
  reports as a huge default): the frame is returned UNhinted and the
  strategy is left to the optimizer — AQE's runtime size statistics
  still convert the join to broadcast when the built side truly fits,
  so nothing is lost at small scale and nothing OOMs at large scale.

The estimate is ``optimizedPlan().stats().sizeInBytes()`` — a
metadata probe (file sizes x column pruning for scans, propagated
child sizes for filters — deliberately conservative: a filtered dim
inherits its parent's size), never a job.

Unconditional ``F.broadcast`` remains correct ONLY for provably
bounded frames: models, centroids, codebooks, per-source caps,
carry/catalog frames whose cardinality is fixed by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BROADCAST_MAX_BYTES = 10 << 20  # Spark's own auto-threshold default


def estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the frame's optimized plan, in
    bytes. Pure metadata — no job is triggered. Unknown sizes come
    back as Catalyst's defaultSizeInBytes (effectively +inf), which
    the gate treats as "too big to force"."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def broadcast_if_small(
    df: DataFrame, max_bytes: int = DEFAULT_BROADCAST_MAX_BYTES
) -> DataFrame:
    """Apply ``F.broadcast`` only when Catalyst estimates the frame at
    or below ``max_bytes``; otherwise return the frame unhinted and
    let AQE's runtime statistics pick the join strategy."""
    if estimated_plan_bytes(df) <= max_bytes:
        return F.broadcast(df)
    return df
