"""Interval (range) join without an equi-key, made shuffle-joinable by
time binning.

Spark has no native interval join: ``points JOIN intervals ON start <=
ts AND ts < end`` with no equality conjunct plans as a nested-loop
join (BroadcastNestedLoopJoin when one side is small, else a cartesian
product) — a scale-killer the moment both sides are large. The
standard fix (used by every stream processor's interval join and by
Spark's own range-join hints in closed-source forks) is to
discretize time into fixed bins, explode each interval into the bins
it covers, tag each point with its single containing bin, and
equi-join on the bin id — a plain hash/sort-merge join that
hash-partitions both sides, followed by the exact range predicate as
a cheap post-join filter.

Correctness: bins partition the timeline, a point lives in exactly one
bin, and an interval is replicated into every bin it overlaps — so
every true (point, interval) pair meets in the point's bin exactly
once. No dedup step is needed.

Scale shape: replication factor per interval is
``ceil(len/bin) + 1`` — pick ``bin_seconds`` near the typical interval
length so the factor stays ~2. The join shuffles (bin_id) on both
sides; skewed bins (a hot hour) are ordinary join skew handled by AQE
skew-join splitting, because the bin id is the join key, not a
payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
) -> DataFrame:
    """INNER-join each point row to every interval row with
    ``start <= point_ts < end``, via an equi-join on time bins.

    Inner only by design: the exact range predicate is applied as a
    post-join filter, which would drop an outer join's null-extended
    rows (and the replicated bin key would duplicate unmatched rows
    per bin) — outer semantics need anti-join recombination, not a
    ``how=`` passthrough.

    Column name collisions between the two inputs are the caller's
    responsibility (select/alias before calling).
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    b = F.lit(bin_seconds).cast("long")

    pts = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / b).cast("long")
    )
    # empty/inverted intervals ([end <= start]) contain no points by the
    # half-open definition — drop them BEFORE the bin explode, where
    # F.sequence(start_bin > end_bin) would error out the whole job
    intervals = intervals.where(F.col(start_col) < F.col(end_col))
    ivs = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                # end is exclusive: an interval ending exactly on a bin
                # boundary does not reach into that bin
                F.floor((F.unix_timestamp(F.col(end_col)) - 1) / b).cast("long"),
            )
        ),
    )
    joined = pts.join(ivs, "_bin", "inner").where(
        (F.col(start_col) <= F.col(point_ts)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
) -> DataFrame:
    """INNER-join interval rows to interval rows on half-open overlap
    (``ls < re AND rs < le``) via the same time-binning trick as
    `interval_join_binned` — without it, an inequality-only join plans
    as a nested loop / cartesian product.

    Both sides explode into the bins they cover, equi-join on the bin,
    then keep a surviving pair ONLY in its canonical bin — the bin
    containing ``max(ls, rs)`` (the later start). For a genuinely
    overlapping pair that instant lies inside BOTH intervals, so both
    sides cover its bin and the pair survives there exactly once; no
    distinct() over the pair blowup is ever needed. Replication factor
    per row is ``ceil(len/bin) + 1`` — pick bin_seconds near the
    typical interval length. Skewed bins are ordinary join-key skew
    (AQE-splittable), never a payload problem.

    Column collisions are the caller's responsibility (alias first).
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    b = F.lit(bin_seconds).cast("long")

    def _bins(df: DataFrame, s: str, e: str) -> DataFrame:
        df = df.where(F.col(s) < F.col(e))
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / b).cast("long"),
                    F.floor((F.unix_timestamp(F.col(e)) - 1) / b).cast("long"),
                )
            ),
        )

    ls, le = F.col(left_start), F.col(left_end)
    rs, re = F.col(right_start), F.col(right_end)
    later_start = F.greatest(F.unix_timestamp(ls), F.unix_timestamp(rs))
    return (
        _bins(left, left_start, left_end)
        .join(_bins(right, right_start, right_end), "_bin", "inner")
        .where(
            (F.unix_timestamp(ls) < F.unix_timestamp(re))
            & (F.unix_timestamp(rs) < F.unix_timestamp(le))
            & (F.col("_bin") == F.floor(later_start / b).cast("long"))
        )
        .drop("_bin")
    )
