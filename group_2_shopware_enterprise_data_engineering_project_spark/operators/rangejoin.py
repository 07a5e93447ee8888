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
hash-partitions both sides, followed by the exact range predicate
OVER THE RAW COLUMNS as a cheap post-join filter.

Bin ids come from ``unix_timestamp()`` (whole seconds); raw timestamps
may carry sub-second precision. Truncation is safe for BINNING because
it is monotone — ``s <= t`` implies ``trunc(s) <= trunc(t)`` — so an
interval's truncated bin range always covers the truncated bin of any
instant inside it, PROVIDED the end bin is ``floor(trunc(end)/bin)``
(not ``floor((trunc(end)-1)/bin)``: an interval ending at 10.5s still
reaches into second 10, which the ``-1`` form would drop). The cost of
the inclusive end bin is at most one extra candidate bin per interval,
discarded by the exact raw-column predicate. Truncation is NEVER used
in the final predicate — comparing truncated seconds there would
silently drop sub-second overlaps (e.g. [10.2s,10.9s) vs [10.5s,11s)).

Correctness (point form): bins partition the timeline, a point lives
in exactly one bin, and an interval is replicated into every bin its
truncated range covers — so every true (point, interval) pair meets in
the point's bin exactly once. No dedup step is needed.

Scale shape: replication factor per interval is
``<= len/bin + 2`` — pick ``bin_seconds`` near the typical interval
length so the factor stays ~2. The join shuffles (bin_id) on both
sides; skewed bins are ordinary join-key skew. AQE skew-join can SPLIT
an oversized bin's task but cannot SHRINK a quadratic pair set: a
single hot bin holding B rows on both sides is a B x B task. The
``salt``/``hot_threshold`` knobs on `interval_overlap_join` bound that
structurally (skewjoin's bipartite pattern: hot-bin left rows salted,
hot-bin right rows replicated per salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    skewjoin,
)


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    equi_keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """INNER-join each point row to every interval row with
    ``start <= point_ts < end``, via an equi-join on time bins.

    Inner only by design: the exact range predicate is applied as a
    post-join filter, which would drop an outer join's null-extended
    rows (and the replicated bin key would duplicate unmatched rows
    per bin) — outer semantics need anti-join recombination, not a
    ``how=`` passthrough.

    ``equi_keys`` — (point_col, interval_col) pairs included IN the
    join condition alongside the bin. When the business join is
    per-entity ("this user's purchases against this user's view
    windows"), putting the entity key in the equi-join makes each
    candidate group (entity, bin)-sized instead of bin-sized across
    ALL entities — the difference between per-key work and a per-bin
    cross product at corpus scale. Filtering the key after a bin-only
    join is the scale bug this parameter exists to prevent.

    When an equi-key pair uses the SAME name on both sides (the
    natural per-entity case), the interval side's copy is dropped
    from the output — the values are equal by the join condition, and
    keeping both would leave two ambiguous columns that break any
    downstream select-by-name (ADVICE r10). Differently-named pairs
    keep both columns. All OTHER column name collisions between the
    two inputs remain the caller's responsibility (select/alias
    before calling).
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    b = F.lit(bin_seconds).cast("long")

    pts = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / b).cast("long")
    )
    # empty/inverted intervals ([end <= start]) contain no points by the
    # half-open definition — drop them BEFORE the bin explode
    intervals = intervals.where(F.col(start_col) < F.col(end_col))
    ivs = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                # inclusive end bin: trunc(end) may still be reached by
                # a sub-second end (see module doc); start<end raw plus
                # monotone truncation guarantees an ascending sequence
                F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    cond = pts["_bin"] == ivs["_bin"]
    for pk, ik in equi_keys or []:
        cond = cond & (pts[pk] == ivs[ik])
    # exact predicate over the RAW columns — full timestamp precision
    joined = pts.join(ivs, cond, "inner").drop(ivs["_bin"])
    for pk, ik in equi_keys or []:
        if pk == ik:
            joined = joined.drop(ivs[ik])
    joined = joined.where(
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
    salt: int = 1,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """INNER-join interval rows to interval rows on half-open overlap
    (``ls < re AND rs < le``, compared on the RAW timestamp columns)
    via the same time-binning trick as `interval_join_binned` —
    without it, an inequality-only join plans as a nested loop /
    cartesian product.

    Both sides explode into the bins their truncated ranges cover
    (end bin inclusive — see module doc), equi-join on the bin, then
    keep a surviving pair ONLY in its canonical bin — the bin of
    ``trunc(max(ls, rs))`` (the later start, taken over the raw
    columns). For a genuinely overlapping pair the later start m
    satisfies ``ls <= m < le`` and ``rs <= m < re``; truncation is
    monotone, so both sides' bin ranges cover ``floor(trunc(m)/bin)``
    and the pair survives there exactly once — no distinct() over the
    pair blowup is ever needed. Replication factor per row is
    ``<= len/bin + 2`` — pick bin_seconds near the typical interval
    length.

    Hot-bin guard: with ``salt > 1``, bins holding more than
    ``hot_threshold`` LEFT rows take skewjoin's bipartite path — left
    rows spread over ``salt`` deterministic sub-keys (xxhash64 of the
    full row; full-row duplicates share a salt, the documented
    degradation), right rows replicate once per salt — bounding a hot
    bin's per-task pair count to ~(B_left/salt) x B_right instead of
    one quadratic task AQE can only split, not shrink. Cold bins pay
    zero replication. ``salt=1`` (default) skips the hot-bin count
    pass entirely.

    Column collisions are the caller's responsibility (alias first).
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    b = F.lit(bin_seconds).cast("long")

    def _bins(df: DataFrame, s: str, e: str) -> DataFrame:
        df = df.where(F.col(s) < F.col(e))
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / b).cast("long"),
                    F.floor(F.unix_timestamp(F.col(e)) / b).cast("long"),
                )
            ),
        )

    lbins = _bins(left, left_start, left_end)
    rbins = _bins(right, right_start, right_end)
    if salt > 1:
        lbins, rbins = skewjoin.salted_sides(
            lbins, rbins, ["_bin"], salt, hot_threshold
        )
        joined = lbins.join(rbins, ["_bin", "_salt"], "inner")
    else:
        joined = lbins.join(rbins, "_bin", "inner")

    ls, le = F.col(left_start), F.col(left_end)
    rs, re = F.col(right_start), F.col(right_end)
    later_start = F.unix_timestamp(F.greatest(ls, rs))
    return (
        joined.where(
            (ls < re)
            & (rs < le)
            & (F.col("_bin") == F.floor(later_start / b).cast("long"))
        )
        .drop("_bin", "_salt")
    )


def interval_concurrency(
    intervals: DataFrame,
    start_us: str = "start_us",
    end_us: str = "end_us",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Sweep-line peak concurrency per time bucket — "max concurrent
    sessions", the classic capacity-planning aggregate, computed
    WITHOUT a global ordered window: each interval [start, end) emits
    +1/-1 boundary events; within a bucket a per-bucket running sum
    finds the LOCAL prefix maximum, and the bucket's carry-in offset is
    a prefix sum over the bucket-cardinality frame (the m15 sharded-
    running-sum decomposition: global prefix at any instant = offset of
    its bucket + local prefix, because net deltas are associative).
    The only per-row window partitions by bucket; the unpartitioned
    window runs over buckets, not rows.

    Half-open semantics: the local running sum uses a RANGE frame on t,
    so every row in an equal-timestamp event group sees the cumulative
    sum THROUGH the whole group — exactly the concurrency level attained
    at that instant (ends at t have already left, starts at t have
    arrived). Intermediate within-group prefixes are never treated as
    attained levels; in particular, a group of ends sitting exactly on
    the bucket boundary cannot leak `offset - 1, ...` as peak
    candidates (the r9 ADVICE regression: two intervals both ending at
    the boundary must yield peak 0 in the later bucket, not 1).
    Back-to-back intervals never double-count, and the result is
    independent of row order. All arithmetic is BIGINT over epoch
    micros.

    Output per occupied bucket: bucket index, n_starts, and
    peak_concurrency (the bucket's maximum simultaneous intervals).
    """
    from pyspark.sql import Window

    starts = intervals.select(
        F.col(start_us).alias("t"), F.lit(1).cast("long").alias("d")
    )
    ends = intervals.select(
        F.col(end_us).alias("t"), F.lit(-1).cast("long").alias("d")
    )
    b = starts.unionByName(ends).withColumn(
        "bucket", F.floor(F.col("t") / F.lit(bucket_us)).cast("long")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("run", F.sum("d").over(w_local))
    per_bucket = local.groupBy("bucket").agg(
        F.max("run").cast("long").alias("local_peak"),
        F.sum("d").cast("long").alias("net"),
        F.count(F.when(F.col("d") == 1, F.lit(1))).cast("long").alias("n_starts"),
        F.min("t").cast("long").alias("t_min"),
    )
    w_prev = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # The carry-in level is a peak candidate ONLY when it is attained
    # on a nonempty instant range [bucket_start, first_event): a bucket
    # whose only local events are ends still holds `offset` concurrent
    # intervals at entry — UNLESS its first event sits exactly at the
    # bucket boundary (a half-open interval ending there never reaches
    # this bucket; the property test's [(0, 100)] example). Otherwise
    # the maximum is offset + the best local prefix.
    entry_attained = F.col("t_min") > F.col("bucket") * F.lit(bucket_us)
    best_local = F.when(
        entry_attained, F.greatest(F.col("local_peak"), F.lit(0).cast("long"))
    ).otherwise(F.col("local_peak"))
    return per_bucket.select(
        "bucket",
        "n_starts",
        (F.coalesce(F.sum("net").over(w_prev), F.lit(0)) + best_local)
        .cast("long")
        .alias("peak_concurrency"),
    )


def interval_union(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_us: str = "start_us",
    end_us: str = "end_us",
    count_col: str | None = None,
) -> DataFrame:
    """Per-key interval union (merge-overlaps): collapse overlapping or
    touching half-open intervals into coverage ISLANDS — the classic
    complement of the sweep-line concurrency count (a36 answers "how
    many at once", this answers "when covered at all", and the space
    between consecutive islands is exactly the coverage gap an uptime/
    SLA audit wants).

    Algebra: per key, order intervals by (start, end); an interval
    starts a NEW island iff its start strictly exceeds the running max
    of all PRIOR ends (touching intervals merge — [a,b) + [b,c) is
    contiguous coverage under half-open semantics); the island id is
    the running count of starts. Both windows partition by the key, so
    per-task state is one key's interval count; the running max uses a
    ROWS frame ending at -1 (the current row must not see its own
    end). Equal-(start, end) duplicates cannot split an island, so the
    output is permutation-deterministic. All-BIGINT epoch micros.

    Output per island: key, island_id (1-based per key), island
    start/end, n_intervals merged.

    ``count_col``: each input row's weight toward n_intervals (default
    1). The INCREMENTAL form passes already-merged islands alongside
    new raw intervals, weighting stored islands by the raw count they
    absorbed — union is associative and idempotent over coverage, so
    re-unioning stored islands with a new batch equals the one-shot
    union of all raw intervals, counts included (st30).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(start_us, end_us)
    prev_max_end = F.max(end_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_us) > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    marked = intervals.withColumn(
        "island_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    n = (
        F.sum(count_col) if count_col is not None else F.count(F.lit(1))
    )
    return marked.groupBy(key_col, "island_id").agg(
        F.min(start_us).cast("long").alias("island_start_us"),
        F.max(end_us).cast("long").alias("island_end_us"),
        n.cast("long").alias("n_intervals"),
    )
