"""Hybrid skew-aware equi-join: hot keys salted, cold keys joined
plain — the fact-to-fact join pattern for keys too skewed for a
uniform shuffle but tables too big to broadcast.

AQE's skew-join (enabled in session.py) re-splits oversized SORT-MERGE
partitions at runtime, which fixes task-size imbalance — but it only
triggers on the sort-merge path, only on post-shuffle partition sizes,
and replicates nothing: a single key whose rows exceed one executor's
memory on the BUILD side of a hash join still lands in one task. This
operator bounds the per-task row count for chosen keys STRUCTURALLY:

  1. Hot keys are found with a map-side-combined count on the left
     input, cut at ``hot_threshold`` rows. The hot list is at most
     n/threshold entries — broadcastable at any scale (same argument
     as saltjoin's oversized-bucket list).
  2. Left hot rows get a DETERMINISTIC salt in [0, salt): xxhash64 of
     ``left_id`` when the caller names a unique row id (the preferred
     form — exact duplicate payloads still spread), else xxhash64 of
     every left column (distinct rows spread; full-row duplicates
     share a salt, so the per-task bound degrades to per-distinct-row
     — name an id if hot keys can carry mass duplication). Salts must
     be recompute-stable: a salt that varies across task attempts
     (e.g. monotonically_increasing_id) is a shuffle-retry
     correctness hazard — a re-run map task would route rows to
     different reducers than the copies already fetched. Right hot
     rows are REPLICATED once per salt value. Join key becomes
     (key, salt): each hot key's left rows spread over ``salt`` tasks
     instead of one.
  3. Cold rows take the plain equi-join path (salt 0 vs salt 0,
     zero replication), and the two paths are a single union-free join
     because cold rows simply carry salt 0 on both sides.

Lossless: a left row with salt s meets exactly the right rows
replicated at s — i.e. ALL right rows for its key — so the output
multiset equals the plain join's (property-tested, and the paired
query's oracle is the PLAIN SQL join).

Cost model: replication multiplies only the RIGHT rows of HOT keys by
``salt``; everything else moves once. Choose ``salt`` ~ (hot key rows
/ target task rows) and ``hot_threshold`` ~ a few target task sizes.

Reference scope: the reference's joins are small-dim lookups
(script.sql:1-40 loyalty join — covered by J1's broadcast); this
operator is the beyond-reference scale path for when BOTH sides are
facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, ...] | list[str] | str,
    salt: int = 16,
    hot_threshold: int = 1_000_000,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Equi-join ``left`` with ``right`` on ``on`` with hot-key
    salting. Output columns = plain ``left.join(right, on, how)``
    (join keys once, then left's then right's remaining columns).

    ``how``: 'inner' or 'left' ('left' keeps unmatched left rows —
    they join nothing on either path, so null-extension is preserved).
    Right-outer/full would need unmatched-RIGHT bookkeeping across
    replicas (a replicated right row is unmatched only if unmatched
    under EVERY salt) and is out of scope.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lsalted, rsalted = salted_sides(
        left, right, keys, salt, hot_threshold, left_id=left_id
    )
    joined = lsalted.join(rsalted, [*keys, "_salt"], how)
    return joined.drop("_salt")


def salted_sides(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt: int,
    hot_threshold: int,
    left_id: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The two `_salt`-carrying join inputs (exposed for tests and for
    callers composing extra predicates into the join)."""
    # 1. hot-key list: tiny by construction (<= n/hot_threshold rows)
    hot = (
        left.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > hot_threshold)
        .select(*keys)
        .withColumn("_hot", F.lit(True))
    )

    # 2. left side: salt hot rows, cold rows salt 0. The salt is a
    # DETERMINISTIC hash — of the caller's unique row id when given
    # (exact duplicate payloads still spread), else of every left
    # column (distinct rows spread; full-row duplicates share a salt,
    # the documented degradation). It must be recompute-stable: a
    # per-attempt value (monotonically_increasing_id, rand) in a
    # shuffle key is a retry correctness hazard — after a fetch
    # failure the re-run map's rows would route to different reducers
    # than the copies already consumed, silently dropping or
    # double-counting hot rows. No addition either: a lone
    # pmod(xxhash64, n) cannot overflow under ANSI mode.
    salt_src = (
        [F.lit("skewsalt"), F.col(left_id)]
        if left_id is not None
        else [F.col(c) for c in left.columns]
    )
    lsalted = (
        left.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(*salt_src), F.lit(salt)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )

    # 3. right side: replicate hot rows across all salts, cold rows
    # pass through once with salt 0 (explode of a 1-element array —
    # generators can't nest inside CASE, so the WHEN picks the array)
    rsalted = (
        right.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_hot", "_salts")
    )
    return lsalted, rsalted
