"""skew_join: lossless vs the plain join under adversarial skew, both
join modes, null keys, and the structural spread itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators.skewjoin import (
    skew_join,
)


def _multiset(df):
    # repr-keyed sort so None-bearing rows compare
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _skewed_frames(spark):
    # key 7: 500 identical-duplicate left rows (the worst case for a
    # content-hash salt) + 20 right rows -> 10,000 output rows for one
    # key; keys 0..9: 5 left x 2 right each (cold path)
    left = spark.createDataFrame(
        [(7, "dup") for _ in range(500)]
        + [(k, f"l{k}-{i}") for k in range(10) for i in range(5)],
        "k long, lval string",
    )
    right = spark.createDataFrame(
        [(7, f"r{i}") for i in range(20)]
        + [(k, f"r{k}-{i}") for k in range(10) for i in range(2)],
        "k long, rval string",
    )
    return left, right


def test_skew_join_inner_equals_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k")
    salted = skew_join(left, right, "k", salt=8, hot_threshold=100)
    assert _multiset(salted) == _multiset(plain)


def test_skew_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a")] * 300 + [(2, "b"), (3, "c")], "k long, lval string"
    )
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, rval string")
    plain = left.join(right, "k", "left")
    salted = skew_join(left, right, "k", salt=4, hot_threshold=100, how="left")
    assert _multiset(salted) == _multiset(plain)
    # the hot key's unmatched sibling (k=3) survives exactly once
    assert salted.filter(F.col("k") == 3).count() == 1


def test_skew_join_null_keys_match_plain_semantics(spark):
    left = spark.createDataFrame(
        [(None, "ln"), (1, "l1")], "k long, lval string"
    )
    right = spark.createDataFrame(
        [(None, "rn"), (1, "r1")], "k long, rval string"
    )
    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        salted = skew_join(left, right, "k", salt=4, hot_threshold=0, how=how)
        assert _multiset(salted) == _multiset(plain), how


def test_skew_join_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "a", i) for i in range(50)] + [(2, "b", 0)],
        "k1 long, k2 string, lval long",
    )
    right = spark.createDataFrame(
        [(1, "a", "x"), (1, "z", "never"), (2, "b", "y")],
        "k1 long, k2 string, rval string",
    )
    plain = left.join(right, ["k1", "k2"])
    salted = skew_join(left, right, ("k1", "k2"), salt=4, hot_threshold=10)
    assert _multiset(salted) == _multiset(plain)


def test_skew_join_actually_spreads_hot_key(spark):
    # distribution proof through the operator's own salted frames:
    # a hot key's DISTINCT rows must land on >1 salt value, the right
    # side replicated once per salt, cold rows single. The salt is
    # deterministic (recompute-stable shuffle key — a per-attempt salt
    # would be a retry correctness hazard), so identical full-row
    # duplicates share a salt UNLESS the caller names a unique id.
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.skewjoin import (
        salted_sides,
    )

    left = spark.createDataFrame(
        [(7, f"l{i}") for i in range(500)] + [(1, "cold")],
        "k long, lval string",
    )
    right = spark.createDataFrame(
        [(7, "r"), (1, "rc")], "k long, rval string"
    )
    lsalted, rsalted = salted_sides(left, right, ["k"], salt=8, hot_threshold=100)
    hot_salts = lsalted.filter(F.col("k") == 7).select("_salt").distinct().count()
    assert hot_salts > 1, "distinct hot rows collapsed onto one salt"
    # right hot row replicated across ALL salts; cold row not replicated
    assert rsalted.filter(F.col("k") == 7).count() == 8
    assert rsalted.filter(F.col("k") == 1).count() == 1
    assert lsalted.filter(F.col("k") == 1).select("_salt").collect()[0]._salt == 0
    # and the composed join stays lossless
    out = skew_join(left, right, "k", salt=8, hot_threshold=100)
    assert out.count() == 501
    # deterministic: the same frame salts identically run to run
    again, _ = salted_sides(left, right, ["k"], salt=8, hot_threshold=100)
    assert sorted(
        (r.k, r.lval, r._salt) for r in lsalted.collect()
    ) == sorted((r.k, r.lval, r._salt) for r in again.collect())


def test_skew_join_left_id_spreads_identical_payloads(spark):
    """With a caller-named unique id, even IDENTICAL payload rows
    spread across salts — the preferred form for hot keys that carry
    mass duplication."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.skewjoin import (
        salted_sides,
    )

    left = spark.createDataFrame(
        [(i, 7, "dup") for i in range(500)], "rid long, k long, lval string"
    )
    right = spark.createDataFrame([(7, "r")], "k long, rval string")
    lsalted, _ = salted_sides(
        left, right, ["k"], salt=8, hot_threshold=100, left_id="rid"
    )
    assert lsalted.select("_salt").distinct().count() > 1
    out = skew_join(
        left, right, "k", salt=8, hot_threshold=100, left_id="rid"
    )
    assert out.count() == 500


def test_skew_join_rejects_unsupported_how(spark):
    left = spark.createDataFrame([(1, "a")], "k long, v string")
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        skew_join(left, left, "k", how="full")


def test_interval_overlap_join_equals_naive(spark):
    """Canonical-bin dedup must reproduce the naive inequality join's
    pair SET exactly — including pairs spanning many bins (long
    intervals) and touching pairs (half-open: sharing only an endpoint
    is NOT overlap)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    def ts(h):  # hours from epoch
        return h * 3600

    left = spark.createDataFrame(
        [(1, ts(0), ts(10)), (2, ts(5), ts(6)), (3, ts(20), ts(21))],
        "a long, ls_s long, le_s long",
    ).select("a", F.timestamp_seconds("ls_s").alias("ls"),
             F.timestamp_seconds("le_s").alias("le"))
    right = spark.createDataFrame(
        # 100: long interval spanning many 1h bins, overlaps 1 and 2;
        # 101: touches 1 at its end exactly (no overlap, half-open);
        # 102: inside 3
        [(100, ts(4), ts(30)), (101, ts(10), ts(12)), (102, ts(20), ts(21))],
        "b long, rs_s long, re_s long",
    ).select("b", F.timestamp_seconds("rs_s").alias("rs"),
             F.timestamp_seconds("re_s").alias("re"))

    got = {
        (r.a, r.b)
        for r in rangejoin.interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_seconds=3600
        ).select("a", "b").collect()
    }
    naive = {
        (r.a, r.b)
        for r in left.crossJoin(right)
        .where((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .select("a", "b")
        .collect()
    }
    assert got == naive == {(1, 100), (2, 100), (3, 100), (3, 102)}


def test_interval_overlap_join_subsecond(spark):
    """The exact predicate must compare RAW timestamps, and the end bin
    must be inclusive of trunc(end): with sub-second timestamps,
    [10.2s,10.9s) vs [10.5s,11.0s) truly overlap (later start 10.5 is
    inside both) and [10.2s,10.5s) vs [10.5s,11.0s) only touch (half-
    open: no overlap). A seconds-truncated predicate or the old
    floor((trunc(e)-1)/b) end bin silently drops the first pair."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    left = spark.createDataFrame(
        [(1, 10.2, 10.9), (2, 10.2, 10.5), (3, 9.0, 10.500001)],
        "a long, ls_s double, le_s double",
    ).select("a", F.timestamp_seconds("ls_s").alias("ls"),
             F.timestamp_seconds("le_s").alias("le"))
    right = spark.createDataFrame(
        [(100, 10.5, 11.0)], "b long, rs_s double, re_s double"
    ).select("b", F.timestamp_seconds("rs_s").alias("rs"),
             F.timestamp_seconds("re_s").alias("re"))

    for bin_s in (1, 3600):
        got = {
            (r.a, r.b)
            for r in rangejoin.interval_overlap_join(
                left, right, "ls", "le", "rs", "re", bin_seconds=bin_s
            ).select("a", "b").collect()
        }
        assert got == {(1, 100), (3, 100)}, f"bin_seconds={bin_s}: {got}"


def test_interval_join_binned_subsecond(spark):
    """Point 11.2s inside [10.5s,11.5s) must match: the interval's
    truncated bin range (10..11 at bin=1) has to cover the point's bin
    11 — the old exclusive end bin floor((trunc(e)-1)/b)=10 missed it.
    Point 10.2s (before the interval) must not match."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    pts = spark.createDataFrame(
        [(1, 11.2), (2, 10.2)], "p long, ts_s double"
    ).select("p", F.timestamp_seconds("ts_s").alias("ts"))
    ivs = spark.createDataFrame(
        [(100, 10.5, 11.5)], "i long, s_s double, e_s double"
    ).select("i", F.timestamp_seconds("s_s").alias("s"),
             F.timestamp_seconds("e_s").alias("e"))

    for bin_s in (1, 60):
        got = {
            (r.p, r.i)
            for r in rangejoin.interval_join_binned(
                pts, ivs, "ts", "s", "e", bin_seconds=bin_s
            ).select("p", "i").collect()
        }
        assert got == {(1, 100)}, f"bin_seconds={bin_s}: {got}"


def test_interval_overlap_join_hot_bin_salted(spark):
    """Adversarial hot bin: one bin holds 50% of BOTH sides (a
    quadratic pair task AQE can only split, not shrink). The salted
    path (salt>1, hot_threshold exceeded) must reproduce the naive
    inequality join's pair set exactly, and the salted left side must
    actually spread the hot bin's rows over >1 sub-key."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        rangejoin, skewjoin,
    )

    H = 3600
    # hot: 60 left + 60 right intervals all inside hour-bin 5;
    # cold: 60 left + 60 right spread one per hour-bin 100..159
    left = spark.createDataFrame(
        [(i, 5 * H + i, 5 * H + i + 120) for i in range(60)]
        + [(1000 + i, (100 + i) * H, (100 + i) * H + 120) for i in range(60)],
        "a long, ls_s long, le_s long",
    ).select("a", F.timestamp_seconds("ls_s").alias("ls"),
             F.timestamp_seconds("le_s").alias("le"))
    right = spark.createDataFrame(
        [(i, 5 * H + 2 * i, 5 * H + 2 * i + 90) for i in range(60)]
        + [(1000 + i, (100 + i) * H + 30, (100 + i) * H + 150) for i in range(60)],
        "b long, rs_s long, re_s long",
    ).select("b", F.timestamp_seconds("rs_s").alias("rs"),
             F.timestamp_seconds("re_s").alias("re"))

    naive = {
        (r.a, r.b)
        for r in left.crossJoin(right)
        .where((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .select("a", "b")
        .collect()
    }
    got = {
        (r.a, r.b)
        for r in rangejoin.interval_overlap_join(
            left, right, "ls", "le", "rs", "re",
            bin_seconds=H, salt=4, hot_threshold=30,
        ).select("a", "b").collect()
    }
    assert got == naive and len(naive) > 100

    # structural check: the hot bin's left rows occupy >1 salt value
    def _bins(df, s, e):
        b = F.lit(H).cast("long")
        return df.withColumn("_bin", F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(s)) / b).cast("long"),
            F.floor(F.unix_timestamp(F.col(e)) / b).cast("long"))))

    lsalted, _ = skewjoin.salted_sides(
        _bins(left, "ls", "le"), _bins(right, "rs", "re"),
        ["_bin"], 4, 30,
    )
    hot_salts = (
        lsalted.where(F.col("_bin") == 5)
        .select("_salt").distinct().count()
    )
    assert hot_salts > 1
