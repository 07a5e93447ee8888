"""Unit tests for the search / stats / range-join / rollup operators."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.hyputil import hyp_examples

_hyp_settings = settings(max_examples=hyp_examples(8, 25), deadline=None)

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    rangejoin,
    rollup,
    search,
    stats,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# --- interval_join_binned -----------------------------------------------


def test_interval_join_boundary_semantics(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start: included
            (2, _ts("2024-01-01 01:00:00")),  # inside
            (3, _ts("2024-01-01 02:00:00")),  # == end: excluded
            (4, _ts("2024-01-05 00:00:00")),  # in no interval
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00"))],
        "iid long, start timestamp, end timestamp",
    )
    out = rangejoin.interval_join_binned(
        points, intervals, "ts", "start", "end", bin_seconds=3600
    )
    got = {(r.pid, r.iid) for r in out.collect()}
    assert got == {(1, 10), (2, 10)}


def test_interval_spanning_many_bins_matches_once(spark):
    # interval covers 10 bins; each contained point matches exactly once
    points = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=30 * i)) for i in range(6)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00"))],
        "iid long, start timestamp, end timestamp",
    )
    out = rangejoin.interval_join_binned(
        points, intervals, "ts", "start", "end", bin_seconds=600
    )
    rows = out.collect()
    assert len(rows) == len({r.pid for r in rows}) == 6


def test_interval_join_same_name_equi_key_unambiguous(spark):
    """ADVICE r10: when both sides call the entity key by the same
    name, the output keeps ONE unambiguous copy — select-by-name and
    downstream groupBy must work without alias gymnastics."""
    points = spark.createDataFrame(
        [
            (7, 1, _ts("2024-01-01 00:30:00")),
            (2, 2, _ts("2024-01-01 00:30:00")),  # other user, same ts
        ],
        "user_id long, pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        "user_id long, iid long, start timestamp, end timestamp",
    )
    out = rangejoin.interval_join_binned(
        points,
        intervals,
        "ts",
        "start",
        "end",
        bin_seconds=3600,
        equi_keys=[("user_id", "user_id")],
    )
    assert out.columns.count("user_id") == 1
    rows = out.select("user_id", "pid", "iid").collect()  # by-name works
    assert {(r.user_id, r.pid, r.iid) for r in rows} == {(7, 1, 10)}
    assert out.groupBy("user_id").count().collect()[0][1] == 1


def test_interval_join_rejects_bad_bin(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        rangejoin.interval_join_binned(df, df, "a", "b", "c", bin_seconds=0)


# --- key_skew_profile ---------------------------------------------------


def test_key_skew_profile_counts_and_ratios(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    out = {r.key_value: r for r in stats.key_skew_profile(df, "k", top_n=2).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].rank == 1 and out["a"].cnt == 6
    assert out["a"].share == 0.6
    # mean per key = 10/3; a's ratio = 6/(10/3) = 1.8
    assert out["a"].ratio_to_avg == pytest.approx(1.8)


# --- group_ols ----------------------------------------------------------


def test_group_ols_exact_line(spark):
    # y = 3x + 7, exactly: slope/intercept recovered, r2 == 1
    rows = [("g", x, 3 * x + 7) for x in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = stats.group_ols(df, "grp", F.col("x"), F.col("y")).collect()[0]
    assert out.n == 10
    assert out.slope == pytest.approx(3.0)
    assert out.intercept == pytest.approx(7.0)
    assert out.r2 == pytest.approx(1.0)


def test_group_ols_two_groups_independent(spark):
    rows = [("up", x, 2 * x) for x in range(1, 6)] + [
        ("down", x, 100 - 5 * x) for x in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    out = {r.group_key: r for r in stats.group_ols(df, "grp", F.col("x"), F.col("y")).collect()}
    assert out["up"].slope == pytest.approx(2.0)
    assert out["down"].slope == pytest.approx(-5.0)


# --- winsorized_summary -------------------------------------------------


def test_winsorize_clamps_tails(spark):
    # values 1..100 in one group; p05 -> k=ceil(.05*100)=5 -> lo=5;
    # p95 -> k=95 -> hi=95. Clamped sum = 4*5 + sum(5..95) + 5*95
    vals = [("g", v) for v in range(1, 101)]
    df = spark.createDataFrame(vals, "grp string, v long")
    out = stats.winsorized_summary(df, "grp", F.col("v"), 0.05, 0.95).collect()[0]
    assert (out.lo_value, out.hi_value) == (5, 95)
    assert out.n_clamped_lo == 4 and out.n_clamped_hi == 5
    expected = 4 * 5 + sum(range(5, 96)) + 5 * 95
    assert out.winsorized_sum == expected


def test_winsorize_repeated_values_run_length(spark):
    # heavy ties: ranks must be computed over run-length pairs
    vals = [("g", 1)] * 50 + [("g", 2)] * 50 + [("g", 1000)] * 2
    df = spark.createDataFrame(vals, "grp string, v long")
    out = stats.winsorized_summary(df, "grp", F.col("v"), 0.05, 0.95).collect()[0]
    assert out.lo_value == 1
    assert out.hi_value == 2  # k_hi = ceil(.95*102) = 97 -> value 2
    assert out.n_clamped_hi == 2
    assert out.winsorized_sum == 50 * 1 + 50 * 2 + 2 * 2


# --- rollup_cascade -----------------------------------------------------


def test_rollup_cascade_equals_direct(spark):
    import random

    rng = random.Random(7)
    base = _ts("2024-03-01 00:00:00")
    rows = [
        (base + dt.timedelta(seconds=rng.randrange(3 * 86400)), rng.randrange(1000) / 100.0)
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = rollup.rollup_cascade(df)
    # day level from the cascade == direct day aggregation of raw rows
    day = {
        r.bucket_start: (r.n_events, r.total_value)
        for r in out.filter(F.col("resolution_sec") == 86400).collect()
    }
    direct = {
        r.bucket_start: (r.n_events, r.total_value)
        for r in df.groupBy(
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
            ).alias("bucket_start")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).cast("double")
                / 100.0
            ).alias("total_value"),
        )
        .collect()
    }
    assert day == direct
    # conservation: every level carries the same total event count
    counts = (
        out.groupBy("resolution_sec").agg(F.sum("n_events").alias("n")).collect()
    )
    assert {r.n for r in counts} == {500}


def test_rollup_cascade_rejects_non_multiple(spark):
    df = spark.range(1).select(
        F.current_timestamp().alias("ts"), F.lit(1.0).alias("value")
    )
    with pytest.raises(ValueError):
        rollup.rollup_cascade(df, resolutions=(60, 90))


# --- bm25_topk ----------------------------------------------------------


def test_bm25_ranks_higher_tf_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple pie"),
            (2, "apple pie crust butter"),
            (3, "banana bread loaf sugar"),
        ],
        "doc_id long, text string",
    )
    out = search.bm25_topk(docs, ["apple"], k=5)
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1, 2]  # doc 3 has no match
    assert rows[0].score > rows[1].score
    assert rows[0].rank == 1


def test_bm25_rarer_term_weighs_more(spark):
    # "rare" appears in 1 doc, "common" in all 3; same tf, same dl
    docs = spark.createDataFrame(
        [
            (1, "rare common filler pad"),
            (2, "common filler pad word"),
            (3, "common filler pad word"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in search.bm25_topk(docs, ["rare", "common"], k=5).collect()}
    assert out[1].n_terms_matched == 2
    assert out[1].score > out[2].score
    assert out[1].rank == 1


# --- inverted_index -----------------------------------------------------


def test_inverted_index_caps_postings_keeps_full_df(spark):
    docs = spark.createDataFrame(
        [(i, "stop word" if i % 2 == 0 else "stop") for i in range(1, 11)],
        "doc_id long, text string",
    )
    out = {r.term: r for r in search.inverted_index(docs, posting_cap=3).collect()}
    assert out["stop"].df == 10  # df from the FULL aggregate
    assert out["stop"].postings == "1,2,3"  # capped, ascending
    assert out["word"].df == 5
    assert out["word"].postings == "2,4,6"
    assert out["stop"].tf_total == 10


# --- empty-input behavior (operators must degrade to empty, not throw) --


def test_new_operators_handle_empty_inputs(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        analytics as an,
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        er as er_op,
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        pagerank as pr,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert search.bm25_topk(empty_docs, ["x"]).count() == 0
    assert search.inverted_index(empty_docs).count() == 0
    assert pr.pagerank(spark.createDataFrame([], "src long, dst long"), 2).count() == 0
    assert (
        an.item_cooccurrence(
            spark.createDataFrame([], "l_orderkey long, l_partkey long")
        ).count()
        == 0
    )
    assert (
        er_op.blocked_pairs(
            spark.createDataFrame([], "id long, name string"), "id", "name"
        ).count()
        == 0
    )


def test_interval_join_drops_empty_and_inverted_intervals(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 01:00:00"))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:00:00")),  # empty
            (2, _ts("2024-01-01 02:00:00"), _ts("2024-01-01 00:00:00")),  # inverted
            (3, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00")),  # valid
        ],
        "iid long, start timestamp, end timestamp",
    )
    out = rangejoin.interval_join_binned(
        points, intervals, "ts", "start", "end", bin_seconds=3600
    )
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 3)]


def test_winsorize_validates_quantiles(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, v long")
    for lo, hi in [(0.0, 0.9), (0.9, 0.1), (0.1, 1.5)]:
        with pytest.raises(ValueError):
            stats.winsorized_summary(df, "grp", F.col("v"), lo, hi)


def test_count_min_overestimates_and_is_bounded(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    # adversarial: 1000 distinct rare keys forced through w=16 buckets
    # (heavy collisions) + one hot key
    rows = [(f"k{i}",) for i in range(1000)] + [("hot",)] * 200
    df = spark.createDataFrame(rows, "k string")
    out = stats.count_min(df, "k", depth=4, width=16).collect()
    n_total = 1200
    assert len(out) == 1001
    by_key = {r.k: r for r in out}
    for r in out:
        # classical one-sided error: never underestimates
        assert r.cms_est >= r.exact_n, r
        # crude sanity ceiling: no estimate can exceed total mass
        assert r.cms_est <= n_total
    # the hot key's estimate is exact-ish: its min bucket can only be
    # inflated by colliders, bounded by total rare mass
    assert by_key["hot"].exact_n == 200
    assert by_key["hot"].cms_est >= 200


def test_count_min_counter_table_is_fixed_size(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(f"k{i}",) for i in range(500)], "k string")
    # rebuild the internal counter table through the same hashing to
    # pin its size contract: depth * width is the whole sketch
    key = F.col("k").cast("string")
    def bucket(i):
        return F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit(str(i)), F.lit(":"), key)), 1, 6), 16, 10).cast("long"),
            F.lit(8),
        )
    hashed = df.select(
        F.explode(F.array(*[F.struct(F.lit(i).alias("i"), bucket(i).alias("bucket")) for i in range(3)])).alias("h")
    ).select("h.i", "h.bucket")
    counters = hashed.groupBy("i", "bucket").count()
    assert counters.count() <= 3 * 8


def test_count_min_partitioning_invariant(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    rows = [(f"k{i % 37}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string")
    a = sorted(tuple(r) for r in stats.count_min(df, "k", 4, 32).collect())
    b = sorted(
        tuple(r)
        for r in stats.count_min(df.repartition(13), "k", 4, 32).collect()
    )
    assert a == b  # counter increments commute — layout can't leak


def test_hll_distinct_accuracy_and_invariance(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    # 2000 distinct values in one group: raw HLL with m=64 has std err
    # ~1.04/sqrt(64) = 13%; assert a generous 40% envelope (the point
    # of the EXACT oracle is that accuracy is a property, not a
    # verification mechanism)
    rows = [("g", f"v{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = stats.hll_distinct(df, "g", "v").collect()[0]
    assert out.exact_distinct == 2000
    assert 0.6 * 2000 < out.hll_raw_est < 1.4 * 2000
    # duplicate-heavy input: distinct count unchanged -> sketch
    # unchanged (it only sees the value set, max-merge absorbs dups)
    df_dup = spark.createDataFrame(rows * 3, "g string, v string")
    out_dup = stats.hll_distinct(df_dup, "g", "v").collect()[0]
    assert out_dup.hll_raw_est == out.hll_raw_est
    # partitioning invariance (max commutes)
    out_rep = stats.hll_distinct(df.repartition(17), "g", "v").collect()[0]
    assert out_rep.hll_raw_est == out.hll_raw_est


def test_hll_register_table_is_mergeable(spark):
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    # the mergeable-artifact claim, exercised through the ACTUAL merge
    # path: registers built INDEPENDENTLY per half-corpus, max-merged
    # with hll_merge, must estimate identically to sketching the whole
    # corpus at once — and overlap must be absorbed (max idempotent)
    a = spark.createDataFrame([("g", f"a{i}") for i in range(500)], "g string, v string")
    b = spark.createDataFrame([("g", f"b{i}") for i in range(500)], "g string, v string")
    whole = stats.hll_distinct(a.unionByName(b), "g", "v").collect()[0]
    assert whole.exact_distinct == 1000
    assert 0.6 * 1000 < whole.hll_raw_est < 1.4 * 1000

    merged = stats.hll_estimate(
        stats.hll_merge(
            stats.hll_registers(a, "g", "v"), stats.hll_registers(b, "g", "v")
        )
    ).collect()[0]
    assert merged.hll_raw_est == whole.hll_raw_est
    assert merged.n_zero_registers == whole.n_zero_registers

    # overlapping shards: a ∪ (a ∪ b) merges to the same registers
    overlap = stats.hll_estimate(
        stats.hll_merge(
            stats.hll_registers(a, "g", "v"),
            stats.hll_registers(a.unionByName(b), "g", "v"),
        )
    ).collect()[0]
    assert overlap.hll_raw_est == whole.hll_raw_est


def test_histogram_sketch_merges_by_addition(spark):
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    lo, hi, bins = 0, 1000, 10
    a = spark.createDataFrame([("g", i) for i in range(0, 500)], "g string, v long")
    b = spark.createDataFrame([("g", i) for i in range(500, 1000)], "g string, v long")
    whole = stats.histogram_bins(
        a.unionByName(b), "g", F.col("v"), lo, hi, bins
    )
    # merge = per-(g,b) count ADDITION of independently built sketches
    merged = (
        stats.histogram_bins(a, "g", F.col("v"), lo, hi, bins)
        .unionByName(stats.histogram_bins(b, "g", F.col("v"), lo, hi, bins))
        .groupBy("g", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # quantile estimates agree between whole and merged sketches, and
    # sit within one bin width of the true quantiles
    qw = stats.histogram_quantiles(whole, lo, hi, bins).collect()[0]
    qm = stats.histogram_quantiles(merged, lo, hi, bins).collect()[0]
    assert (qw.n, qw.q50_upper_cents, qw.q95_upper_cents) == (
        qm.n, qm.q50_upper_cents, qm.q95_upper_cents,
    )
    assert qw.n == 1000
    width = (hi - lo) // bins
    assert abs(qw.q50_upper_cents - 500) <= width
    assert abs(qw.q95_upper_cents - 950) <= width
    # out-of-domain values clamp into the edge bins, flagging a
    # mis-sized domain instead of crashing or vanishing
    odd = spark.createDataFrame([("g", -5), ("g", 99999)], "g string, v long")
    eb = {r.b: r.c for r in stats.histogram_bins(odd, "g", F.col("v"), lo, hi, bins).collect()}
    assert eb == {0: 1, bins - 1: 1}


def test_equidepth_buckets_balance_on_distinct_values(spark):
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    df = spark.createDataFrame(
        [("g", i * 7 % 1000) for i in range(1000)], "g string, v long"
    )
    out = stats.equidepth_bucketize(df, "g", F.col("v"), 8).collect()
    assert {r.bucket for r in out} == set(range(8))
    # distinct values -> every bucket within 1 row of n/B, ranges abut
    assert all(abs(r.n_rows - 125) <= 1 for r in out)
    by_b = sorted(out, key=lambda r: r.bucket)
    assert all(by_b[i].hi < by_b[i + 1].lo for i in range(7))
    assert sum(r.n_rows for r in out) == 1000
    # massive ties collapse into the LOWER bucket deterministically:
    # one value holding >1/B of the mass can leave later buckets empty
    # but never splits across buckets
    tied = spark.createDataFrame(
        [("g", 5)] * 900 + [("g", i + 100) for i in range(100)],
        "g string, v long",
    )
    tout = stats.equidepth_bucketize(tied, "g", F.col("v"), 4).collect()
    five = [r for r in tout if r.lo <= 5 <= r.hi]
    assert len(five) == 1 and five[0].n_rows >= 900


def test_rrf_fuse_contributions_and_absentees(spark):
    """RRF micro-contributions are exact integer division; docs absent
    from one list contribute only the other term; ranks assigned over
    the fused union with id tie-breaks."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import search

    kw = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank_kw long")
    vec = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank_vec long")
    out = {r.doc_id: r for r in search.rrf_fuse(kw, vec).collect()}
    m = search.RRF_MICRO
    assert out[20].rrf_micro == m // 62 + m // 61  # both lists
    assert out[10].rrf_micro == m // 61            # kw only
    assert out[30].rrf_micro == m // 62            # vec only
    assert out[10].rank_vec is None and out[30].rank_kw is None
    assert (out[20].fused_rank, out[10].fused_rank, out[30].fused_rank) == (1, 2, 3)


def test_drift_buckets_expected_and_chi2(spark):
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    # baseline: 30 rows bin0, 10 bin1; current: 10 bin0, 30 bin1
    rows = (
        [(0, 1.0)] * 30 + [(0, 3.0)] * 10 + [(1, 1.0)] * 10 + [(1, 3.0)] * 30
    )
    df = spark.createDataFrame(rows, "period int, value double")
    out = {
        r.bin: r
        for r in stats.drift_buckets(
            df, "period", F.floor(F.col("value") * 100.0 + 0.5), lo=0, hi=400, bins=2
        ).collect()
    }
    assert (out[0].n_base, out[0].n_cur) == (30, 10)
    assert (out[1].n_base, out[1].n_cur) == (10, 30)
    # totals equal (40/40) -> expected = n_base; chi2 = (cur-base)^2/base
    assert out[0].expected_cur == 30.0 and out[1].expected_cur == 10.0
    assert out[0].chi2_contrib == (10.0 - 30.0) ** 2 / 30.0
    assert out[1].chi2_contrib == (30.0 - 10.0) ** 2 / 10.0


# --- shuffle_skew_audit ---------------------------------------------------


def test_shuffle_skew_audit_flags_hot_key(spark):
    """Against a REALLY skewed key distribution (one key holding ~90%
    of rows — the mm6 hot-language shape) the >2x-mean flag must fire
    on exactly the hot key's bucket, and nowhere else when the rest is
    uniform."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    rows = [("hot-lang",)] * 900 + [(f"cold-{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    out = {r.bucket: r for r in stats.shuffle_skew_audit(df, "k", 8).collect()}

    assert sum(r.n_rows for r in out.values()) == 1000
    flagged = [b for b, r in out.items() if r.skew_flag == 1]
    # the hot key's bucket holds >= 900 of 1000 rows -> 900*8 > 2*1000
    hot_bucket = max(out, key=lambda b: out[b].n_rows)
    assert flagged == [hot_bucket]
    assert out[hot_bucket].n_rows >= 900


def test_shuffle_skew_audit_uniform_key_quiet(spark):
    """A uniform high-cardinality key must raise no flag: no bucket
    can exceed 2x the mean when keys hash evenly."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    df = spark.createDataFrame([(f"k{i}",) for i in range(4000)], "k string")
    out = stats.shuffle_skew_audit(df, "k", 8).collect()
    assert sum(r.n_rows for r in out) == 4000
    assert all(r.skew_flag == 0 for r in out)


def test_hll_merge_equals_direct_sketch(spark):
    """The mergeability invariant m56 relies on: max-merging per-shard
    register tables yields BIT-IDENTICAL estimates to sketching the
    union directly — max is commutative, associative, idempotent, so
    shard boundaries (and overlaps) cannot change the registers."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    rows = [("g1", f"u{i % 37}") for i in range(200)] + [
        ("g2", f"v{i % 11}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, val string")
    # shard by an arbitrary predicate, with overlap (idempotence)
    s1 = df.filter(F.length("val") <= 2)
    s2 = df.filter(F.length("val") >= 2)
    merged = stats.hll_merge(
        stats.hll_registers(s1, "g", "val"),
        stats.hll_registers(s2, "g", "val"),
    )
    direct = stats.hll_registers(df, "g", "val")
    est_m = {r.g: r for r in stats.hll_estimate(merged).collect()}
    est_d = {r.g: r for r in stats.hll_estimate(direct).collect()}
    assert set(est_m) == set(est_d) == {"g1", "g2"}
    for g in est_d:
        assert est_m[g].hll_raw_est == est_d[g].hll_raw_est  # bit-equal
        assert est_m[g].n_zero_registers == est_d[g].n_zero_registers


def test_interval_concurrency_sweep_line(spark):
    """Hand-solved sweep line incl. the half-open tie rule (an interval
    ending exactly when another starts never overlaps it) and a
    cross-bucket carry-in (an interval spanning buckets raises the
    later bucket's floor via the offset, not via local events)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    H = 100  # tiny bucket for the test
    iv = spark.createDataFrame(
        [
            (10, 30),   # A: bucket 0
            (20, 40),   # B: overlaps A -> peak 2 in bucket 0
            (40, 60),   # C: starts exactly at B's end -> NOT +1 on top of B
            (90, 250),  # D: spans buckets 0->2; carries +1 into 1 and 2
            (110, 120), # E: bucket 1; with D active -> peak 2 in bucket 1
        ],
        "start_us long, end_us long",
    )
    out = {
        r.bucket: r
        for r in rangejoin.interval_concurrency(
            iv, bucket_us=H
        ).collect()
    }
    assert out[0].peak_concurrency == 2  # A+B, never 3 (tie rule at t=40)
    assert out[0].n_starts == 4
    # bucket 1 has only E's start locally, but D carries in: peak 2
    assert out[1].peak_concurrency == 2
    assert out[1].n_starts == 1
    # bucket 2 has no starts — only D's end event; concurrency 1 until it
    assert out[2].peak_concurrency == 1
    assert out[2].n_starts == 0


def test_interval_concurrency_boundary_end_group(spark):
    """r9 ADVICE regression: >=2 half-open intervals ending exactly on a
    bucket boundary. The later bucket holds ZERO concurrent intervals at
    every instant (both ended at entry), so its peak must be 0 — the
    pre-fix ROWS-frame code leaked the intermediate prefix `offset - 1`
    (= 1) as a phantom attained level."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    iv = spark.createDataFrame(
        [(0, 100), (0, 100)], "start_us long, end_us long"
    )
    out = {
        r.bucket: r.peak_concurrency
        for r in rangejoin.interval_concurrency(iv, bucket_us=100).collect()
    }
    assert out == {0: 2, 1: 0}

    # mixed boundary group: one end + one start at t=100 with carry-in 1
    # -> level at instant 100 is 1 (the carry leaves, the start arrives)
    iv2 = spark.createDataFrame(
        [(0, 100), (100, 150)], "start_us long, end_us long"
    )
    out2 = {
        r.bucket: r.peak_concurrency
        for r in rangejoin.interval_concurrency(iv2, bucket_us=100).collect()
    }
    assert out2 == {0: 1, 1: 1}


def test_interval_union_hand_solved(spark):
    """Hand-solved coverage islands: overlap merges, touching merges
    (half-open contiguity), a strict gap splits, duplicate intervals
    don't split, and keys never mix."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    iv = spark.createDataFrame(
        [
            (1, 0, 10),
            (1, 5, 20),    # overlaps -> same island
            (1, 20, 30),   # touches [., 20) -> still same island
            (1, 40, 50),   # strict gap -> new island
            (1, 40, 50),   # exact duplicate -> merged, counted
            (2, 0, 5),     # other key
        ],
        "user_id long, start_us long, end_us long",
    )
    got = {
        (r.user_id, r.island_id): (
            r.island_start_us, r.island_end_us, r.n_intervals
        )
        for r in rangejoin.interval_union(iv).collect()
    }
    assert got == {
        (1, 1): (0, 30, 3),
        (1, 2): (40, 50, 2),
        (2, 1): (0, 5, 1),
    }


INTERVALS_U = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),
        st.integers(min_value=1, max_value=60),
    ),
    min_size=1,
    max_size=15,
)


@given(iv=INTERVALS_U)
@_hyp_settings
def test_interval_union_matches_brute_force(spark, iv):
    """Property: islands == the textbook sort-and-merge of the same
    intervals (merge when next start <= current island end)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    rows = [(0, s, s + l) for s, l in iv]
    df = spark.createDataFrame(rows, "user_id long, start_us long, end_us long")
    got = sorted(
        (r.island_start_us, r.island_end_us, r.n_intervals)
        for r in rangejoin.interval_union(df).collect()
    )
    expect = []
    for s, e in sorted((s, s + l) for s, l in iv):
        if expect and s <= expect[-1][1]:
            expect[-1] = (expect[-1][0], max(expect[-1][1], e), expect[-1][2] + 1)
        else:
            expect.append((s, e, 1))
    assert got == [tuple(x) for x in expect]


def test_interval_union_incremental_equals_one_shot(spark):
    """The st30 invariant: unioning a first batch, then re-unioning the
    resulting islands (weighted by their absorbed counts) with a second
    batch, equals the one-shot union of all intervals — ids, spans, and
    n_intervals all identical."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import rangejoin

    all_iv = [
        (1, 0, 10), (1, 5, 20), (1, 30, 40), (1, 18, 32),  # 18-32 bridges!
        (2, 0, 5), (2, 100, 110),
    ]
    first = spark.createDataFrame(
        [r for r in all_iv[:2] + all_iv[4:5]],
        "user_id long, start_us long, end_us long",
    )
    second = spark.createDataFrame(
        [r for r in all_iv[2:4] + all_iv[5:]],
        "user_id long, start_us long, end_us long",
    )
    both = spark.createDataFrame(all_iv, "user_id long, start_us long, end_us long")

    want = sorted(
        tuple(r) for r in rangejoin.interval_union(both).collect()
    )
    stage1 = rangejoin.interval_union(first).select(
        "user_id",
        F.col("island_start_us").alias("start_us"),
        F.col("island_end_us").alias("end_us"),
        F.col("n_intervals").alias("n"),
    )
    cand = stage1.unionByName(
        second.withColumn("n", F.lit(1).cast("long"))
    )
    got = sorted(
        tuple(r)
        for r in rangejoin.interval_union(cand, count_col="n").collect()
    )
    assert got == want
    # the bridge case really merged: user 1 ends with ONE island of 4
    assert (1, 1, 0, 40, 4) in got


def test_j10_coverage_hand_solved_with_window_clipping(spark, tmp_path):
    """Hand-solved coverage: overlapping intervals merge before
    measuring, an interval straddling the window END is clipped, one
    straddling the window START contributes only its inside part, and
    coverage is the exact integer ratio."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.search_stats import (
        _J10_WIN_US,
        j10_interval_coverage,
    )

    def ev(eid, y, mo, d, h, mi, s):
        return (eid, dt.datetime(y, mo, d, h, mi, s), 1, "view", 1.0, "{}")

    rows = [
        ev(1, 2024, 1, 15, 0, 0, 0),    # [00:00, 00:05)
        ev(2, 2024, 1, 15, 0, 2, 0),    # overlaps -> island [00:00, 00:07) = 420s
        ev(3, 2024, 1, 31, 23, 58, 0),  # clipped at Feb 1 -> 120s
        ev(4, 2023, 12, 31, 23, 59, 0), # straddles start -> 240s inside
        ev(5, 2023, 12, 1, 0, 0, 0),    # fully before the window -> dropped
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = j10_interval_coverage(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    want_us = (420 + 120 + 240) * 1_000_000
    assert (r.user_id, r.n_islands, r.covered_us) == (1, 3, want_us)
    assert r.coverage == want_us / _J10_WIN_US


def test_guarded_bigint_raises_on_overflow_and_passes_below(spark):
    """The overflow gate behind t33/t34 (ADVICE r10): a DECIMAL(38,0)
    aggregate that fits BIGINT casts through untouched; one that
    exceeds 2^63-1 RAISES (where non-ANSI Spark would silently wrap
    and DuckDB would error) — the engines fail together or agree."""
    big = spark.createDataFrame(
        [(1, 2**62), (1, 2**62)], "g long, v long"
    )
    dec_sum = F.sum(F.col("v").cast("decimal(38,0)"))  # = 2^63
    ok = big.groupBy("g").agg(
        stats.guarded_bigint(
            dec_sum - F.lit(1).cast("decimal(38,0)"), "t"
        ).alias("s")
    )
    assert ok.collect()[0].s == 2**63 - 1  # exact boundary fits
    boom = big.groupBy("g").agg(stats.guarded_bigint(dec_sum, "t").alias("s"))
    with pytest.raises(Exception, match="overflows BIGINT"):
        boom.collect()


@_hyp_settings
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # start offset (s)
            st.integers(min_value=1, max_value=15),   # length (s)
        ),
        min_size=1,
        max_size=12,
    )
)
def test_j10_coverage_matches_set_measure(spark, iv):
    """Property vs a set-theoretic brute force: coverage of the clipped
    union == |union of integer microsecond sets| computed by literally
    unioning Python ranges (seconds granularity here, so the range sets
    are small). Exercises merging, containment, and duplicates."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        rangejoin,
    )

    t0 = 1_000_000_000  # epoch seconds base (integer-second intervals)
    rows = [
        (1, (t0 + s) * 1_000_000, (t0 + s + ln) * 1_000_000)
        for s, ln in iv
    ]
    df = spark.createDataFrame(rows, "user_id long, start_us long, end_us long")
    islands = rangejoin.interval_union(df).collect()
    covered_us = sum(r.island_end_us - r.island_start_us for r in islands)
    want_secs = set()
    for s, ln in iv:
        want_secs.update(range(t0 + s, t0 + s + ln))
    assert covered_us == len(want_secs) * 1_000_000


def test_interval_join_pre_epoch_negative_bins(spark):
    """Pre-epoch timestamps make unix seconds negative; the bin must be
    FLOOR division (bin -1), not truncation toward zero (bin 0), or
    every pre-epoch point silently misses its interval — the mm9
    caption-0 case ([-1 s, 5 s)) and any historical-data backfill."""
    points = spark.createDataFrame(
        [
            (1, _ts("1969-12-31 23:30:00")),  # -1800 s -> bin -1
            (2, _ts("1970-01-01 00:30:00")),  # +1800 s -> bin 0
            (3, _ts("1969-12-31 22:30:00")),  # -5400 s -> bin -2, no interval
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts("1969-12-31 23:00:00"), _ts("1970-01-01 01:00:00"))],
        "iid long, start timestamp, end timestamp",
    )
    out = rangejoin.interval_join_binned(
        points, intervals, "ts", "start", "end", bin_seconds=3600
    )
    assert {(r.pid, r.iid) for r in out.collect()} == {(1, 10), (2, 10)}


def test_length_gini_null_source_group_survives(spark):
    """A null source is a real group (groupBy and window both treat
    null as its own key): it must emit a row rather than vanish, with
    the same exact algebra as any named source."""
    docs = spark.createDataFrame(
        [
            (1, "w w", None),
            (2, "w w", None),
            (3, "w", "A"),
            (4, "w w w", "A"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in stats.length_gini(docs).collect()}
    assert set(got) == {None, "A"}
    assert got[None].gini == 0.0 and got[None].total_tokens == 4
    # A: lengths [1,3]: S1 = 1 + 6 = 7, S0 = 4, N = 2 -> (14-12)/8 = 0.25
    assert got["A"].gini == 0.25


def test_triangular_exact_past_bigint_wrap(spark):
    """ADVICE r11: length_gini's tie-block term c*(c+1)/2 must form in
    DECIMAL(38,0) — as raw BIGINTs the product raises (ANSI) or wraps
    (non-ANSI) at c ~ 3.04e9 while the DuckDB oracle's HUGEINT stays
    exact. The decimal form is exact at and far past that point, and
    the /2 is always integral."""
    cs = [1, 2, 7, 3_037_000_500, 4_000_000_000, 9_999_999_999_999]
    df = spark.createDataFrame([(c,) for c in cs], "c long")
    got = {
        r.c: int(r.t)
        for r in df.select("c", stats.triangular_exact("c").alias("t")).collect()
    }
    for c in cs:
        assert got[c] == c * (c + 1) // 2


def test_j10_user_entirely_outside_window_absent(spark, tmp_path):
    """A user whose every interval clips to empty must be ABSENT from
    the coverage frame (not present with zero) — matching the oracle's
    sweep, which has no boundary events for them either."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.search_stats import (
        j10_interval_coverage,
    )

    rows = [
        (1, dt.datetime(2023, 11, 1), 1, "view", 1.0, "{}"),   # way before
        (2, dt.datetime(2024, 3, 1), 1, "view", 1.0, "{}"),    # way after
        (3, dt.datetime(2024, 1, 10), 2, "view", 1.0, "{}"),   # inside
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r.user_id: r for r in j10_interval_coverage(spark, str(tmp_path)).collect()}
    assert set(got) == {2}
    assert got[2].covered_us == 300_000_000


def test_drift_empty_baseline_yields_null_not_error(spark):
    """Empty baseline is plausible (first run of a new metric): the
    expected-count division must yield NULL — matching DuckDB's
    double/0 — instead of an ANSI DIVIDE_BY_ZERO error, and the chi2
    CASE must fall through to NULL the same way in both engines."""
    cur_only = spark.createDataFrame(
        [(1, 0, 5), (1, 1, 7)], "g int, b long, c long"
    )
    rows = {r.bin: r for r in stats.drift_from_histogram(cur_only).collect()}
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r.n_base == 0
        assert r.expected_cur is None and r.chi2_contrib is None
    # sanity: a populated baseline still computes real numbers
    both = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 10), (1, 0, 5), (1, 1, 15)],
        "g int, b long, c long",
    )
    got = {r.bin: r for r in stats.drift_from_histogram(both).collect()}
    assert got[0].expected_cur == 10.0  # 10 * 20 / 20
    assert got[0].chi2_contrib == 2.5  # (5-10)^2/10
