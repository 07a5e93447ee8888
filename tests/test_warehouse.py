"""Unit tests for SCD2 history, expectation suites, and market-basket
co-occurrence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    analytics,
    scd,
    validate,
)


def _d(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# --- scd2_build ---------------------------------------------------------


def test_scd2_intervals_and_current_flag(spark):
    rows = [
        (1, _d("2024-01-01"), 101, "bronze"),
        (1, _d("2024-02-01"), 102, "silver"),
        (1, _d("2024-03-01"), 103, "gold"),
        (2, _d("2024-01-15"), 104, "bronze"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long, tier string")
    out = scd.scd2_build(df, "k", "ts", "tb", ["tier"]).orderBy("k", "valid_from")
    got = [(r.k, r.tier, r.valid_to is None, r.is_current) for r in out.collect()]
    assert got == [
        (1, "bronze", False, False),
        (1, "silver", False, False),
        (1, "gold", True, True),
        (2, "bronze", True, True),
    ]
    # half-open chaining: each valid_to == next valid_from
    k1 = [r for r in out.collect() if r.k == 1]
    assert k1[0].valid_to == k1[1].valid_from
    assert k1[1].valid_to == k1[2].valid_from


def test_scd2_collapses_noop_changes(spark):
    rows = [
        (1, _d("2024-01-01"), 1, "a"),
        (1, _d("2024-02-01"), 2, "a"),  # no-op: must NOT split interval
        (1, _d("2024-03-01"), 3, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long, v string")
    out = scd.scd2_build(df, "k", "ts", "tb", ["v"]).collect()
    assert len(out) == 2
    first = next(r for r in out if r.v == "a")
    assert first.valid_from == _d("2024-01-01")
    assert first.valid_to == _d("2024-03-01")  # interval spans the no-op


def test_scd2_null_attrs_are_stable(spark):
    rows = [
        (1, _d("2024-01-01"), 1, None),
        (1, _d("2024-02-01"), 2, None),  # null == null: no-op
        (1, _d("2024-03-01"), 3, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long, v string")
    assert scd.scd2_build(df, "k", "ts", "tb", ["v"]).count() == 2


def test_scd2_requires_attrs(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        scd.scd2_build(df, "id", "id", "id", [])


# --- expectation_report -------------------------------------------------


def test_expectation_report_detects_violations(spark):
    df = spark.createDataFrame(
        [(1, "ok", 5.0), (2, "ok", 50.0), (None, "BAD", -1.0), (2, "ok", 3.0)],
        "k long, status string, v double",
    )
    rep = {
        r.constraint_name: r
        for r in validate.expectation_report(
            df,
            completeness_cols=["k"],
            unique_cols=["k"],
            bounds={"v": (0.0, 10.0)},
            allowed={"status": ["ok"]},
        ).collect()
    }
    assert rep["completeness:k"].passed is False
    assert rep["completeness:k"].metric == 0.75
    assert rep["uniqueness:k"].passed is False  # k=2 twice
    assert rep["bounds:v"].passed is False  # -1 below, 50 above
    assert rep["allowed_values:status"].metric == 1.0  # one bad row
    assert rep["allowed_values:status"].passed is False


def test_expectation_report_all_green_and_single_scan(spark):
    df = spark.createDataFrame([(1, "ok", 1.0), (2, "ok", 2.0)], "k long, s string, v double")
    rep = validate.expectation_report(
        df,
        completeness_cols=["k"],
        unique_cols=["k"],
        bounds={"v": (0.0, 10.0)},
        allowed={"s": ["ok"]},
    )
    assert all(r.passed for r in rep.collect())
    # one aggregate scan: no join, no second read
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# --- item_cooccurrence --------------------------------------------------


def test_cooccurrence_counts_pairs_once_per_order(spark):
    rows = [
        (1, 10), (1, 20), (1, 20),  # dup line: pair (10,20) counted once
        (2, 10), (2, 20),
        (3, 10), (3, 30),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.item_a, r.item_b): r.n_orders for r in analytics.item_cooccurrence(df).collect()}
    assert out[(10, 20)] == 2
    assert out[(10, 30)] == 1
    assert (20, 10) not in out  # unordered pair emitted once


def test_cooccurrence_excludes_oversized_baskets(spark):
    rows = [(1, i) for i in range(10)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = analytics.item_cooccurrence(df, max_basket=5).collect()
    assert {(r.item_a, r.item_b) for r in out} == {(1, 2)}


# --- naive bayes --------------------------------------------------------


def test_nb_learns_separable_langs(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        nbayes,
    )

    rows = [(i, "en", "the cat and the dog") for i in range(10)] + [
        (i + 10, "fr", "le chat et les chiens") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = nbayes.nb_train(docs, ["the", "and", "le", "et", "les"])
    out = nbayes.nb_predict(docs, model).collect()
    assert all(r.correct for r in out)
    # smoothing: every (class, term) likelihood strictly inside (0, 1)
    ps = [r.p for r in model.collect()]
    assert all(0.0 < p < 1.0 for p in ps)


def test_nb_prediction_is_deterministic_on_uninformative_doc(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        nbayes,
    )

    rows = [(0, "aa", "x x"), (1, "bb", "y y")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = nbayes.nb_train(docs, ["x", "y"])
    # a doc containing neither marker scores identically under both
    # classes (same priors, symmetric likelihoods) -> tie must go to
    # the lexicographically first class, every run
    probe = spark.createDataFrame([(9, "zz", "q")], "doc_id long, lang string, text string")
    preds = {nbayes.nb_predict(probe, model).collect()[0].predicted for _ in range(3)}
    assert preds == {"aa"}


def test_nb_train_requires_vocab(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        nbayes,
    )

    docs = spark.createDataFrame([(0, "en", "x")], "doc_id long, lang string, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        nbayes.nb_train(docs, [])


def test_zorder_morton_interleave_and_rectangle_bound(spark):
    """z_value must be the exact Morton interleave (x in even bit
    positions, y in odd), the SQL mirror must agree bit-for-bit, and
    fixed-width z-ranges must cover bounded rectangles of the plane."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import zorder

    def morton(x, y, bits=8):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    pts = [(x, y) for x in (0, 1, 3, 170, 255) for y in (0, 2, 85, 255)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder.z_value(F.col("x"), F.col("y"), bits=8).alias("z")
        ).collect()
    }
    assert got == {(x, y): morton(x, y) for x, y in pts}
    # masking: out-of-range high bits cannot collide across dims
    big = spark.createDataFrame([(256 + 3, 512 + 5)], "x long, y long")
    assert (
        big.select(zorder.z_value(F.col("x"), F.col("y"), bits=8).alias("z"))
        .collect()[0]
        .z
        == morton(3, 5)
    )
    # SQL mirror parity via DuckDB
    import duckdb

    con = duckdb.connect()
    sql_z = zorder.z_value_sql("x", "y", bits=8)
    for x, y in pts:
        assert con.sql(f"SELECT {sql_z} FROM (SELECT {x} AS x, {y} AS y)").fetchone()[0] == morton(x, y)
    # layout: 64 fixed-width ranges over an exhaustive 8-bit grid ->
    # every bucket is exactly a 32x32 rectangle
    grid = spark.createDataFrame(
        [(x, y) for x in range(0, 256, 8) for y in range(0, 256, 8)],
        "x long, y long",
    )
    stats = zorder.zorder_layout_stats(
        grid, F.col("x"), F.col("y"), n_buckets=64, bits=8
    ).collect()
    assert len(stats) == 64
    for r in stats:
        assert r.x_max - r.x_min <= 31 and r.y_max - r.y_min <= 31


def test_k33_retention_plan_hand_solved(spark, tmp_path):
    """Retention boundaries by hand on a 12-version catalog with
    keep_last=7: versions 1-7 (newest first) are 'recent'; among the
    older five, exactly the newest of each ISO week survives as
    'weekly'; the rest expire. Two older versions share a week to
    force a real thinning decision."""
    import datetime as dt

    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.warehouse_q import (
        k33_retention_plan,
    )

    # Mon 2024-01-01 anchors ISO weeks. Older set (ranks 8-12):
    # Jan 2 (Tue) + Jan 3 (Wed) share week 1; Jan 8 (Mon) week 2;
    # Jan 16 + Jan 17 share week 3. Recent set: Jan 22..Jan 28.
    older = [
        dt.datetime(2024, 1, 2),
        dt.datetime(2024, 1, 3),
        dt.datetime(2024, 1, 8),
        dt.datetime(2024, 1, 16),
        dt.datetime(2024, 1, 17),
    ]
    recent = [dt.datetime(2024, 1, 22 + i) for i in range(7)]
    rows = [
        (i, 1, "O", 10.0, ts, "1-URGENT")
        for i, ts in enumerate(older + recent)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.version_ts: (r.rn, r.keep_reason, r.keep_flag)
        for r in k33_retention_plan(spark, str(tmp_path)).collect()
    }
    assert len(got) == 12
    for ts in recent:
        assert got[ts][1] == "recent" and got[ts][2] == 1
    assert got[dt.datetime(2024, 1, 3)] == (11, "weekly", 1)   # wk1 latest
    assert got[dt.datetime(2024, 1, 2)] == (12, "expire", 0)
    assert got[dt.datetime(2024, 1, 8)] == (10, "weekly", 1)   # wk2 alone
    assert got[dt.datetime(2024, 1, 17)] == (8, "weekly", 1)   # wk3 latest
    assert got[dt.datetime(2024, 1, 16)] == (9, "expire", 0)


def test_k33_retention_all_recent_when_catalog_small(spark, tmp_path):
    """Fewer versions than keep_last: everything is 'recent', nothing
    expires, and no 'weekly' row exists (the older set is empty)."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.warehouse_q import (
        k33_retention_plan,
    )

    rows = [
        (i, 1, "O", 1.0, dt.datetime(2024, 3, 1 + i), "1-URGENT")
        for i in range(4)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = k33_retention_plan(spark, str(tmp_path)).collect()
    assert len(got) == 4
    assert all(r.keep_reason == "recent" and r.keep_flag == 1 for r in got)
