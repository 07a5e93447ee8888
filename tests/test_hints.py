"""Size-gated broadcast hint (r11 verdict item 1).

A forced F.broadcast on an sf-proportional dimension bypasses Spark's
size checks and OOMs at the 100 TB design point; broadcast_if_small
applies the hint only when Catalyst's metadata size estimate fits the
gate, otherwise leaves the strategy to the optimizer/AQE. Same test
shape as the MergeOnReadTable tombstone gate (test_merge.py).

Catalyst only knows sizes for frames rooted at a file scan (a
PySpark createDataFrame local frame is a LogicalRDD with UNKNOWN
stats = Long.MaxValue, which the gate correctly treats as "too big
to force") — so the dims here round-trip through parquet, exactly
like every production site the helper guards.
"""

from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators.hints import (
    broadcast_if_small,
    estimated_plan_bytes,
)


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _pq(spark, tmp_path, name, rows, schema):
    p = str(tmp_path / name)
    spark.createDataFrame(rows, schema).write.parquet(p)
    return spark.read.parquet(p)


def test_broadcast_if_small_hints_below_gate_and_not_above(spark, tmp_path):
    """Below the gate the analyzed plan carries the hint; with a
    1-byte gate (any real frame exceeds it) the join is UNhinted —
    the above-gate path falls back to a shuffle join / AQE's runtime
    choice. Results are identical either way."""
    fact = _pq(
        spark, tmp_path, "fact", [(i, i % 7) for i in range(100)],
        "id long, k long",
    )
    dim = _pq(
        spark, tmp_path, "dim", [(i, f"d{i}") for i in range(7)],
        "k long, name string",
    )

    est = estimated_plan_bytes(dim)
    assert 0 < est <= 10 << 20  # a 7-row parquet frame is tiny

    hinted = fact.join(broadcast_if_small(dim), "k")
    assert "ResolvedHint" in _analyzed(hinted)

    unhinted = fact.join(broadcast_if_small(dim, max_bytes=1), "k")
    assert "ResolvedHint" not in _analyzed(unhinted)

    want = sorted((r.id, r.name) for r in hinted.collect())
    got = sorted((r.id, r.name) for r in unhinted.collect())
    assert want == got and len(want) == 100


def test_unknown_size_frame_is_never_force_broadcast(spark):
    """A frame whose size Catalyst cannot estimate (LogicalRDD from a
    local collection — stats default to Long.MaxValue) must NOT get
    the forced hint: unknown means "don't bet the driver on it"."""
    dim = spark.createDataFrame([(1, "a")], "k long, v string")
    assert estimated_plan_bytes(dim) > 10 << 20
    fact = spark.range(10).withColumn("k", (F.col("id") % 2).cast("long"))
    joined = fact.join(broadcast_if_small(dim), "k", "left")
    assert "ResolvedHint" not in _analyzed(joined)


def test_broadcast_if_small_above_gate_plan_is_not_broadcast(spark, tmp_path):
    """Past the gate the PHYSICAL plan must not be a broadcast join
    when AQE's own threshold is also off — proving the helper really
    removed the forced hint rather than re-spelling it."""
    fact = _pq(
        spark, tmp_path, "fact2", [(i, i % 5) for i in range(64)],
        "id long, k long",
    )
    dim = _pq(
        spark, tmp_path, "dim2", [(i, i * 10) for i in range(5)],
        "k long, v long",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            fact.join(broadcast_if_small(dim, max_bytes=1), "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" not in plan
        forced = (
            fact.join(broadcast_if_small(dim), "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in forced  # hint still forces below gate
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_gated_dimension_queries_still_execute(spark, tmp_path):
    """The six swept sites (j1/a16/a19/a31/a41/st17 — r11 verdict)
    run through the gated helper; at test scale parquet-backed dims
    fit the default gate, so the broadcast fast path is preserved.
    Smoke the pure-operator site (j1 loyalty_join) end to end."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.analytics import (
        loyalty_join,
    )

    sessions = spark.createDataFrame(
        [("1", 5), ("2", 3), ("99", 1)], "user_id string, n long"
    )
    customers = _pq(
        spark, tmp_path, "cust",
        [(1, "alice", 10.0, "AUTO"), (2, "bob", 20.0, "BIKE")],
        "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
    )
    got = {r.user_id: (r.customer_name, r.acctbal, r.mktsegment)
           for r in loyalty_join(sessions, customers).collect()}
    assert got["1"] == ("alice", 10.0, "AUTO")
    assert got["99"] == ("unknown", 0.0, "NONE")  # COALESCE defaults
    assert "ResolvedHint" in _analyzed(loyalty_join(sessions, customers))
