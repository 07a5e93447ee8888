"""Validation framework: split / summary / batch gate (P3-P7, K6-K8)."""

from __future__ import annotations

from group_2_shopware_enterprise_data_engineering_project_spark.operators import validate as V


def _df(spark):
    # (id, stock, threshold) with planted violations.
    rows = [
        (1, 10, 5),      # valid
        (2, -1, 5),      # stock negative
        (None, 10, 5),   # id missing
        (3, 10, None),   # valid (threshold nullable)
        (4, 10, -2),     # threshold negative (non-null)
    ]
    return spark.createDataFrame(rows, "id long, stock long, threshold long")


def _rules():
    return (
        V.required(["id"])
        + V.non_negative(["stock"])
        + V.non_negative_or_null(["threshold"])
    )


def test_split_counts_and_reasons(spark):
    valid, invalid = V.split(_df(spark), _rules())
    assert valid.count() == 2
    inv = {tuple(r.violations) for r in invalid.collect()}
    assert ("stock_non_negative",) in inv
    assert ("id_required",) in inv
    assert ("threshold_non_negative_or_null",) in inv
    # invalid side keeps the violations column; valid side drops it
    assert "violations" not in valid.columns


def test_summary_single_row(spark):
    row = V.summary(_df(spark), _rules()).collect()[0]
    assert row.total_rows == 5
    assert row.valid_rows == 2
    assert row.invalid_rows == 3
    assert row.viol_id_required == 1
    assert row.viol_stock_non_negative == 1


def test_batch_gate(spark):
    df = _df(spark)
    assert not V.batch_is_valid(df, _rules())
    clean = df.filter("id IS NOT NULL AND stock >= 0 AND (threshold IS NULL OR threshold >= 0)")
    assert V.batch_is_valid(clean, _rules())


def test_not_future_rule(spark):
    df = spark.createDataFrame(
        [("2025-01-01 00:00:00",), ("2025-01-03 00:00:00",)], ["ts"]
    ).selectExpr("CAST(ts AS timestamp) AS ts")
    rule = V.not_future("ts", horizon="24 hours", now="2025-01-01 12:00:00")
    valid, invalid = V.split(df, [rule])
    assert valid.count() == 1 and invalid.count() == 1


def test_positive_key_rule(spark):
    df = spark.createDataFrame([(1,), (0,), (-3,)], ["customer_id"])
    valid, invalid = V.split(df, [V.positive_key("customer_id")])
    assert valid.count() == 1 and invalid.count() == 2


def test_quarantine_split_writes_both_sides(spark, tmp_path):
    vp, rp = str(tmp_path / "valid"), str(tmp_path / "rejected")
    V.quarantine_split(_df(spark), _rules(), valid_path=vp, rejected_path=rp)
    assert spark.read.parquet(vp).count() == 2
    rej = spark.read.parquet(rp)
    assert rej.count() == 3
    # violations serialized as JSON string for the quarantine zone
    assert dict(rej.dtypes)["violations"] == "string"


def test_checked_write_blocks_contract_violations(spark, tmp_path):
    import os

    from group_2_shopware_enterprise_data_engineering_project_spark.sinks import (
        DataContractViolation,
        checked_write,
    )

    bad = spark.createDataFrame(
        [(1, "ok", 5.0), (None, "ok", 2.0)], "k long, s string, v double"
    )
    out = str(tmp_path / "contract")
    import pytest as _pytest

    with _pytest.raises(DataContractViolation) as ei:
        checked_write(bad, out, {"completeness_cols": ["k"]})
    assert "completeness:k" in str(ei.value)
    assert not os.path.exists(out)  # nothing published on violation

    good = spark.createDataFrame([(1, "ok", 5.0)], "k long, s string, v double")
    checked_write(good, out, {"completeness_cols": ["k"], "unique_cols": ["k"]})
    assert spark.read.parquet(out).count() == 1
