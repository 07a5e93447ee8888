"""Property-based tests (hypothesis) for the merge and time operators —
the algebraic laws the pipelines rely on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from group_2_shopware_enterprise_data_engineering_project_spark.operators.merge import (
    merge_additive,
    merge_replace,
)

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.integers(min_value=-1000, max_value=1000)
BATCH = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k long, v long").limit(
        len(rows)
    )


@given(t=BATCH, s=BATCH)
@_settings
def test_additive_merge_is_commutative_and_sum_preserving(spark, t, s):
    """K5: target+source totals == source+target totals == plain sum of
    the union — accumulation loses nothing and order doesn't matter."""
    # pre-aggregate per key (merge inputs are KPI rows, one per key)
    def agg(rows):
        out = {}
        for k, v in rows:
            out[k] = out.get(k, 0) + v
        return [(k, v) for k, v in out.items()]

    ta, sa = agg(t), agg(s)
    ab = {r.k: r.v for r in merge_additive(_df(spark, ta), _df(spark, sa), ("k",), ("v",)).collect()}
    ba = {r.k: r.v for r in merge_additive(_df(spark, sa), _df(spark, ta), ("k",), ("v",)).collect()}
    expect = agg(ta + sa)
    assert ab == ba == dict(expect)


@given(t=BATCH, s=BATCH)
@_settings
def test_replace_merge_source_wins_and_is_idempotent(spark, t, s):
    """K4: after the merge, every source key holds the source value,
    every target-only key is untouched; merging the same source twice
    changes nothing."""
    def latest(rows):
        out = {}
        for k, v in rows:
            out[k] = v  # last occurrence wins within a batch input
        return [(k, v) for k, v in out.items()]

    ta, sa = latest(t), latest(s)
    once = merge_replace(_df(spark, ta), _df(spark, sa), ("k",))
    got = {r.k: r.v for r in once.collect()}
    expect = {**dict(ta), **dict(sa)}
    assert got == expect
    twice = merge_replace(once, _df(spark, sa), ("k",))
    assert {r.k: r.v for r in twice.collect()} == expect
