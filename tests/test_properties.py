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


# --- CDC round-trip --------------------------------------------------------

STATE = st.dictionaries(KEYS, st.one_of(st.none(), VALS), max_size=6)


@given(old=STATE, new=STATE)
@_settings
def test_snapshot_diff_roundtrip_reconstructs_new_state(spark, old, new):
    """Applying the CDC stream to the old state reproduces the new
    state exactly: inserts/updates overwrite, deletes remove, silence
    means unchanged. This is the contract an incremental consumer
    relies on — if it holds for arbitrary states (including NULL
    values), no diff class is ever missed or spurious."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.merge import (
        snapshot_diff,
    )

    def df(state):
        rows = list(state.items()) or [(0, 0)]
        return spark.createDataFrame(rows, "k long, v long").limit(len(state))

    changes = snapshot_diff(df(old), df(new), ("k",)).collect()

    rebuilt = dict(old)
    for r in changes:
        assert r._change_type in ("insert", "update", "delete")
        if r._change_type == "delete":
            assert r.k in rebuilt
            del rebuilt[r.k]
        else:
            if r._change_type == "insert":
                assert r.k not in rebuilt
            else:
                assert r.k in rebuilt and rebuilt[r.k] != r.v
            rebuilt[r.k] = r.v
    assert rebuilt == new


@given(keys=st.lists(st.integers(min_value=0, max_value=10**9), max_size=20))
@_settings
def test_split_assign_total_and_consistent(spark, keys):
    """Every key lands in exactly one split, and reassignments never
    happen across differing corpora (hash depends on the key alone)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.prep import (
        split_assign,
    )

    uniq = sorted(set(keys))
    df = spark.createDataFrame([(k,) for k in uniq] or [(0,)], "k long").limit(
        len(uniq)
    )
    rows = split_assign(df, "k").collect()
    assert len(rows) == len(uniq)
    assert all(r.split in ("train", "val", "test") for r in rows)
    # subset invariance: the assignment of each key is context-free
    half = uniq[::2]
    df2 = spark.createDataFrame([(k,) for k in half] or [(0,)], "k long").limit(
        len(half)
    )
    sub = {r.k: r.split for r in split_assign(df2, "k").collect()}
    full = {r.k: r.split for r in rows}
    assert all(full[k] == v for k, v in sub.items())


GROUPS = st.sampled_from(["a", "b", None])  # NULL is a real group too
SNAP = st.lists(
    st.tuples(KEYS, GROUPS, st.integers(min_value=-99, max_value=99)),
    min_size=0,
    max_size=10,
    unique_by=lambda t: t[0],  # one row per key (snapshot invariant)
)


@given(old=SNAP, new=SNAP)
@_settings
def test_incremental_agg_always_equals_recompute(spark, old, new):
    """IVM law: for ANY pair of snapshots, maintaining the old
    aggregate with the CDC image stream equals recomputing from the
    new snapshot — inserts, deletes, value updates, group migrations,
    and groups emptying out all included."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.merge import (
        incremental_agg,
        snapshot_diff_images,
    )

    schema = "k long, g string, v double"

    def df(rows):
        return spark.createDataFrame(
            [(k, g, float(v)) for k, g, v in rows] or [(0, "a", 0.0)], schema
        ).limit(len(rows))

    cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long")

    def agg(d):
        return d.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"), F.sum(cents).alias("value_cents")
        )

    o, n = df(old), df(new)
    maintained = incremental_agg(
        agg(o), snapshot_diff_images(o, n, ("k",)), ("g",), value_col="v"
    )
    got = {r.g: (r.n_rows, r.value_cents) for r in maintained.collect()}
    want = {r.g: (r.n_rows, r.value_cents) for r in agg(n).collect()}
    assert got == want


SIMROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # query_id
        st.integers(min_value=0, max_value=20),    # neighbor_id
        st.one_of(                                  # sims incl. +/-0 AND NaN
            st.just(float("nan")),
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        ),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


def _nan_safe(v):
    import math

    return None if isinstance(v, float) and math.isnan(v) else v


@given(rows=SIMROWS, k=st.integers(min_value=1, max_value=5))
@_settings
def test_topk_per_query_matches_window_reference(spark, rows, k):
    """The two-stage partial top-k must equal the naive window ranking
    (sim DESC, neighbor ASC) for any score set — including duplicate
    sims, signed zeros, and NaNs (which rank FIRST under descending
    order in both Spark windows and DuckDB)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.similarity import (
        _topk_per_query,
    )

    sims = spark.createDataFrame(
        [(q, n, float(s)) for q, n, s in rows] or [(0, 0, 0.0)],
        "query_id long, neighbor_id long, cos_sim double",
    ).limit(len(rows))
    got = {
        (r.query_id, r.rank): (r.neighbor_id, _nan_safe(r.cos_sim))
        for r in _topk_per_query(sims.repartition(4), k).collect()
    }
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    want = {
        (r.query_id, r.rank): (r.neighbor_id, _nan_safe(r.cos_sim))
        for r in sims.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank") <= k)
        .collect()
    }
    assert got == want
