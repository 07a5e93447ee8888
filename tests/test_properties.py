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

from tests.hyputil import hyp_examples

_settings = settings(
    max_examples=hyp_examples(6, 15),
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


# --- round-4 operators ------------------------------------------------------

_TS0 = 1_700_000_000  # epoch base for generated timestamps


@given(
    points=st.lists(st.integers(min_value=0, max_value=5000), min_size=0, max_size=25),
    ivals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),
            st.integers(min_value=1, max_value=900),
        ),
        min_size=0,
        max_size=10,
    ),
    bin_s=st.sampled_from([60, 300, 1000]),
)
@_settings
def test_interval_join_binned_equals_naive(spark, points, ivals, bin_s):
    """Binned interval join == the naive O(n·m) definition, for any bin
    size — binning must never change semantics, only the plan."""
    import datetime as dt

    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.rangejoin import (
        interval_join_binned,
    )

    to_ts = lambda s: dt.datetime.utcfromtimestamp(_TS0 + s)  # noqa: E731
    pts = spark.createDataFrame(
        [(i, to_ts(p)) for i, p in enumerate(points)] or [(0, to_ts(0))],
        "pid long, ts timestamp",
    ).limit(len(points))
    ivs = spark.createDataFrame(
        [(i, to_ts(s), to_ts(s + d)) for i, (s, d) in enumerate(ivals)]
        or [(0, to_ts(0), to_ts(1))],
        "iid long, start timestamp, end timestamp",
    ).limit(len(ivals))
    got = {
        (r.pid, r.iid)
        for r in interval_join_binned(pts, ivs, "ts", "start", "end", bin_s).collect()
    }
    expect = {
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, (s, d) in enumerate(ivals)
        if s <= p < s + d
    }
    assert got == expect


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # key
            st.integers(min_value=0, max_value=50),  # ts offset
            st.sampled_from(["a", "b", "c"]),  # attr
        ),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_scd2_intervals_partition_each_keys_timeline(spark, rows):
    """Per key: intervals are non-overlapping, chained (valid_to ==
    next valid_from), exactly one is_current, and consecutive
    intervals never carry the same attrs (else they'd have
    collapsed)."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.scd import (
        scd2_build,
    )

    to_ts = lambda s: dt.datetime.utcfromtimestamp(_TS0 + s * 3600)  # noqa: E731
    df = spark.createDataFrame(
        [(k, to_ts(t), i, v) for i, (k, t, v) in enumerate(rows)],
        "k long, ts timestamp, tb long, v string",
    )
    hist = scd2_build(df, "k", "ts", "tb", ["v"]).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in rs if r.is_current) == 1
        assert rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from  # chained, no gaps/overlaps
            assert a.v != b.v  # no-op changes collapsed


@given(
    vals=st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=60)
)
@_settings
def test_winsorize_bounds_and_counts(spark, vals):
    """Thresholds are actual data values, lo <= hi, clamp counts match
    the raw tails, and the winsorized sum equals the direct clamped
    sum."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.stats import (
        winsorized_summary,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v long")
    out = winsorized_summary(df, "grp", F.col("v"), 0.1, 0.9).collect()[0]
    assert out.lo_value in vals and out.hi_value in vals
    assert out.lo_value <= out.hi_value
    assert out.n == len(vals)
    assert out.n_clamped_lo == sum(1 for v in vals if v < out.lo_value)
    assert out.n_clamped_hi == sum(1 for v in vals if v > out.hi_value)
    expect = sum(max(out.lo_value, min(out.hi_value, v)) for v in vals)
    assert out.winsorized_sum == expect


@given(
    keys=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=40, unique=True),
    nparts=st.sampled_from([1, 3, 8]),
)
@_settings
def test_dense_ids_is_rank_permutation(spark, keys, nparts):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.prep import (
        dense_ids,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = {r.k: r.dense_id for r in dense_ids(df, ["k"], num_partitions=nparts).collect()}
    expect = {k: i for i, k in enumerate(sorted(keys))}
    assert out == expect


# --- salt-split self-join: lossless under any bucket layout ---------------

SALT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),  # id
        st.integers(min_value=0, max_value=3),  # bucket
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda t: t[0],
)
CAPS = st.integers(min_value=1, max_value=8)


@given(rows=SALT_ROWS, cap=CAPS)
@_settings
def test_salted_pair_join_is_lossless(spark, rows, cap):
    """For ANY bucket layout and ANY cap >= 1, the salted self-join
    emits exactly the same-bucket unordered pairs, each exactly once —
    the algebraic contract every dedup family rides on."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.saltjoin import (
        salted_pair_join,
        salted_pair_tasks,
    )

    df = spark.createDataFrame(rows or [(0, 0)], "vec_id long, bucket long").limit(
        len(rows)
    )
    tasks = salted_pair_tasks(df, cap, ("bucket",), "vec_id")
    got = [
        (r.a, r.b)
        for r in salted_pair_join(tasks, ("bucket",), "vec_id")
        .select(
            F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias("a"),
            F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("b"),
        )
        .collect()
    ]
    by_bucket: dict[int, list[int]] = {}
    for vid, bkt in rows:
        by_bucket.setdefault(bkt, []).append(vid)
    want = sorted(
        (min(x, y), max(x, y))
        for ids in by_bucket.values()
        for i, x in enumerate(ids)
        for y in ids[i + 1 :]
    )
    # exactly once each: compare as sorted LISTS, not sets
    assert sorted(got) == want


# --- incremental dedup equivalence ---------------------------------------

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
DOC = st.lists(
    st.sampled_from(WORDS), min_size=4, max_size=10
)
CORPUS = st.lists(DOC, min_size=2, max_size=7)
MASK = st.lists(st.booleans(), min_size=7, max_size=7)

_dedup_settings = settings(
    max_examples=hyp_examples(4, 8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus=CORPUS, mask=MASK)
@_dedup_settings
def test_incremental_dedup_equals_union_dedup_minus_existing_pairs(
    spark, corpus, mask
):
    """d7/st14 contract, as an algebraic law over random corpora and
    random shard splits: incremental_dedup(new, existing) must emit
    exactly the pairs of minhash_lsh_dedup(new UNION existing) whose
    sides are not BOTH historical, with identical jaccard values and a
    correct vs_existing flag — for any split, including empty new and
    empty existing."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import minhash

    rows = [(i, " ".join(doc)) for i, doc in enumerate(corpus)]
    schema = "doc_id long, text string"
    docs = spark.createDataFrame(rows, schema)
    new_ids = {i for i, _ in rows if mask[i]}
    new_df = spark.createDataFrame(
        [r for r in rows if r[0] in new_ids] or [], schema
    )
    ex_df = spark.createDataFrame(
        [r for r in rows if r[0] not in new_ids] or [], schema
    )

    union_pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash.minhash_lsh_dedup(docs, threshold=0.4).collect()
    }
    expect = {
        pair: (j, int(not (pair[0] in new_ids and pair[1] in new_ids)))
        for pair, j in union_pairs.items()
        if pair[0] in new_ids or pair[1] in new_ids
    }
    got = {
        (r.doc_a, r.doc_b): (r.jaccard, r.vs_existing)
        for r in minhash.incremental_dedup(new_df, ex_df, threshold=0.4).collect()
    }
    assert got == expect


# --- bipartite salt-split: lossless under any two-sided layout ------------

BI_LEFT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),  # id
        st.integers(min_value=0, max_value=3),  # bucket
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)
BI_RIGHT = st.lists(
    st.tuples(
        st.integers(min_value=2 * 10**6, max_value=3 * 10**6),  # disjoint ids
        st.integers(min_value=0, max_value=3),
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(left=BI_LEFT, right=BI_RIGHT, cap=CAPS)
@_settings
def test_salted_bipartite_join_is_lossless(spark, left, right, cap):
    """For ANY two-sided bucket layout and ANY cap >= 1, the bipartite
    salt emits exactly the cross-side same-bucket pairs, each exactly
    once — including buckets oversized on only one side, on both, and
    absent from one side entirely (the d7/st14 candidate contract)."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.saltjoin import (
        salted_bipartite_join,
    )

    schema = "vec_id long, bucket long"
    ldf = spark.createDataFrame(left or [(0, 0)], schema).limit(len(left))
    rdf = spark.createDataFrame(right or [(0, 0)], schema).limit(len(right))
    got = [
        (r.l, r.r)
        for r in salted_bipartite_join(
            ldf, rdf, cap, ("bucket",), "vec_id", "vec_id"
        )
        .select(
            F.col("a.vec_id").alias("l"), F.col("b.vec_id").alias("r")
        )
        .collect()
    ]
    want = sorted(
        (lid, rid)
        for lid, lb in left
        for rid, rb in right
        if lb == rb
    )
    # exactly once each: compare as sorted LISTS, not sets
    assert sorted(got) == want


# --- temperature resample: quota law under any source layout --------------

SRC_LAYOUT = st.lists(
    st.integers(min_value=1, max_value=60),  # docs per source
    min_size=1,
    max_size=6,
)


def _quota_reference(sizes: list[int], sample_div: int) -> dict[str, int]:
    """Pure-Python largest-remainder reference for temperature_resample:
    isqrt weights, BIGINT div/mod, remainder-desc + name-asc tie-break,
    without-replacement clamp (no redistribution)."""
    import math

    names = [f"s{i}" for i in range(len(sizes))]
    w = {n: math.isqrt(c) for n, c in zip(names, sizes)}
    W = sum(w.values())
    k = sum(sizes) // sample_div
    base = {n: (k * w[n]) // W for n in names}
    rem = {n: (k * w[n]) % W for n in names}
    leftover = k - sum(base.values())
    ranked = sorted(names, key=lambda n: (-rem[n], n))
    return {
        n: min(base[n] + (1 if i < leftover else 0), sizes[names.index(n)])
        for i, n in enumerate(ranked)
    }


@given(sizes=SRC_LAYOUT, div=st.integers(min_value=2, max_value=8))
@_settings
def test_temperature_resample_matches_reference_quotas(spark, sizes, div):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    rows, next_id = [], 0
    for i, c in enumerate(sizes):
        for _ in range(c):
            rows.append((next_id, f"s{i}"))
            next_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = prep.temperature_resample(docs, sample_div=div).collect()
    got: dict[str, int] = {}
    for r in out:
        got[r.source] = got.get(r.source, 0) + 1
        assert 1 <= r.mix_rank <= r.quota
    expect = {n: q for n, q in _quota_reference(sizes, div).items() if q > 0}
    assert got == expect


# --- skew_join: lossless under any layout, threshold, salt ----------------

SKEW_LEFT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key
        st.integers(min_value=0, max_value=10**6),  # unique-ish id
    ),
    min_size=0,
    max_size=30,
)
SKEW_RIGHT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=10**6),
    ),
    min_size=0,
    max_size=15,
)


@given(
    left=SKEW_LEFT,
    right=SKEW_RIGHT,
    salt=st.integers(min_value=1, max_value=6),
    thr=st.integers(min_value=0, max_value=10),
    how=st.sampled_from(["inner", "left"]),
)
@_settings
def test_skew_join_lossless_for_any_layout(spark, left, right, salt, thr, how):
    """For ANY input layout, hot threshold, salt count, and join type,
    skew_join's output multiset equals the plain join's — including
    duplicate ids, keys hot on one or both sides, and unmatched left
    rows under 'left'."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.skewjoin import (
        skew_join,
    )

    schema = "k long, v long"
    ldf = spark.createDataFrame(left or [(0, 0)], schema).limit(len(left))
    rdf = (
        spark.createDataFrame(right or [(0, 0)], schema)
        .limit(len(right))
        .withColumnRenamed("v", "w")
    )
    plain = sorted(
        (r.k, r.v, r.w)
        for r in ldf.join(rdf, "k", how).select("k", "v", "w").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w)
        for r in skew_join(ldf, rdf, "k", salt=salt, hot_threshold=thr, how=how)
        .select("k", "v", "w")
        .collect()
    )
    assert salted == plain


# --- sketch / bucketizer laws ----------------------------------------------

_HVALS = st.lists(
    st.integers(min_value=-50, max_value=1050), min_size=1, max_size=40
)


@given(a=_HVALS, b=_HVALS)
@_settings
def test_histogram_sketch_merge_law_random_splits(spark, a, b):
    """Union-then-bin == bin-then-add for ANY pair of corpora, and the
    quantile estimates computed from either sketch agree — the
    mergeability contract m31 rides on (including out-of-domain values
    clamped into edge bins)."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    lo, hi, bins = 0, 1000, 8
    da = spark.createDataFrame([("g", v) for v in a], "g string, v long")
    db = spark.createDataFrame([("g", v) for v in b], "g string, v long")
    whole = stats.histogram_bins(da.unionByName(db), "g", F.col("v"), lo, hi, bins)
    merged = (
        stats.histogram_bins(da, "g", F.col("v"), lo, hi, bins)
        .unionByName(stats.histogram_bins(db, "g", F.col("v"), lo, hi, bins))
        .groupBy("g", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    qw = stats.histogram_quantiles(whole, lo, hi, bins).collect()[0]
    qm = stats.histogram_quantiles(merged, lo, hi, bins).collect()[0]
    assert tuple(qw) == tuple(qm)
    assert qw.n == len(a) + len(b)


@given(vals=_HVALS, nb=st.integers(min_value=2, max_value=6))
@_settings
def test_equidepth_bucketize_is_a_partition_with_ordered_ranges(spark, vals, nb):
    """For ANY multiset: bucket counts sum to n, bucket ids are a
    prefix of 0..B-1 in value order, ranges never overlap, and no
    bucket except a tie-absorber exceeds ceil(n/B) + ties slack —
    i.e. the output is always a valid ordered partition of the data."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import stats

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    out = sorted(
        stats.equidepth_bucketize(df, "g", F.col("v"), nb).collect(),
        key=lambda r: r.bucket,
    )
    assert sum(r.n_rows for r in out) == len(vals)
    assert all(r.lo <= r.hi for r in out)
    assert all(out[i].hi < out[i + 1].lo for i in range(len(out) - 1))
    assert 0 <= out[0].bucket and out[-1].bucket <= nb - 1
    # deterministic: same input -> identical sketch
    again = sorted(
        stats.equidepth_bucketize(df, "g", F.col("v"), nb).collect(),
        key=lambda r: r.bucket,
    )
    assert list(map(tuple, out)) == list(map(tuple, again))


# --- r7: CDC apply == brute-force replay ------------------------------------

_OPS = st.sampled_from(["I", "U", "D"])
_FEED = st.lists(
    st.tuples(_OPS, KEYS, VALS, st.integers(min_value=1, max_value=5)),
    min_size=0,
    max_size=15,
)


@given(t=BATCH, feed=_FEED)
@_settings
def test_merge_cdc_equals_bruteforce_replay(spark, t, feed):
    """merge_cdc (one-pass compact + merge + anti-join) must equal the
    obvious per-key replay of the latest change under the documented
    (seq desc, op desc) compaction rule."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.merge import merge_cdc

    def latest_batch(rows):
        out = {}
        for k, v in rows:
            out[k] = v
        return out

    target = latest_batch(t)

    # reference: latest change per key by (seq, op) — op desc means
    # 'U' > 'I' > 'D' on ties
    best = {}
    for op, k, v, seq in feed:
        cur = best.get(k)
        if cur is None or (seq, op) > (cur[2], cur[0]):
            best[k] = (op, v, seq)
    expect = dict(target)
    for k, (op, v, _seq) in best.items():
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v

    tgt_df = _df(spark, list(target.items()))
    feed_rows = [(op, k, v, seq) for op, k, v, seq in feed] or [("I", 0, 0, 1)]
    feed_df = spark.createDataFrame(
        feed_rows, "op string, k long, v long, seq long"
    ).limit(len(feed))
    got = {r.k: r.v for r in merge_cdc(tgt_df, feed_df, ("k",), "seq").collect()}
    assert got == expect


@given(rows=st.lists(st.tuples(KEYS, KEYS, VALS), min_size=0, max_size=20))
@_settings
def test_preference_pairs_match_extremes(spark, rows):
    """chosen/rejected are exactly the (score, id) max/min per group;
    singletons (and groups where max==min id) emit nothing else."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    # unique ids: (g, id) pairs may repeat in the strategy — dedup
    seen = {}
    for g, i, s in rows:
        seen[(g, i)] = s
    flat = [(g, i, s) for (g, i), s in seen.items()]
    if not flat:
        return
    df = spark.createDataFrame(flat, "g long, id long, score long")
    got = {
        r.g: (r.chosen_id, r.rejected_id, r.margin)
        for r in prep.preference_pairs(df, "g", "id", "score").collect()
    }
    expect = {}
    groups = {}
    for g, i, s in flat:
        groups.setdefault(g, []).append((s, i))
    for g, members in groups.items():
        hi = max(members)
        lo = min(members)
        if hi[1] != lo[1]:
            expect[g] = (hi[1], lo[1], hi[0] - lo[0])
    assert got == expect


# --- r9 operators: water-fill, sweep-line concurrency ----------------------

TOTALS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=25), st.integers(min_value=0, max_value=500)),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)
PCT = st.integers(min_value=1, max_value=100)


@given(totals=TOTALS, pct=PCT)
@_settings
def test_waterfill_cap_is_maximal_and_budget_respected(spark, totals, pct):
    """m54's defining property, checked against the definition rather
    than the closed form: the allocation never exceeds the budget, and
    the cap is MAXIMAL — raising it by one token would overshoot
    (unless nothing is capped, in which case everything is funded)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.prep import (
        waterfill_from_totals,
    )

    rows = [(f"s{k}", v) for k, v in totals]
    df = spark.createDataFrame(rows, "source string, total_tokens long")
    out = waterfill_from_totals(df, pct).collect()
    grand = sum(v for _, v in totals)
    budget = (grand * pct) // 100
    cap = out[0].cap_tokens
    alloc = sum(r.alloc_tokens for r in out)
    assert all(r.cap_tokens == cap for r in out)  # one waterline
    assert all(r.alloc_tokens == min(r.total_tokens, cap) for r in out)
    if any(r.capped for r in out):
        assert alloc <= budget
        assert sum(min(t, cap + 1) for _, t in totals) > budget  # maximal
    else:
        assert alloc == grand  # budget covers everything, cap = max total


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),
        st.integers(min_value=1, max_value=300),
    ),
    min_size=1,
    max_size=20,
)


@given(iv=INTERVALS)
@_settings
def test_interval_concurrency_matches_brute_force(spark, iv):
    """a36's sharded decomposition == the naive per-instant sweep: for
    every bucket, peak equals the maximum over that bucket's instants
    of |{intervals containing the instant}| (half-open)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.rangejoin import (
        interval_concurrency,
    )

    B = 100
    rows = [(s, s + l) for s, l in iv]
    df = spark.createDataFrame(rows, "start_us long, end_us long")
    got = {
        r.bucket: r.peak_concurrency
        for r in interval_concurrency(df, bucket_us=B).collect()
    }
    # brute force: the level only changes at event instants, so the
    # peak within an emitted bucket is the max level over that
    # bucket's event instants PLUS its entry instant (the carry-in
    # level holds on [bucket_start, first_event)); half-open
    # containment s <= t < e evaluates the level at any instant.
    support = {t // B for s, e in rows for t in (s, e)}
    expect: dict[int, int] = {}
    for b in support:
        instants = {b * B} | {
            t for s, e in rows for t in (s, e) if t // B == b
        }
        expect[b] = max(
            sum(1 for s, e in rows if s <= t < e) for t in instants
        )
    assert got == expect
