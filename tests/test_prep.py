"""Training-data prep operators: split assignment, sessionization,
PII redaction, group-wise top-k, document frequency, stratified
sampling — semantics plus the plan shapes that matter at scale."""

from __future__ import annotations

import datetime
from fractions import Fraction

from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_split_assign_is_deterministic_and_total(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    out = prep.split_assign(df, "k").select("k", "split")
    a = {r.k: r.split for r in out.collect()}
    b = {r.k: r.split for r in prep.split_assign(df, "k").collect()}
    assert a == b  # same key -> same split, run to run
    counts = {s: 0 for s in ("train", "val", "test")}
    for s in a.values():
        counts[s] += 1
    assert sum(counts.values()) == 2000  # total: every row assigned
    # hash uniformity: 90/5/5 within generous tolerance at n=2000
    assert 0.85 <= counts["train"] / 2000 <= 0.95
    assert counts["val"] > 0 and counts["test"] > 0


def test_split_assign_stable_under_corpus_growth(spark):
    """Adding rows never reassigns existing keys (the property
    randomSplit lacks)."""
    small = prep.split_assign(spark.range(100).withColumnRenamed("id", "k"), "k")
    big = prep.split_assign(spark.range(5000).withColumnRenamed("id", "k"), "k")
    small_map = {r.k: r.split for r in small.collect()}
    big_map = {r.k: r.split for r in big.collect()}
    assert all(big_map[k] == v for k, v in small_map.items())


def test_split_assign_has_no_shuffle(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    assert "Exchange" not in _plan(prep.split_assign(df, "k"))


def test_sessionize_gap_semantics(spark):
    t0 = datetime.datetime(2025, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        # user 1: two sessions split by a >30min gap
        (1, ts(0), 1, 10.0),
        (1, ts(60), 2, 5.0),
        (1, ts(60 + 1801), 3, 2.5),  # 1801s after prev -> new session
        # user 2: one session, exactly-at-gap boundary stays (> not >=)
        (2, ts(0), 4, 1.0),
        (2, ts(1800), 5, 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = {
        (r.user_id, r.session_seq): r for r in prep.sessionize(df, gap_sec=1800).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)].n_events == 2 and out[(1, 1)].total_value == 15.0
    assert out[(1, 1)].duration_ms == 60_000
    assert out[(1, 2)].n_events == 1 and out[(1, 2)].duration_ms == 0
    assert out[(2, 1)].n_events == 2  # 1800s gap == threshold: same session


def test_sessionize_accepts_timestamp_ntz(spark):
    """Spark 4.x parquet inference can hand us TIMESTAMP_NTZ; sessionize
    must normalize rather than fail analysis (unix_millis is
    TIMESTAMP-only). Semantics must match the TIMESTAMP path exactly."""
    t0 = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, 10.0),
        (1, t0 + datetime.timedelta(seconds=1801), 2, 5.0),
    ]
    ntz = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    out = {
        (r.user_id, r.session_seq): r
        for r in prep.sessionize(ntz, gap_sec=1800).collect()
    }
    assert set(out) == {(1, 1), (1, 2)}
    assert out[(1, 1)].n_events == 1 and out[(1, 2)].n_events == 1


def test_sessionize_single_shuffle(spark):
    """The groupBy(user, session_seq) must reuse the window's hash
    partitioning on user — two exchanges would double the shuffle
    surface of every 100 TB sessionization run."""
    df = spark.createDataFrame(
        [(1, datetime.datetime(2025, 1, 1), 1, 1.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    plan = _plan(prep.sessionize(df))
    assert plan.count("Exchange hashpartitioning") == 1


def test_pii_redact_counts_and_replaces(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@test.org or call +49 30 1234567 now"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in prep.pii_redact(df).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert "[EMAIL]" in out[1].redacted_text and "[PHONE]" in out[1].redacted_text
    assert "@" not in out[1].redacted_text
    assert out[2].n_emails == 0 and out[2].n_phones == 0
    assert out[2].redacted_text == "no pii here"


def test_topk_per_group_rank_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 5.0), (1, 12, 9.0), (1, 13, 1.0), (2, 20, 3.0)],
        "g long, k long, v double",
    )
    out = prep.topk_per_group(df, "g", "v", "k", k=2).collect()
    got = {(r.g, r.k): r.rank_in_group for r in out}
    # g=1: 12 (9.0) then the v=5.0 tie broken by k asc -> 10
    assert got == {(1, 12): 1, (1, 10): 2, (2, 20): 1}


def test_doc_frequency_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "x z"), (3, "z")], "doc_id long, text string"
    )
    out = {r.term: r for r in prep.doc_frequency(df, top_n=10).collect()}
    assert out["x"].df == 2  # three occurrences in doc 1 count once
    assert out["z"].df == 2 and out["y"].df == 1
    assert out["y"].idf_ratio == 3.0


def test_stratified_sample_exact_quota_per_stratum(spark):
    rows = [(i, "en") for i in range(100)] + [(i + 1000, "de") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = prep.stratified_sample(df, frac=Fraction(1, 5)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang["en"]) == 20  # floor(100/5)
    assert len(by_lang["de"]) == 1  # floor(7/5)
    # deterministic: the same sample every run
    again = prep.stratified_sample(df, frac=Fraction(1, 5)).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in out}


def test_session_window_boundary_matches_gap_split(spark):
    """Boundary semantics of Spark's native session_window, pinned
    empirically: an event at EXACTLY last_ts + gap still MERGES into
    the session (new session only when the gap is strictly exceeded) —
    same contract as prep.sessionize, and what the m9 oracle mirrors
    with its strict-> comparison. One microsecond past the gap splits."""
    t0 = datetime.datetime(2025, 1, 1)

    def sessions(offset_us):
        df = spark.createDataFrame(
            [
                (1, t0, 1, 0.0),
                (1, t0 + datetime.timedelta(seconds=1800, microseconds=offset_us), 2, 0.0),
            ],
            "user_id long, ts timestamp, event_id long, value double",
        )
        native = (
            df.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .count()
            .collect()
        )
        return len(native), len(prep.sessionize(df, gap_sec=1800).collect())

    assert sessions(0) == (1, 1)  # exact gap: merged in both
    assert sessions(1)[0] == 2  # 1 us past the gap: native splits


def test_stratified_sample_single_shuffle(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    plan = _plan(prep.stratified_sample(df))
    assert plan.count("Exchange hashpartitioning") == 1


def test_approx_stats_error_bounds_vs_exact(spark):
    """The sketches must be loudly close to exact: HLL distinct within
    5*rsd, approx percentiles within the documented rank error
    (epsilon = 1/accuracy) of the exact value-at-rank window."""
    import os

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.analytics import (
        approx_engagement_stats,
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.sources import table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    ev = table(spark, sf_dir, "events")
    approx = {r.event_type: r for r in approx_engagement_stats(ev, rsd=0.02).collect()}
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    values = {}
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r.event_type, []).append(r.value)

    def rank_err(vals, approx_v, q):
        """|rank(approx) - q*n| / n — the quantity percentile_approx
        actually bounds (by eps = 1/accuracy). Value-relative checks
        would be wrong on heavy-tailed columns, where a tiny rank slip
        is a large value jump."""
        vals = sorted(vals)
        n = len(vals)
        import bisect

        lo = bisect.bisect_left(vals, approx_v)
        hi = bisect.bisect_right(vals, approx_v)
        target = q * (n - 1)
        dist = 0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
        return dist / n

    assert set(approx) == set(exact)
    for t, e in exact.items():
        a = approx[t]
        assert abs(a.approx_users - e.users) <= max(0.10 * e.users, 2), (t, a, e)
        # eps = 1/accuracy = 0.01; allow 2x slack
        assert rank_err(values[t], a.p50_approx, 0.50) <= 0.02, (t, a.p50_approx)
        assert rank_err(values[t], a.p99_approx, 0.99) <= 0.02, (t, a.p99_approx)


def test_approx_stats_deterministic(spark):
    import os

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.analytics import (
        approx_engagement_stats,
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.sources import table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    ev = table(spark, sf_dir, "events")
    a = sorted(map(tuple, approx_engagement_stats(ev).collect()))
    b = sorted(map(tuple, approx_engagement_stats(ev).collect()))
    assert a == b


# --- contamination detection ------------------------------------------------


def test_contamination_flags_verbatim_overlap(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        contamination,
    )

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
            (3, "short"),  # < k tokens -> zero shingles, never flagged
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [(100, "we observed the quick brown fox in the wild")],
        ["doc_id", "text"],
    )
    out = contamination.contamination_report(train, evals, k=4).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 1 shares the 4-gram "the quick brown fox"; docs 2/3 are clean
    assert set(by_id) == {1}
    r = by_id[1]
    assert r.n_overlap == 1 and r.n_shingles == 6
    assert abs(r.contamination_ratio - 1 / 6) < 1e-12


def test_contamination_eval_side_broadcasts(spark):
    """Scale pin: the corpus-side probe must be a broadcast hash join —
    the 100 TB corpus never shuffles on the n-gram key."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        contamination,
    )

    train = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    evals = spark.createDataFrame([(2, "c d e f g h")], ["doc_id", "text"])
    plan = (
        contamination.contamination_report(train, evals, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_pack_semantics(spark):
    # one shard (ids all even, shards=2 -> shard 0), cap 10:
    # docs of 4,4,4 tokens -> cum_before 0,4,8; packs 0,0,0; third spans.
    rows = [
        (0, "a b c d"),
        (2, "e f g h"),
        (4, "i j k l"),
        (6, "m n o p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in prep.sequence_pack(df, cap=10, shards=2).collect()}
    assert all(r.shard == 0 for r in out.values())
    assert [out[i].pack_id for i in (0, 2, 4, 6)] == [0, 0, 0, 1]
    assert [out[i].pack_offset for i in (0, 2, 4, 6)] == [0, 4, 8, 2]
    # doc 4 starts at offset 8 of a cap-10 pack: spans the boundary
    # (INT flag, not BOOLEAN — matches the oracle's canonical form)
    assert out[4].spans_boundary == 1
    assert out[0].spans_boundary == 0
    # pack stream is gapless: offsets+lengths tile the token stream
    assert out[6].pack_id * 10 + out[6].pack_offset == 12


def test_sequence_pack_rows_frame_and_ties(spark):
    # Regression for the r4/r5 driver hash mismatch: with duplicate
    # doc_ids, Spark's DEFAULT window frame (RANGE) sums ALL ordering
    # peers, diverging from the oracle's pinned ROWS frame. The fix
    # pins ROWS + an md5(text) tie-break, so duplicate rows still
    # tile the token stream one after another.
    rows = [(0, "a b c"), (0, "a b c"), (0, "a b c")]  # 3 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        prep.sequence_pack(df, cap=4, shards=1).collect(),
        key=lambda r: (r.pack_id, r.pack_offset),
    )
    # ROWS semantics: cum_before = 0, 3, 6 -> offsets 0,3,2 / packs 0,0,1.
    # RANGE semantics would give all three cum_before=0 (identical rows).
    assert [(r.pack_id, r.pack_offset) for r in out] == [(0, 0), (0, 3), (1, 2)]
    # physical-order independence: repartitioned input, same layout
    out2 = sorted(
        prep.sequence_pack(df.repartition(7), cap=4, shards=1).collect(),
        key=lambda r: (r.pack_id, r.pack_offset),
    )
    assert [(r.pack_id, r.pack_offset) for r in out2] == [(0, 0), (0, 3), (1, 2)]
    # and the plan really carries a RowFrame, not the default RangeFrame
    analyzed = prep.sequence_pack(df, cap=4, shards=1)._jdf.queryExecution().analyzed().toString()
    assert "rowframe" in analyzed.lower()
    assert "rangeframe" not in analyzed.lower()


def test_sequence_pack_no_global_window(spark):
    df = spark.createDataFrame([(i, "x y z") for i in range(100)], "doc_id long, text string")
    plan = _plan(prep.sequence_pack(df, cap=8, shards=4))
    # the window sort is per-shard: partitioning is on shard, never a
    # single global partition (which would serialize the corpus)
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_mixture_weights_invariants(spark):
    rows = [(i, "w " * (i % 3 + 1), "s" + str(i % 4)) for i in range(40)]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = prep.mixture_weights(df).collect()
    assert len(out) == 4
    # shares sum to 1 (exact: disjoint BIGINT counts over one total)
    assert abs(sum(r.token_share for r in out) - 1.0) < 1e-12
    for r in out:
        assert r.alpha_weight_unnorm**2 == pytest_approx(r.token_share)
        # sqrt temperature flattens: up-sample factor >= 1 iff share <= 1
        assert r.rel_upsample >= 1.0


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-12)


def test_contamination_bloom_matches_exact(spark):
    """The bloom pre-filter must be output-invisible: no false
    negatives by construction, false positives killed by the exact
    verify join — so both paths return identical reports."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        contamination,
    )

    train = spark.createDataFrame(
        [(i, f"doc {i} body alpha beta gamma delta {'x ' * (i % 5)}epsilon") for i in range(60)]
        + [(100, "the planted quick brown fox jumps over the lazy dog today")],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [(200, "a report on the planted quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    exact = sorted(contamination.contamination_report(train, evals, k=6).collect())
    # tiny bitmap on purpose: high fpp stresses the verify join
    bloom = sorted(
        contamination.contamination_report_bloom(
            train, evals, k=6, m_bits=1 << 10
        ).collect()
    )
    assert exact == bloom
    assert [r.doc_id for r in exact] == [100]


def test_contamination_bloom_plan_shape(spark):
    """Scale pins: the bitmap row reaches the corpus side via a
    broadcast nested-loop join (single build row), and the survivor
    join is the non-broadcast digest-keyed shuffle join this path
    exists for."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        contamination,
    )

    train = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    evals = spark.createDataFrame([(2, "c d e f g h i j")], ["doc_id", "text"])
    plan = (
        contamination.contamination_report_bloom(train, evals, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan  # one-row bitmap build side
    assert "bit_get" in plan  # probe stays JVM-side codegen
    assert "CartesianProduct" not in plan


def test_token_budget_select_fills_best_bands_first(spark):
    # 60-token quality docs (score 4) + junk docs (low score): with a
    # budget of 150 the selector must take quality docs only, and the
    # straddling band keeps exactly floor(150/60)=2 of them.
    good = [(i, "the and of " + "word " * 56 + "end") for i in range(5)]  # 60 tokens
    junk = [(100 + i, "!!! ??? ...") for i in range(5)]
    df = spark.createDataFrame(good + junk, "doc_id long, text string")
    out = prep.token_budget_select(df, budget_tokens=150).collect()
    assert all(r.quality_score == 4 for r in out)
    assert len(out) == 2  # 2*60 <= 150 < 3*60
    assert all(r.band_rule == "partial_band" for r in out)
    # determinism: same selection every run
    again = prep.token_budget_select(df, budget_tokens=150).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


def test_token_budget_select_full_bands_skip_window(spark):
    # budget large enough for the whole top band -> marked full_band
    good = [(i, "the and of " + "word " * 56 + "end") for i in range(3)]
    junk = [(100, "!!! ??? ...")]
    df = spark.createDataFrame(good + junk, "doc_id long, text string")
    # 181: whole top band (180) fits; junk band straddles and its one
    # doc would overflow, so nothing from it survives
    out = {r.doc_id: r for r in prep.token_budget_select(df, budget_tokens=181).collect()}
    assert set(out) == {0, 1, 2}
    assert all(r.band_rule == "full_band" for r in out.values())


def test_length_buckets_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),                    # 3 tokens -> cap 8
            (2, " ".join(["w"] * 8)),        # exactly 8 -> cap 8
            (3, " ".join(["w"] * 9)),        # 9 -> cap 16
            (4, " ".join(["w"] * 9000)),     # beyond last cap -> clamp 8192
        ],
        "doc_id long, text string",
    )
    out = {r.bucket_cap_tokens: r for r in prep.length_buckets(docs).collect()}
    assert set(out) == {8, 16, 8192}
    assert out[8].n_docs == 2 and out[8].total_tokens == 11
    assert out[8].pad_tokens == (8 - 3) + (8 - 8)
    assert out[16].pad_tokens == 7
    # clamped docs can exceed the cap: pad goes NEGATIVE, pricing the
    # truncation the collator must do — the stat is a signed balance
    assert out[8192].pad_tokens == 8192 - 9000
    assert abs(out[8].pack_efficiency - 11 / 16) < 1e-15


def test_length_buckets_single_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert _plan(prep.length_buckets(docs)).count("Exchange") == 1


def test_chunk_documents_window_arithmetic(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks, W=6 S=4 -> 2 chunks
            (2, "a b"),                                  # shorter than W -> 1 chunk
            (3, " ".join(f"t{i}" for i in range(6))),    # exactly W -> 1 chunk
            (4, ""),                                     # empty -> 1 empty chunk
        ],
        "doc_id long, text string",
    )
    out = prep.chunk_documents(docs, chunk_tokens=6, overlap_tokens=2)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    assert len([k for k in rows if k[0] == 1]) == 2
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3 t4 t5"
    # overlap: chunk 1 starts at token 4 (stride 4), short final window
    assert rows[(1, 1)].chunk_text == "t4 t5 t6 t7 t8 t9"
    assert rows[(1, 1)].n_tokens == 6
    assert rows[(2, 0)].n_tokens == 2 and len([k for k in rows if k[0] == 2]) == 1
    assert len([k for k in rows if k[0] == 3]) == 1
    assert rows[(4, 0)].chunk_text == "" and rows[(4, 0)].n_tokens == 0
    # every token of doc 1 is covered by some chunk
    covered = set()
    for (d, _), r in rows.items():
        if d == 1 and r.chunk_text:
            covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(10)}


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prep.chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)


def test_chunk_documents_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert "Exchange" not in _plan(prep.chunk_documents(docs))


def test_shard_assign_deterministic_balanced_and_single_shuffle(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    out1 = prep.shard_assign(df, "k", n_shards=8).collect()
    out2 = prep.shard_assign(df, "k", n_shards=8).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_shard = {}
    for r in out1:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) <= set(range(8))
    # hash balance: no shard takes more than 3x its fair share
    assert max(len(v) for v in by_shard.values()) < 3 * 1000 / 8
    # shard_pos is a dense 1..n rank within each shard
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # shard assignment itself is a projection; ranking is the only shuffle
    plan = _plan(prep.shard_assign(df, "k"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_shard_assign_order_stable_under_growth(spark):
    """Adding rows must never permute the relative order of existing
    rows within a shard (md5 order is per-key) — the property that
    makes shard manifests append-friendly."""
    small = spark.range(100).withColumnRenamed("id", "k")
    big = spark.range(200).withColumnRenamed("id", "k")
    o_small = prep.shard_assign(small, "k").collect()
    o_big = prep.shard_assign(big, "k").collect()

    def rel_order(rows, universe):
        by_shard = {}
        for r in sorted(rows, key=lambda r: (r.shard, r.shard_pos)):
            if r.k in universe:
                by_shard.setdefault(r.shard, []).append(r.k)
        return by_shard

    keys = {r.k for r in o_small}
    assert rel_order(o_small, keys) == rel_order(o_big, keys)


def test_group_quantile_filter_per_group_thresholds(spark):
    rows = [(i, "a", float(i)) for i in range(1, 5)]        # a: 1..4, p50=2.5
    rows += [(i, "b", float(100 + i)) for i in range(1, 5)]  # b: 101..104
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = {
        (r.grp, r.id): r
        for r in prep.group_quantile_filter(df, "v", "grp", q=0.5).collect()
    }
    assert len(out) == 8
    assert not out[("a", 1)].keep and not out[("a", 2)].keep
    assert out[("a", 3)].keep and out[("a", 4)].keep
    # group b's threshold adapts: its small values still keep vs group a's scale
    assert not out[("b", 1)].keep and out[("b", 3)].keep
    assert out[("a", 3)].q_threshold == 2.5


def test_group_quantile_filter_broadcasts_thresholds(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(50)], "id long, grp string, v double"
    )
    plan = _plan(prep.group_quantile_filter(df, "v", "grp"))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_dense_ids_contiguous_and_order_deterministic(spark):
    rows = [(i, f"s{i % 3}") for i in range(97)]
    df = spark.createDataFrame(rows, "k long, src string")
    out = prep.dense_ids(df, ["src", "k"], num_partitions=7).collect()
    ids = sorted(r.dense_id for r in out)
    assert ids == list(range(97))  # contiguous, zero-based, no gaps
    by_order = sorted(out, key=lambda r: (r.src, r.k))
    assert [r.dense_id for r in by_order] == list(range(97))


def test_dense_ids_no_single_partition_window(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "k long")
    plan = (
        prep.dense_ids(df, ["k"], num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the window must be partitioned by _pid — a global orderBy window
    # would print windowspecdefinition(<order> ...) with no partition
    # column before the sort spec
    assert "windowspecdefinition(_pid" in plan


def test_dense_ids_requires_order(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prep.dense_ids(spark.range(1), [])


def test_sequence_pack_cross_engine_with_duplicate_ids(spark):
    """The r4/r5 driver-mismatch scenario, reproduced cross-engine:
    duplicate doc_ids (which /root/testdata never has — why local runs
    stayed green while the driver's corpus disagreed) packed by Spark
    and by DuckDB running the m15 oracle SQL must agree exactly."""
    import duckdb
    import pandas as pd

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.ml_prep import (
        _M15_CAP,
        _M15_SHARDS,
        M15_ORACLE,
    )

    rows = (
        [(0, "alpha beta gamma")] * 3          # exact-duplicate ties
        + [(0, "alpha beta")]                   # same id, different text
        + [(i, f"tok{i} " * (i % 7 + 1)) for i in range(1, 40)]
        + [(8, "tok8 tok8")]                    # another id collision
    )
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    sdf = spark.createDataFrame(pdf)
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    got = sorted(
        (tuple(r) for r in prep.sequence_pack(
            sdf, cap=_M15_CAP, shards=_M15_SHARDS
        ).collect()),
        key=repr,
    )

    con = duckdb.connect()
    con.register("documents", pdf)
    res = con.execute(M15_ORACLE)
    cols = [d[0] for d in res.description]
    # align column order with the Spark frame before comparing
    import itertools

    spark_cols = prep.sequence_pack(sdf, cap=_M15_CAP, shards=_M15_SHARDS).columns
    idx = [cols.index(c) for c in spark_cols]
    want = sorted(
        (tuple(row[i] for i in idx) for row in res.fetchall()), key=repr
    )
    assert got == want


def test_temperature_resample_quota_allocation_and_determinism(spark):
    # 3 sources with very different sizes: quotas follow isqrt weights,
    # not raw counts (the whole point of temperature alpha=0.5)
    rows = (
        [(i, "big") for i in range(400)]
        + [(i + 1000, "mid") for i in range(100)]
        + [(i + 2000, "tiny") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = prep.temperature_resample(docs, sample_div=4).collect()
    # K = 504 // 4 = 126; weights isqrt: 20 / 10 / 2 (W = 32)
    # base = floor(126*w/32): big 78, mid 39, tiny 7 -> sum 124,
    # leftover 2; rem = (126*w) % 32: big 24, mid 12, tiny 28 ->
    # +1 to tiny and big; tiny clamps to its 4 docs (no replacement)
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["big"]) == 79
    assert len(by_src["mid"]) == 39
    assert len(by_src["tiny"]) == 4  # clamped: quota 8 > 4 available
    assert all(r.quota == 4 for r in by_src["tiny"])
    # per-source ranks are 1..n with no gaps, and deterministic
    assert sorted(r.mix_rank for r in by_src["mid"]) == list(range(1, 40))
    again = prep.temperature_resample(docs, sample_div=4).collect()
    assert sorted((r.source, r.doc_id) for r in again) == sorted(
        (r.source, r.doc_id) for r in out
    )


def test_temperature_resample_broadcasts_quotas(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(200)], "doc_id long, source string"
    )
    plan = _plan(prep.temperature_resample(docs))
    # the corpus-side join against the D-row quota frame must be a
    # broadcast, and the corpus itself must never hit a global window
    assert "BroadcastHashJoin" in plan


def test_curation_audit_partitions_the_corpus(spark):
    """The audit's 'kept' set IS curate_corpus's survivor set, and the
    four drop labels + kept form a total partition of the input."""
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.pipelines.curation import (
        curate_corpus,
        curation_audit,
    )

    rows = []
    # 30 quality docs (long enough, varied), plus engineered failures
    base = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a friend to rest ").split()
    for i in range(30):
        rows.append((i, " ".join(base + [f"tail{i}w{j}" for j in range(8)])))
    rows.append((100, rows[0][1]))          # exact dup of doc 0
    rows.append((101, rows[1][1] + " x"))   # near dup of doc 1
    rows.append((102, "short text"))        # fails length check
    rows.append((103, " ".join(["loop"] * 120)))  # repetition fail
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    audit = {r.doc_id: r.drop_stage for r in curation_audit(docs, 0.4).collect()}
    kept = {r.doc_id for r in curate_corpus(docs, 0.4).collect()}

    assert set(audit) == {r[0] for r in rows}  # total: every input labeled
    assert {d for d, s in audit.items() if s == "kept"} == kept
    assert audit[100] == "exact_dup"
    assert audit[101] == "near_dup"
    assert audit[102] == "quality"
    assert audit[103] == "repetition"


def test_preference_pairs_extremes_ties_singletons(spark):
    """Chosen/rejected are the (score, id) total-order extremes, ties
    resolve deterministically, and singleton groups emit no pair."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    df = spark.createDataFrame(
        [
            # group 0: clear extremes
            (0, 1, 10), (0, 2, 50), (0, 3, 30),
            # group 1: ALL scores tie -> ids break it (chosen=max id,
            # rejected=min id), margin 0
            (1, 4, 7), (1, 5, 7), (1, 6, 7),
            # group 2: singleton -> no pair
            (2, 9, 99),
        ],
        "g long, id long, score long",
    )
    out = {
        r.g: (r.chosen_id, r.rejected_id, r.margin)
        for r in prep.preference_pairs(df, "g", "id", "score").collect()
    }
    assert out == {0: (2, 1, 40), 1: (6, 4, 0)}


def test_linearize_conversations_order_and_cap(spark):
    """Turn order is (ts, id) regardless of input order; the rank cap
    truncates per-user state; digest matches the assembled string."""
    import hashlib

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    rows = [
        # user 1 arrives out of order
        (1, 300, 3, "c"),
        (1, 100, 1, "a"),
        (1, 200, 2, "b"),
        # user 2 has 4 turns, cap=3 keeps the FIRST three by (ts, id)
        (2, 10, 1, "w"),
        (2, 10, 2, "x"),
        (2, 20, 3, "y"),
        (2, 30, 4, "z"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, turn string")
    out = {
        r.user_id: r
        for r in prep.linearize_conversations(df, max_turns=3).collect()
    }
    assert out[1].n_turns == 3
    assert out[1].convo_digest == hashlib.md5(b"a\nb\nc").hexdigest()
    assert out[2].n_turns == 3
    assert out[2].convo_digest == hashlib.md5(b"w\nx\ny").hexdigest()
    assert out[2].convo_chars == 5


def test_loss_mask_spans_hand_computed(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    ev = spark.createDataFrame(
        # user 7: turns in (ts, event_id) order: "aa"(1,masked),
        # "bbb"(2,loss), "c"(3,masked), "dddd"(4,loss)
        # linearized: "aa\nbbb\nc\ndddd"; offsets: bbb@3 len3, dddd@9 len4
        [
            (7, 1, 10, "aa"),
            (7, 2, 11, "bbb"),
            (7, 3, 12, "c"),
            (7, 4, 13, "dddd"),
            # user 8: single turn -> prompt only, no loss spans
            (8, 1, 20, "solo"),
        ],
        "user_id long, ts long, event_id long, turn string",
    )
    out = {r.user_id: r for r in prep.loss_mask_spans(ev).collect()}
    assert (out[7].n_turns, out[7].n_loss_chars, out[7].loss_spans) == (4, 7, "3:3,9:4")
    assert (out[8].n_turns, out[8].n_loss_chars, out[8].loss_spans) == (1, 0, "")


def test_loss_mask_spans_cap_bounds_state(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    ev = spark.createDataFrame(
        [(1, t, t, "x" * 2) for t in range(1, 11)],
        "user_id long, ts long, event_id long, turn string",
    )
    r = prep.loss_mask_spans(ev, max_turns=4).collect()[0]
    # only the first 4 turns survive the cap: xx\nxx\nxx\nxx
    assert (r.n_turns, r.n_loss_chars, r.loss_spans) == (4, 4, "3:2,9:2")


def test_budget_waterfill_clips_dominant_source(spark):
    """Hand-solved instance: totals a=10, b=20, c=70, budget 60% of
    100 = 60. Feasibility g(i)=P(i-1)+(n-i+1)t(i): g(1)=30, g(2)=50
    (both <= 60), g(3)=100 (> 60) -> k=2 fully funded, waterline
    C = (60-30)//1 = 30. Only the dominant source is clipped."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    docs = spark.createDataFrame(
        [(i, src, "w " * n) for i, (src, n) in enumerate(
            [("a", 10), ("b", 20), ("c", 35), ("c", 35)]
        )],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in prep.budget_waterfill(docs, 60).collect()}
    assert out["a"].total_tokens == 10 and out["a"].alloc_tokens == 10
    assert out["b"].alloc_tokens == 20
    assert out["c"].total_tokens == 70 and out["c"].alloc_tokens == 30
    assert [out[s].cap_tokens for s in "abc"] == [30, 30, 30]
    assert [out[s].capped for s in "abc"] == [0, 0, 1]
    # budget sum property: allocations exhaust the budget up to the
    # integer floor (cap is maximal: raising it by 1 would exceed B)
    alloc = sum(r.alloc_tokens for r in out.values())
    assert alloc <= 60 < alloc + sum(
        1 for r in out.values() if r.capped
    ) + 1


def test_budget_waterfill_no_cap_when_budget_covers_corpus(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    docs = spark.createDataFrame(
        [(0, "a", "w " * 10), (1, "b", "w " * 70)],
        "doc_id long, source string, text string",
    )
    out = {r.source: r for r in prep.budget_waterfill(docs, 100).collect()}
    assert out["a"].alloc_tokens == 10 and out["b"].alloc_tokens == 70
    assert all(r.capped == 0 for r in out.values())
    assert out["b"].cap_tokens == 70  # waterline = max total, k == n


def test_fim_transform_is_lossless_permutation(spark):
    """FIM only PERMUTES content: stitching prefix+middle+suffix back
    from the PSM serialization must reproduce the original text, and
    the three span lengths must partition the doc length."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import prep

    texts = ["hello world, fill me in", "", "x", "abc def ghi " * 40]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for r in prep.fim_transform(docs).collect():
        orig = texts[r.doc_id]
        assert r.n_prefix + r.n_middle + r.n_suffix == len(orig)
        body = r.fim_text[len("<|fim_prefix|>"):]
        pre, rest = body.split("<|fim_suffix|>", 1)
        suf, mid = rest.split("<|fim_middle|>", 1)
        assert pre + mid + suf == orig
        assert (len(pre), len(mid), len(suf)) == (
            r.n_prefix, r.n_middle, r.n_suffix,
        )


def test_chunk_manifest_tiles_docs_and_matches_sequence_pack(spark):
    """The gather manifest's invariants, checked against the packing
    plan it inverts: (a) each doc's slices tile it exactly — lengths
    sum to n_tokens, starts are contiguous from 0, chunk ids are
    consecutive; (b) the doc's FIRST manifest row lands at
    sequence_pack's (pack_id, pack_offset); (c) per (shard, chunk) the
    gathered slice lengths never exceed the cap, and every interior
    chunk is exactly full."""
    docs = spark.createDataFrame(
        [
            # shard 0 (ids % 2 == 0): 7 + 5 + 9 tokens, cap 8 ->
            # doc 0 spans chunks 0-0, doc 2 spans 0-1, doc 4 spans 1-2
            (0, " ".join(f"a{i}" for i in range(7))),
            (2, " ".join(f"b{i}" for i in range(5))),
            (4, " ".join(f"c{i}" for i in range(9))),
            # shard 1: one zero-token doc (must vanish) and one normal
            (1, ""),
            (3, " ".join(f"d{i}" for i in range(3))),
        ],
        "doc_id long, text string",
    )
    cap = 8
    man = prep.chunk_manifest(docs, cap=cap, shards=2).collect()
    pack = {
        r.doc_id: r for r in prep.sequence_pack(docs, cap=cap, shards=2).collect()
    }
    assert not [r for r in man if r.doc_id == 1]  # zero-token doc gone
    by_doc: dict[int, list] = {}
    for r in man:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tokens = {0: 7, 2: 5, 4: 9, 3: 3}
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert sum(r.slice_len for r in rows) == n_tokens[doc]
        assert rows[0].slice_start == 0
        for a, b in zip(rows, rows[1:]):
            assert b.chunk_id == a.chunk_id + 1
            assert b.slice_start == a.slice_start + a.slice_len
        p = pack[doc]
        assert rows[0].chunk_id == p.pack_id
        assert rows[0].shard == p.shard
        # position inside the first chunk == the packing plan's offset
        assert all(r.slice_len >= 1 for r in rows)
    # per-chunk budget: shard 0 carries 21 tokens -> chunks 0,1 full (8)
    per_chunk: dict[tuple, int] = {}
    for r in man:
        per_chunk[(r.shard, r.chunk_id)] = (
            per_chunk.get((r.shard, r.chunk_id), 0) + r.slice_len
        )
    assert all(v <= cap for v in per_chunk.values())
    assert per_chunk[(0, 0)] == cap and per_chunk[(0, 1)] == cap
    assert per_chunk[(0, 2)] == 21 - 2 * cap


def test_budget_select_greedy_prefix_under_cap(spark):
    """Hand-solved waterfill + selection: totals {A:30, B:5} at 60%
    budget -> budget 21, cap 16 (B fully funded, A clipped); A's
    greedy id-ordered prefix keeps only its first 10-token doc
    (cum 10 <= 16 < cum 20), B keeps everything."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 10), "A"),
            (2, " ".join(["w"] * 10), "A"),
            (3, " ".join(["w"] * 10), "A"),
            (4, " ".join(["w"] * 5), "B"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.cum_tokens, r.keep_flag)
        for r in prep.budget_select(docs, budget_pct=60).collect()
    }
    assert got == {1: (10, 1), 2: (20, 0), 3: (30, 0), 4: (5, 1)}
    # kept tokens never exceed the allocation the waterfill promised
    alloc = {
        r.source: r.alloc_tokens
        for r in prep.budget_waterfill(docs, budget_pct=60).collect()
    }
    kept = {"A": 10, "B": 5}
    for s in kept:
        assert kept[s] <= alloc[s]


def test_budget_select_sharded_equals_single_window(spark):
    """The r11 sharding rewrite must be bit-identical to the naive
    per-source window: bucket_width=1 (every doc its own bucket — all
    carry, no partial), width=3 (mixed), and width=10**9 (one bucket —
    all partial, no carry) agree row-for-row on a corpus with skewed
    per-source sizes and non-contiguous ids."""
    import random

    rng = random.Random(11)
    rows = []
    ids = rng.sample(range(10_000), 120)
    for i, doc_id in enumerate(ids):
        src = "hot" if i % 3 else f"s{i % 7}"
        rows.append((doc_id, " ".join(["w"] * rng.randint(0, 9)), src))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    outs = []
    for width in (1, 3, 10**9):
        outs.append(
            sorted(
                (r.doc_id, r.source, r.n_tokens, r.cum_tokens, r.keep_flag)
                for r in prep.budget_select(
                    docs, budget_pct=60, bucket_width=width
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 120  # every doc audited
    # independent brute force: greedy prefix in id order per source
    import collections

    toks = {doc_id: len(t.split()) for doc_id, t, _ in rows}
    by_src = collections.defaultdict(list)
    for doc_id, _, src in rows:
        by_src[src].append(doc_id)
    caps = {
        r.source: r.cap_tokens
        for r in prep.budget_waterfill(docs, budget_pct=60).collect()
    }
    want = {}
    for src, dids in by_src.items():
        cum = 0
        for d in sorted(dids):
            cum += toks[d]
            want[d] = (cum, int(cum <= caps[src]))
    got = {r[0]: (r[3], r[4]) for r in outs[0]}
    assert got == want


def test_budget_select_plan_has_no_whole_source_corpus_window(spark):
    """Pin the scale fix: the only doc-ordered window (the corpus
    running sum) is partitioned by (source, bucket), never by source
    alone — a hot source can no longer become one task's sort. The
    source-only window that remains orders by _bkt and runs on the
    bucket-cardinality carry frame."""
    import re

    docs = spark.createDataFrame(
        [(i, "w w w", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    plan = re.sub(
        r"#\d+L?",
        "",
        prep.budget_select(docs, bucket_width=4)
        ._jdf.queryExecution()
        .analyzed()
        .toString(),
    )
    doc_ordered = [
        m
        for m in re.findall(r"windowspecdefinition\([^)]*\)", plan)
        if "doc_id ASC" in m
    ]
    assert doc_ordered, plan
    assert all("_bkt" in m.split("doc_id")[0] for m in doc_ordered), doc_ordered


def test_budget_select_audits_null_source_docs(spark):
    """ADVICE r10: the audit contract is TOTAL — a doc whose source
    matches no waterfill row (null source never equi-joins) must
    surface with keep_flag 0, not vanish from the frame."""
    docs = spark.createDataFrame(
        [(1, "w w", "A"), (2, "w w w", None), (3, "w", "A")],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.cum_tokens, r.keep_flag)
        for r in prep.budget_select(docs, budget_pct=100).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2] == (3, 0)  # audited, never kept (no allocation row)
    assert got[1][1] == 1 and got[3][1] == 1


def test_budget_select_zero_token_doc_of_unfunded_source_not_kept(spark):
    """ADVICE r11: a ZERO-token doc whose source has no allocation row
    (null source never equi-joins the waterfill frame) must get
    keep_flag 0 — `0 <= coalesce(null, 0)` used to sneak it through.
    A zero-token doc of a FUNDED source costs nothing and stays
    kept."""
    docs = spark.createDataFrame(
        [(1, "", None), (2, "w w", "A"), (3, "", "A"), (4, None, None)],
        "doc_id long, text string, source string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens, r.keep_flag)
        for r in prep.budget_select(docs, budget_pct=100).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == (0, 0, 0)  # zero tokens, unfunded -> NOT kept
    assert got[4] == (0, 0, 0)  # null text, unfunded -> NOT kept
    assert got[2][2] == 1
    assert got[3] == (0, 2, 1)  # zero tokens, funded -> kept (free; cum carries doc 2)


def test_chunk_manifest_carried_offsets_equal_one_shot(spark):
    """The streaming invariant behind st28: chunking a corpus in two
    id-range batches with carried per-shard offsets produces EXACTLY
    the one-shot manifest — chunk ids continue across the batch
    boundary instead of restarting, and mid-chunk splice points line
    up."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 5))) for i in range(40)],
        "doc_id long, text string",
    )
    cap, shards = 8, 2
    want = {
        (r.doc_id, r.chunk_id): (r.shard, r.slice_start, r.slice_len)
        for r in prep.chunk_manifest(docs, cap=cap, shards=shards).collect()
    }
    first = docs.filter(F.col("doc_id") < 20)
    second = docs.filter(F.col("doc_id") >= 20)
    got = {
        (r.doc_id, r.chunk_id): (r.shard, r.slice_start, r.slice_len)
        for r in prep.chunk_manifest(first, cap=cap, shards=shards).collect()
    }
    offsets = (
        first.select(
            (F.col("doc_id") % shards).alias("shard"),
            F.size(F.split("text", " ")).cast("long").alias("base_offset"),
        )
        .groupBy("shard")
        .agg(F.sum("base_offset").cast("long").alias("base_offset"))
    )
    got.update(
        {
            (r.doc_id, r.chunk_id): (r.shard, r.slice_start, r.slice_len)
            for r in prep.chunk_manifest(
                second, cap=cap, shards=shards, base_offsets=offsets
            ).collect()
        }
    )
    assert got == want


def test_head_tail_truncate_spans_tile_and_stay_disjoint(spark):
    """Three regimes by hand: shorter than H (all head, empty tail at
    position n), between H and H+T (head full, tail = remainder), and
    longer than H+T (both full, middle dropped). Spans must be
    disjoint and tile exactly kept_tokens."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 3)),   # n=3  < H
            (2, " ".join(["w"] * 6)),   # H <= n=6 < H+T
            (3, " ".join(["w"] * 20)),  # n=20 > H+T
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in prep.head_tail_truncate(
            docs, head_tokens=5, tail_tokens=2
        ).collect()
    }
    assert (got[1].head_len, got[1].tail_start, got[1].tail_len) == (3, 3, 0)
    assert (got[2].head_len, got[2].tail_start, got[2].tail_len) == (5, 5, 1)
    assert (got[3].head_len, got[3].tail_start, got[3].tail_len) == (5, 18, 2)
    for r in got.values():
        assert r.head_len + r.tail_len == r.kept_tokens
        assert r.kept_tokens + r.dropped_tokens == r.n_tokens
        assert r.tail_start >= r.head_len  # disjoint
        assert r.tail_start + r.tail_len == r.n_tokens


def test_budget_select_cum_is_prefix_stable_across_id_batches(spark):
    """The invariant st31's streaming form rides: cum_tokens from
    budget_select over an id-ordered FIRST batch, plus that batch's
    per-source totals carried as offsets into the SECOND batch's
    within-batch running sum, reproduces the one-shot cum_tokens
    exactly — cum is prefix-stable even though the waterline is not."""
    import random

    rng = random.Random(31)
    rows = [
        (i, " ".join(["w"] * rng.randint(0, 7)), f"s{i % 5}")
        for i in range(80)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    want = {
        r.doc_id: r.cum_tokens
        for r in prep.budget_select(docs, budget_pct=100).collect()
    }
    first = docs.filter(F.col("doc_id") < 40)
    second = docs.filter(F.col("doc_id") >= 40)
    got = {
        r.doc_id: r.cum_tokens
        for r in prep.budget_select(first, budget_pct=100).collect()
    }
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.text import (
        token_count,
    )

    carried = {
        r.source: r.total
        for r in first.groupBy("source")
        .agg(F.sum(token_count("text")).alias("total"))
        .collect()
    }
    # second batch: within-batch cum + carried per-source base
    for r in prep.budget_select(second, budget_pct=100).collect():
        src = f"s{r.doc_id % 5}"
        got[r.doc_id] = r.cum_tokens + carried.get(src, 0)
    assert got == want


def test_head_tail_truncate_degenerate_budgets(spark):
    """Knob edges: T=0 keeps a pure head (tail span empty AT n); H=0
    keeps a pure tail (head empty, tail_start = n-T); both zero keeps
    nothing but still audits the doc."""
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 10))], "doc_id long, text string"
    )
    head_only = prep.head_tail_truncate(docs, head_tokens=4, tail_tokens=0).collect()[0]
    assert (head_only.head_len, head_only.tail_len, head_only.kept_tokens) == (4, 0, 4)
    assert head_only.tail_start == 10
    tail_only = prep.head_tail_truncate(docs, head_tokens=0, tail_tokens=3).collect()[0]
    assert (tail_only.head_len, tail_only.tail_len, tail_only.kept_tokens) == (0, 3, 3)
    assert tail_only.tail_start == 7
    nothing = prep.head_tail_truncate(docs, head_tokens=0, tail_tokens=0).collect()[0]
    assert (nothing.kept_tokens, nothing.dropped_tokens) == (0, 10)


def test_deterministic_downsample_hand_solved(spark):
    """m64's keep set recomputed in plain Python with the same modular
    arithmetic — the oracle shares the formula, so only an
    independent reimplementation pins it. Also: a small source
    (n <= cap) keeps everything, and a null source is a real group."""
    M = (1 << 31) - 1
    A = 2654435761 % M
    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(3)]
    rows += [(777, None)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    cap = 5
    got = {
        r.doc_id: r.keep_flag
        for r in prep.deterministic_downsample(docs, cap_per_source=cap).collect()
    }
    assert len(got) == 44  # audit contract: every row emitted
    thr_big = (M * cap) // 40
    for i in range(40):
        assert got[i] == int(((i % M) * A) % M < thr_big)
    for i in range(3):
        assert got[100 + i] == 1  # n=3 <= cap -> threshold >= M
    assert got[777] == 1  # null source: n=1 <= cap, still a group
    # sanity: the big source actually drops a nontrivial subset
    kept_big = sum(got[i] for i in range(40))
    assert 0 < kept_big < 40


def test_group_quantile_filter_null_group_is_total(spark):
    """m21's audit contract: a null group must not vanish through the
    threshold join-back — it gets its OWN percentile row. Named
    groups keep the documented at-or-above-P25 semantics."""
    docs = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (3, "A", 30), (4, "A", 40),
         (5, None, 7), (6, None, 9)],
        "doc_id long, source string, n_chars long",
    )
    got = {
        r.doc_id: (r.keep, r.q_threshold)
        for r in prep.group_quantile_filter(docs, "n_chars", "source", q=0.25).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6}  # TOTAL, null group included
    # A: exact P25 of (10,20,30,40) = 17.5 -> keeps 20,30,40
    assert [got[i][0] for i in (1, 2, 3, 4)] == [False, True, True, True]
    # null group: P25 of (7,9) = 7.5 -> 9 keeps, 7 does not
    assert got[5][0] is False and got[6][0] is True
