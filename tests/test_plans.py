"""Physical-plan regression tests: the plans we shipped are the plans
we keep. Each assertion pins a scale-critical property — broadcast
strategy, map-side partial aggregation, scan-level filter pushdown,
column pruning — so a refactor that silently degrades one fails CI,
not the 100 TB run."""

from __future__ import annotations

import pytest

from group_2_shopware_enterprise_data_engineering_project_spark import registry


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = registry.all_queries()

    def plan_of(name: str) -> str:
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def test_loyalty_join_broadcasts_dim(plans):
    plan = plans("j1_loyalty_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dim side must never shuffle-sort


def test_sales_kpi_partial_aggregation_and_broadcast(plans):
    plan = plans("a1_sales_kpi")
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "BroadcastHashJoin" in plan


def test_date_filter_pushed_to_scan(plans):
    plan = plans("p15_date_range")
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any("o_orderdate" in ln and "PushedFilters" in ln for ln in scan_lines)


def test_column_pruning_on_events_scan(plans):
    """a3 touches only (user_id, event_type); the events scan must not
    read ts/value/props."""
    plan = plans("a3_engagement_score")
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    read_cols = scan.split("FileScan parquet ")[1].split("]")[0]
    assert "user_id" in read_cols and "event_type" in read_cols
    assert "props" not in read_cols and "value" not in read_cols


def test_ann_bruteforce_broadcasts_queries(plans):
    """The corpus side must stream past broadcast queries — a shuffled
    cross join would be catastrophic at corpus scale."""
    plan = plans("e2_ann_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_headline_aggregates_have_no_global_sort(plans):
    """a2/a3/j1 mirror reference queries whose ORDER BY is display-only.
    A global sort is a pure-cost range exchange at scale — the plans
    must not contain one (ordering lives in oracle SQL / top_k)."""
    for q in ("a2_session_metrics", "a3_engagement_score", "j1_loyalty_join"):
        plan = plans(q)
        assert "rangepartitioning" not in plan.lower(), q


def test_prep_projections_have_no_exchange(plans):
    """m1/m3/m12 are pure per-row derivations — any Exchange appearing
    here means someone added an accidental wide op to a map-only path."""
    for q in ("m1_split_assign", "m3_pii_redact", "m12_text_normalize"):
        assert "Exchange" not in plans(q), q


def test_rollup_aggregates_map_side(plans):
    """ROLLUP runs as Expand + partial aggregation before its single
    exchange — NOT as three unioned scans."""
    plan = plans("a9_rollup_sales")
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan") == 1


def test_pivot_single_scan_two_combined_shuffles(plans):
    """Spark's pivot shape: pre-aggregate per (user, type), then
    pivotfirst per user — two exchanges, each behind a map-side
    partial (the second shuffles already-pivoted compact rows)."""
    plan = plans("a10_pivot_events")
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_count" in plan and "partial_pivotfirst" in plan


def test_anti_join_pushes_date_filter(plans):
    plan = plans("j3_customers_without_orders")
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any("o_orderdate" in ln and "PushedFilters" in ln for ln in scan_lines)
    assert "CartesianProduct" not in plan


def test_doc_frequency_uses_top_n_not_global_sort(plans):
    assert "TakeOrderedAndProject" in plans("m5_doc_frequency")


def test_skew_profile_and_bm25_use_partial_topk(plans):
    # global top-N must be TakeOrderedAndProject (per-task partial
    # top-k), never a row_number window funneling all keys/docs
    # through one partition
    for q in ("a15_key_skew_profile", "t11_bm25_topk"):
        plan = plans(q)
        assert "TakeOrderedAndProject" in plan, q


def test_range_join_is_hash_join_not_nested_loop(plans):
    plan = plans("j4_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_cascade_levels_are_cached(plans):
    # the cascade must scan raw events once at runtime: every level is
    # persisted before it branches into (output union, next level), so
    # all reuse goes through InMemoryTableScan. The plan STRING still
    # re-prints the cached child under each InMemoryTableScan, so
    # counting "events.parquet" substrings would be a false negative —
    # the cache nodes are the real evidence.
    plan = plans("k14_rollup_cascade")
    assert plan.count("InMemoryTableScan") >= 2


def test_er_pairs_join_within_blocks_only(plans):
    # candidate generation must be an equi-join on the blocking key —
    # an all-pairs similarity join would be a cartesian product
    plan = plans("d5_er_blocked_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sequence_examples_single_shuffle(plans):
    # one exchange on the user key; lags are window work on top of it
    assert plans("m22_sequence_examples").count("Exchange") == 1


def test_regional_revenue_broadcasts_dims(plans):
    # Q5 shape: nation/region/supplier broadcast; the big-big joins
    # shuffle on their keys; never a cartesian product
    plan = plans("a19_regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_anomaly_zscore_broadcasts_moments(plans):
    # the 5-row per-type moment table must broadcast back; the event
    # stream itself never reshuffles for the join
    plan = plans("a18_anomaly_zscore")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_grouping_sets_single_scan_expand(plans):
    # three grains must come from ONE scan via Expand, not three
    # unioned scans
    plan = plans("a22_grouping_sets")
    assert "Expand" in plan
    assert plan.count("FileScan") == 1


def test_skew_join_broadcasts_hot_list_no_cartesian(plans):
    # the hot-key list and oversized-bucket lists must arrive via
    # broadcast (never a shuffled join), and salting must never
    # degenerate to a cartesian
    plan = plans("j5_skew_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_count_min_counters_broadcast(plans):
    # the d x w counter table is bounded by construction — the
    # estimate join must broadcast it, not shuffle the increments
    plan = plans("m27_count_min")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hll_register_rollup_is_partial_agg(plans):
    # register max-merge must combine map-side before the exchange
    plan = plans("m28_hll_distinct")
    assert "partial_max" in plan or "partial" in plan
    assert "CartesianProduct" not in plan


def test_plan_lint_heuristics():
    """Unit-level checks of the dragnet linter's plan-string
    heuristics (the full-registry run is tools/plan_lint.py — too
    heavy for the default suite; PLAN_AUDIT.md is its committed
    output)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from plan_lint import lint_info, lint_plan

    assert lint_plan("... CartesianProduct ...")["cartesian"]
    assert lint_info("... BroadcastNestedLoopJoin BuildRight ...")["nested_loop"]
    # unpartitioned window: spec starts with a sort order
    assert lint_plan(
        "Window [row_number() windowspecdefinition(cnt#5L DESC NULLS LAST, "
        "specifiedwindowframe(...)) AS rank#9]"
    )["global_window"]
    # partitioned window: spec starts with partition attributes
    assert not lint_plan(
        "Window [row_number() windowspecdefinition(_pid#1, k#0L ASC NULLS "
        "FIRST, specifiedwindowframe(...)) AS _we0#71]"
    )["global_window"]


def test_analyze_column_stats_single_scan(plans):
    """k29's ANALYZE computes all columns' stats in ONE pass: a 100 TB
    fact table must be scanned once, not once per column (the r7
    verdict's item 3). Expand (multi-countDistinct planning) is fine;
    a second FileScan is not."""
    plan = plans("k29_analyze_column_stats")
    assert plan.count("FileScan") == 1
    assert "Union" not in plan


def test_analyze_hll_stats_single_scan_no_expand(plans):
    """k30 is the verified 100 TB ANALYZE path (r8 verdict item 2):
    sketch NDV must keep the single table pass AND drop the Expand
    operator that exact multi-countDistinct planning inserts — Expand
    replicates every input row once per distinct-aggregate, which at
    100 TB multiplies the shuffle write by the column count."""
    plan = plans("k30_analyze_hll_stats")
    assert plan.count("FileScan") == 1
    assert "Expand" not in plan
    assert "Union" not in plan


def test_contrastive_pool_prestage_is_salted(plans):
    """mm6's negative pool must never sort a whole language inside one
    task (r7 verdict item 4): the FIRST row_number window over the
    full corpus partitions by (lang, salt); only the bounded
    n_salts*POOL union re-ranks per-lang."""
    plan = plans("mm6_contrastive_pairs")
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    full_corpus_specs = [s for s in specs if "lang" in s]
    assert full_corpus_specs, "expected per-lang window specs in plan"
    # the (lang, salt)-partitioned spec must exist AND be the deepest
    # lang spec in the plan (optimized-plan strings print inner/earlier
    # operators LAST, so the full-corpus pre-stage window — the one
    # that must be salted — is the final lang spec in the string;
    # lang-only specs may only re-rank the bounded n_salts*POOL union
    # and therefore must all appear before it)
    assert "salt" in full_corpus_specs[-1], (
        "deepest (full-corpus) window spec is not salt-partitioned: "
        f"{full_corpus_specs}"
    )
