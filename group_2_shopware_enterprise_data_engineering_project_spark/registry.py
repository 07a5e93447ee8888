"""Query registry: name -> (spark callable, DuckDB oracle SQL).

This is the single source of truth behind __spark_entry__.py's
``queries()`` / ``oracle_sql()`` contract. Every operator from
SURVEY.md §2 that is SQL-expressible registers BOTH a Spark callable
(spark, sf_dir) -> DataFrame and the equivalent ANSI SQL for DuckDB;
non-SQL-expressible ops register the callable only (driver records a
rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name
before value-hashing). Aggregates that DuckDB widens to HUGEINT are
CAST to BIGINT in the SQL; decimal literals are cast to DOUBLE.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

#: Driver-facing core set. The correctness harness checks the FIRST 50
#: registered queries, so ordering is part of the verification contract:
#: this list front-loads (a) every query that had never had a driver
#: oracle row through r3 (m9-m17, m7b, m14b, k11, pipe_llm_curation),
#: (b) the 19 queries whose last green row was r1, and (c) one query per
#: remaining SURVEY §2 ID — exactly 50. Everything else follows and is
#: covered by the committed FULL-registry local sweep
#: (tools/verify_local.py --json -> CORRECTNESS_LOCAL_r*.json — the
#: artifact, not this comment, is the query count of record). Rotation
#: policy: queries outside the window rely on their newest green driver
#: row plus the sweep; when a round frees slots (older entries
#: accumulate multiple green rounds), rotate never-driver-checked
#: queries in. r4: e9_ann_ivf_kmeans swapped in for a5_alert_count
#: (A5 keeps its r3 green row, and st5's hour-aligned negative-event
#: counts exercise the same alert-count semantics in-window).
CORE_ORDER: tuple[str, ...] = (
    # never driver-checked before r4
    "m9_session_window_native",
    "m10_percentiles",
    "m11_json_extract",
    "m12_text_normalize",
    "m13_approx_stats",
    "m14_contamination",
    "m14b_contamination_bloom",
    "m15_sequence_pack",
    "m16_mixture_weights",
    "m17_token_budget_select",
    "m7b_asof_join_bucketed",
    "k11_snapshot_diff",
    "pipe_llm_curation",
    # green in r1 only, outside the r2/r3 window
    "k1_hour_partition_roundtrip",
    "k4_replace_merge",
    "k5_additive_merge",
    "k8_validation_summary",
    "mm1_media_fingerprint",
    "mm2_frame_sample",
    "mm3_decode_features",
    "mm4_resize_plan",
    "p3_validation_flags",
    "p9_transform_pipeline",
    "p13_regex_extract",
    "pipe_pos",
    "pipe_inventory",
    "pipe_web",
    "pipe_crm",
    "s2_csv_roundtrip",
    "s3_jsonl_roundtrip",
    "st5_hourly_alert_counts",
    "st7_stream_kpi",
    # one query per remaining §2 ID (+ the r3-regressed m2, re-proven)
    "m2_sessionize",
    "a1_sales_kpi",
    "a2_session_metrics",
    "a3_engagement_score",
    "a4_loyalty_metrics",
    "e9_ann_ivf_kmeans",
    "a6_duplicate_keys",
    "a8_null_counts",
    "j1_loyalty_join",
    "w1_keep_latest",
    "d1_distinct_rows",
    "o1_topk_orders",
    "p2_extra_column_split",
    "p15_date_range",
    "k9_partition_registration",
    "k10_archive_lifecycle",
    "st2_stateful_dedup",
    "s5_record_decode",
)


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _ordered() -> list[QuerySpec]:
    """Core set first (in CORE_ORDER), then the rest in registration
    order. Every CORE_ORDER name must exist — a typo here would silently
    shrink the verified window, so fail loudly instead."""
    missing = [n for n in CORE_ORDER if n not in _REGISTRY]
    if missing:
        raise KeyError(f"CORE_ORDER names not registered: {missing}")
    core = [_REGISTRY[n] for n in CORE_ORDER]
    rest = [s for n, s in _REGISTRY.items() if n not in set(CORE_ORDER)]
    return core + rest


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {spec.name: spec.fn for spec in _ordered()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        spec.name: spec.oracle for spec in _ordered() if spec.oracle is not None
    }


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from group_2_shopware_enterprise_data_engineering_project_spark.queries import (  # noqa: F401
        batch_analytics,
        coverage_q,
        embeddings_sim,
        graph_er,
        ml_prep,
        multimodal_q,
        search_stats,
        streaming_pipelines,
        text_pipeline,
        validation_merge,
        warehouse_q,
    )

    _LOADED = True
