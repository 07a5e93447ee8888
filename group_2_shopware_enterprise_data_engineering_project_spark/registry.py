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
#: registered queries, so ordering is part of the verification
#: contract. Everything past the window marker is covered by the
#: committed FULL-registry local sweep (tools/verify_local.py --json ->
#: CORRECTNESS_LOCAL_r*.json — the artifact, not this comment, is the
#: query count of record). Rotation policy: queries outside the window
#: rely on their newest green driver row plus the sweep; each round,
#: entries with multiple green driver rounds rotate out and
#: never-driver-checked queries rotate in (r4: e9 in for a5; r5: full
#: rotation to the never-checked set, see the block comment below).
CORE_ORDER: tuple[str, ...] = (
    # r6 rotation: m15 stays first per the r5 verdict (r4+r5 driver
    # hash-red; r6 fix = ROWS frame + md5(text) tie-break + INT flag on
    # BOTH engines, prep.py:sequence_pack / ml_prep.py:M15_ORACLE —
    # this row is the proof). The six queries that have never had a
    # driver row rotate in (t14/s8 deferred from r5, t16/t17/t18/
    # pipe_llm_prep new in r5); rotated out to make space, each with a
    # green r5 driver row and overlapping pytest coverage: k13, k18,
    # a22, a23, j4, st11.
    "m15_sequence_pack",
    "t14_compression_ratio",
    "s8_orc_roundtrip",
    "t16_pii_redact",
    "pipe_llm_prep",
    "t17_strip_markup",
    "t18_url_stats",
    # new in r6: native-XML interop (st12 rotated out, green r5 +
    # sweep + pytest coverage)
    "s9_xml_roundtrip",
    # new in r6: hybrid skew-aware equi-join (k12 rotated out, green r5)
    "j5_skew_join",
    # warehouse / storage layer — k21 new in r6 (schema-evolving merge;
    # k14 rotated out, green r5 + sweep coverage)
    "k21_schema_evolution",
    # new in r6: stored-version-chain time travel + CDC (k16 rotated
    # out, green r5 + sweep coverage)
    "k22_time_travel_cdc",
    "k17_zone_map_scan",
    # new in r6: runtime dynamicpruning subquery, plan-proven (k19
    # rotated out, green r5 + sweep coverage)
    "j6_dynamic_partition_pruning",
    "k20_shard_manifest",
    # ANN / embedding family
    "e10_ann_lsh_multiprobe",
    "e11_semdedup",
    "e12_ann_pq",
    "e13_ann_ivfpq",
    # graph
    "g1_pagerank",
    "g2_triangle_counts",
    # entity resolution / dedup
    "d5_er_blocked_pairs",
    "d6_qgram_pairs",
    "mm5_media_near_dup",
    # text / search
    "t8_corpus_dup_ngrams",
    "t9_dedup_spans",
    "t15_bpe_train",
    # late-r6 additions, swapped into the window so each gets its
    # first driver row THIS round (rotated out to make space, each
    # with a green r5 driver row + pytest coverage: t10-t13, m18, a19)
    "t19_bpe_encode",
    "d7_incremental_dedup",
    "st14_stream_incremental_dedup",
    "m27_count_min",
    "st13_stream_count_min",
    "m28_hll_distinct",
    # training-prep
    "m19_chunk_documents",
    "m20_shard_assign",
    "m21_source_quantile_filter",
    # new in r6: applies m16's temperature mixture (m22 rotated out,
    # green r5 + sweep + test_prep coverage)
    "m29_temperature_resample",
    "m23_negative_sample",
    "m24_dense_ids",
    "m25_transition_matrix",
    # new in r6: linear-interpolation resample (m26 ffill rotated out,
    # green r5 + sweep coverage)
    "m30_resample_interpolate",
    # analytics — a24 new in r6 (last-touch attribution; a13 rotated
    # out, green r5 + sweep coverage)
    "a24_attribution",
    # new in r6: custom stateful streaming aggregate (a14 rotated out,
    # green r5 + sweep coverage)
    "st16_stream_custom_state",
    "a15_key_skew_profile",
    "a16_regression_trends",
    "a17_winsorize",
    "a18_anomaly_zscore",
    "a20_expectations",
    "a21_item_cooccurrence",
    # joins / streaming — st15 new in r6 (left-outer watermark flush;
    # st9 rotated out, green r5 + sweep coverage)
    "st15_stream_outer_join",
    "st10_stream_stream_join",
    # --- driver window boundary (first 50 above) ---
    # r7 rotation priority: the 19 queries added AFTER the r6 window
    # froze have never had a driver row and should rotate in first —
    # st17, m31, a25, st18, d8_canonical_selection, pipe_llm_audit,
    # m32, st19, e14, m33, k23, k24, st20, s10, s11, a26, a27, e15, k25 (each
    # sweep-green in CORRECTNESS_LOCAL_r06.json).
    # rotated out in r6 (each has a green r5 driver row):
    "a13_funnel",
    "a14_cohort_retention",
    "k16_scd2_history",
    "k19_bloom_point_lookup",
    "st12_stream_dim_replace",
    "m26_resample_ffill",
    "k14_rollup_cascade",
    "m22_sequence_examples",
    "st9_stream_sessions",
    "t10_tfidf_top_terms",
    "t11_bm25_topk",
    "t12_inverted_index",
    "t13_nb_classifier",
    "m18_length_buckets",
    "a19_regional_revenue",
    "k12_compaction",
    "k13_incremental_agg",
    "k18_bucketed_join",
    "a22_grouping_sets",
    "a23_share_of_total",
    "j4_range_join",
    "st11_dedup_within_watermark",
    # prior-round driver-proven core (keeps sweep order stable)
    "m9_session_window_native",
    "m10_percentiles",
    "m11_json_extract",
    "m12_text_normalize",
    "m13_approx_stats",
    "m14_contamination",
    "m14b_contamination_bloom",
    "m16_mixture_weights",
    "m17_token_budget_select",
    "m7b_asof_join_bucketed",
    "k11_snapshot_diff",
    "pipe_llm_curation",
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
