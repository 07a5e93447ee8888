"""Validation-split, transform, and merge queries with DuckDB oracles
(SURVEY §2.3 P3-P13, §2.2 K4/K5 realized per FIXTURES.md §5).

The validation rules are seeded so the testdata actually splits:
user_id 0 violates the positive-key rule (P6), and events after the
pinned clock + 24h violate the not-future rule (P7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    analytics,
    dedup,
    merge,
    validate,
)
from group_2_shopware_enterprise_data_engineering_project_spark.registry import register
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table

# Pinned validation clock (P7 not-future rule needs a deterministic
# "now" for the oracle; production uses current_timestamp).
VALIDATION_NOW = "2024-01-20 00:00:00"


def _event_rules() -> list[validate.Rule]:
    return [
        validate.positive_key("user_id"),
        *validate.non_negative(["value"]),
        validate.not_future("ts", "24 hours", now=VALIDATION_NOW),
    ]


# DuckDB mirror of the same three rules, in the same order. A rule is
# violated when its condition IS DISTINCT FROM TRUE (false or null) —
# matching Spark's ~cond.eqNullSafe(True).
_ORACLE_RULES = [
    ("user_id_positive", "user_id > 0"),
    ("value_non_negative", "value >= 0"),
    (
        "ts_not_future",
        f"ts <= TIMESTAMP '{VALIDATION_NOW}' + INTERVAL 24 HOURS",
    ),
]

_ORACLE_VIOLATIONS = (
    "list_filter(["
    + ", ".join(
        f"CASE WHEN ({cond}) IS DISTINCT FROM TRUE THEN '{name}' END"
        for name, cond in _ORACLE_RULES
    )
    + "], x -> x IS NOT NULL)"
)


P3_ORACLE = f"""
SELECT event_id,
       len({_ORACLE_VIOLATIONS}) = 0 AS is_valid,
       coalesce(array_to_string({_ORACLE_VIOLATIONS}, ','), '') AS violation_list
FROM events
"""


@register(
    "p3_validation_flags",
    P3_ORACLE,
    doc="P3/P6/P7 rule evaluation with per-row violation tags "
    "(reference inventory_validate.py:216-276, lambda_function.py:70-117)",
)
def p3_validation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    flagged = validate.with_flags(events, _event_rules())
    return flagged.select(
        "event_id",
        "is_valid",
        F.array_join("violations", ",").alias("violation_list"),
    )


_SUMMARY_VIOLS = ", ".join(
    f"CAST(sum(CASE WHEN ({cond}) IS DISTINCT FROM TRUE THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS viol_{name}"
    for name, cond in _ORACLE_RULES
)

K8_ORACLE = f"""
SELECT count(*) AS total_rows,
       CAST(sum(CASE WHEN ({' AND '.join(f'({c}) IS NOT DISTINCT FROM TRUE' for _, c in _ORACLE_RULES)})
                THEN 1 ELSE 0 END) AS BIGINT) AS valid_rows,
       CAST(sum(CASE WHEN ({' AND '.join(f'({c}) IS NOT DISTINCT FROM TRUE' for _, c in _ORACLE_RULES)})
                THEN 0 ELSE 1 END) AS BIGINT) AS invalid_rows,
       {_SUMMARY_VIOLS}
FROM events
"""


@register(
    "k8_validation_summary",
    K8_ORACLE,
    doc="K8 single-row validation report: totals + per-rule violation "
    "counts (reference validate.py:107-132)",
)
def k8_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return validate.summary(table(spark, sf_dir, "events"), _event_rules())


# --- P8/P9/P10/P11: transform pipeline ------------------------------------

P9_ORACLE = """
WITH raw AS (
  SELECT event_id,
         CASE WHEN event_id % 2 = 0
              THEN (CAST(epoch_us(ts) AS DOUBLE) / CAST(1000000.0 AS DOUBLE)) * CAST(1000.0 AS DOUBLE)
              ELSE CAST(epoch_us(ts) AS DOUBLE) / CAST(1000000.0 AS DOUBLE) END AS epoch_raw
  FROM events
), norm AS (
  SELECT event_id, epoch_raw,
         CASE WHEN epoch_raw > 1e11
              THEN epoch_raw / CAST(1000.0 AS DOUBLE)
              ELSE epoch_raw END AS epoch_s
  FROM raw
)
SELECT n.event_id,
       make_timestamp(CAST(floor(n.epoch_s) AS BIGINT) * 1000000) AS event_time,
       CAST(make_timestamp(CAST(floor(n.epoch_s) AS BIGINT) * 1000000) AS DATE)
           AS event_date,
       concat('anon', substr(sha256(CAST(e.user_id AS VARCHAR)), 1, 8)) AS anon_id,
       CAST(e.user_id AS INT) AS user_id_int
FROM norm n JOIN events e USING (event_id)
"""


@register(
    "p9_transform_pipeline",
    P9_ORACLE,
    doc="P8 cast + P9 epoch ms-vs-s autodetect (1e11 rule, reference "
    "transformation.py:37-49) + P10 date derivation + P11 deterministic "
    "anon id (sha2 in place of uuid4)",
)
def p9_transform_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.functions.cleanfn import (
        anon_id,
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.functions.timefn import (
        epoch_to_timestamp,
    )

    events = table(spark, sf_dir, "events")
    # Synthesize a mixed s/ms epoch column from ts (even ids -> ms).
    raw = events.withColumn(
        "epoch_raw",
        F.when(
            F.col("event_id") % 2 == 0,
            F.col("ts").cast("double") * F.lit(1000.0),
        ).otherwise(F.col("ts").cast("double")),
    )
    out = raw.withColumn(
        "event_time", epoch_to_timestamp("epoch_raw", truncate_to_second=True)
    )
    return out.select(
        "event_id",
        "event_time",
        F.to_date("event_time").alias("event_date"),
        anon_id("user_id").alias("anon_id"),
        F.col("user_id").cast("int").alias("user_id_int"),
    )


# --- P13: regex extraction -------------------------------------------------

P13_ORACLE = """
SELECT CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) AS src_num,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY 1
"""


@register(
    "p13_regex_extract",
    P13_ORACLE,
    doc="P13 regex key extraction (reference s3toathena.py:44-60, "
    "transfom_pos.py:80-87) + rollup",
)
def p13_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "src_num", F.regexp_extract("source", r"src(\d+)", 1).cast("int")
        )
        .groupBy("src_num")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("src_num")
    )


# --- K4: replace merge ------------------------------------------------------

K4_SPLIT = "2024-01-16 00:00:00"

K4_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '{K4_SPLIT}'
  ) WHERE rn = 1
), s AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts >= TIMESTAMP '{K4_SPLIT}'
  ) WHERE rn = 1
), u AS (
  SELECT *, 1 AS pri FROM s
  UNION ALL
  SELECT *, 2 AS pri FROM t
)
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY pri) AS rn2
  FROM u
) WHERE rn2 = 1
"""


@register(
    "k4_replace_merge",
    K4_ORACLE,
    doc="K4 replace-MERGE upsert semantics, pure-Spark union+window form "
    "(reference inventory_transform.py:265-275; fallback per SURVEY §4)",
)
def k4_replace_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    split_ts = F.lit(K4_SPLIT).cast("timestamp")
    target = dedup.keep_latest(
        events.filter(F.col("ts") < split_ts), ("user_id",), "ts", "event_id"
    ).select(*cols)
    source = dedup.keep_latest(
        events.filter(F.col("ts") >= split_ts), ("user_id",), "ts", "event_id"
    ).select(*cols)
    return merge.merge_replace(target, source, ("user_id",))


# --- K5: additive merge ------------------------------------------------------

K5_ORACLE = """
WITH b1 AS (
  SELECT l_partkey AS product_id, CAST(o_orderdate AS DATE) AS sale_date,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / CAST(100.0 AS DOUBLE) AS total_sales
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_linenumber <= 3 GROUP BY 1, 2
), b2 AS (
  SELECT l_partkey AS product_id, CAST(o_orderdate AS DATE) AS sale_date,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / CAST(100.0 AS DOUBLE) AS total_sales
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_linenumber > 3 GROUP BY 1, 2
)
SELECT product_id, sale_date, sum(total_sales) AS total_sales
FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
GROUP BY 1, 2
"""


@register(
    "k5_additive_merge",
    K5_ORACLE,
    doc="K5 accumulating KPI MERGE: two batch KPIs merged additively, "
    "round-before-merge quirk preserved (reference transfom_pos.py:140-152)",
)
def k5_additive_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    kpi1 = analytics.sales_kpi(lineitem.filter(F.col("l_linenumber") <= 3), orders)
    kpi2 = analytics.sales_kpi(lineitem.filter(F.col("l_linenumber") > 3), orders)
    return merge.merge_additive(
        kpi1, kpi2, ("product_id", "sale_date"), ("total_sales",)
    )


# --- K11: CDC snapshot diff --------------------------------------------------

# Two keep-latest table states over sliding time windows: users active
# only in the old window delete, only in the new window insert, and a
# changed latest event updates. Null-safe field comparison on both
# sides (IS DISTINCT FROM <-> eqNullSafe).
_K11_OLD_END = "2024-01-20 00:00:00"
_K11_NEW_START = "2024-01-10 00:00:00"

K11_ORACLE = f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '{_K11_OLD_END}'
  ) WHERE rn = 1
), n AS (
  SELECT user_id, event_id, ts, event_type, value FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts >= TIMESTAMP '{_K11_NEW_START}'
  ) WHERE rn = 1
), d AS (
  SELECT coalesce(o.user_id, n.user_id) AS user_id,
         CASE WHEN o.user_id IS NULL THEN 'insert'
              WHEN n.user_id IS NULL THEN 'delete'
              WHEN (o.event_id IS DISTINCT FROM n.event_id)
                OR (o.ts IS DISTINCT FROM n.ts)
                OR (o.event_type IS DISTINCT FROM n.event_type)
                OR (o.value IS DISTINCT FROM n.value)
                   THEN 'update' END AS _change_type,
         coalesce(n.event_id, o.event_id) AS event_id,
         coalesce(n.ts, o.ts) AS ts,
         coalesce(n.event_type, o.event_type) AS event_type,
         coalesce(n.value, o.value) AS value
  FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
)
SELECT * FROM d WHERE _change_type IS NOT NULL
"""


@register(
    "k11_snapshot_diff",
    K11_ORACLE,
    doc="CDC between two keep-latest table states (insert/update/"
    "delete classification, null-safe struct compare, single "
    "full-outer shuffle) — the incremental-consumer primitive behind "
    "ParquetUpsertTable.table_changes",
)
def k11_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    old = dedup.keep_latest(
        events.filter(F.col("ts") < F.lit(_K11_OLD_END).cast("timestamp")),
        ("user_id",),
        "ts",
        "event_id",
    ).select(*cols)
    new = dedup.keep_latest(
        events.filter(F.col("ts") >= F.lit(_K11_NEW_START).cast("timestamp")),
        ("user_id",),
        "ts",
        "event_id",
    ).select(*cols)
    return merge.snapshot_diff(old, new, ("user_id",))


# --- K13 (beyond-reference): incremental aggregate maintenance -------------
#
# The oracle computes the aggregate DIRECTLY from the new snapshot; the
# Spark side never touches the new snapshot as a whole — it maintains
# the old snapshot's aggregate by applying the CDC image stream. A hash
# match therefore proves maintained == recomputed, the defining
# property of incremental view maintenance.

K13_ORACLE = f"""
WITH n AS (
  SELECT user_id, event_type, value FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts >= TIMESTAMP '{_K11_NEW_START}'
  ) WHERE rn = 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
FROM n GROUP BY event_type
"""


@register(
    "k13_incremental_agg",
    K13_ORACLE,
    doc="incremental view maintenance: a per-event_type (count, cents) "
    "aggregate materialized on the OLD keep-latest snapshot is "
    "maintained to the NEW state by applying only the "
    "snapshot_diff_images CDC stream (insert/delete/update pre+post "
    "images, signed contributions) - O(changes) not O(table); oracle "
    "recomputes from the new snapshot directly, so the hash match "
    "proves maintained == recomputed",
)
def k13_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    old = dedup.keep_latest(
        events.filter(F.col("ts") < F.lit(_K11_OLD_END).cast("timestamp")),
        ("user_id",),
        "ts",
        "event_id",
    ).select(*cols)
    new = dedup.keep_latest(
        events.filter(F.col("ts") >= F.lit(_K11_NEW_START).cast("timestamp")),
        ("user_id",),
        "ts",
        "event_id",
    ).select(*cols)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = old.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("value_cents"),
    )
    changes = merge.snapshot_diff_images(old, new, ("user_id",))
    return merge.incremental_agg(
        base, changes, ("event_type",), value_col="value"
    )
