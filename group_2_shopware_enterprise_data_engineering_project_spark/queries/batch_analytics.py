"""Batch analytics queries over the testdata star schema, with DuckDB
oracles (SURVEY §2.4-2.8 realized per FIXTURES.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    analytics,
    dedup,
)
from group_2_shopware_enterprise_data_engineering_project_spark.operators.hints import (
    broadcast_if_small,
)
from group_2_shopware_enterprise_data_engineering_project_spark.registry import register
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table


# --- A2: session/engagement metrics (flagship) --------------------------

A2_ORACLE = """
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       date_diff('second', min(ts), max(ts)) AS duration_sec,
       count(*) AS n_events,
       count(DISTINCT props) AS n_distinct,
       min(event_type) AS entry_event,
       max(event_type) AS exit_event
FROM events
GROUP BY user_id
ORDER BY session_start DESC, user_id
"""


@register(
    "a2_session_metrics",
    A2_ORACLE,
    doc="A2 session engagement metrics (reference script.sql:1-17); "
    "alphabetical MIN/MAX(event_type) entry/exit quirk preserved",
)
def a2_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return analytics.session_metrics(events, distinct_col="props")


# --- A3: weighted engagement score ---------------------------------------

A3_ORACLE = """
SELECT user_id,
       CAST(sum(CASE event_type WHEN 'click' THEN 2 WHEN 'view' THEN 1
                WHEN 'purchase' THEN 4 WHEN 'signup' THEN 3
                ELSE 1 END) AS BIGINT) AS engagement_score
FROM events
GROUP BY user_id
ORDER BY engagement_score DESC, user_id
"""


@register(
    "a3_engagement_score",
    A3_ORACLE,
    doc="A3 weighted CASE-sum engagement score (reference script.sql:59-76)",
)
def a3_engagement_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.engagement_score(table(spark, sf_dir, "events"))


# --- A1: sales KPI -------------------------------------------------------

A1_ORACLE = """
SELECT l_partkey AS product_id,
       CAST(o_orderdate AS DATE) AS sale_date,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / CAST(100.0 AS DOUBLE) AS total_sales
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


@register(
    "a1_sales_kpi",
    A1_ORACLE,
    doc="A1 sales per product per day, round(sum,2) before merge "
    "(reference transfom_pos.py:127-129)",
)
def a1_sales_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.sales_kpi(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    )


# --- A4: loyalty metrics -------------------------------------------------

A4_ORACLE = """
SELECT o_custkey AS customer_id,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS loyalty_interactions,
       count(*) AS total_interactions,
       CASE WHEN count(*) > 0
             THEN CAST(100.0 AS DOUBLE) * sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / count(*)
             ELSE CAST(0.0 AS DOUBLE) END AS loyalty_rate,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / (CAST(100.0 AS DOUBLE) * count(*)) AS avg_rating
FROM orders
GROUP BY o_custkey
"""


@register(
    "a4_loyalty_metrics",
    A4_ORACLE,
    doc="A4 loyalty conditional agg + guarded rate + avg "
    "(reference script.sql:79-91)",
)
def a4_loyalty_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.loyalty_metrics(table(spark, sf_dir, "orders"))


# --- A5: hour-window alert count ----------------------------------------

A5_START, A5_END = "2024-01-10 00:00:00", "2024-01-11 00:00:00"

A5_ORACLE = f"""
SELECT count(*) AS negative_count,
       count(*) >= 10 AS alert
FROM events
WHERE ts >= TIMESTAMP '{A5_START}' AND ts < TIMESTAMP '{A5_END}'
  AND value <= CAST(100.0 AS DOUBLE)
"""


@register(
    "a5_alert_count",
    A5_ORACLE,
    doc="A5 conditional count in aligned time window + alert flag "
    "(reference alerting_lambda.py:47-93)",
)
def a5_alert_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.alert_count(
        table(spark, sf_dir, "events"), A5_START, A5_END, negative_threshold=100.0
    )


# --- A6: duplicate-key diagnostic ---------------------------------------

A6_ORACLE = """
SELECT user_id, count(*) AS n
FROM events
GROUP BY user_id
HAVING count(*) > 1
"""


@register(
    "a6_duplicate_keys",
    A6_ORACLE,
    doc="A6 duplicate-key detection (reference inventory_transform.py:486-493)",
)
def a6_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.duplicate_keys(table(spark, sf_dir, "events"), "user_id")


# --- A8: per-column null counts -----------------------------------------

_EVENT_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")

A8_ORACLE = "SELECT " + ", ".join(
    f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}_nulls"
    for c in _EVENT_COLS
) + " FROM events"


@register(
    "a8_null_counts",
    A8_ORACLE,
    doc="A8 per-column null-count validation report "
    "(reference inventory_validate.py:238-243)",
)
def a8_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.null_counts(table(spark, sf_dir, "events"), list(_EVENT_COLS))


# --- J1/J2/O1: left join with cast key + coalesce defaults ---------------

J1_ORACLE = """
WITH s AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) AS session_end,
         date_diff('second', min(ts), max(ts)) AS duration_sec,
         count(*) AS n_events,
         count(DISTINCT props) AS n_distinct,
         min(event_type) AS entry_event,
         max(event_type) AS exit_event
  FROM events GROUP BY user_id
)
SELECT s.*,
       coalesce(c.c_name, 'unknown') AS customer_name,
       coalesce(c.c_acctbal, CAST(0.0 AS DOUBLE)) AS acctbal,
       coalesce(c.c_mktsegment, 'NONE') AS mktsegment
FROM s LEFT JOIN customer c ON CAST(s.user_id AS INT) = c.c_custkey
ORDER BY s.user_id DESC
"""


@register(
    "j1_loyalty_join",
    J1_ORACLE,
    doc="J1 LEFT JOIN on cast key + J2 COALESCE defaults + O1 ORDER BY "
    "key DESC (reference script.sql:93-103); dim side size-gated "
    "broadcast (broadcast_if_small — the customer dim is "
    "sf-proportional)",
)
def j1_loyalty_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = analytics.session_metrics(
        table(spark, sf_dir, "events"), distinct_col="props"
    )
    return analytics.loyalty_join(sessions, table(spark, sf_dir, "customer"))


# --- W1: keep-latest dedup window ---------------------------------------

W1_ORACLE = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register(
    "w1_keep_latest",
    W1_ORACLE,
    doc="W1 latest-record-per-key ranking window "
    "(reference inventory_transform.py:483-484)",
)
def w1_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return dedup.keep_latest(events, ("user_id",), "ts", "event_id").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


# --- D1: full-row distinct ------------------------------------------------

D1_ORACLE = """
SELECT DISTINCT * FROM (
  SELECT * FROM events UNION ALL SELECT * FROM events
)
"""


@register(
    "d1_distinct_rows",
    D1_ORACLE,
    doc="D1 full-row distinct over a dup-seeded union "
    "(reference transfom_pos.py:118)",
)
def d1_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return dedup.distinct_rows(events.unionAll(events))


# --- O1/O2: global top-k --------------------------------------------------

O1_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register(
    "o1_topk_orders",
    O1_ORACLE,
    doc="O1 global ORDER BY DESC + O2 LIMIT (reference script.sql:17, "
    "CRM_README.md:216); executes as TakeOrderedAndProject",
)
def o1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    return analytics.top_k(orders, "o_totalprice", 10, "o_orderkey")


# --- P15: date-range filter + monthly rollup ------------------------------

P15_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / CAST(100.0 AS DOUBLE) AS total_value
FROM orders
WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
GROUP BY 1
ORDER BY 1
"""


@register(
    "p15_date_range",
    P15_ORACLE,
    doc="P15 date-range filter (reference script.sql:15) + monthly rollup",
)
def p15_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.date_range_summary(
        table(spark, sf_dir, "orders"), "1996-01-01", "1996-12-31"
    )


# --- A9: ROLLUP multi-level aggregation -------------------------------------

A9_ORACLE = """
SELECT o_orderstatus,
       strftime(o_orderdate, '%Y-%m') AS month,
       CAST(grouping(o_orderstatus) * 2 + grouping(strftime(o_orderdate, '%Y-%m'))
            AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE)
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
           / CAST(100 AS DOUBLE) AS total_value
FROM orders
GROUP BY ROLLUP (o_orderstatus, strftime(o_orderdate, '%Y-%m'))
"""


@register(
    "a9_rollup_sales",
    A9_ORACLE,
    doc="multi-level ROLLUP (status, month) with GROUPING ids and "
    "exact-cents totals — subtotal + grand-total levels in ONE "
    "pass/shuffle instead of three unioned aggregations",
)
def a9_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    cents = F.floor(
        F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    return (
        orders.rollup("o_orderstatus", month)
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("total_value"),
        )
    )


# --- A10: pivot (conditional aggregation) -----------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "scroll", "share")

A10_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
           for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


@register(
    "a10_pivot_events",
    A10_ORACLE,
    doc="per-user event-type pivot with an EXPLICIT pivot value list — "
    "one shuffle with map-side combine; an unlisted-values pivot would "
    "add a distinct-scan job first (the 100 TB anti-pattern)",
)
def a10_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (user, type) pair never occurred;
    # counts mean 0 — and the oracle's FILTER form agrees
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


# --- J3: anti join ----------------------------------------------------------

J3_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
"""


@register(
    "j3_customers_without_orders",
    J3_ORACLE,
    doc="LEFT ANTI join: customers with no order since 2000 (lapsed-"
    "customer retention cut) — the complement of J1; the date filter "
    "pushes to the orders scan, then one shuffle",
)
def j3_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --- D4: set operations -----------------------------------------------------

D4_ORACLE = """
WITH w1 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
), w2 AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
)
SELECT user_id, 'both' AS cohort FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w2)
UNION ALL
SELECT user_id, 'early_only' AS cohort FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w2)
UNION ALL
SELECT user_id, 'late_only' AS cohort FROM (SELECT * FROM w2 EXCEPT SELECT * FROM w1)
"""


@register(
    "d4_cohort_set_ops",
    D4_ORACLE,
    doc="INTERSECT / EXCEPT cohort split of users across a time "
    "boundary (retention-analysis primitive); distinct inputs keep "
    "the set ops one hash shuffle each",
)
def d4_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    w1 = ev.filter(F.col("ts") < split).select("user_id").distinct()
    w2 = ev.filter(F.col("ts") >= split).select("user_id").distinct()
    return (
        w1.intersect(w2).select("user_id", F.lit("both").alias("cohort"))
        .unionAll(
            w1.exceptAll(w2).select("user_id", F.lit("early_only").alias("cohort"))
        )
        .unionAll(
            w2.exceptAll(w1).select("user_id", F.lit("late_only").alias("cohort"))
        )
    )


# --- W2: running totals (cumulative window) ---------------------------------

W2_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(sum(CAST(floor(o_totalprice * CAST(100 AS DOUBLE)
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) / CAST(100 AS DOUBLE) AS running_total,
       CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS BIGINT) AS order_seq
FROM orders
"""


@register(
    "w2_running_totals",
    W2_ORACLE,
    doc="per-customer cumulative spend (ROWS UNBOUNDED PRECEDING "
    "window, exact cents) — lifetime-value running metric; one "
    "shuffle shared by both window functions",
)
def w2_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double")
            / F.lit(100.0)
        ).alias("running_total"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


# --- A11: one-pass column profile -------------------------------------------

A11_ORACLE = """
SELECT 'o_totalprice' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(o_totalprice) AS BIGINT) AS n_non_null,
       CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
       min(o_totalprice) AS min_val, max(o_totalprice) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey',
       CAST(count(*) AS BIGINT), CAST(count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
FROM orders
"""


@register(
    "a11_profile_orders",
    A11_ORACLE,
    doc="column profiling (rows / non-null / distinct / min / max) — "
    "the data-quality survey primitive; Spark computes ALL columns in "
    "one scan+aggregate (the SQL mirror unions per-column for "
    "readability, Spark does not)",
)
def a11_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    one = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("double").alias("min_cust"),
        F.max("o_custkey").cast("double").alias("max_cust"),
    )
    return one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_totalprice").alias("column_name"),
                    F.col("n_rows"),
                    F.col("nn_price").alias("n_non_null"),
                    F.col("nd_price").alias("n_distinct"),
                    F.col("min_price").alias("min_val"),
                    F.col("max_price").alias("max_val"),
                ),
                F.struct(
                    F.lit("o_custkey").alias("column_name"),
                    F.col("n_rows"),
                    F.col("nn_cust").alias("n_non_null"),
                    F.col("nd_cust").alias("n_distinct"),
                    F.col("min_cust").alias("min_val"),
                    F.col("max_cust").alias("max_val"),
                ),
            )
        ).alias("p")
    ).select("p.*")


# --- A12: fixed-bin histogram -----------------------------------------------

_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 500.0, 20
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_BINS

A12_ORACLE = f"""
WITH binned AS (
  SELECT event_type,
         least(greatest(CAST(floor((value - CAST({_HIST_LO} AS DOUBLE))
             / CAST({_HIST_W} AS DOUBLE)) AS BIGINT), 0), {_HIST_BINS - 1}) AS bin
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, bin,
       CAST({_HIST_LO} AS DOUBLE) + bin * CAST({_HIST_W} AS DOUBLE) AS bin_lo,
       CAST(count(*) AS BIGINT) AS n
FROM binned GROUP BY event_type, bin
"""


@register(
    "a12_value_histogram",
    A12_ORACLE,
    doc="fixed-width value histogram per event type (20 bins, clamped "
    "edges) — distribution monitoring in one combined shuffle; bins "
    "computed in codegen, only (type, bin, count) survives",
)
def a12_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bin_col = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(_HIST_LO)) / F.lit(_HIST_W)).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(_HIST_BINS - 1).cast("long"),
    )
    return (
        ev.select("event_type", bin_col.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            (F.lit(_HIST_LO) + F.col("bin") * F.lit(_HIST_W)).alias("bin_lo"),
            "n",
        )
    )


# --- a13: ordered funnel ---------------------------------------------------
#
# Oracle deliberately uses the OTHER standard formulation (per-step
# first-completion via windows + strictly-after joins) so the Spark
# fold and the SQL are independent derivations of the same semantics.

A13_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), s0 AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
    FROM e WHERE event_type = 'view'
  ) WHERE rn = 1
), s1 AS (
  SELECT user_id, ts, event_id FROM (
    SELECT e.user_id, e.ts, e.event_id,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) rn
    FROM e JOIN s0 ON e.user_id = s0.user_id
    WHERE e.event_type = 'click'
      AND (e.ts > s0.ts OR (e.ts = s0.ts AND e.event_id > s0.event_id))
  ) WHERE rn = 1
), s2 AS (
  SELECT user_id FROM (
    SELECT e.user_id,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) rn
    FROM e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'purchase'
      AND (e.ts > s1.ts OR (e.ts = s1.ts AND e.event_id > s1.event_id))
  ) WHERE rn = 1
)
SELECT CAST(0 AS BIGINT) AS step, 'view' AS step_name,
       CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
UNION ALL
SELECT CAST(1 AS BIGINT), 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
UNION ALL
SELECT CAST(2 AS BIGINT), 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
"""


@register(
    "a13_funnel",
    A13_ORACLE,
    doc="strict-order funnel (view -> click -> purchase, first-touch): "
    "per-user time-sorted fold in ONE shuffle with O(steps) state; "
    "oracle is the independent window/join formulation of the same "
    "semantics",
)
def a13_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.funnel(table(spark, sf_dir, "events"))


# --- a14: weekly cohort retention ------------------------------------------

A14_ORACLE = """
WITH a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
), f AS (
  SELECT user_id, min(week) AS cohort_week FROM a GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) // 7 AS BIGINT)
           AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
"""


@register(
    "a14_cohort_retention",
    A14_ORACLE,
    doc="weekly cohort retention triangle (first-event ISO-week cohorts, "
    "distinct-active-users per cohort x offset cell): dedup to "
    "(user, week) before any join so raw events never shuffle twice",
)
def a14_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.cohort_retention(table(spark, sf_dir, "events"))


# --- A24: last-touch attribution ----------------------------------------

A24_ORACLE = """
WITH conv AS (
  SELECT event_id AS buy_id, user_id, ts AS buy_ts, value
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, ts, event_type, event_id
  FROM events WHERE event_type IN ('click', 'view')
), ranked AS (
  SELECT c.buy_id, t.event_type AS touch_channel, t.ts AS touch_ts,
         row_number() OVER (
           PARTITION BY c.buy_id
           ORDER BY t.ts DESC, t.event_id DESC) AS rn
  FROM conv c JOIN t
    ON c.user_id = t.user_id AND t.ts <= c.buy_ts
), last AS (
  SELECT buy_id, touch_channel, touch_ts FROM ranked WHERE rn = 1
), att AS (
  SELECT c.buy_id, c.value,
         CASE WHEN l.touch_ts >= c.buy_ts - INTERVAL 1 DAY
              THEN l.touch_channel ELSE 'direct' END AS channel
  FROM conv c LEFT JOIN last l ON c.buy_id = l.buy_id
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / CAST(100.0 AS DOUBLE) AS attributed_revenue
FROM att GROUP BY channel
"""


@register(
    "a24_attribution",
    A24_ORACLE,
    doc="last-touch conversion attribution with a 1-day lookback: "
    "purchases credited to the user's most recent click/view via the "
    "as-of join (union + ONE per-user window — the oracle's "
    "inequality join + rank, which would blow up at scale, exists "
    "only on the DuckDB side); stale or absent touches fall to "
    "'direct'; exact-cents revenue rollup",
)
def a24_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.last_touch_attribution(table(spark, sf_dir, "events"))


# --- A26: ranking-function surface (rank / dense_rank / ntile / ratios) ----

A26_ORACLE = """
WITH v AS (
  SELECT o_orderkey, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, status, cents,
       CAST(rank() OVER w_val AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w_val AS BIGINT) AS drnk,
       percent_rank() OVER w_val AS pct_rank,
       cume_dist() OVER w_val AS cume,
       CAST(ntile(4) OVER w_tot AS BIGINT) AS quartile
FROM v
WINDOW w_val AS (PARTITION BY status ORDER BY cents DESC),
       w_tot AS (PARTITION BY status ORDER BY cents DESC, o_orderkey)
ORDER BY status, cents DESC, o_orderkey
"""


@register(
    "a26_window_ranks",
    A26_ORACLE,
    doc="the ranking-function surface in one query: rank/dense_rank/"
    "percent_rank/cume_dist over a VALUE ordering (ties share ranks, "
    "so every per-row value is deterministic without a tie-break) "
    "plus ntile over a TOTAL ordering (ntile splits tie groups, so "
    "its ordering must be collision-proof — the o_orderkey tie-break "
    "is load-bearing, not stylistic). percent_rank/cume_dist are one "
    "division of identical integers on both engines — exactly-rounded "
    "IEEE, hash-safe per the repo's float discipline. One shuffle on "
    "the partition key serves all five functions",
)
def a26_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    v = orders.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    w_val = Window.partitionBy("status").orderBy(F.col("cents").desc())
    w_tot = Window.partitionBy("status").orderBy(
        F.col("cents").desc(), F.col("o_orderkey")
    )
    return v.select(
        "o_orderkey",
        "status",
        "cents",
        F.rank().over(w_val).cast("long").alias("rnk"),
        F.dense_rank().over(w_val).cast("long").alias("drnk"),
        F.percent_rank().over(w_val).alias("pct_rank"),
        F.cume_dist().over(w_val).alias("cume"),
        F.ntile(4).over(w_tot).cast("long").alias("quartile"),
    )


# --- A27: proportion estimates with Wilson confidence bounds ---------------

# z = 1.96 exactly (a double literal); every input to the bound is a
# BIGINT count, and the bound itself is ONE pinned expression using
# only +,-,*,/ and sqrt — all exactly-rounded per IEEE-754, so both
# engines produce bit-identical doubles (the repo's float discipline;
# ln/exp/pow never appear).
A27_ORACLE = """
WITH c AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_type,
         CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
  FROM events GROUP BY 1
)
SELECT event_type, n_type, n_total,
       CAST(n_type AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_hat,
       (CAST(n_type AS DOUBLE) / CAST(n_total AS DOUBLE)
          + 1.96 * 1.96 / (2.0 * CAST(n_total AS DOUBLE))
          - 1.96 * sqrt(
              (CAST(n_type AS DOUBLE) / CAST(n_total AS DOUBLE))
              * (1.0 - CAST(n_type AS DOUBLE) / CAST(n_total AS DOUBLE))
              / CAST(n_total AS DOUBLE)
              + 1.96 * 1.96 / (4.0 * CAST(n_total AS DOUBLE)
                               * CAST(n_total AS DOUBLE))))
         / (1.0 + 1.96 * 1.96 / CAST(n_total AS DOUBLE)) AS wilson_lo,
       (CAST(n_type AS DOUBLE) / CAST(n_total AS DOUBLE)
          + 1.96 * 1.96 / (2.0 * CAST(n_total AS DOUBLE))
          + 1.96 * sqrt(
              (CAST(n_type AS DOUBLE) / CAST(n_total AS DOUBLE))
              * (1.0 - CAST(n_type AS DOUBLE) / CAST(n_total AS DOUBLE))
              / CAST(n_total AS DOUBLE)
              + 1.96 * 1.96 / (4.0 * CAST(n_total AS DOUBLE)
                               * CAST(n_total AS DOUBLE))))
         / (1.0 + 1.96 * 1.96 / CAST(n_total AS DOUBLE)) AS wilson_hi
FROM c ORDER BY event_type
"""


@register(
    "a27_wilson_proportions",
    A27_ORACLE,
    doc="per-type event share with Wilson 95% confidence bounds — the "
    "interval that stays inside [0,1] and behaves at small n, unlike "
    "the naive normal approximation; the decision-grade form of 'is "
    "this share really higher'. Inputs are BIGINT counts and the "
    "bound is ONE pinned expression over +,-,*,/ and sqrt (all "
    "IEEE exactly-rounded -> bit-identical across engines; the repo's "
    "float discipline). One map-side-combined groupBy; the total "
    "rides a window over the per-type rows, not the data",
)
def a27_wilson_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = table(spark, sf_dir, "events")
    c = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_type")
    )
    c = c.withColumn(
        "n_total", F.sum("n_type").over(Window.partitionBy()).cast("long")
    )
    nt = F.col("n_type").cast("double")
    n = F.col("n_total").cast("double")
    z = F.lit(1.96)
    p = nt / n
    center = p + z * z / (F.lit(2.0) * n)
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
    denom = F.lit(1.0) + z * z / n
    return c.select(
        "event_type",
        "n_type",
        "n_total",
        p.alias("p_hat"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


# --- a28: distribution-drift monitor (chi-square per bucket) ---------------

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (  # noqa: E402
    stats as _stats,
)

_A28_LO, _A28_HI, _A28_BINS = 0, 50_000, 10

A28_ORACLE = f"""
WITH v AS (
  SELECT CAST(day(ts) % 2 AS INT) AS g,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS val
  FROM events WHERE value IS NOT NULL
), binned AS (
  SELECT g,
         least({_A28_BINS - 1},
               greatest(0, ((val - {_A28_LO}) * {_A28_BINS})
                           // {_A28_HI - _A28_LO})) AS bin
  FROM v
), per AS (
  SELECT bin,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM binned GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_base) AS BIGINT) AS tb, CAST(sum(n_cur) AS BIGINT) AS tc
  FROM per
), scored AS (
  SELECT bin, n_base, n_cur,
         CAST(n_base AS DOUBLE) * CAST(tc AS DOUBLE) / CAST(tb AS DOUBLE)
             AS expected_cur
  FROM per, tot
)
SELECT bin, n_base, n_cur, expected_cur,
       CASE WHEN expected_cur > 0
            THEN (CAST(n_cur AS DOUBLE) - expected_cur)
               * (CAST(n_cur AS DOUBLE) - expected_cur) / expected_cur
       END AS chi2_contrib
FROM scored
"""


@register(
    "a28_drift_buckets",
    A28_ORACLE,
    doc="distribution-drift gate between baseline/current periods "
    "(day-parity split): fixed-domain BIGINT value histogram per "
    "period, per-bin expected-under-baseline count and chi-square "
    "contribution — contributions deliberately NOT float-summed "
    "(order-dependent); one map-side-combined groupBy + a broadcast "
    "totals row",
)
def a28_drift_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        (F.dayofmonth("ts") % 2).cast("int").alias("period"),
        "value",
    )
    return _stats.drift_buckets(
        ev,
        "period",
        F.floor(F.col("value") * 100.0 + 0.5),
        lo=_A28_LO,
        hi=_A28_HI,
        bins=_A28_BINS,
    )


# --- a30: RFM customer features ---------------------------------------------

_A30_REF = "2001-08-01"  # fixed reference date (corpus max order date)

A30_ORACLE = f"""
SELECT o_custkey,
       CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                      DATE '{_A30_REF}') AS BIGINT) AS recency_days,
       CAST(count(*) AS BIGINT) AS frequency,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS monetary_cents
FROM orders
GROUP BY o_custkey
"""


@register(
    "a30_rfm_features",
    A30_ORACLE,
    doc="RFM customer-feature build (recency to a fixed reference "
    "date, order frequency, exact-cents monetary) — the classic "
    "segmentation/feature-store projection; one map-side-combined "
    "groupBy, all-integer outputs",
)
def a30_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_A30_REF).cast("date"), F.to_date(F.max("o_orderdate"))
        )
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(cents).cast("long").alias("monetary_cents"),
    )


# --- a32: bounded moving-window aggregates ------------------------------------

A32_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, n, cents,
       CAST(sum(n) OVER w AS BIGINT) AS n_7d,
       CAST(sum(cents) OVER w AS BIGINT) AS cents_7d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
"""


@register(
    "a32_moving_window",
    A32_ORACLE,
    doc="7-day moving totals per user (bounded RANGE frame over the "
    "daily pre-aggregate — the rolling-KPI shape; the window runs "
    "over per-day rows, not raw events, so frame state is <= 7 rows "
    "however hot the user); exact BIGINT sums, one user shuffle "
    "shared by the daily agg and the window",
)
def a32_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("cents"),
    )
    # RANGE frame over a day-ordinal column: Spark's RANGE frame needs
    # a numeric ordering expression for interval bounds — epoch-day
    # keeps it integer-exact and engine-portable
    day_idx = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(day_idx)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        "day",
        "n",
        "cents",
        F.sum("n").over(w).cast("long").alias("n_7d"),
        F.sum("cents").over(w).cast("long").alias("cents_7d"),
    )


# --- a34: shuffle-skew pre-flight audit ---------------------------------------

_A34_BUCKETS = 8

A34_ORACLE = f"""
WITH b AS (
  SELECT CAST(CAST(concat('0x', substring(
             md5('skew:' || event_type), 1, 4)) AS BIGINT)
             % {_A34_BUCKETS} AS BIGINT) AS bucket,
         event_type
  FROM events
), per_bucket AS (
  SELECT bucket,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_keys
  FROM b GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM per_bucket
)
SELECT bucket, n_rows, n_keys,
       CAST(CASE WHEN n_rows * {_A34_BUCKETS} > 2 * total
                 THEN 1 ELSE 0 END AS BIGINT) AS skew_flag
FROM per_bucket CROSS JOIN tot
"""


@register(
    "a34_shuffle_skew_audit",
    A34_ORACLE,
    doc="shuffle-skew pre-flight audit: before shuffling on a "
    "low-cardinality key (event_type), hash keys into the planned "
    f"reducer buckets (md5_16 mod {_A34_BUCKETS} — engine-portable, "
    "k28's bucket rule) and report per-bucket row/key counts with a "
    ">2x-mean flag — the report that tells a pipeline to salt (j5) "
    "BEFORE the straggler, not after. One map-side-combined groupBy; "
    "flag by integer cross-multiplication against a broadcast total",
)
def a34_shuffle_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        stats,
    )

    events = table(spark, sf_dir, "events")
    return stats.shuffle_skew_audit(events, "event_type", _A34_BUCKETS)


# --- a35: Benford first-digit audit ------------------------------------------

_A35_THRESHOLD = 0.02


def _a35_oracle() -> str:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.stats import (
        BENFORD_EXPECTED,
    )

    values = ", ".join(
        f"({d}, CAST({BENFORD_EXPECTED[d - 1]!r} AS DOUBLE))"
        for d in range(1, 10)
    )
    return f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
), d AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0
), counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS total FROM d
), expected(digit, benford_expected) AS (
  VALUES {values}
)
SELECT e.digit,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       COALESCE(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE), 0.0) AS share,
       e.benford_expected,
       COALESCE(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
                - e.benford_expected,
                -e.benford_expected) AS deviation,
       CAST(abs(COALESCE(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
                         - e.benford_expected,
                         -e.benford_expected)) > {_A35_THRESHOLD!r}
            AS INT) AS flagged
FROM expected e
LEFT JOIN counts c USING (digit)
CROSS JOIN tot t
"""


@register(
    "a35_benford_audit",
    _a35_oracle(),
    doc=f"Benford's-law first-digit audit over order totals (deviation "
    f"threshold {_A35_THRESHOLD}): the forensic screen for fabricated "
    "or corrupted monetary data. First digits come from the decimal "
    "string of exact integer cents (no engine-side log10 — the "
    "expected shares log10(1+1/d) are Python-interpolated literals, "
    "per the stats-module transcendental discipline), shares and "
    "deviations are single exact IEEE ops over BIGINT counts. One "
    "9-bucket map-side-combined groupBy + a broadcast 9-row "
    "expectation join; the table is scanned once",
)
def a35_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        stats,
    )

    return stats.benford_audit(
        table(spark, sf_dir, "orders"),
        "o_totalprice",
        deviation_threshold=_A35_THRESHOLD,
    )


# --- a36: sweep-line peak concurrency per hour ----------------------------------

_A36_LEN_US = 300_000_000  # each event opens a 5-minute activity interval
_A36_HOUR_US = 3_600_000_000

A36_ORACLE = f"""
WITH iv AS (
  SELECT epoch_us(ts) AS s, epoch_us(ts) + {_A36_LEN_US} AS e FROM events
), b AS (
  SELECT s AS t, CAST(1 AS BIGINT) AS d FROM iv
  UNION ALL
  SELECT e AS t, CAST(-1 AS BIGINT) AS d FROM iv
), bb AS (
  SELECT t, d, t // {_A36_HOUR_US} AS bucket FROM b
), run AS (
  -- RANGE frame on t: every row in an equal-instant event group sees
  -- the cumsum THROUGH the group — the attained level at that instant.
  -- (ROWS + tie-ordering leaked intermediate prefixes as phantom
  -- peaks when >=2 ends sat exactly on a bucket boundary; r9 ADVICE.)
  SELECT bucket, d, t,
         CAST(sum(d) OVER (PARTITION BY bucket ORDER BY t
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS run
  FROM bb
), per_bucket AS (
  SELECT bucket,
         CAST(max(run) AS BIGINT) AS local_peak,
         CAST(sum(d) AS BIGINT) AS net,
         CAST(count(*) FILTER (WHERE d = 1) AS BIGINT) AS n_starts,
         CAST(min(t) AS BIGINT) AS t_min
  FROM run GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket, n_starts,
       CAST(COALESCE(sum(net) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + CASE WHEN t_min > bucket * {_A36_HOUR_US}
                   THEN greatest(local_peak, 0) ELSE local_peak END
            AS BIGINT) AS peak_concurrency
FROM per_bucket
"""


@register(
    "a36_peak_concurrency",
    A36_ORACLE,
    doc="sweep-line peak concurrency per hour (max simultaneous "
    "5-minute activity intervals — the capacity-planning aggregate): "
    "+1/-1 boundary events, per-HOUR running sum for the local prefix "
    "max, carry-in offsets from a prefix sum over the hour-cardinality "
    "frame — the m15 sharded-running-sum decomposition, so no global "
    "ordered window ever sees row-level data. Half-open tie rule "
    "(ends before starts at equal t) pinned; all-BIGINT epoch-us "
    "arithmetic",
)
def a36_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        rangejoin,
    )

    iv = table(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts")).alias("start_us"),
        (F.unix_micros(F.col("ts")) + F.lit(_A36_LEN_US)).alias("end_us"),
    )
    return rangejoin.interval_concurrency(
        iv, "start_us", "end_us", bucket_us=_A36_HOUR_US
    )


# --- a37: EWMA revenue baseline + spike flag ------------------------------------

_A37_L = 7  # lookback depth, current day included
#: EWMA with alpha = 1/4 over a zero-padded 7-day lookback, as EXACT
#: INTEGER weights: the renormalized alpha*(1-alpha)^j weights equal
#: 3^j * 4^(L-1-j) / U with U = 4^L - 3^L — so the smoothed value is
#: ONE BIGINT weighted sum divided ONCE by the literal U. No float
#: accumulation exists to diverge: a first float formulation (double
#: weights in a term chain) hash-missed by 1 ulp because DuckDB
#: contracts `w*c + acc` into fused multiply-adds while the JVM never
#: fuses; integer arithmetic removes the FMA surface entirely.
_A37_U_WEIGHTS = tuple(3**j * 4 ** (_A37_L - 1 - j) for j in range(_A37_L))
_A37_U = 4**_A37_L - 3**_A37_L  # == sum of the integer weights

_A37_NUM_SQL = " + ".join(
    f"{u} * lag(cents, {j}, 0) OVER w"
    for j, u in enumerate(_A37_U_WEIGHTS)
)

A37_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents
  FROM events GROUP BY 1, 2
), n AS (
  SELECT event_type, day, cents,
         CAST({_A37_NUM_SQL} AS BIGINT) AS num
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day, cents,
       CAST(num AS DOUBLE) / CAST({_A37_U} AS DOUBLE) AS ewma_7,
       CAST({_A37_U} * cents > 2 * num AS INT) AS spike_flag
FROM n
"""


def ewma_from_daily(daily: DataFrame) -> DataFrame:
    """a37's exact-integer EWMA + spike flag over a (event_type, day,
    cents) daily frame — shared with st29, whose streamed counter
    table equals the batch daily aggregate (additive commutativity)."""
    from pyspark.sql import Window

    # Overflow audit (r11 verdict item 4): num = Σ u_j*cents_j with
    # Σu_j = U = 4^L-3^L ≈ 1.4e4, so num fits BIGINT while daily
    # cents stay under ~6.5e14 (≈ $6.5e12/day/event-type). Past that,
    # BOTH engines raise at the same product/add (ANSI Spark and
    # DuckDB INT64 arithmetic both error; probed) — fail-together,
    # never a silent wrap. Same bound governs the U*cents spike
    # compare.
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    for j, u in enumerate(_A37_U_WEIGHTS):
        term = F.lit(u).cast("long") * F.lag("cents", j, 0).over(w)
        num = term if num is None else num + term
    num = num.cast("long")
    return daily.select(
        "event_type",
        "day",
        "cents",
        (num.cast("double") / F.lit(float(_A37_U))).alias("ewma_7"),
        (F.lit(_A37_U).cast("long") * F.col("cents") > F.lit(2).cast("long") * num)
        .cast("int")
        .alias("spike_flag"),
    )


@register(
    "a37_ewma_revenue",
    A37_ORACLE,
    doc=f"EWMA revenue baseline per event type (alpha=1/4, {_A37_L}-day "
    "zero-padded lookback over the OBSERVED daily series) + spike "
    "flag (day > 2x its own smoothed baseline) — the ops-dashboard "
    "anomaly screen a18's global z-score cannot give per-key with "
    "bounded state. EXACT arithmetic end-to-end: the renormalized "
    "alpha(1-alpha)^j weights are the integers 3^j*4^(L-1-j) over "
    f"U=4^L-3^L={_A37_U}, so the smoothed value is one BIGINT lag-"
    "chain sum divided ONCE by the literal U, and the spike compare "
    "is pure integers (U*cents > 2*num) — no float accumulation, no "
    "FMA divergence surface (a double-weight formulation hash-missed "
    "by 1 ulp: DuckDB fuses w*c+acc, the JVM does not). One key "
    "shuffle shared by the daily agg and the per-type window; frame "
    "state is L rows",
)
def a37_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    return ewma_from_daily(daily)


# --- a39: day-of-week seasonality index -----------------------------------------

A39_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents
  FROM events GROUP BY 1, 2
), dw AS (
  SELECT event_type,
         CAST(datediff('day', DATE '1970-01-01', day) % 7 AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM daily GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(sum(n_days) AS BIGINT) AS n_all,
         CAST(sum(cents) AS BIGINT) AS cents_all
  FROM dw GROUP BY 1
)
SELECT dw.event_type, dw.dow, dw.n_days, dw.cents,
       CAST(dw.cents * t.n_all AS DOUBLE)
           / CAST(dw.n_days * t.cents_all AS DOUBLE) AS seasonality_index
FROM dw JOIN tot t USING (event_type)
"""


@register(
    "a39_seasonality_index",
    A39_ORACLE,
    doc="day-of-week seasonality index per event type: average daily "
    "revenue on each weekday relative to the type's overall daily "
    "average — the retail staffing/promo-planning ratio. dow is the "
    "engine-portable epoch-day mod 7 (0 = Thursday; native dayofweek "
    "bases differ between engines). EXACT algebra: the index "
    "(s_d/n_d)/(s/n) is cross-multiplied to (s_d*n)/(n_d*s) — one "
    "division of exact BIGINT products. Two map-side-combined "
    "groupBys; the per-type totals frame is type-cardinality and "
    "joins back broadcast-small",
)
def a39_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    dw = daily.groupBy(
        "event_type",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            % 7
        ).cast("long").alias("dow"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = dw.groupBy("event_type").agg(
        F.sum("n_days").cast("long").alias("n_all"),
        F.sum("cents").cast("long").alias("cents_all"),
    )
    return dw.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n_days",
        "cents",
        (
            (F.col("cents") * F.col("n_all")).cast("double")
            / (F.col("n_days") * F.col("cents_all")).cast("double")
        ).alias("seasonality_index"),
    )


# --- a40: time-bound conversion rate ---------------------------------------------

_A40_WINDOW_SEC = 3600  # a view converts if a purchase follows within 1h


@register(
    "a40_timebound_conversion",
    f"""
WITH v AS (
  SELECT event_id AS view_id, user_id, ts,
         ts + INTERVAL {_A40_WINDOW_SEC} SECOND AS te
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'
), conv AS (
  SELECT DISTINCT v.view_id, CAST(v.ts AS DATE) AS day
  FROM v JOIN p ON v.user_id = p.user_id
       AND v.ts <= p.pts AND p.pts < v.te
), days AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_views
  FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT d.day, d.n_views,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_converted,
       CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(d.n_views AS DOUBLE)
           AS conversion_rate
FROM days d LEFT JOIN (
  SELECT day, CAST(count(*) AS BIGINT) AS n FROM conv GROUP BY 1
) c USING (day)
""",
    doc=f"time-bound conversion rate: a view converts iff the SAME "
    f"user purchases within {_A40_WINDOW_SEC}s (half-open window) — "
    "the attribution question a13's unordered funnel cannot answer. "
    "The view->purchase match is the bin-exploded interval join "
    "(rangejoin.interval_join_binned + user pre-key), never a "
    "nested loop: views become [ts, ts+T) intervals keyed by user, "
    "purchases are points, the equi-join runs on (user, time-bin). "
    "Rate = integer counts, one division. Per-day output",
)
def a40_timebound_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        rangejoin,
    )

    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("vts"),
        (
            F.col("ts")
            + F.make_dt_interval(secs=F.lit(float(_A40_WINDOW_SEC)))
        ).alias("vte"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    # the user key rides INSIDE the equi-join (not as a post-filter):
    # each candidate group is (user, bin)-sized, so a hot bin never
    # becomes a cross-user pair blowup
    matched = rangejoin.interval_join_binned(
        purchases,
        views,
        point_ts="pts",
        start_col="vts",
        end_col="vte",
        bin_seconds=_A40_WINDOW_SEC,
        equi_keys=[("p_user", "v_user")],
    )
    conv = (
        matched.select("view_id", F.to_date("vts").alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_converted"))
    )
    days = views.groupBy(F.to_date("vts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_views")
    )
    return days.join(conv, "day", "left").select(
        "day",
        "n_views",
        F.coalesce(F.col("n_converted"), F.lit(0))
        .cast("long")
        .alias("n_converted"),
        (
            F.coalesce(F.col("n_converted"), F.lit(0)).cast("double")
            / F.col("n_views").cast("double")
        ).alias("conversion_rate"),
    )


# --- a41: unshipped-revenue ship priority (TPC-H Q3 shape) -------------------

_A41_SEG = "BUILDING"
_A41_DATE = "1998-06-01"
_A41_TOPN = 10

A41_ORACLE = f"""
SELECT l.l_orderkey AS orderkey,
       o.o_orderdate AS orderdate,
       o.o_orderpriority AS orderpriority,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                           + 0.5) AS BIGINT)) AS DOUBLE)
           / CAST(100.0 AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_A41_SEG}'
  AND o.o_orderdate < TIMESTAMP '{_A41_DATE} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{_A41_DATE} 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, orderkey
LIMIT {_A41_TOPN}
"""


@register(
    "a41_ship_priority",
    A41_ORACLE,
    doc="unshipped-revenue shipping priority — the TPC-H Q3 shape "
    "(segment-filtered customers x pre-cutoff orders x post-cutoff "
    "lineitems, revenue-ranked top-N): the classic three-way star "
    "join every warehouse benchmark leads with. Plan: the filtered "
    "customer keys broadcast into orders when they fit (size-gated "
    "via broadcast_if_small — the segment slice is still ~1/5 of an "
    "sf-proportional dim, so the hint must not be forced), the "
    "orders->lineitem join shuffles on orderkey with partial aggs "
    "map-side; top-N is TakeOrdered (no global window). Exact cents "
    "per row -> BIGINT sum; ranking and ties resolved on the exact "
    "cents + unique orderkey, so LIMIT contents are deterministic",
)
def a41_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _A41_SEG)
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_A41_DATE).cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_A41_DATE).cast("timestamp")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * F.lit(100.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        orders.join(
            broadcast_if_small(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(F.sum(cents).cast("long").alias("revenue_cents"))
        .withColumn(
            "revenue",
            F.col("revenue_cents").cast("double") / F.lit(100.0),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("orderkey"))
        .limit(_A41_TOPN)
    )


# --- a42: repeat-purchase latency -------------------------------------------

A42_ORACLE = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT o_custkey AS customer_id,
       CAST(count(*) + 1 AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(min(gap_days) AS BIGINT) AS min_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days,
       CAST(sum(gap_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS avg_gap_days
FROM g WHERE gap_days IS NOT NULL
GROUP BY o_custkey
"""


@register(
    "a42_reorder_latency",
    A42_ORACLE,
    doc="repeat-purchase latency: per customer, the day gaps between "
    "consecutive orders (lag over (orderdate, orderkey) — the unique "
    "key makes same-day sequences deterministic) reduced to "
    "min/max/avg; customers with a single order emit nothing (no "
    "gaps). Exact: gaps are integer day counts, avg is one "
    "BIGINT/BIGINT double division. Scale: one per-customer window "
    "(per-key state = that customer's order count) + one "
    "map-side-combined groupBy; no global ordering anywhere",
)
def a42_reorder_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        F.col("o_custkey"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("long").alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return g.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        (F.count(F.lit(1)) + F.lit(1)).cast("long").alias("n_orders"),
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_days").cast("long").alias("min_gap_days"),
        F.max("gap_days").cast("long").alias("max_gap_days"),
        (
            F.sum("gap_days").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_gap_days"),
    )


# --- a43: small-quantity-order revenue (TPC-H Q17 shape) ---------------------

_A43_BRAND = "Brand#23"

A43_ORACLE = f"""
WITH bp AS (
  SELECT p_partkey FROM part WHERE p_brand = '{_A43_BRAND}'
), st AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem JOIN bp ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / CAST(100.0 AS DOUBLE) AS total_revenue,
       CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / CAST(700.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN st ON l.l_partkey = st.l_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * st.n < st.sum_qty
"""


@register(
    "a43_small_qty_revenue",
    A43_ORACLE,
    doc="small-quantity-order revenue — the TPC-H Q17 shape (per-part "
    "average quantity joined BACK against the same lineitems; revenue "
    "of rows under 20% of their part's average): the canonical "
    "aggregate-then-self-join pattern. The fractional-average compare "
    "is pure integers (5*qty*n < sum_qty — quantity is integral in "
    "TPC-H, cross-multiplied so no float average ever forms). Scale: "
    "the per-part (n, sum_qty) frame is the filtered brand's part "
    "slice — sf-proportional, so its join-back hint is size-gated "
    "(broadcast_if_small), the r12 idiom; revenue in exact cents",
)
def a43_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.hints import (
        broadcast_if_small,
    )

    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand") == _A43_BRAND
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem")
    brand_li = li.join(
        broadcast_if_small(part), li["l_partkey"] == part["p_partkey"]
    )
    st = brand_li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )
    stats_side = broadcast_if_small(
        st.select(F.col("l_partkey").alias("_pk"), "n", "sum_qty")
    )
    cents = F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    small = li.join(stats_side, li["l_partkey"] == F.col("_pk")).filter(
        F.lit(5) * F.col("l_quantity").cast("long") * F.col("n")
        < F.col("sum_qty")
    )
    return small.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("total_revenue"),
        (F.sum(cents).cast("double") / F.lit(700.0)).alias("avg_yearly"),
    )


# --- a44: late-shipment order screening (TPC-H Q4 shape / EXISTS semi-join) ---

_A44_LATE_DAYS = 60

A44_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {_A44_LATE_DAYS} DAY
)
GROUP BY 1
ORDER BY 1
"""


@register(
    "a44_late_ship_semijoin",
    A44_ORACLE,
    doc="orders with at least one lineitem shipped more than "
    f"{_A44_LATE_DAYS} days after the order date, counted by "
    "priority — the TPC-H Q4 EXISTS shape. The Spark plan is a LEFT "
    "SEMI join (existence check, never row multiplication: an order "
    "with 7 late lines counts once WITHOUT a distinct), which at "
    "100 TB is the difference between shuffling matches and "
    "shuffling the lineitem x orders product. The date compare sits "
    "in the join condition so the semi join short-circuits per "
    "probe; j3 covers the anti-join twin",
)
def a44_late_ship_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (
            li["l_shipdate"]
            > F.timestamp_add("DAY", F.lit(_A44_LATE_DAYS), orders["o_orderdate"])
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_late_orders"))
    )
