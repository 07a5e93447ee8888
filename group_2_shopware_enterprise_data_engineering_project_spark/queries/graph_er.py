"""Graph-centrality, entity-resolution, and training-example queries
with DuckDB oracles.

PageRank's oracle unrolls the exact-integer recurrence (see
`operators/pagerank.py`) — BIGINT sums and floor divisions are
order-independent, so three unrolled CTE iterations reproduce the
distributed loop bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    er,
    pagerank,
    prep,
)
from group_2_shopware_enterprise_data_engineering_project_spark.registry import register
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table


# --- G1: bipartite PageRank ---------------------------------------------

_PR_ITER = """
, c{i} AS (
  SELECT e.dst AS node, CAST(sum(r.r // o.outdeg) AS BIGINT) AS inc
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN od o ON e.src = o.src
  GROUP BY 1
), d{i} AS (
  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dang
  FROM r{p} r LEFT JOIN od o ON r.node = o.src WHERE o.src IS NULL
), r{i} AS (
  SELECT n.node,
         CAST(150000000000
              + (85 * (coalesce(c.inc, 0) + (d.dang // x.n_nodes))) // 100
           AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.node, d{i} d, nn x
)"""

G1_ORACLE = (
    """
WITH edges AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes
), od AS (
  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1
), r0 AS (
  SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes
)"""
    + _PR_ITER.format(i=1, p=0)
    + _PR_ITER.format(i=2, p=1)
    + _PR_ITER.format(i=3, p=2)
    + """
SELECT node AS node_id, r AS rank_units,
       CAST(r AS DOUBLE) / 1000000000000.0 AS rank_value
FROM r3
ORDER BY node_id
"""
)


@register(
    "g1_pagerank",
    G1_ORACLE,
    doc="3-iteration PageRank over the bipartite customer->part "
    "interaction graph (parts are dangling sinks, exercising the "
    "dangling-mass redistribution); exact BIGINT mass units make the "
    "iterative distributed loop bit-identical to the unrolled SQL "
    "recurrence",
)
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    out = pagerank.pagerank(edges, iterations=3)
    return out.select(
        "node_id", "rank_units", F.col("rank").alias("rank_value")
    )


# --- D5: blocked entity-resolution candidate pairs ----------------------

D5_ORACLE = """
WITH k AS (
  SELECT p_partkey AS rid, p_name AS rname,
         list_filter(string_split(p_name, ' '), x -> x <> '') AS toks
  FROM part
), kb AS (
  SELECT rid, rname,
         toks[1] || '|' || substring(toks[-1], 1, 1) || '|'
                || CAST(len(toks) AS VARCHAR) AS bkey
  FROM k
), ok AS (
  SELECT bkey FROM kb GROUP BY bkey HAVING count(*) <= 1000
), b AS (
  SELECT kb.* FROM kb JOIN ok USING (bkey)
)
SELECT a.rid AS id_a, c.rid AS id_b, a.bkey,
       CAST(levenshtein(a.rname, c.rname) AS BIGINT) AS distance
FROM b a JOIN b c ON a.bkey = c.bkey AND a.rid < c.rid
WHERE levenshtein(a.rname, c.rname) <= 3
ORDER BY id_a, id_b
"""


@register(
    "d5_er_blocked_pairs",
    D5_ORACLE,
    doc="entity-resolution candidate pairs over part names: multi-"
    "feature blocking key (first token + last-token initial + token "
    "count) -> within-block self-join -> Levenshtein<=3 verify; "
    "degenerate blocks excluded by explicit cap, never silently "
    "exploded",
)
def d5_er_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return er.blocked_pairs(
        table(spark, sf_dir, "part"),
        id_col="p_partkey",
        name_col="p_name",
        max_distance=3,
        max_block=1000,
    )


# --- M22: next-event sequence examples ----------------------------------

M22_ORACLE = """
SELECT user_id, ts, event_id,
       lag(event_type, 3) OVER w || ',' || lag(event_type, 2) OVER w
           || ',' || lag(event_type, 1) OVER w AS context,
       event_type AS label
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
QUALIFY lag(event_type, 3) OVER w IS NOT NULL
ORDER BY user_id, ts, event_id
"""


@register(
    "m22_sequence_examples",
    M22_ORACLE,
    doc="next-action training examples: previous-3-events context "
    "(oldest first) -> current label, per user, (ts,event_id)-ordered "
    "for determinism under timestamp ties; one shuffle + window lags",
)
def m22_sequence_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prep.sequence_examples(
        table(spark, sf_dir, "events"), context_len=3
    )


# --- M23: deterministic negative sampling -------------------------------

M23_ORACLE = """
WITH inter AS (
  SELECT DISTINCT o_custkey AS usr, l_partkey AS item
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), pool AS (
  SELECT item FROM (
    SELECT item, count(*) AS pop FROM inter
    GROUP BY 1 ORDER BY pop DESC, item ASC LIMIT 100
  )
), users AS (
  SELECT DISTINCT usr FROM inter
), cands AS (
  SELECT usr, item FROM users, pool
), unseen AS (
  SELECT c.usr, c.item
  FROM cands c LEFT JOIN inter i ON c.usr = i.usr AND c.item = i.item
  WHERE i.usr IS NULL
)
SELECT usr AS o_custkey, item AS l_partkey,
       CAST(row_number() OVER (
           PARTITION BY usr
           ORDER BY md5('neg:' || CAST(usr AS VARCHAR) || ':'
                        || CAST(item AS VARCHAR))
       ) AS BIGINT) AS rnk
FROM unseen
QUALIFY rnk <= 5
ORDER BY o_custkey, rnk
"""


@register(
    "m23_negative_sample",
    M23_ORACLE,
    doc="per-user hard negatives for recommendation training: top-100 "
    "popularity pool (bounded, broadcast) minus the user's "
    "interactions (anti-join), k=5 picked by salted-md5 rank — "
    "deterministic across runs/engines, unlike rand() sampling",
)
def m23_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    inter = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    return prep.negative_sample(
        inter, user_col="o_custkey", item_col="l_partkey", pool_size=100, k=5
    )


# --- G2: triangle counting over the co-purchase graph -------------------

G2_ORACLE = """
WITH oi AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem
), e AS (
  SELECT a.item AS a, c.item AS b
  FROM oi a JOIN oi c ON a.okey = c.okey AND a.item < c.item
  GROUP BY 1, 2
  HAVING count(*) >= 2
), tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), pn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY 1
)
SELECT node, n_triangles,
       CAST(row_number() OVER (
           ORDER BY n_triangles DESC, node ASC) AS BIGINT) AS rank
FROM pn
QUALIFY rank <= 20
ORDER BY rank
"""


@register(
    "g2_triangle_counts",
    G2_ORACLE,
    doc="per-node triangle participation over the support>=2 "
    "co-purchase graph: canonical-order e(a,b)⋈e(b,c)⋈e(a,c) finds "
    "each triangle once (no dedup); degree-ordered orientation is the "
    "documented power-law hardening",
)
def g2_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem")
    oi = lineitem.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("item")
    ).distinct()
    a = oi.select("okey", F.col("item").alias("ia"))
    b = oi.select("okey", F.col("item").alias("ib"))
    edges = (
        a.join(b, "okey")
        .where(F.col("ia") < F.col("ib"))
        .groupBy(F.col("ia").alias("src"), F.col("ib").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )
    return pagerank.triangle_counts(edges, top_n=20)


# --- D6: q-gram count-filtering similarity join -------------------------

D6_ORACLE = """
WITH grams AS (
  SELECT p_partkey AS rid,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(p_name) - 2, 1)),
           i -> substring(p_name, i, 3)))) AS g
  FROM part
), ok AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) <= 500
), ix AS (
  SELECT grams.* FROM grams JOIN ok USING (g)
)
SELECT a.rid AS id_a, b.rid AS id_b,
       CAST(count(*) AS BIGINT) AS shared
FROM ix a JOIN ix b ON a.g = b.g AND a.rid < b.rid
GROUP BY 1, 2
HAVING count(*) >= 4
ORDER BY id_a, id_b
"""


@register(
    "d6_qgram_pairs",
    D6_ORACLE,
    doc="key-free fuzzy-match candidates by shared-3-gram count "
    "(PPJoin-family count filtering): inverted q-gram index, "
    "stop-grams over df=500 cut (quadratic volume, zero signal), "
    "pairs sharing >= 4 distinct grams survive — catches edits "
    "anywhere in the string, unlike fixed blocking keys",
)
def d6_qgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_df pinned absolute so the oracle's literal 500 stays exact;
    # the operator's DEFAULT is the scale-free fraction cut
    return er.qgram_pairs(
        table(spark, sf_dir, "part"), "p_partkey", "p_name",
        q=3, min_shared=4, max_df=500,
    )
