"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <float>}

Each query is forced end-to-end with a noop-format write (full
materialization of every column — count() would let Catalyst prune the
work). Session startup and a warmup scan are excluded so the numbers
measure query execution, not JVM boot.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from group_2_shopware_enterprise_data_engineering_project_spark import registry
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark

# Spanning set: scan+agg, join+agg, window, broadcast join, merge,
# validation, text stats, minhash-LSH dedup, ANN (exact + IVF),
# embedding near-dup, Arrow-UDF media decode, streaming KPI, and the
# POS pipeline end-to-end (CSV -> validate -> dedup -> KPI merge).
HEADLINE = [
    "a1_sales_kpi",
    "a2_session_metrics",
    "j1_loyalty_join",
    "w1_keep_latest",
    "k5_additive_merge",
    "p3_validation_flags",
    "t2_quality_score",
    "dedup_minhash_lsh",
    "e2_ann_bruteforce",
    "e5_ann_ivf",
    "e6_embedding_near_dup",
    "mm3_decode_features",
    "st7_stream_kpi",
    "pipe_pos",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("shopware-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: touch the biggest input so JVM/codegen/FS caches are hot.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = registry.all_queries()
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # record and keep benching the rest
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
        # Drop persists left by pipeline-internal .persist() calls so
        # one query's cached working set can't distort the next one's
        # measurement (isolation between timed queries).
        spark.catalog.clearCache()

    out = {
        "metric": "headline_queries_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))


if __name__ == "__main__":
    main()
