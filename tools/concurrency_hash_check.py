"""Concurrent-harness VALUE-STABILITY repro: run a set of
value-sensitive queries serially, then repeatedly through a thread pool
against ONE shared SparkSession, and compare the full canonicalized
value multiset (not just row counts) of every run against the serial
baseline.

This is the repro class behind the r4 `m15_sequence_pack` driver-only
hash mismatch (rows/schema matched, values didn't — only under the
driver's concurrent harness): any session-GLOBAL conf mutated by one
query mid-flight can flip another thread's plan semantics. The fixes
(nanosAsLong pinned once at session init; dynamic partition overwrite
as a per-write option; k18's forced SMJ as a join hint) each removed
one such mutation; this tool guards against regressions.

The query mix deliberately interleaves:
  - m15_sequence_pack (the r4 red cell),
  - queries that read the nanos-timestamp events table (p15, a2),
  - queries that WRITE through the merge/sink paths (k1, k4, k5),
  - k18 (previously toggled autoBroadcastJoinThreshold).

Usage: python tools/concurrency_hash_check.py [sf_dir] [rounds]
Prints one JSON line {"rounds": N, "pool": P, "stable": true|false,
"mismatches": [...]}; exit 1 on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from group_2_shopware_enterprise_data_engineering_project_spark import registry  # noqa: E402
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark  # noqa: E402
from tools.verify_local import rows_to_multiset  # noqa: E402

QUERIES = (
    "m15_sequence_pack",
    "p15_date_range",
    "a2_session_metrics",
    "k1_hour_partition_roundtrip",
    "k4_replace_merge",
    "k5_additive_merge",
    "k18_bucketed_join",
    "k9_partition_registration",  # per-run catalog name (fixed in r5)
    "st12_stream_dim_replace",  # manifest-txn streaming replace-merge
)
POOL = int(os.environ.get("SPARK_GRAFT_CONCURRENCY", "4"))


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    rounds = int(argv[1]) if len(argv) > 1 else 3

    spark = get_spark("shopware-spark-conc-hash")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    def snapshot(name: str):
        df = qs[name](spark, sf_dir)
        return name, rows_to_multiset([tuple(r) for r in df.collect()], df.columns)

    baseline = dict(snapshot(q) for q in QUERIES)

    mismatches: list[str] = []
    for rnd in range(rounds):
        with ThreadPoolExecutor(max_workers=POOL) as ex:
            for name, rows in ex.map(snapshot, QUERIES):
                if rows != baseline[name]:
                    mismatches.append(f"round {rnd}: {name}")

    print(
        json.dumps(
            {
                "rounds": rounds,
                "pool": POOL,
                "n_queries": len(QUERIES),
                "stable": not mismatches,
                "mismatches": mismatches,
            }
        )
    )
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
