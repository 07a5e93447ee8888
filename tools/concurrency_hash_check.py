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

Usage: python tools/concurrency_hash_check.py [--window] [--json PATH]
       [sf_dir] [rounds]
Prints one JSON line {"rounds": N, "pool": P, "stable": true|false,
"mismatches": [...]}; exit 1 on any mismatch.

``--window`` replaces the hand-picked mix with the EXACT first-50
CORE_ORDER driver window, in driver order — the standing alibi run if
another driver-only mismatch appears: serial baseline in window order
on one shared session, then `rounds` concurrent replays of the same
window, value-multiset-compared query by query. ``--json PATH`` writes
the artifact (per-query stable flag + run metadata) for committing.
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
    window = "--window" in argv
    if window:
        argv.remove("--window")
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    rounds = int(argv[1]) if len(argv) > 1 else 3

    spark = get_spark("shopware-spark-conc-hash")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    queries = tuple(list(qs)[:50]) if window else QUERIES

    def snapshot(name: str):
        df = qs[name](spark, sf_dir)
        return name, rows_to_multiset([tuple(r) for r in df.collect()], df.columns)

    # serial baseline in exact (driver) order on the shared session
    baseline = dict(snapshot(q) for q in queries)

    mismatches: list[str] = []
    for rnd in range(rounds):
        with ThreadPoolExecutor(max_workers=POOL) as ex:
            for name, rows in ex.map(snapshot, queries):
                if rows != baseline[name]:
                    mismatches.append(f"round {rnd}: {name}")

    unstable = {m.split(": ", 1)[1] for m in mismatches}
    result = {
        "rounds": rounds,
        "pool": POOL,
        "window": window,
        "n_queries": len(queries),
        "stable": not mismatches,
        "mismatches": mismatches,
        "queries": {q: q not in unstable for q in queries},
    }
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    if json_path:
        with open(json_path, "w") as f:
            json.dump(result, f, indent=1)
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
