"""Time EVERY registry query with the noop sink (guide §1.4) at one sf dir.

Measurement-only tool for the optimization rounds: finds the slow tail of
the full registry (the bench covers only the 14 headline queries). Each
query is labeled (setJobDescription), forced end-to-end with a noop write,
and isolated with clearCache() exactly like bench.py.

Usage: python tools/time_sweep.py [sf_dir] [--json OUT.json] [query ...]

Prints one line per query (slowest last) and a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from group_2_shopware_enterprise_data_engineering_project_spark import registry  # noqa: E402
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(args[1:])

    spark = get_spark("shopware-spark-time-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # Warmup like bench.py so the first query doesn't pay JVM/codegen boot.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = registry.all_queries()
    names = [n for n in qs if not only or n in only]
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for k, name in enumerate(names):
        spark.sparkContext.setJobDescription(f"time_sweep:{name}")
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        if (k + 1) % 25 == 0:
            print(f"... {k + 1}/{len(names)}", file=sys.stderr)

    for name, sec in sorted(timings.items(), key=lambda kv: kv[1]):
        print(f"{sec:9.3f}  {name}")
    summary = {
        "sf_dir": sf_dir,
        "total_sec": round(sum(timings.values()), 3),
        "n": len(timings),
        "failures": failures,
        "queries": timings,
    }
    print(json.dumps({"total_sec": summary["total_sec"], "n": summary["n"], "failures": failures}))
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
