"""Per-query stage-level profile via the Spark UI REST API.

Runs each named query (default: bench HEADLINE) to a noop sink inside
one warm session with the UI enabled, then prints a per-stage
breakdown (task count, executorRunTime, shuffle bytes) attributed via
job groups. Measurement tool only — not part of the engine.

Usage: python tools/stage_profile.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from group_2_shopware_enterprise_data_engineering_project_spark import registry
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark


def rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "shopware-stage-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # warmup (mirror bench.py)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = registry.all_queries()
    spans: dict[str, tuple[float, float, float]] = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        spans[name] = (t0, time.time(), wall)
        spark.catalog.clearCache()

    jobs = rest(base, "/jobs")
    stages = {s["stageId"]: s for s in rest(base, "/stages")}
    for name in names:
        t0, t1, wall = spans[name]
        mine = [
            j
            for j in jobs
            if j.get("jobGroup") == name
        ]
        print(f"\n=== {name}: wall {wall:.2f}s, {len(mine)} jobs ===")
        rows = []
        for j in sorted(mine, key=lambda j: j["jobId"]):
            for sid in j["stageIds"]:
                s = stages.get(sid)
                if not s or s["status"] == "SKIPPED":
                    continue
                rows.append(
                    (
                        sid,
                        j["jobId"],
                        s["numCompleteTasks"],
                        s.get("executorRunTime", 0) / 1000.0,
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                        (s.get("name") or "")[:60],
                    )
                )
        rows.sort(key=lambda r: -r[3])
        for sid, jid, nt, rt, srb, swb, nm in rows[:12]:
            print(
                f"  stage {sid:>4} job {jid:>3} tasks {nt:>3} "
                f"runTime {rt:6.2f}s shufR {srb/1e6:7.2f}MB "
                f"shufW {swb/1e6:7.2f}MB  {nm}"
            )
        tot_rt = sum(r[3] for r in rows)
        print(f"  total executorRunTime {tot_rt:.2f}s across {len(rows)} stages")


if __name__ == "__main__":
    main()
