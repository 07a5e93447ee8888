"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [query ...]
Defaults to the bench HEADLINE set. Queries whose builder executes
side effects (pipeline/streaming bootstraps) still work — the dumped
plan is the plan of the RETURNED DataFrame, the declared query
surface the driver checks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from group_2_shopware_enterprise_data_engineering_project_spark import registry
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shopware-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
