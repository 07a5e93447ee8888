"""One-off interleaved A/B for e5_ann_ivf (r7 VERDICT item 5).

Question: is e5's r7 headline delta (+17% vs a +11% anchor) caused by
the r7 persist work, or is it capture noise? e5's code path contains
no salt-split; its only persists are `_centroids`' sample frame and
the `assigned` corpus cache inside `ivf_topk`. This probe interleaves
persist-ON (shipped code) with persist-OFF (DataFrame.persist
monkeypatched to identity; unpersist on a non-persisted frame is a
no-op) in ONE warm session at sf0.1, alternating sides per rep so
neither side monopolizes warm-cache position.

Usage: python tools/e5_persist_ab.py [reps=6]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.dataframe as _D  # noqa: E402

from group_2_shopware_enterprise_data_engineering_project_spark import registry  # noqa: E402
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("e5-persist-ab")
    spark.sparkContext.setLogLevel("ERROR")
    fn = registry.get("e5_ann_ivf").fn

    orig_persist = _D.DataFrame.persist

    def run(label: str, persist_on: bool) -> float:
        _D.DataFrame.persist = (
            orig_persist if persist_on else (lambda self, *a, **k: self)
        )
        try:
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            dt = time.monotonic() - t0
        finally:
            _D.DataFrame.persist = orig_persist
        print(f"{label}: {dt:.2f}s ({n} rows)", flush=True)
        return dt

    # warmup (discarded): JIT/codegen/scan caches
    run("warmup(on)", True)
    run("warmup(off)", False)
    on, off = [], []
    for i in range(reps):
        if i % 2 == 0:
            on.append(run(f"rep{i} persist-ON ", True))
            off.append(run(f"rep{i} persist-OFF", False))
        else:
            off.append(run(f"rep{i} persist-OFF", False))
            on.append(run(f"rep{i} persist-ON ", True))
    fmt = lambda xs: f"min={min(xs):.2f} med={sorted(xs)[len(xs)//2]:.2f} max={max(xs):.2f}"  # noqa: E731
    print(f"\npersist-ON : {fmt(on)}")
    print(f"persist-OFF: {fmt(off)}")


if __name__ == "__main__":
    main()
