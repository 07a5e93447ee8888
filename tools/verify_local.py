"""Local correctness harness mirroring the driver's DuckDB-oracle check.

For every query in the registry: run the Spark DataFrame and the DuckDB
oracle SQL on the same sf dir, then compare row count, sorted column
names, and an order-insensitive canonicalized value multiset. Floats are
compared exactly first; near-misses (rel<=1e-9) are reported as
FLOAT-FRAGILE so we know a driver-side exact hash could still fail.

Usage: python tools/verify_local.py [--json OUT.json] [sf_dir] [query ...]

With --json, also writes a driver-format artifact (rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err per query) so
the full-registry sweep can be committed alongside CORRECTNESS_r{N}.json
as standing proof for queries outside the driver's 50-query window.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from group_2_shopware_enterprise_data_engineering_project_spark import registry  # noqa: E402
from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark  # noqa: E402
from group_2_shopware_enterprise_data_engineering_project_spark.sources.tables import TABLE_NAMES  # noqa: E402


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, Decimal):
        return ("float", float(v))
    if isinstance(v, float):
        return ("float", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(canon(x) for x in v))
    return ("str", str(v))


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def close_enough(a, b):
    if a == b:
        return True
    if (
        isinstance(a, tuple)
        and isinstance(b, tuple)
        and len(a) == len(b) == 2
        and a[0] == "float"
        and b[0] == "float"
    ):
        return math.isclose(a[1], b[1], rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(close_enough(x, y) for x, y in zip(a, b))
    return False


def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:  # accept --json anywhere, not only first
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    plain = "--plain" in argv
    if plain:
        argv.remove("--plain")
    window = "--window" in argv  # first-50 driver window only
    if window:
        argv.remove("--window")
    bad_flags = [a for a in argv if a.startswith("--")]
    if bad_flags:
        # an unknown flag silently matching zero queries would be a
        # vacuous ALL GREEN — refuse instead
        sys.exit(f"unknown flag(s): {bad_flags}; usage: "
                 "verify_local.py [--json OUT.json] [--plain] [--window] "
                 "[sf_dir] [query ...]")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

    if plain:
        # TRUE driver simulation: a bare SparkSession with none of this
        # repo's configs (no UTC, no AQE, default shuffle partitions) —
        # table()/ensure_session_settings must self-configure, and any
        # query relying on session state the engine didn't set itself
        # fails HERE instead of in the driver's harness.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify-local-plain")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("verify-local")
    if window and not only:
        from group_2_shopware_enterprise_data_engineering_project_spark import (
            registry as _reg,
        )

        only = set(list(_reg.all_queries())[:50])
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)} — refusing a "
                 "vacuous run (0 queries checked would print ALL GREEN)")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None, "err": str(e)[:2000],
            }
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            report[name] = {
                "rows_match": len(srows) >= 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": None, "note": "rows-only (no oracle)",
            }
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            # Driver-faithful output-type gate: the driver fetches oracle
            # results via Arrow, where DuckDB HUGEINT/DECIMAL becomes
            # decimal128 — which hash-mismatches Spark's int64 even when
            # every value is equal. Python fetchall() collapses HUGEINT to
            # plain int, which is exactly how the r4–r6 m15 red stayed
            # invisible locally for three rounds. Refuse such oracles here.
            bad_types = [
                f"{c}:{t}"
                for c, t in zip(ocols, [str(t) for t in rel.types])
                if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))
            ]
            if bad_types:
                print(
                    f"FAIL  {name}: oracle emits driver-unsafe output "
                    f"type(s) {bad_types} (HUGEINT/DECIMAL -> Arrow "
                    f"decimal128 != Spark int64; CAST ... AS BIGINT/DOUBLE)"
                )
                report[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(srows),
                    "oracle_rows": None,
                    "err": f"oracle_unsafe_types: {bad_types}",
                }
                failures += 1
                continue
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": str(e)[:2000],
            }
            failures += 1
            continue

        problems = []
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = None
        if not rows_ok:
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not schema_ok:
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sm = rows_to_multiset(srows, scols)
            om = rows_to_multiset(orows, ocols)
            hash_ok = sm == om
            if not hash_ok:
                exact_bad = [(a, b) for a, b in zip(sm, om) if a != b]
                frag = all(close_enough(a, b) for a, b in exact_bad)
                if frag:
                    # COUNTED AS RED since r6: the driver's hash is
                    # exact, so "within 1e-9" still fails there — the
                    # r4/r5 m15 episode proved local leniency breeds
                    # false confidence. The distinct FRAG label (vs
                    # FAIL) is kept only to speed up diagnosis.
                    print(
                        f"FRAG  {name}: exact mismatch within 1e-9 — "
                        f"RED, the driver hash is exact "
                        f"({len(exact_bad)} rows) [{time.time()-t0:.1f}s]"
                    )
                    for a, b in exact_bad[:3]:
                        print(f"      spark={a}\n      orcle={b}")
                    report[name] = {
                        "rows_match": True, "schema_match": True,
                        "hash_match": False, "spark_rows": len(srows),
                        "oracle_rows": len(orows), "err": None,
                        "note": f"float-fragile: {len(exact_bad)} rows within 1e-9",
                    }
                    failures += 1
                    continue
                problems.append(f"values differ ({len(exact_bad)} rows)")
                for a, b in exact_bad[:3]:
                    problems.append(f"  spark={a}\n  orcle={b}")
        report[name] = {
            "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": hash_ok, "spark_rows": len(srows),
            "oracle_rows": len(orows), "err": None,
        }
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
