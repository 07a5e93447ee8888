"""Standing lint: no registered oracle may emit HUGEINT/UHUGEINT/DECIMAL.

The driver compares Spark and DuckDB results via Arrow. DuckDB widens
SUM(BIGINT) (and integer window sums) to HUGEINT, which materializes as
Arrow decimal128(38,0); the exact value hash then mismatches Spark's
int64 even when every value is numerically identical, with rows/schema
green — the signature that cost rounds 4–6 on m15_sequence_pack and
pipe_llm_prep. Python fetchall() collapses HUGEINT to plain int, so a
values-based local harness is blind to it.

This lint PREPAREs every registered oracle against the sf0.001 tables
(cheap: plan-only via `con.sql(...).types`, no fetch of full results)
and fails if any output column's DuckDB type contains HUGEINT or
DECIMAL. Run it whenever an oracle changes; wire into the round
checklist next to tools/plan_lint.py.

Usage: python tools/oracle_type_lint.py [sf_dir] [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from group_2_shopware_enterprise_data_engineering_project_spark import registry  # noqa: E402
from group_2_shopware_enterprise_data_engineering_project_spark.sources.tables import TABLE_NAMES  # noqa: E402

BANNED = ("HUGEINT", "DECIMAL")  # UHUGEINT contains HUGEINT


def main() -> None:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # queries() registration populates the oracle map; import side effects
    # are already handled by registry.all_oracles().
    oracles = registry.all_oracles()
    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            bad = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, [str(t) for t in rel.types])
                if any(k in str(t).upper() for k in BANNED)
            ]
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)[:500]
            continue
        if bad:
            offenders[name] = bad
            print(f"BAD   {name}: {bad}")
    print(
        f"\n{len(oracles)} oracles checked, {len(offenders)} with "
        f"HUGEINT/DECIMAL output, {len(errors)} plan errors"
    )
    for name, err in errors.items():
        print(f"ERR   {name}: {err}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "checked": len(oracles),
                    "offenders": offenders,
                    "plan_errors": errors,
                },
                fh,
                indent=2,
            )
        print(f"wrote {json_out}")
    sys.exit(1 if offenders or errors else 0)


if __name__ == "__main__":
    main()
