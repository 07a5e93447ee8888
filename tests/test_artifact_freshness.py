"""Artifact-freshness gate (r7 verdict item 2).

The round's evidence chain must never trail the code: the committed
full-registry sweep (CORRECTNESS_LOCAL_r*.json), the plan audit
(PLAN_AUDIT.md), and the oracle type lint (ORACLE_TYPE_LINT.json) must
each cover EXACTLY the current registry. In r7, two queries (k29/t27)
were committed after the sweep artifact, so the registry claimed
sweep-green rows that no committed artifact showed. These asserts make
that state a test failure: regenerate the artifacts as the last
pre-snapshot step whenever the registry changes.

No Spark session needed — this is pure artifact-vs-registry counting.
"""

from __future__ import annotations

import glob
import json
import os
import re

from group_2_shopware_enterprise_data_engineering_project_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_names() -> set[str]:
    return set(registry.all_queries())


def _newest(pattern: str) -> str:
    paths = glob.glob(os.path.join(REPO, pattern))
    assert paths, f"no artifact matching {pattern}"
    # round number ordering, not mtime (git does not preserve mtimes)
    return max(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def test_local_sweep_covers_registry():
    path = _newest("CORRECTNESS_LOCAL_r*.json")
    entries = json.load(open(path))
    missing = _registry_names() - set(entries)
    extra = set(entries) - _registry_names()
    assert not missing, (
        f"{os.path.basename(path)} is stale: registry queries with no "
        f"sweep row: {sorted(missing)}"
    )
    assert not extra, (
        f"{os.path.basename(path)} lists queries not in the registry: "
        f"{sorted(extra)}"
    )


def test_oracle_type_lint_covers_registry():
    lint = json.load(open(os.path.join(REPO, "ORACLE_TYPE_LINT.json")))
    n_oracles = len(registry.all_oracles())
    assert lint["checked"] == n_oracles, (
        f"ORACLE_TYPE_LINT.json checked {lint['checked']} oracles, "
        f"registry has {n_oracles} — regenerate "
        f"(python tools/oracle_type_lint.py)"
    )
    assert not lint["offenders"], lint["offenders"]
    assert not lint["plan_errors"], lint["plan_errors"]


def test_plan_audit_covers_registry():
    text = open(os.path.join(REPO, "PLAN_AUDIT.md")).read()
    m = re.search(r"plan lint: (\d+) queries clean", text)
    assert m, "PLAN_AUDIT.md missing the 'plan lint: N queries clean' line"
    n = int(m.group(1))
    n_reg = len(_registry_names())
    assert n == n_reg, (
        f"PLAN_AUDIT.md covers {n} plans, registry has {n_reg} — "
        f"regenerate (python tools/plan_lint.py --report)"
    )
