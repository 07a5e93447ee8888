"""Query registry: name -> (spark callable, DuckDB oracle SQL).

This is the single source of truth behind __spark_entry__.py's
``queries()`` / ``oracle_sql()`` contract. Every operator from
SURVEY.md §2 that is SQL-expressible registers BOTH a Spark callable
(spark, sf_dir) -> DataFrame and the equivalent ANSI SQL for DuckDB;
non-SQL-expressible ops register the callable only (driver records a
rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name
before value-hashing). Aggregates that DuckDB widens to HUGEINT are
CAST to BIGINT in the SQL; decimal literals are cast to DOUBLE.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from group_2_shopware_enterprise_data_engineering_project_spark.queries import (  # noqa: F401
        batch_analytics,
        coverage_q,
        embeddings_sim,
        ml_prep,
        multimodal_q,
        streaming_pipelines,
        text_pipeline,
        validation_merge,
    )

    _LOADED = True
