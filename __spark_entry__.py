"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the
``group_2_shopware_enterprise_data_engineering_project_spark`` package;
this module only adapts its registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from group_2_shopware_enterprise_data_engineering_project_spark import registry
from group_2_shopware_enterprise_data_engineering_project_spark.session import (
    ensure_session_settings,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = A2 session/engagement metrics over events (SURVEY §7.2
    step 1): scan -> groupBy agg (min/max/count/countDistinct) ->
    alphabetical entry/exit quirk -> ORDER BY session_start DESC.
    """
    ensure_session_settings(spark)
    return registry.get("a2_session_metrics").fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible operators -> rows-only check)."""
    return registry.all_oracles()
