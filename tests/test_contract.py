"""Driver-contract invariants: registry shape, entry() smoke, and
query/oracle column alignment (names must match for the driver's
sorted-column value hash)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from group_2_shopware_enterprise_data_engineering_project_spark import registry
from group_2_shopware_enterprise_data_engineering_project_spark.sources import tables


def test_every_oracle_has_a_query():
    qs, ors = registry.all_queries(), registry.all_oracles()
    assert set(ors) <= set(qs)
    assert len(qs) >= 30


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.slow
def test_query_oracle_columns_align(spark, sf_dir):
    """Column-name parity between each Spark query and its DuckDB
    oracle at the smoke SF — catches alias drift before the driver's
    full value-hash gate does."""
    con = duckdb.connect()
    for name in tables.TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    qs, ors = registry.all_queries(), registry.all_oracles()
    mismatches = []
    for name, sql in ors.items():
        spark_cols = sorted(qs[name](spark, sf_dir).columns)
        duck_cols = sorted(con.execute(sql).df().columns)
        if spark_cols != duck_cols:
            mismatches.append((name, spark_cols, duck_cols))
    assert not mismatches, mismatches
