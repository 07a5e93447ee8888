"""Testdata catalog reads — incl. the TIMESTAMP(NANOS) regression."""

from __future__ import annotations

import pytest

from group_2_shopware_enterprise_data_engineering_project_spark.sources import tables


def test_all_tables_load(spark, sf_dir):
    for name in tables.TABLE_NAMES:
        df = tables.table(spark, sf_dir, name)
        assert df.count() > 0, name


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError):
        tables.table(spark, sf_dir, "nope")


def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    """events.parquet stores ts as TIMESTAMP(NANOS); the reader must
    surface a usable timestamp column (nanosAsLong + div 1000), not a
    raw long — and it must match DuckDB's ns->us truncation."""
    df = tables.table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    spark_min = df.selectExpr("min(ts) AS m").collect()[0].m

    import duckdb

    duck_min = duckdb.sql(
        f"SELECT min(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert spark_min == duck_min


def test_register_views(spark, sf_dir):
    tables.register_views(spark, sf_dir)
    assert spark.sql("SELECT count(*) c FROM region").collect()[0].c > 0


def test_register_views_enables_athena_style_sql(spark, sf_dir):
    """Reference analysts query tables by name in SQL (quicksight
    script.sql); register_views makes that surface work verbatim."""
    from group_2_shopware_enterprise_data_engineering_project_spark.sources.tables import (
        register_views,
    )

    names = register_views(spark, sf_dir)
    assert "events" in names and "lineitem" in names
    out = spark.sql(
        """
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM events GROUP BY user_id ORDER BY session_start DESC LIMIT 5
        """
    ).collect()
    assert len(out) == 5 and all(r.n_events > 0 for r in out)
    joined = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0].n
    assert joined > 0


def test_query_paths_never_mutate_session_conf(spark, sf_dir):
    """Regression guard for the r4 m15 driver-only hash mismatch class:
    no read/write/query path may flip session-global confs mid-flight
    (nanosAsLong is pinned at init; partition overwrite and forced-SMJ
    are per-write/per-plan options; partition-type inference is avoided
    via explicit schemas). Snapshot the sensitive confs, push data
    through the previously-offending paths, assert bit-identical."""
    import tempfile

    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators.merge import (
        ParquetUpsertTable,
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.sinks import (
        read_hour_partitioned,
        write_hour_partitioned,
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.sources import table

    keys = (
        "spark.sql.legacy.parquet.nanosAsLong",
        "spark.sql.sources.partitionOverwriteMode",
        "spark.sql.sources.partitionColumnTypeInference.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
        "spark.sql.session.timeZone",
    )

    def snap():
        # no fallback arg: Spark type-validates the fallback string,
        # and every key here has a built-in default to surface anyway
        return {k: spark.conf.get(k) for k in keys}

    # table() self-configures once; take the snapshot AFTER the first
    # read so init-time settings are the baseline being guarded
    events = table(spark, sf_dir, "events")
    before = snap()

    base = tempfile.mkdtemp(prefix="shopware_spark_confguard_")
    # K1 write + partition-string read (old partitionColumnTypeInference toggle)
    write_hour_partitioned(events.limit(200), "ts", f"{base}/k1")
    read_hour_partitioned(spark, f"{base}/k1").count()
    assert snap() == before
    # nanos-capable read path (old nanosAsLong per-read toggle)
    table(spark, sf_dir, "events").count()
    assert snap() == before
    # partition-scoped dynamic overwrite (old partitionOverwriteMode toggle)
    t = ParquetUpsertTable(spark, f"{base}/kpi", partition_by=("d",))
    b = spark.createDataFrame([(1, "a", 1.0)], "id long, d string, v double")
    t.upsert_additive(b, ("id", "d"), ("v",))
    t.upsert_additive(b, ("id", "d"), ("v",))
    assert snap() == before
