"""SparkSession factory.

Mirrors the reference's SPARK_CONFIGS (reference:
src/batch/inventory/services/glue_service/inventory_transform.py:46-56 —
AQE on, coalescePartitions, skewJoin, Kryo, snappy parquet, Arrow) with
local-mode ergonomics: shuffle partitions sized to cores rather than the
200 default, UTC session timezone so results compare bit-for-bit against
a DuckDB oracle, and the Spark UI off for headless runs.

On a real cluster only ``master`` and the memory knobs change; every
query in this package is declarative DataFrame/SQL, so Catalyst + AQE
pick physical strategies per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "shopware-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for this engine.

    Safe to call when a session already exists (e.g. under the driver
    harness): ``getOrCreate`` reuses it, and the session-level configs
    we depend on for correctness (timezone, AQE) are re-applied via
    runtime conf below.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Session-level settings that matter even on a pre-existing session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_settings(spark: SparkSession) -> SparkSession:
    """Apply the correctness-critical runtime confs to an externally
    created session (the driver harness passes us its own).

    ``inferTimestampNTZ`` must be off BEFORE any parquet read: testdata
    ``events.ts`` is parquet timestamp[us] with isAdjustedToUTC=false,
    which Spark 4.x otherwise surfaces as TIMESTAMP_NTZ — a type that
    ``unix_millis``/``unix_micros`` reject. The session timezone is UTC,
    so reading NTZ micros as instant-semantics TIMESTAMP is value-exact
    and matches the DuckDB oracle bit-for-bit."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Write instant timestamps as INT64 micros, not legacy INT96: INT96
    # carries NO parquet min/max footer stats, which silently disables
    # file/row-group pruning on every timestamp predicate downstream —
    # a table-scan-vs-pruned-scan difference at 100 TB.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    # Always-on, set ONCE here rather than toggled per-read: Spark has
    # no nanosecond timestamp type, so parquet TIMESTAMP(NANOS) columns
    # (testdata events.ts) surface as BIGINT nanos and sources/tables.py
    # converts them per-column from the footer schema. Flipping this
    # conf per table() call was a session-global mutation that raced
    # under a concurrent harness (two threads planning parquet scans
    # while the conf changes mid-flight); with it pinned true at init,
    # no read path ever mutates session state. Non-nanos tables are
    # unaffected by the setting.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
