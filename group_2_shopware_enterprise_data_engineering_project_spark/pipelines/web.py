"""WEB analytics streaming pipeline: JSON events -> validated stream ->
hour-partitioned parquet by EVENT time -> SQL session metrics
(SURVEY §3.3).

Reference flow (src/streaming/WEB): API poller -> Kinesis -> Lambda
(decode, validate required fields + timestamp, anon-id missing users,
group by event-time hour, write parquet) -> Athena session/engagement
queries. Here: Structured Streaming file source -> the same validation
as rules -> deterministic anon ids -> K1 sink partitioned on
event_time (ST3: WEB partitions by event time, not ingest time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.functions.cleanfn import anon_id
from group_2_shopware_enterprise_data_engineering_project_spark.operators import validate
from group_2_shopware_enterprise_data_engineering_project_spark.operators.transform import (
    normalize_epoch,
)
from group_2_shopware_enterprise_data_engineering_project_spark.schemas import WEB_EVENT_SCHEMA
from group_2_shopware_enterprise_data_engineering_project_spark.streaming.micro_batch import (
    dlq_split_sink,
    stream_json_source,
)
from group_2_shopware_enterprise_data_engineering_project_spark.sinks import (
    write_hour_partitioned,
)

REQUIRED = ["session_id", "page", "device_type", "browser", "event_type", "timestamp"]


def rules() -> list[validate.Rule]:
    """Required fields + parseable positive timestamp (reference
    transformation.py:61-74)."""
    return validate.required(REQUIRED) + [
        validate.Rule("timestamp_positive", F.col("timestamp") > 0)
    ]


def clean(df: DataFrame) -> DataFrame:
    """Event-time derivation + deterministic anon user ids (reference
    transformation.py:37-49,76-79; P11 determinism per SURVEY §7.3)."""
    df = normalize_epoch(df, "timestamp", ts_col="event_time")
    return df.withColumn(
        "user_id",
        F.coalesce(F.col("user_id"), anon_id("session_id", "timestamp")),
    )


def run_stream(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    dlq_path: str,
    checkpoint: str,
) -> None:
    """Drain currently-available event files into the hour-partitioned
    event-time layout, with invalid records routed to the DLQ."""
    src = stream_json_source(spark, input_dir, WEB_EVENT_SCHEMA)

    def _write_valid(df: DataFrame, _bid: int) -> None:
        write_hour_partitioned(clean(df), "event_time", output_path)

    dlq_split_sink(src, rules(), _write_valid, dlq_path, checkpoint)
