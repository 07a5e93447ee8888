"""Declared source schemas (schema-on-read, enforced at validation).

The reference fixes one schema per source and validates against it:
- inventory: reference src/batch/inventory/services/glue_service/inventory_validate.py:33-41
- pos:       reference src/batch/pos/services/glue_job/transfom_pos.py:30-38
- web:       reference src/streaming/WEB/services/lambda/transformation.py:140-148
- crm:       reference src/streaming/CRM/services/consumer/lambda_function.py:58-67

Type palette used by the reference: int32/int64, double, string,
timestamp, date, nullable int — declared here as Spark StructTypes.
"""

from __future__ import annotations

from pyspark.sql import types as T

INVENTORY_SCHEMA = T.StructType(
    [
        T.StructField("inventory_id", T.LongType(), False),
        T.StructField("product_id", T.LongType(), False),
        T.StructField("warehouse_id", T.LongType(), False),
        T.StructField("stock_level", T.LongType(), False),
        T.StructField("restock_threshold", T.LongType(), True),  # nullable Int64
        T.StructField("last_updated", T.DoubleType(), False),  # epoch seconds
    ]
)

POS_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("store_id", T.IntegerType(), False),
        T.StructField("product_id", T.IntegerType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("revenue", T.DoubleType(), False),
        T.StructField("discount_applied", T.DoubleType(), True),
        T.StructField("timestamp", T.DoubleType(), False),  # epoch seconds
    ]
)

WEB_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),  # missing -> anon id
        T.StructField("page", T.StringType(), False),
        T.StructField("device_type", T.StringType(), False),
        T.StructField("browser", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("timestamp", T.DoubleType(), False),  # epoch s OR ms
    ]
)

CRM_INTERACTION_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), False),
        T.StructField("interaction_type", T.StringType(), False),
        T.StructField("timestamp", T.DoubleType(), False),
        T.StructField("channel", T.StringType(), True),
        T.StructField("rating", T.IntegerType(), True),  # 1..5 or null
        T.StructField("message_excerpt", T.StringType(), True),
    ]
)

# Testdata star schema (driver-generated; see TESTDATA.md) — declared so
# streaming file sources (which require a schema) and tests can use them.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
