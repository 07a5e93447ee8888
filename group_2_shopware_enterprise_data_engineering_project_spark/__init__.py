"""shopware-spark: a PySpark-native analytics engine.

Re-expresses the semantics of the Shopware Enterprise Data Engineering
reference project (GEssuman/Group_2-Shopware-Enterprise-Data-Engineering-Project,
read-only at /root/reference/) as idiomatic Spark SQL / DataFrame /
Structured Streaming code, extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, snappy)
    schemas.py    source StructTypes (inventory / pos / web / crm) + testdata
    sources/      readers (parquet / csv / jsonl) and the testdata catalog
    functions/    scalar column helpers (epoch normalize, trim-null, ids)
    operators/    validate / transform / dedup / analytics / merge /
                  text / minhash / similarity / multimodal
    streaming/    Structured Streaming micro-batch equivalents
    pipelines/    inventory / pos / web / crm flow compositions
    plans/        explain helpers for plan inspection
"""

from group_2_shopware_enterprise_data_engineering_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
