from group_2_shopware_enterprise_data_engineering_project_spark.functions.timefn import (
    epoch_to_timestamp,
    derive_date,
    hour_partition_cols,
)
from group_2_shopware_enterprise_data_engineering_project_spark.functions.cleanfn import (
    blank_to_null,
    range_to_null,
    anon_id,
)

__all__ = [
    "epoch_to_timestamp",
    "derive_date",
    "hour_partition_cols",
    "blank_to_null",
    "range_to_null",
    "anon_id",
]
