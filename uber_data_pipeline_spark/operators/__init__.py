from uber_data_pipeline_spark.operators.topk import top_k, top_k_per_group
from uber_data_pipeline_spark.operators.shares import (
    with_share_of_total,
    with_partition_avg,
)
from uber_data_pipeline_spark.operators.sessions import sessionize

__all__ = [
    "top_k",
    "top_k_per_group",
    "with_share_of_total",
    "with_partition_avg",
    "sessionize",
]
