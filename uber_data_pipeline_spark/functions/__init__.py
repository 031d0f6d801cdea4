from uber_data_pipeline_spark.functions.datetime import month_name, month_num

__all__ = ["month_name", "month_num"]
