from tickdatapipeline_spark.functions.fir import design_decimation_filter

__all__ = ["design_decimation_filter"]
