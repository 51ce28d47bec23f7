from etl_ml_pipeline_spark.sinks.base import BaseSink  # noqa: F401
