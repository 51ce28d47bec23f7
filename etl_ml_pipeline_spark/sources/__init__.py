from etl_ml_pipeline_spark.sources.base import BaseSource  # noqa: F401
