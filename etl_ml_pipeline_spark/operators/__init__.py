from etl_ml_pipeline_spark.operators.base import BaseTransform  # noqa: F401
