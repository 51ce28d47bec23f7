"""Identity transform.

Reference: /root/reference/src/data_extractor/transformers/pass_through.py:15-20
(``df.copy()``). Spark DataFrames are immutable, so identity needs no copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.registry import register_transform


@register_transform("pass_through")
class PassThrough(BaseTransform):
    def transform(self, df: DataFrame) -> DataFrame:
        return df
