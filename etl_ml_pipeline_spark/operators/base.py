"""Transform base class.

Capability parity with /root/reference/src/data_extractor/transformers/base.py:36-49:
each transform gets the previous stage's table, may ``validate`` it first
(fail fast at plan time — schema checks against ``df.schema`` are free in
Spark, no data touched), and returns the next table. Spark-first: the
returned DataFrame is lazy, so a chain of transforms fuses into ONE
Catalyst plan with a single action at the sink.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


class BaseTransform:
    def __init__(self, config: dict[str, Any] | None = None) -> None:
        self.config = dict(config or {})

    def validate(self, df: DataFrame) -> None:
        """Plan-time schema assertions; raise ValueError on contract breach."""

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        self.validate(df)
        return self.transform(df)
