"""Sink (loader) base class.

Capability parity with /root/reference/src/data_extractor/loaders/base.py:34-61:
context-managed lifecycle around ``load(df)``. Spark-first: ``load`` is the
single ACTION that triggers the whole fused extract->transform plan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


class BaseSink:
    def __init__(self, spark: SparkSession, config: dict[str, Any]) -> None:
        self.spark = spark
        self.config = dict(config)

    def connect(self) -> None:  # pragma: no cover - default no-op
        pass

    def disconnect(self) -> None:  # pragma: no cover - default no-op
        pass

    def __enter__(self) -> "BaseSink":
        self.connect()
        return self

    def __exit__(self, *exc: object) -> None:
        self.disconnect()

    def load(self, df: DataFrame) -> None:
        raise NotImplementedError
