"""Bucketed-table sink: pre-shuffled layout for co-located joins.

No reference counterpart (the reference has no joins, SURVEY.md §2.6) —
this is the 100 TB-posture storage operator: writing both sides of a
recurring join bucketed + sorted by the join key means every subsequent
join of those tables runs with NO shuffle exchange and NO sort (verified
by tests/test_plans.py::test_bucketed_join_no_shuffle). This is how you
amortize the one-time shuffle across every downstream query — the
lakehouse equivalent of co-partitioned storage.

The table lands in the session catalog (``saveAsTable``); read it back
with the ``table`` source. Bucket count should be sized so one bucket of
the bigger table fits an executor's memory at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_ml_pipeline_spark.registry import register_sink
from etl_ml_pipeline_spark.sinks.base import BaseSink


@register_sink("bucketed_table")
class BucketedTableSink(BaseSink):
    """Config: table, buckets (int), bucket_cols (list), sort_cols
    (optional list, defaults to bucket_cols), mode (default overwrite),
    format (default parquet), path (optional — store the files at an
    explicit location as an external table instead of under the
    session warehouse dir; DROP TABLE then leaves the files, so
    callers own the lifecycle of the path)."""

    def load(self, df: DataFrame) -> None:
        table = self.config["table"]
        buckets = int(self.config["buckets"])
        bucket_cols = list(self.config["bucket_cols"])
        sort_cols = list(self.config.get("sort_cols") or bucket_cols)
        writer = (
            df.write.mode(self.config.get("mode", "overwrite"))
            .format(self.config.get("format", "parquet"))
            .bucketBy(buckets, *bucket_cols)
            .sortBy(*sort_cols)
        )
        if self.config.get("path"):
            writer = writer.option("path", self.config["path"])
        writer.saveAsTable(table)
