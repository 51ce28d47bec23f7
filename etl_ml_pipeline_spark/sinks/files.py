"""File sinks: parquet / csv / json (distributed JSONL or single-file records).

Capability parity with the reference ``json_local`` loader
(/root/reference/src/data_extractor/loaders/json_local.py:17-41 —
mkdir parents + ``to_json(orient="records", indent=2)``). Two JSON modes:

- distributed (default): ``df.write.json`` part files (JSON Lines) — the
  100 TB path.
- ``single_file: true``: byte-compatible ``records``-orient single JSON
  array via a bounded ``toPandas`` — only for declared small results
  (the reference's semantics; guarded by ``max_rows``).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

from etl_ml_pipeline_spark.registry import register_sink
from etl_ml_pipeline_spark.sinks.base import BaseSink


class _FileSink(BaseSink):
    format = ""

    def _writer(self, df: DataFrame):
        # sort_by: cluster rows inside each output file so parquet
        # row-group min/max statistics become selective — readers skip
        # row groups on sorted-column predicates without any index. The
        # sortWithinPartitions is a local per-partition sort (no shuffle).
        sort_by = self.config.get("sort_by")
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        # zorder_by: multi-column clustering — every listed column's
        # row-group stats become selective (see operators/layout.py).
        # Unlike sort_by this repartitions (range on the z-key): layout
        # rewrites pay one shuffle by definition.
        zorder_by = self.config.get("zorder_by")
        if zorder_by:
            from etl_ml_pipeline_spark.operators.layout import zorder_layout

            df = zorder_layout(
                df, list(zorder_by),
                num_partitions=self.config.get("zorder_files"),
            )
        writer = df.write.mode(self.config.get("mode", "overwrite"))
        partition_by = self.config.get("partition_by")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        options = self.config.get("options") or {}
        if options:
            writer = writer.options(**{k: str(v) for k, v in options.items()})
        return writer

    def load(self, df: DataFrame) -> None:
        self._writer(df).format(self.format).save(self.config["path"])


@register_sink("parquet")
class ParquetSink(_FileSink):
    format = "parquet"


@register_sink("orc")
class OrcSink(_FileSink):
    format = "orc"


@register_sink("csv")
class CsvSink(_FileSink):
    format = "csv"

    def load(self, df: DataFrame) -> None:
        writer = self._writer(df)
        if "options" not in self.config:
            writer = writer.option("header", "true")
        writer.format("csv").save(self.config["path"])


@register_sink("json_local")
class JsonSink(_FileSink):
    format = "json"

    def load(self, df: DataFrame) -> None:
        path = self.config["path"]
        if self.config.get("single_file"):
            max_rows = int(self.config.get("max_rows", 1_000_000))
            limited = df.limit(max_rows + 1)
            pdf = limited.toPandas()
            if len(pdf) > max_rows:
                raise ValueError(
                    f"single_file JSON sink exceeds max_rows={max_rows}; "
                    "use the distributed JSONL mode for large results"
                )
            Path(path).parent.mkdir(parents=True, exist_ok=True)
            pdf.to_json(
                path,
                orient=self.config.get("orient", "records"),
                indent=int(self.config.get("indent", 2)),
            )
            return
        self._writer(df).format("json").save(path)
