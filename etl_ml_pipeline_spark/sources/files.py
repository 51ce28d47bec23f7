"""File-based sources: parquet / json / csv / jsonl.

Capability parity with the reference's ``json_file`` extractor
(/root/reference/src/data_extractor/extractors/json_file.py:21-34,
``pd.read_json(path, orient="records")``), generalized to the formats a
Spark engine treats as first-class. All of these return lazy scans, so
Catalyst gets predicate pushdown + column pruning + partition pruning
for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.registry import register_source
from etl_ml_pipeline_spark.sources.base import BaseSource


class _FileSource(BaseSource):
    format: str = ""

    def _reader(self):
        reader = self.spark.read
        schema = self.config.get("schema")
        if schema:
            reader = reader.schema(schema)
        options = self.config.get("options") or {}
        if options:
            reader = reader.options(**{k: str(v) for k, v in options.items()})
        return reader

    def _post(self, df: DataFrame) -> DataFrame:
        pred = getattr(self, "_cursor_predicate", None)
        if pred is not None:
            field, cursor = pred
            if cursor is not None:
                df = df.filter(F.col(field) > F.lit(cursor))
        return df

    def extract(self) -> DataFrame:
        path = self.config["path"]
        return self._post(self._reader().format(self.format).load(path))


@register_source("parquet")
class ParquetSource(_FileSource):
    format = "parquet"


@register_source("csv")
class CsvSource(_FileSource):
    format = "csv"

    def extract(self) -> DataFrame:
        path = self.config["path"]
        reader = self._reader().format("csv")
        if "options" not in self.config:
            reader = reader.option("header", "true")
        return self._post(reader.load(path))


@register_source("json_file")
class JsonSource(_FileSource):
    """JSON source.

    ``orient="records"`` in the reference maps to a single top-level JSON
    array -> ``multiLine=true``; JSON Lines is the scalable default.
    """

    format = "json"

    def extract(self) -> DataFrame:
        path = self.config["path"]
        reader = self._reader().format("json")
        if self.config.get("multiline") or self.config.get("orient") == "records":
            reader = reader.option("multiLine", "true")
        return self._post(reader.load(path))


@register_source("orc")
class OrcSource(_FileSource):
    """ORC columnar source — same pushdown/pruning story as parquet
    (predicate pushdown into ORC stripe stats), for corpora stored by
    Hive-lineage systems."""

    format = "orc"


@register_source("table")
class TableSource(BaseSource):
    """Read a registered catalog/temp-view table by name."""

    def extract(self) -> DataFrame:
        df = self.spark.table(self.config["name"])
        pred = getattr(self, "_cursor_predicate", None)
        if pred is not None and pred[1] is not None:
            df = df.filter(F.col(pred[0]) > F.lit(pred[1]))
        return df
