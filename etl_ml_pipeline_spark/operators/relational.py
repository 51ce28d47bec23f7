"""Declarative relational transforms for YAML pipelines: filter, select,
and deterministic hash sampling.

The reference's transform surface is whole-DataFrame plugins
(/root/reference/src/data_extractor/transformers/base.py:43-49); it has
no row-filter or projection step (SURVEY.md §2.6). These fill that gap
the Spark way: config strings compile to Catalyst expressions
(``F.expr``), so filters push into scans and projections prune columns —
the optimizer sees declared intent, not an opaque Python function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.operators.text import token_hash60
from etl_ml_pipeline_spark.registry import register_transform


@register_transform("filter")
class FilterTransform(BaseTransform):
    """Keep rows matching a SQL boolean expression.

    config: {where: "lang = 'en' AND quality >= 0.5"}

    Because the predicate is a Catalyst expression (not a Python lambda),
    it participates in pushdown/pruning and stays in codegen.
    """

    def validate(self, df: DataFrame) -> None:
        if not str(self.config.get("where", "")).strip():
            raise ValueError("filter transform requires a non-empty 'where'")

    def transform(self, df: DataFrame) -> DataFrame:
        return df.filter(F.expr(self.config["where"]))


@register_transform("select")
class SelectTransform(BaseTransform):
    """Project columns and/or computed expressions.

    config: {columns: ["doc_id", "lang"], exprs: {n_chars: "length(text)"}}

    Either key may be omitted; exprs are appended after columns. Explicit
    projection is what lets the parquet scan read 2 columns instead of 40.
    """

    def validate(self, df: DataFrame) -> None:
        if not self.config.get("columns") and not self.config.get("exprs"):
            raise ValueError("select transform requires 'columns' and/or 'exprs'")

    def transform(self, df: DataFrame) -> DataFrame:
        cols = [F.col(c) for c in self.config.get("columns", [])]
        cols += [
            F.expr(e).alias(name)
            for name, e in dict(self.config.get("exprs", {})).items()
        ]
        return df.select(*cols)


@register_transform("hash_sample")
class HashSampleTransform(BaseTransform):
    """Deterministic hash-mod sampling (see queries/sampling_q.py for the
    rationale: reproducible across retries/engines, pure map-side filter,
    no RNG state tied to partitioning).

    config:
      key_col: doc_id          # stable row key
      rate_pct: 10             # default keep-rate in percent
      strata:                  # optional per-value overrides
        column: lang
        rates: {en: 80, zh: 40}
    """

    def validate(self, df: DataFrame) -> None:
        if "key_col" not in self.config:
            raise ValueError("hash_sample requires 'key_col'")
        rate = self.config.get("rate_pct", 10)
        if not 0 <= float(rate) <= 100:
            raise ValueError(f"rate_pct must be in [0, 100], got {rate}")

    def transform(self, df: DataFrame) -> DataFrame:
        bucket = token_hash60(F.col(self.config["key_col"]).cast("string")) % 100
        rate = F.lit(int(self.config.get("rate_pct", 10)))
        strata = self.config.get("strata") or {}
        if strata:
            col = F.col(strata["column"])
            for value, r in sorted(dict(strata["rates"]).items()):
                rate = F.when(col == value, F.lit(int(r))).otherwise(rate)
        return df.filter(bucket < rate)
