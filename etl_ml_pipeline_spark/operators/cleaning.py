"""Data-cleaning rule pipeline (11 rules, fixed deterministic order).

Capability parity with /root/reference/src/data_extractor/transformers/
data_cleaning.py:26-159: rules always apply in the canonical order below
regardless of config key order; unknown/missing columns log a WARNING and
are skipped, never fatal. Naming follows the reference *code* (not its
README, which documents two rules backwards — SURVEY.md §0):

- ``drop_nulls`` is a BOOL (drop rows with any null);
- ``drop_null_columns`` is a COLUMN LIST (drop rows null in those).

Spark-first differences:

- Everything is a lazy Column expression — the whole rule chain fuses
  into one projection/filter stage, no materialization per rule.
- ``deduplicate_columns`` keep-first needs an explicit order in a
  distributed engine (Pandas relies on physical row order). Config key
  ``deduplicate_order_by`` supplies the tiebreak (default: all
  non-key columns ascending) -> row_number()==1, deterministic at any
  parallelism.
- ``cast_types`` supports two modes: ``permissive`` (per-value
  try_cast -> null on failure; Spark-idiomatic, fully parallel) and
  ``column_atomic`` (reference parity: a column with ANY failing value
  is left entirely unchanged — implemented with a global max-failure
  flag, costs one extra aggregate).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.registry import register_transform

logger = logging.getLogger(__name__)

# Canonical application order — mirrors the reference's _RULES table
# (data_cleaning.py:26-38).
RULE_ORDER = (
    "drop_columns",
    "rename_columns",
    "lowercase_columns",
    "strip_whitespace",
    "fill_nulls",
    "drop_nulls",
    "drop_null_columns",
    "deduplicate",
    "deduplicate_columns",
    "standardize_dates",
    "cast_types",
)


def _existing(df: DataFrame, cols: list[str], rule: str) -> list[str]:
    present = [c for c in cols if c in df.columns]
    missing = set(cols) - set(present)
    if missing:
        logger.warning("cleaning rule %s: skipping missing columns %s", rule, missing)
    return present


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.drop(*_existing(df, cols, "drop_columns"))


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    mapping = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(mapping)


def lowercase_columns(df: DataFrame) -> DataFrame:
    return df.toDF(*[c.lower() for c in df.columns])


def strip_whitespace(df: DataFrame) -> DataFrame:
    string_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    if not string_cols:
        return df
    return df.withColumns({c: F.trim(F.col(c)) for c in string_cols})


def fill_nulls(df: DataFrame, mapping: dict[str, Any]) -> DataFrame:
    mapping = {k: v for k, v in mapping.items() if k in df.columns}
    return df.fillna(mapping)


def drop_nulls(df: DataFrame) -> DataFrame:
    return df.dropna("any")


def drop_null_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    present = _existing(df, cols, "drop_null_columns")
    return df.dropna(subset=present) if present else df


def deduplicate(df: DataFrame) -> DataFrame:
    return df.dropDuplicates()


def deduplicate_columns(
    df: DataFrame, cols: list[str], order_by: list[str] | None = None
) -> DataFrame:
    """Keep-first dedup with an explicit, deterministic tiebreak.

    Pandas ``drop_duplicates(subset)`` keeps the first row in physical
    order (data_cleaning.py:122-132); a distributed engine has no
    physical order, so the 'first' row is defined by ``order_by``
    (default: the remaining columns ascending).
    """
    present = _existing(df, cols, "deduplicate_columns")
    if not present:
        return df
    if order_by is None:
        order_by = [c for c in df.columns if c not in present]
    if not order_by:
        return df.dropDuplicates(present)
    w = Window.partitionBy(*present).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def standardize_dates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Parse to timestamp; unparseable values coerce to null
    (= pd.to_datetime(errors='coerce'), data_cleaning.py:134-144)."""
    present = _existing(df, cols, "standardize_dates")
    return df.withColumns(
        {c: F.expr(f"try_cast(`{c}` AS timestamp)") for c in present}
    )


def cast_types(
    df: DataFrame, mapping: dict[str, str], mode: str = "permissive"
) -> DataFrame:
    present = {k: v for k, v in mapping.items() if k in df.columns}
    for col in set(mapping) - set(present):
        logger.warning("cast_types: skipping missing column %s", col)
    if not present:
        return df
    if mode == "permissive":
        return df.withColumns(
            {c: F.expr(f"try_cast(`{c}` AS {t})") for c, t in present.items()}
        )
    if mode == "column_atomic":
        # Reference parity (data_cleaning.py:147-159): a cast that fails for
        # ANY value leaves that column entirely unchanged. A static-schema
        # engine cannot make the output *type* data-dependent lazily, so
        # this mode is deliberately eager: one probe job per column (scans
        # only that column, predicate pushed down) decides cast-or-keep.
        out = df
        for c, typ in present.items():
            tried = F.expr(f"try_cast(`{c}` AS {typ})")
            n_bad = df.filter(F.col(c).isNotNull() & tried.isNull()).limit(1).count()
            if n_bad:
                logger.warning(
                    "cast_types(column_atomic): column %s has uncastable "
                    "values; keeping original type", c,
                )
                continue
            out = out.withColumn(c, F.col(c).cast(typ))
        return out
    raise ValueError(f"cast_types mode must be permissive|column_atomic, got {mode!r}")


@register_transform("data_cleaning")
class DataCleaning(BaseTransform):
    """Config-driven rule pipeline; rules run in RULE_ORDER."""

    def transform(self, df: DataFrame) -> DataFrame:
        cfg = self.config
        unknown = set(cfg) - set(RULE_ORDER) - {"deduplicate_order_by", "cast_mode"}
        if unknown:
            logger.warning("data_cleaning: ignoring unknown rules %s", unknown)
        for rule in RULE_ORDER:
            if rule not in cfg or cfg[rule] in (None, False):
                continue
            value = cfg[rule]
            if rule == "drop_columns":
                df = drop_columns(df, value)
            elif rule == "rename_columns":
                df = rename_columns(df, value)
            elif rule == "lowercase_columns":
                df = lowercase_columns(df)
            elif rule == "strip_whitespace":
                df = strip_whitespace(df)
            elif rule == "fill_nulls":
                df = fill_nulls(df, value)
            elif rule == "drop_nulls":
                df = drop_nulls(df)
            elif rule == "drop_null_columns":
                df = drop_null_columns(df, value)
            elif rule == "deduplicate":
                df = deduplicate(df)
            elif rule == "deduplicate_columns":
                df = deduplicate_columns(df, value, cfg.get("deduplicate_order_by"))
            elif rule == "standardize_dates":
                df = standardize_dates(df, value)
            elif rule == "cast_types":
                df = cast_types(df, value, cfg.get("cast_mode", "permissive"))
        return df
