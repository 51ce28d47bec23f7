"""Named query catalog: every engine operator exposed as a (Spark, oracle-SQL) pair.

Each submodule defines ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL over the same parquet
tables). The driver (and our own tests) run both sides and compare
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- doubles are rounded with the shared helpers in ``parity.py`` so both
  engines produce bit-identical values;
- queries whose semantics SQL cannot express (recursive EWMAs, LSH
  bucketing with library hashes) appear in QUERIES only -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "relational",
    "subqueries",
    "tpch_extra",
    "windows",
    "cleaning_q",
    "timeseries",
    "text_q",
    "dedup_q",
    "graph_q",
    "similarity_q",
    "sampling_q",
    "ml_q",
    "asof_q",
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _MODULES:
        mod = _load(name)
        for k, v in getattr(mod, "QUERIES", {}).items():
            if k in out:
                raise ValueError(f"duplicate query name {k!r} in {name}")
            out[k] = v
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for name in _MODULES:
        mod = _load(name)
        out.update(getattr(mod, "ORACLES", {}))
    return out


def _load(name: str):
    """Import a catalog module, loudly. No ImportError guard: every
    query module is core, and a swallowed import error would silently
    drop queries AND their oracles — the correctness harness then shows
    green on a shrunken catalog (this bit us once; see plugins.py)."""
    import importlib

    return importlib.import_module(f"etl_ml_pipeline_spark.queries.{name}")
