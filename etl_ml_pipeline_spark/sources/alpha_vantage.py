"""Alpha-Vantage-style OHLCV source with nested-series flattening.

Capability parity with /root/reference/src/data_extractor/extractors/
alpha_vantage.py:45-142:

- API error payloads raise ``ValueError``: keys ``Error Message``
  (bad call), ``Note`` (rate limit), ``Information`` (reference
  alpha_vantage.py:88-97).
- series-key auto-detect: first top-level key that is not ``Meta Data``
  (reference alpha_vantage.py:133-142); ``series_key`` config overrides.
- flattening ``{date: {"1. open": ..., "2. high": ...}}`` into columns
  ``date, open, high, low, close, volume`` — numeric prefix and
  whitespace stripped from field names (reference alpha_vantage.py:104-118).
- numeric cast of every non-date column (reference
  alpha_vantage.py:121-122) — expressed here as an explicit Spark
  ``DoubleType`` schema rather than per-column ``pd.to_numeric``.

API volume is ~100 rows/call (BASELINE.md), so the fetch+flatten is
correct driver-side work; the returned DataFrame is a normal Catalyst
plan for everything downstream.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from etl_ml_pipeline_spark.registry import register_source
from etl_ml_pipeline_spark.sources.base import BaseSource
from etl_ml_pipeline_spark.sources.rest_api import Transport, build_url, urllib_transport

OHLCV_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
    ]
)

_ERROR_KEYS = {
    "Error Message": "API error",
    "Note": "API rate limit",
    "Information": "API information notice",
}


def detect_series_key(payload: dict[str, Any]) -> str:
    """First non-'Meta Data' top-level key (reference alpha_vantage.py:133-142)."""
    for key in payload:
        if key != "Meta Data":
            return key
    raise ValueError("No time-series key found in API response")


def flatten_series(series: dict[str, dict[str, Any]]) -> list[dict[str, Any]]:
    """{date: {'1. open': v, ...}} -> [{'date': d, 'open': v, ...}] rows.

    Field names lose their 'N. ' ordinal prefix (reference
    alpha_vantage.py:104-118). Values are cast to float; uncastable
    values become None (pd.to_numeric(errors='coerce') parity).
    """
    rows = []
    for date, fields in series.items():
        row: dict[str, Any] = {"date": date}
        for raw_name, value in fields.items():
            name = raw_name.split(". ", 1)[-1].strip().replace(" ", "_")
            try:
                row[name] = float(value)
            except (TypeError, ValueError):
                row[name] = None
        rows.append(row)
    return rows


@register_source("alpha_vantage")
class AlphaVantageSource(BaseSource):
    """Config: symbol, function (default TIME_SERIES_DAILY), outputsize,
    api_key_env (default ALPHA_VANTAGE_API_KEY), series_key (optional
    override), base_url, transport (test injection)."""

    def connect(self) -> None:
        self._transport: Transport = self.config.get("transport") or urllib_transport

    def _fetch_payload(self) -> dict[str, Any]:
        key_env = self.config.get("api_key_env", "ALPHA_VANTAGE_API_KEY")
        params = {
            "function": self.config.get("function", "TIME_SERIES_DAILY"),
            "symbol": self.config["symbol"],
            "outputsize": self.config.get("outputsize", "compact"),
            "apikey": os.environ.get(key_env, "demo"),
        }
        url = build_url(self.config.get("base_url", "https://www.alphavantage.co"), "query", params)
        status, _, body = self._transport(url, {})
        if status >= 400:
            raise RuntimeError(f"HTTP {status} fetching {url}")
        payload = json.loads(body)
        if not isinstance(payload, dict):
            raise ValueError("Unexpected API response shape")
        for key, label in _ERROR_KEYS.items():
            if key in payload:
                raise ValueError(f"{label}: {payload[key]}")
        return payload

    def extract(self) -> DataFrame:
        if not hasattr(self, "_transport"):
            self.connect()
        payload = self._fetch_payload()
        series_key = self.config.get("series_key") or detect_series_key(payload)
        series = payload.get(series_key)
        if not isinstance(series, dict):
            raise ValueError(f"Series key {series_key!r} not present in response")
        rows = flatten_series(series)
        ohlcv_cols = {f.name for f in OHLCV_SCHEMA.fields}
        if rows and set(rows[0]) == ohlcv_cols:
            ordered = [
                {name: r.get(name) for name in (f.name for f in OHLCV_SCHEMA.fields)}
                for r in rows
            ]
            return self.spark.createDataFrame(ordered, OHLCV_SCHEMA)
        import pandas as pd

        return self.spark.createDataFrame(pd.DataFrame(rows))
