"""Technical-indicator transform: SMA, RSI, Bollinger bands, MACD.

Capability parity with /root/reference/src/data_extractor/transformers/
finance_transformer.py:29-144 (requires OHLCV columns case-insensitively,
lowercases, parses dates, coerces numerics, sorts by date, computes 4
indicator families, drops rolling-warmup rows). Re-expressed Spark-first:

- SMA and Bollinger are plain frame aggregates (``avg`` / ``stddev_samp``
  over ``rowsBetween(-(n-1), 0)``) with an explicit ``count >= n`` guard
  reproducing Pandas ``min_periods`` semantics (Spark happily returns the
  partial-frame mean; Pandas returns NaN — SURVEY.md §4.2).
- RSI (Wilder smoothing) and MACD (span EWMAs) are *recursive* — state
  carried row to row — which no SQL window frame expresses. They run as
  repartition-by-key + Arrow-batched ``mapInPandas`` over whole
  partitions, with pandas ``GroupBy.ewm`` applying the standard public
  formulas (Wilder 1978 RSI; Appel MACD 12/26/9, ``adjust=False`` EWMA
  recurrence y[t] = (1-a)*y[t-1] + a*x[t]) across every series in the
  partition in one Cython pass (see add_rsi_macd for why not
  per-group applyInPandas).

Scale: everything is keyed by ``series_col`` (symbol/user) — each series
must fit one executor's memory (time-series length, not dataset width);
thousands of series parallelize across the cluster. A single global
unkeyed series is the degenerate case and is documented as such.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.registry import register_transform

REQUIRED = ("date", "open", "high", "low", "close", "volume")


def sma(df: DataFrame, col: str, n: int, w, out: str) -> DataFrame:
    """Simple moving average with min_periods=n null semantics."""
    frame = w.rowsBetween(-(n - 1), 0)
    return df.withColumn(
        out,
        F.when(
            F.count(col).over(frame) >= n, F.avg(col).over(frame)
        ).otherwise(F.lit(None)),
    )


def bollinger(df: DataFrame, col: str, n: int, k: float, w, prefix: str) -> DataFrame:
    """Bollinger bands: SMA(n) ± k * sample stddev(n) (ddof=1, like Pandas)."""
    frame = w.rowsBetween(-(n - 1), 0)
    guard = F.count(col).over(frame) >= n
    mid = F.avg(col).over(frame)
    sd = F.stddev_samp(col).over(frame)
    return df.withColumns(
        {
            f"{prefix}_upper": F.when(guard, mid + k * sd).otherwise(F.lit(None)),
            f"{prefix}_lower": F.when(guard, mid - k * sd).otherwise(F.lit(None)),
        }
    )


def _ewm_kernel_schema(base_schema, cols: list[str]) -> str:
    parts = [f"`{f.name}` {f.dataType.simpleString()}" for f in base_schema.fields]
    parts += [f"{c} double" for c in cols]
    return ", ".join(parts)


def add_rsi_macd(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    rsi_n: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
) -> DataFrame:
    """RSI + MACD — the one stateful scalar op (recursive EWMAs).

    Executed as repartition-by-series + ``mapInPandas`` over whole
    partitions, NOT per-group ``applyInPandas``: applyInPandas makes one
    Python call per GROUP, and with many short series (150k users at our
    sf1 sweep) the ~0.2 ms/call interpreter overhead dominates — measured
    34s -> a few seconds switching to one call per partition with
    pandas ``GroupBy.ewm`` (Cython across all groups, bit-identical
    recurrence to per-group ``Series.ewm``).

    Memory contract: one shuffle PARTITION (not one group) must fit in
    executor memory — size it via spark.sql.shuffle.partitions; each
    group still lands wholly in one partition via the hash repartition.
    """
    out_cols = [f"rsi_{rsi_n}", "macd", "macd_signal", "macd_histogram"]
    schema = _ewm_kernel_schema(df.schema, out_cols)
    col_names = [f.name for f in df.schema.fields] + out_cols

    def kernel(batches) -> "pd.DataFrame":
        parts = list(batches)  # whole partition: groups must not split
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values([series_col, order_col]).reset_index(drop=True)
        close = pd.to_numeric(pdf[value_col], errors="coerce")
        keys = pdf[series_col]

        def gewm(s: pd.Series, **kw) -> pd.Series:
            return (
                s.groupby(keys, sort=False)
                .ewm(adjust=False, **kw)
                .mean()
                .reset_index(level=0, drop=True)
                .sort_index()
            )

        # Wilder RSI: smoothed gains/losses with alpha=1/n, warmup n
        delta = close.groupby(keys, sort=False).diff()
        gain = delta.clip(lower=0.0)
        loss = -delta.clip(upper=0.0)
        avg_gain = gewm(gain, alpha=1.0 / rsi_n, min_periods=rsi_n)
        avg_loss = gewm(loss, alpha=1.0 / rsi_n, min_periods=rsi_n)
        rs = avg_gain / avg_loss
        pdf[f"rsi_{rsi_n}"] = 100.0 - 100.0 / (1.0 + rs)

        # MACD: span EWMAs defined from row 0 (no warmup)
        ema_fast = gewm(close, span=macd_fast)
        ema_slow = gewm(close, span=macd_slow)
        macd = ema_fast - ema_slow
        signal = gewm(macd, span=macd_signal)
        pdf["macd"] = macd
        pdf["macd_signal"] = signal
        pdf["macd_histogram"] = macd - signal
        yield pdf[col_names]

    # Enforce the memory contract: never let a 1-partition session (tiny
    # local test configs set spark.sql.shuffle.partitions=1) concentrate
    # the whole dataset into a single pandas frame on one core — spread
    # over at least the cluster's parallelism. Groups still co-locate
    # via the hash repartition on series_col.
    sess = df.sparkSession
    try:
        shuffle_n = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle_n = 0
    n_parts = max(shuffle_n, sess.sparkContext.defaultParallelism)
    return df.repartition(n_parts, series_col).mapInPandas(kernel, schema=schema)


def add_holt_linear(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.2,
    beta: float = 0.1,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing per series.

    Appends ``level``, ``trend``, and the one-step-ahead ``forecast``
    (level_t + trend_t). Init: level_1 = y_1, trend_1 = 0; then
    level_t = a*y_t + (1-a)*(level+trend), trend_t = b*(level_t -
    level_{t-1}) + (1-b)*trend_{t-1} — two COUPLED recursions, so no
    ``GroupBy.ewm`` shortcut; each series runs a float loop.

    Intended input is an already-REDUCED series (e.g. daily aggregates
    — the heavy groupBy happens before this operator, map-side
    combined), so each series is calendar-bounded (|days| rows, not
    |events|) and the per-row Python loop cost is trivial. Groups
    co-locate via hash repartition on ``series_col``; one shuffle
    partition (not one group) must fit in memory, exactly the
    add_rsi_macd contract.
    """
    out_cols = ["level", "trend", "forecast"]
    schema = _ewm_kernel_schema(df.schema, out_cols)
    col_names = [f.name for f in df.schema.fields] + out_cols

    def kernel(batches) -> "pd.DataFrame":
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values([series_col, order_col]).reset_index(drop=True)
        level = np.empty(len(pdf))
        trend = np.empty(len(pdf))
        for _, idx in pdf.groupby(series_col, sort=False).indices.items():
            y = pdf[value_col].to_numpy()[idx]
            lv, tr = y[0], 0.0
            level[idx[0]], trend[idx[0]] = lv, tr
            for j in range(1, len(idx)):
                lv_new = alpha * y[j] + (1.0 - alpha) * (lv + tr)
                tr = beta * (lv_new - lv) + (1.0 - beta) * tr
                lv = lv_new
                level[idx[j]], trend[idx[j]] = lv, tr
        pdf["level"] = level
        pdf["trend"] = trend
        pdf["forecast"] = level + trend
        yield pdf[col_names]

    sess = df.sparkSession
    try:
        shuffle_n = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle_n = 0
    n_parts = max(shuffle_n, sess.sparkContext.defaultParallelism)
    return df.repartition(n_parts, series_col).mapInPandas(kernel, schema=schema)


@register_transform("technical_indicators")
class TechnicalIndicators(BaseTransform):
    """OHLCV indicator pipeline (reference finance_transformer parity)."""

    def validate(self, df: DataFrame) -> None:
        lower = {c.lower() for c in df.columns}
        missing = [c for c in REQUIRED if c not in lower]
        if missing:
            raise ValueError(
                f"technical_indicators requires OHLCV columns; missing {missing}"
            )

    def transform(self, df: DataFrame) -> DataFrame:
        cfg: dict[str, Any] = self.config
        sma_n = int(cfg.get("sma_window", 50))
        rsi_n = int(cfg.get("rsi_window", 14))
        bb_n = int(cfg.get("bollinger_window", 20))
        bb_k = float(cfg.get("bollinger_std", 2.0))
        series_col = cfg.get("series_col")

        # lowercase + date parse + numeric coercion (reference lines 55-66)
        df = df.toDF(*[c.lower() for c in df.columns])
        df = df.withColumn("date", F.expr("try_cast(date AS timestamp)"))
        for c in ("open", "high", "low", "close", "volume"):
            df = df.withColumn(c, F.expr(f"try_cast(`{c}` AS double)"))

        if series_col is None:
            # Single global series: one partition by construction; fine for
            # API-scale OHLCV, documented degenerate case.
            df = df.withColumn("__series", F.lit("_"))
            series_col = "__series"

        w = W.partitionBy(series_col).orderBy("date")
        df = sma(df, "close", sma_n, w, f"sma_{sma_n}")
        df = bollinger(df, "close", bb_n, bb_k, w, "bb")
        df = add_rsi_macd(df, series_col, "date", "close", rsi_n=rsi_n)

        # drop rolling-warmup rows (reference line 88: dropna())
        indicator_cols = [f"sma_{sma_n}", f"rsi_{rsi_n}", "bb_upper", "bb_lower",
                          "macd", "macd_signal", "macd_histogram"]
        df = df.dropna(subset=indicator_cols)

        # dates serialized as ISO-8601 UTC strings (reference lines 57-62)
        if cfg.get("date_as_iso_string", True):
            # The 'Z' suffix claims UTC, so convert from the session
            # timezone first — under a non-UTC session the raw
            # date_format would stamp local wall-clock times as UTC.
            # (No-op when the session already runs UTC, as ours do.)
            df = df.withColumn(
                "date",
                F.date_format(
                    F.to_utc_timestamp("date", F.current_timezone()),
                    "yyyy-MM-dd'T'HH:mm:ss'Z'",
                ),
            )
        return df.drop("__series") if "__series" in df.columns else df
