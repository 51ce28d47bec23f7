"""Indicator numerics: golden pandas cross-check + reference invariants.

Mirrors the reference test strategy (tests/test_finance_transformer.py —
SURVEY.md §5): deterministic synthetic OHLCV (rng seed 42), RSI in
[0,100], SMA spot-check vs mean of prior closes, bb_upper > bb_lower,
histogram == macd - signal, warmup-row counts, unsorted input handling.
The RSI/MACD kernels (recursive EWMAs, no SQL oracle) are compared
value-by-value against an independent pandas computation here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.indicators import (
    TechnicalIndicators,
    add_rsi_macd,
    bollinger,
    sma,
)


def make_ohlcv(n: int = 100, start_price: float = 100.0) -> pd.DataFrame:
    """Deterministic synthetic OHLCV (business days, seed 42) — same
    generator contract as FIXTURES.md §A3."""
    rng = np.random.default_rng(42)
    dates = pd.bdate_range("2023-01-01", periods=n)
    close = start_price + np.cumsum(rng.normal(0.1, 1.5, n))
    close = np.maximum(close, 1.0)
    high = close + rng.uniform(0.5, 2.0, n)
    low = close - rng.uniform(0.5, 2.0, n)
    open_ = close + rng.normal(0, 0.5, n)
    volume = rng.uniform(1e6, 1e7, n)
    return pd.DataFrame(
        {
            "date": dates.strftime("%Y-%m-%d"),
            "open": open_,
            "high": high,
            "low": low,
            "close": close,
            "volume": volume,
        }
    )


@pytest.fixture(scope="module")
def ohlcv_pdf():
    return make_ohlcv(100)


@pytest.fixture(scope="module")
def indicators_out(spark, ohlcv_pdf):
    df = spark.createDataFrame(ohlcv_pdf)
    out = TechnicalIndicators(
        {"sma_window": 50, "rsi_window": 14, "bollinger_window": 20}
    ).transform(df)
    return out.orderBy("date").toPandas()


def test_warmup_rows_dropped(indicators_out):
    # SMA(50) is the longest warmup -> first valid row is index 49
    assert len(indicators_out) == 100 - 49


def test_output_columns(indicators_out):
    expected = {
        "date", "open", "high", "low", "close", "volume",
        "sma_50", "rsi_14", "bb_upper", "bb_lower",
        "macd", "macd_signal", "macd_histogram",
    }
    assert expected <= set(indicators_out.columns)


def test_date_iso_utc_strings(indicators_out):
    assert indicators_out["date"].str.match(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$").all()


def test_rsi_in_range(indicators_out):
    assert ((indicators_out["rsi_14"] >= 0) & (indicators_out["rsi_14"] <= 100)).all()


def test_sma_spot_check(indicators_out, ohlcv_pdf):
    # SMA at the first surviving row == mean of closes 0..49
    expected = ohlcv_pdf["close"].iloc[:50].mean()
    assert abs(indicators_out["sma_50"].iloc[0] - expected) < 1e-9


def test_bollinger_band_ordering(indicators_out):
    assert (indicators_out["bb_upper"] > indicators_out["bb_lower"]).all()


def test_histogram_identity(indicators_out):
    diff = indicators_out["macd"] - indicators_out["macd_signal"]
    assert np.allclose(indicators_out["macd_histogram"], diff, atol=1e-10)


def test_rsi_macd_golden_vs_pandas(spark, ohlcv_pdf):
    """Value-by-value parity with an independent pandas EWMA computation."""
    df = spark.createDataFrame(ohlcv_pdf).withColumn("sym", F.lit("X"))
    out = (
        add_rsi_macd(df, "sym", "date", "close", rsi_n=14)
        .orderBy("date")
        .toPandas()
    )

    close = ohlcv_pdf["close"]
    delta = close.diff()
    avg_gain = delta.clip(lower=0).ewm(alpha=1 / 14, min_periods=14, adjust=False).mean()
    avg_loss = (-delta.clip(upper=0)).ewm(alpha=1 / 14, min_periods=14, adjust=False).mean()
    exp_rsi = 100 - 100 / (1 + avg_gain / avg_loss)
    ema12 = close.ewm(span=12, adjust=False).mean()
    ema26 = close.ewm(span=26, adjust=False).mean()
    exp_macd = ema12 - ema26
    exp_signal = exp_macd.ewm(span=9, adjust=False).mean()

    assert np.allclose(out["rsi_14"].iloc[14:], exp_rsi.iloc[14:], atol=1e-9)
    assert np.allclose(out["macd"], exp_macd, atol=1e-9)
    assert np.allclose(out["macd_signal"], exp_signal, atol=1e-9)


def test_unsorted_input_sorted_by_kernel(spark, ohlcv_pdf):
    shuffled = ohlcv_pdf.sample(frac=1.0, random_state=7)
    df = spark.createDataFrame(shuffled).withColumn("sym", F.lit("X"))
    out = add_rsi_macd(df, "sym", "date", "close").orderBy("date").toPandas()
    df2 = spark.createDataFrame(ohlcv_pdf).withColumn("sym", F.lit("X"))
    out2 = add_rsi_macd(df2, "sym", "date", "close").orderBy("date").toPandas()
    assert np.allclose(
        out["macd"].to_numpy(), out2["macd"].to_numpy(), atol=1e-12
    )


def test_multi_series_isolation(spark, ohlcv_pdf):
    """Two symbols must be computed independently (keyed parallelism)."""
    a = ohlcv_pdf.assign(sym="A")
    b = ohlcv_pdf.assign(sym="B", close=ohlcv_pdf["close"] * 2)
    df = spark.createDataFrame(pd.concat([a, b]))
    out = add_rsi_macd(df, "sym", "date", "close").toPandas()
    macd_a = out[out.sym == "A"].sort_values("date")["macd"].to_numpy()
    macd_b = out[out.sym == "B"].sort_values("date")["macd"].to_numpy()
    # MACD is linear in price -> doubling the series doubles macd
    assert np.allclose(macd_b, 2 * macd_a, atol=1e-9)


def test_missing_ohlcv_column_raises(spark, ohlcv_pdf):
    df = spark.createDataFrame(ohlcv_pdf.drop(columns=["volume"]))
    with pytest.raises(ValueError, match="missing"):
        TechnicalIndicators({}).validate(df)


def test_min_periods_guard_nulls(spark):
    """Spark's partial-frame avg must be nulled out below min_periods."""
    pdf = pd.DataFrame({"k": ["a"] * 5, "i": range(5), "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    df = spark.createDataFrame(pdf)
    w = W.partitionBy("k").orderBy("i")
    out = sma(df, "v", 3, w, "sma_3").orderBy("i").toPandas()
    assert out["sma_3"].isna().tolist() == [True, True, False, False, False]
    assert out["sma_3"].iloc[2] == pytest.approx(2.0)

    out2 = bollinger(df, "v", 3, 2.0, w, "bb").orderBy("i").toPandas()
    assert out2["bb_upper"].isna().tolist() == [True, True, False, False, False]
    # sample std of [1,2,3] = 1.0 -> upper = 2 + 2*1 = 4
    assert out2["bb_upper"].iloc[2] == pytest.approx(4.0)


def test_rsi_macd_spreads_one_partition_sessions(spark):
    """The EWM kernel's repartition must override a 1-partition shuffle
    config (memory contract: one partition != whole dataset)."""
    from etl_ml_pipeline_spark.operators.indicators import add_rsi_macd

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        df = spark.range(0, 1000).selectExpr(
            "id % 7 AS sid", "id AS ord", "CAST(id % 13 AS DOUBLE) AS v"
        )
        out = add_rsi_macd(df, "sid", "ord", "v")
        assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
        assert out.count() == 1000
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_holt_linear_matches_reference_loop(spark):
    from etl_ml_pipeline_spark.operators.indicators import add_holt_linear

    ys = {"a": [10.0, 12.0, 11.0, 15.0, 14.0], "b": [5.0]}
    rows = [(k, i, y) for k, series in ys.items() for i, y in enumerate(series)]
    df = spark.createDataFrame(rows, ["sid", "ord", "y"])
    got = {
        (r["sid"], r["ord"]): r
        for r in add_holt_linear(df, "sid", "ord", "y", alpha=0.2, beta=0.1).collect()
    }
    for k, series in ys.items():
        lv, tr = series[0], 0.0
        assert got[(k, 0)]["level"] == lv and got[(k, 0)]["trend"] == 0.0
        for i in range(1, len(series)):
            lv_new = 0.2 * series[i] + (1.0 - 0.2) * (lv + tr)
            tr = 0.1 * (lv_new - lv) + (1.0 - 0.1) * tr
            lv = lv_new
            r = got[(k, i)]
            assert r["level"] == lv and r["trend"] == tr
            assert r["forecast"] == lv + tr


def test_holt_linear_groups_independent(spark):
    from etl_ml_pipeline_spark.operators.indicators import add_holt_linear

    # identical series under different keys produce identical state
    rows = [(k, i, float(i * i % 7)) for k in ("x", "y", "z") for i in range(20)]
    df = spark.createDataFrame(rows, ["sid", "ord", "y"])
    out = add_holt_linear(df, "sid", "ord", "y").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["sid"], {})[r["ord"]] = (r["level"], r["trend"])
    assert by_key["x"] == by_key["y"] == by_key["z"]


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference/src").exists(),
    reason="reference checkout not mounted",
)
def test_parity_against_reference_transformer(spark):
    """Strongest parity proof: run the REFERENCE's own
    TechnicalIndicatorTransformer (imported unmodified) and our Spark
    transform on the same OHLCV series; every indicator column must
    agree to 6 decimals row-for-row."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    from data_extractor.transformers.finance_transformer import (
        TechnicalIndicatorTransformer,
    )

    pdf = make_ohlcv(120)
    ref = TechnicalIndicatorTransformer({}).transform(pdf.copy())
    ours = (
        TechnicalIndicators(
            {"sma_window": 50, "rsi_window": 14, "bollinger_window": 20}
        )
        .transform(spark.createDataFrame(pdf))
        .orderBy("date")
        .toPandas()
    )
    assert len(ref) == len(ours)
    cols = ["sma_50", "rsi_14", "bb_upper", "bb_lower",
            "macd", "macd_signal", "macd_histogram"]
    for c in cols:
        assert np.allclose(
            ref[c].to_numpy(), ours[c].to_numpy(), atol=1e-6
        ), c
