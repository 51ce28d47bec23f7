"""MLlib prediction pipeline tests (M1-M6 parity, SURVEY.md §2.5).

Mirrors the reference's flow: indicator features -> next-day-return
target -> TimeSeriesSplit expanding folds -> GBT + ridge -> RMSE +
importances (/root/reference/predict.py:31-107). Uses the same
deterministic synthetic OHLCV generator as the indicator tests
(rng seed 42).
"""

from __future__ import annotations

import math

import pytest

from etl_ml_pipeline_spark.ml import (
    create_target,
    feature_importances,
    run_prediction,
    train_evaluate,
)
from etl_ml_pipeline_spark.ml.predict import DEFAULT_FEATURES, fold_bounds
from tests.test_indicators import make_ohlcv


@pytest.fixture(scope="module")
def features_df(spark):
    """Synthetic OHLCV through the indicator pipeline = the feature table."""
    from etl_ml_pipeline_spark.operators.indicators import TechnicalIndicators

    df = spark.createDataFrame(make_ohlcv(220))
    out = TechnicalIndicators({}).transform(df)
    out.cache()
    out.count()
    return out


def test_create_target_matches_pandas(spark, features_df):
    pdf = features_df.orderBy("date").toPandas()
    expected = (pdf["close"].shift(-1) - pdf["close"]) / pdf["close"] * 100.0
    out = create_target(features_df).orderBy("date").toPandas()
    assert len(out) == len(pdf) - 1  # last row dropped (predict.py:44)
    assert out["target_return"].values == pytest.approx(
        expected.iloc[:-1].values, abs=1e-9
    )


def test_fold_bounds_match_sklearn_semantics():
    # n=100, 5 splits -> test size 16, first train end 20 (sklearn TimeSeriesSplit)
    bounds = fold_bounds(100, 5)
    assert bounds[0] == (20, 21, 36)
    assert bounds[-1] == (84, 85, 100)
    # folds expand: each train_end grows by test size
    train_ends = [b[0] for b in bounds]
    assert train_ends == [20, 36, 52, 68, 84]
    with pytest.raises(ValueError):
        fold_bounds(3, 5)


def test_global_window_autoroute_above_threshold(spark, features_df):
    """Above row_threshold, create_target/expanding_folds must route to
    the two-phase distributed rank: identical output to the naive global
    window, and the plan range-partitions instead of collapsing every
    row into one WindowExec task (VERDICT r04 #4)."""
    from etl_ml_pipeline_spark.ml.predict import expanding_folds

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString().lower()

    routed_t = create_target(features_df, row_threshold=10)
    naive_t = create_target(features_df, row_threshold=None)
    key = lambda rows: sorted((r.date, round(r.target_return, 9)) for r in rows)
    assert key(routed_t.collect()) == key(naive_t.collect())
    assert "existingrdd" in plan(routed_t)  # pinned two-phase layout

    routed_f = expanding_folds(features_df, order_col="date", row_threshold=10)
    naive_f = expanding_folds(features_df, order_col="date", row_threshold=None)
    fkey = lambda rows: sorted((r.date, r._rn) for r in rows)
    assert fkey(routed_f.select("date", "_rn").collect()) == fkey(
        naive_f.select("date", "_rn").collect()
    )
    assert "existingrdd" in plan(routed_f)
    # below the threshold the single-series path is kept (no re-range)
    small = expanding_folds(features_df, order_col="date", row_threshold=10**6)
    assert "existingrdd" not in plan(small)


def test_route_decision_schedules_no_job(spark, tmp_path):
    """The routing decision must not cost an action (VERDICT r05 #6):
    a rows_hint answers immediately, and absent a hint the Catalyst
    plan statistics (rowCount / sizeInBytes bound) settle a small
    parquet input — either way zero Spark jobs are scheduled, which we
    assert via a dedicated job group."""
    from etl_ml_pipeline_spark.ml.predict import _route_distributed

    path = str(tmp_path / "route_probe.parquet")
    spark.range(0, 500).selectExpr("id", "id * 2 AS close").write.parquet(path)
    df = spark.read.parquet(path)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("route-no-job", "routing decision must be job-free")
    try:
        assert _route_distributed(df, 10, rows_hint=500) is True
        assert _route_distributed(df, 10**6, rows_hint=500) is False
        # no hint: the 500-row parquet is far below 10^6 bytes, so the
        # sizeInBytes upper bound proves rows <= threshold without a scan
        assert _route_distributed(df, 10**6) is False
        assert tracker.getJobIdsForGroup("route-no-job") == []
    finally:
        sc.setJobGroup("", "")
    # count() fallback still exists: tiny threshold, no hint, stats
    # cannot prove the large side -> a job IS allowed (and routes True)
    assert _route_distributed(df, 10) is True


def test_train_evaluate_both_models(features_df):
    df = create_target(features_df)
    results = train_evaluate(df, n_splits=3, max_iter=5)
    assert set(results) == {"gbt", "ridge"}
    for model, res in results.items():
        assert len(res["fold_rmse"]) == 3
        assert all(math.isfinite(r) and r >= 0 for r in res["fold_rmse"])
        assert res["mean_rmse"] == pytest.approx(
            sum(res["fold_rmse"]) / 3, rel=1e-12
        )


def test_feature_importances_top5(features_df):
    df = create_target(features_df)
    imp = feature_importances(df, top_k=5, max_iter=5)
    assert len(imp) == 5
    names = [n for n, _ in imp]
    assert set(names) <= set(DEFAULT_FEATURES)
    weights = [w for _, w in imp]
    assert weights == sorted(weights, reverse=True)
    assert all(0.0 <= w <= 1.0 for w in weights)


def test_run_prediction_end_to_end(features_df):
    out = run_prediction(features_df, n_splits=3, max_iter=5)
    assert "metrics" in out and "importances" in out
    assert out["metrics"]["ridge"]["mean_rmse"] > 0


def test_plot_importance_renders_svg(tmp_path):
    """The native SVG renderer materializes the presentation artifact
    with no plotting dependency: one bar + label per feature, widths
    proportional to weight."""
    from etl_ml_pipeline_spark.ml.predict import plot_importance

    ranked = [("close", 0.5), ("volume", 0.25), ("open", 0.0)]
    out = plot_importance(ranked, str(tmp_path / "imp.svg"))
    svg = open(out, encoding="utf-8").read()
    assert svg.startswith("<svg") or svg.startswith("<?xml") or "<svg" in svg
    assert svg.count("<rect") == 1 + len(ranked)  # background + one per bar
    for name, w in ranked:
        assert f">{name}</text>" in svg
        assert f"{w:.4f}" in svg


def test_plot_importance_png_falls_back_to_svg(tmp_path):
    """Raster output needs matplotlib (absent here); the plot falls back
    to SVG at the swapped-extension path instead of failing."""
    from etl_ml_pipeline_spark.ml.predict import plot_importance

    out = plot_importance([("close", 0.5)], str(tmp_path / "imp.png"))
    assert out.endswith(".svg")
    assert "<svg" in open(out, encoding="utf-8").read()

    with pytest.raises(ValueError, match="empty"):
        plot_importance([], str(tmp_path / "x.svg"))


def test_boosted_regressor_selects_gbt_without_xgboost():
    """In this container xgboost is absent -> the MLlib GBT stand-in."""
    from pyspark.ml.regression import GBTRegressor

    from etl_ml_pipeline_spark.ml.predict import _boosted_regressor

    model = _boosted_regressor(seed=7)
    assert isinstance(model, GBTRegressor)
    assert model.getMaxIter() == 100 and model.getMaxDepth() == 4


def test_boosted_regressor_selects_xgb_when_importable(monkeypatch):
    """When xgboost.spark is importable, its SparkXGBRegressor must be
    chosen over the GBT stand-in (simulated module: xgboost isn't in
    this container)."""
    import sys
    import types

    calls = {}

    class FakeSparkXGBRegressor:
        def __init__(self, **kw):
            calls.update(kw)

    xgb = types.ModuleType("xgboost")
    xgb_spark = types.ModuleType("xgboost.spark")
    xgb_spark.SparkXGBRegressor = FakeSparkXGBRegressor
    xgb.spark = xgb_spark
    monkeypatch.setitem(sys.modules, "xgboost", xgb)
    monkeypatch.setitem(sys.modules, "xgboost.spark", xgb_spark)

    from etl_ml_pipeline_spark.ml.predict import _boosted_regressor

    model = _boosted_regressor(seed=7)
    assert isinstance(model, FakeSparkXGBRegressor)
    assert calls["n_estimators"] == 100 and calls["max_depth"] == 4
    assert calls["random_state"] == 7
