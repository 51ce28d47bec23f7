"""PSI drift operator + psi_gate pipeline transform
(operators/drift.py); the cross-engine contract is pinned by the
drift_psi_events oracle row."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.drift import psi


def _grid_df(spark, rows):
    return spark.createDataFrame(rows, ["k", "c"])


def test_psi_zero_for_identical_distributions(spark):
    rows = [("a", v) for v in range(100)]
    ref = _grid_df(spark, rows)
    got = psi(ref, ref, ["k"], "c").collect()[0]
    # identical windows: q == p in every bin, each term floors to 0 or -1e-8
    assert abs(got["psi"]) < 1e-6


def test_psi_detects_shift(spark):
    ref = _grid_df(spark, [("a", v % 100) for v in range(1000)])
    cur = _grid_df(spark, [("a", 80 + v % 20) for v in range(1000)])
    got = psi(ref, cur, ["k"], "c").collect()[0]
    assert got["psi"] > 0.2  # mass concentrated in the top fifth


def test_psi_matches_reference_formula(spark):
    ref_vals = [v % 10 for v in range(200)]
    cur_vals = [v % 7 for v in range(150)]
    got = psi(
        _grid_df(spark, [("a", v) for v in ref_vals]),
        _grid_df(spark, [("a", v) for v in cur_vals]),
        ["k"],
        "c",
        bins=5,
    ).collect()[0]["psi"]
    lo, hi = min(ref_vals), max(ref_vals)
    nr, nc = [0] * 5, [0] * 5
    for v in ref_vals:
        nr[max(0, min(4, (v - lo) * 5 // (hi - lo + 1)))] += 1
    for v in cur_vals:
        nc[max(0, min(4, (v - lo) * 5 // (hi - lo + 1)))] += 1
    tr, tc = sum(nr) + 5, sum(nc) + 5
    expect = sum(
        math.floor(
            ((c + 1) / tc - (r + 1) / tr)
            * math.log(((c + 1) / tc) / ((r + 1) / tr))
            * 1e8
        )
        for r, c in zip(nr, nc)
    ) / 1e8
    assert got == expect


def test_psi_null_key_segment_is_monitored(spark):
    """Round-9 audit of ADVICE r08 #4: a NULL segment key is a real
    segment — the monitor must emit a PSI row for it (the old equi-join
    back on the key silently dropped the whole NULL slice), and its
    value must match the same data under a non-null label."""
    ref_vals = [v % 100 for v in range(1000)]
    cur_vals = [80 + v % 20 for v in range(1000)]
    ref = _grid_df(spark, [(None, v) for v in ref_vals] + [("a", v) for v in ref_vals])
    cur = _grid_df(spark, [(None, v) for v in cur_vals] + [("a", v) for v in cur_vals])
    rows = {r["k"]: r["psi"] for r in psi(ref, cur, ["k"], "c").collect()}
    assert set(rows) == {None, "a"}
    assert rows[None] == rows["a"] > 0.2


def test_psi_gate_fail_and_warn(spark, tmp_path):
    import etl_ml_pipeline_spark.plugins  # noqa: F401
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    ref = spark.createDataFrame(
        [("t", (v % 100) / 100.0) for v in range(1000)],
        ["event_type", "value"],
    )
    ref_path = str(tmp_path / "ref")
    ref.write.parquet(ref_path)
    shifted = spark.createDataFrame(
        [("t", (80 + v % 20) / 100.0) for v in range(1000)],
        ["event_type", "value"],
    )
    gate = TRANSFORMS.get("psi_gate")
    with pytest.raises(ValueError, match="drifted past"):
        gate({"reference_path": ref_path}).transform(shifted)
    # warn mode passes the frame through untouched
    out = gate({"reference_path": ref_path, "mode": "warn"}).transform(shifted)
    assert out.count() == 1000
    # stable data passes in fail mode
    assert gate({"reference_path": ref_path}).transform(ref).count() == 1000
    with pytest.raises(ValueError, match="fail|warn"):
        gate({"reference_path": ref_path, "mode": "bogus"}).transform(ref)
