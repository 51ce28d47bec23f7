"""asof_join golden tests: <= convention, per-key isolation, tolerance."""

from __future__ import annotations

import datetime as dt

from etl_ml_pipeline_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "l0"), (1, _ts(10), "l1"), (1, _ts(30), "l2"), (2, _ts(5), "l3")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(20), 200.0), (2, _ts(6), 300.0)],
        "k long, ts timestamp, rv double",
    )
    return left, right


def test_asof_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r["lv"]: r["rv_right"]
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    assert out["l0"] is None          # no right row at/before 10:00
    assert out["l1"] == 100.0         # exactly simultaneous right row matches (<=)
    assert out["l2"] == 200.0         # latest of the two earlier rows
    assert out["l3"] is None          # key 2's right row is later (10:06 > 10:05)


def test_asof_keys_do_not_leak(spark):
    left, right = _frames(spark)
    rows = asof_join(left, right, on="ts", by="k").filter("k = 2").collect()
    assert [r["rv_right"] for r in rows] == [None]  # key 1's rows invisible


def test_asof_tolerance_drops_stale(spark):
    left, right = _frames(spark)
    out = {
        r["lv"]: r["rv_right"]
        for r in asof_join(
            left, right, on="ts", by="k", tolerance=300.0  # 5 minutes
        ).collect()
    }
    assert out["l1"] == 100.0          # same-instant match, age 0
    assert out["l2"] is None           # 10:30 vs 10:20 = 600s > 300s -> dropped
    # matched ts also nulled by tolerance
    rows = {
        r["lv"]: r["ts_right"]
        for r in asof_join(left, right, on="ts", by="k", tolerance=300.0).collect()
    }
    assert rows["l2"] is None and rows["l1"] == _ts(10)


def test_asof_preserves_left_columns_and_count(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k")
    assert out.count() == left.count()  # left join: no row loss or dup
    assert out.columns == ["k", "ts", "lv", "ts_right", "rv_right"]


def test_banded_interval_join_matches_naive(spark):
    """Banded equi-join formulation must produce exactly the naive
    inequality join's pairs, including at the ±tolerance boundary and
    across bin edges."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_ml_pipeline_spark.operators.asof import banded_interval_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    lefts = [Row(lid=i, user_id=1, ts=base + dt.timedelta(seconds=s))
             for i, s in enumerate([0, 599, 600, 1800])]
    rights = [Row(rid=j, user_id=1, ts=base + dt.timedelta(seconds=s))
              for j, s in enumerate([-600, -601, 0, 600, 1199, 1200, 2400, 2401])]
    l = spark.createDataFrame(lefts)
    r = spark.createDataFrame(rights)
    got = {
        (row["lid"], row["rid_right"])
        for row in banded_interval_join(l, r, by="user_id", ts="ts",
                                        tolerance_seconds=600).collect()
    }
    want = {
        (i.lid, j.rid)
        for i in lefts for j in rights
        if abs(int(i.ts.timestamp()) - int(j.ts.timestamp())) <= 600
    }
    assert got == want
    # sanity: boundary pairs present, just-outside pairs absent
    assert (0, 0) in got and (0, 3) in got      # exactly ±600s
    assert (0, 1) not in got                    # 601s away


def test_asof_forward_direction(spark):
    """direction='forward': earliest right row at/after each left ts —
    pandas merge_asof(direction='forward') semantics, verified against a
    pandas reference on the shared fixture."""
    import pandas as pd

    left, right = _frames(spark)
    out = {
        r["lv"]: r["rv_right"]
        for r in asof_join(left, right, on="ts", by="k", direction="forward").collect()
    }
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    want = {
        row.lv: (None if pd.isna(row.rv) else row.rv) for row in ref.itertuples()
    }
    assert out == want
    assert out["l0"] == 100.0   # 10:00 -> next right at 10:10
    assert out["l2"] is None    # nothing after 10:30


def test_asof_disallow_exact_matches(spark):
    """allow_exact_matches=False: a simultaneous right row is invisible;
    the match falls back to the strictly-earlier row (pandas parity)."""
    import pandas as pd

    left, right = _frames(spark)
    out = {
        r["lv"]: r["rv_right"]
        for r in asof_join(
            left, right, on="ts", by="k", allow_exact_matches=False
        ).collect()
    }
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", allow_exact_matches=False)
    want = {
        row.lv: (None if pd.isna(row.rv) else row.rv) for row in ref.itertuples()
    }
    assert out == want
    assert out["l1"] is None  # the 10:10 right row no longer matches l1


def test_asof_forward_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["lv"]: r["rv_right"]
        for r in asof_join(
            left, right, on="ts", by="k", direction="forward", tolerance=360.0
        ).collect()
    }
    assert out["l3"] == 300.0       # 10:05 -> 10:06, 60s gap within 360s
    assert out["l1"] == 100.0       # exact match, gap 0
    assert out["l0"] is None        # 10:00 -> 10:10 is 600s, beyond 360s
