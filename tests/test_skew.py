"""Salted aggregation/join: result parity with the unsalted plan plus
fan-out evidence (the hot key's rows really spread over salt buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.skew import _salt, salted_agg, salted_join


def _skewed(spark):
    # key 0 holds 90% of rows (hot); keys 1..9 share the rest
    hot = spark.range(900).select(
        F.lit(0).alias("k"), F.col("id").alias("rid"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(900, 1000).select(
        (F.col("id") % 9 + 1).alias("k"), F.col("id").alias("rid"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"], r["a"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"), F.count("v").alias("n"),
            F.min("v").alias("mn"), F.max("v").alias("mx"), F.avg("v").alias("a"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["count_v"], r["min_v"], r["max_v"], r["avg_v"])
        for r in salted_agg(
            df,
            ["k"],
            {"v": "sum"},
            unique_col="rid",
            n_salt=8,
        )
        .join(
            salted_agg(df, ["k"], {"v": "count"}, "rid", 8), "k"
        )
        .join(salted_agg(df, ["k"], {"v": "min"}, "rid", 8), "k")
        .join(salted_agg(df, ["k"], {"v": "max"}, "rid", 8), "k")
        .join(salted_agg(df, ["k"], {"v": "avg"}, "rid", 8), "k")
        .collect()
    }
    assert set(plain) == set(salted)
    for k, (s, n, mn, mx, a) in plain.items():
        ss, sn, smn, smx, sa = salted[k]
        assert (ss, sn, smn, smx) == (s, n, mn, mx)
        assert abs(sa - a) < 1e-9


def test_salt_actually_fans_out_hot_key(spark):
    df = _skewed(spark).withColumn("__salt", _salt("rid", 8))
    buckets = (
        df.filter("k = 0").select("__salt").distinct().count()
    )
    assert buckets == 8  # hot key spread over every salt bucket


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"name{k}") for k in range(10)], "k long, name string"
    )
    plain = sorted(
        (r["rid"], r["name"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["rid"], r["name"])
        for r in salted_join(big, small, "k", unique_col="rid", n_salt=8).collect()
    )
    assert plain == salted


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(1, "one")], "k long, name string")
    out = salted_join(big, small, "k", "rid", n_salt=4, how="left")
    assert out.count() == big.count()
    assert out.filter("k = 0 AND name IS NOT NULL").count() == 0


def test_non_algebraic_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(_skewed(spark), ["k"], {"v": "median"}, "rid")
