"""Bloom-filter join pruning: membership contract, join identity, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.bloom import (
    BloomFilterTooLarge,
    bloom_build,
    bloom_prune_join,
    might_contain,
)


def test_no_false_negatives(spark):
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    words, m, k = bloom_build(dim, "k")
    hits = dim.filter(might_contain(F.col("k"), words, m, k)).count()
    assert hits == 1000  # every member must pass


def test_false_positive_rate_bounded(spark):
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    words, m, k = bloom_build(dim, "k", bits_per_key=10, k=7)
    # 20k keys disjoint from the build set
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probe.filter(might_contain(F.col("k"), words, m, k)).count()
    # theory ~0.8% at 10 bits/key, 7 hashes; allow 3x slack
    assert fp / 20_000 < 0.03


def test_prune_join_identical_to_plain_join(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("k"), (F.col("id") * 3).alias("v")
    )
    # add null fact keys — inner join must drop them either way
    fact = fact.union(spark.sql("SELECT CAST(NULL AS BIGINT) k, CAST(-1 AS BIGINT) v"))
    dim = spark.range(0, 200).select((F.col("id") * 3).alias("k"), F.lit("d").alias("tag"))
    got = sorted(bloom_prune_join(fact, dim, "k").collect())
    want = sorted(fact.join(dim, "k", "inner").collect())
    assert got == want


def test_prune_join_left_semi(spark):
    fact = spark.range(0, 3000).select((F.col("id") % 500).alias("k"))
    dim = spark.range(0, 100).select((F.col("id") * 5).alias("k"))
    got = sorted(bloom_prune_join(fact, dim, "k", how="left_semi").collect())
    want = sorted(fact.join(dim, "k", "left_semi").collect())
    assert got == want


def test_unsupported_how_raises(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_prune_join(df, df, "k", how="left_outer")


def test_empty_dim_prunes_everything(spark):
    fact = spark.range(0, 100).select(F.col("id").alias("k"))
    dim = spark.range(0).select(F.col("id").alias("k"))
    assert bloom_prune_join(fact, dim, "k").count() == 0


def test_build_raises_above_driver_cap(spark):
    """The collect is the only unbounded driver cost; the cap bounds it.
    2000 keys at 10 bits/key is ~2.4 KB — a 0.000001 MiB cap trips."""
    dim = spark.range(0, 2000).select(F.col("id").alias("k"))
    with pytest.raises(BloomFilterTooLarge, match="cap"):
        bloom_build(dim, "k", max_filter_mb=0.000001)


def test_prune_join_falls_back_to_plain_join_above_cap(spark):
    """Above the cap the operator degrades to the exact join — identical
    result, and the plan contains NO bloom probe (no getbit filter)."""
    fact = spark.range(0, 4000).select(
        (F.col("id") % 600).alias("k"), (F.col("id") * 7).alias("v")
    )
    dim = spark.range(0, 300).select((F.col("id") * 2).alias("k"), F.lit("d").alias("tag"))
    got_df = bloom_prune_join(fact, dim, "k", max_filter_mb=0.000001)
    want = sorted(fact.join(dim, "k", "inner").collect())
    assert sorted(got_df.collect()) == want
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "getbit" not in plan  # pre-filter skipped, not half-applied


def test_plan_filter_is_jvm_side_single_join(spark):
    fact = spark.range(0, 1000).select((F.col("id") % 100).alias("k"))
    dim = spark.range(0, 30).select(F.col("id").alias("k"))
    plan = bloom_prune_join(fact, dim, "k")._jdf.queryExecution().executedPlan().toString()
    # probe is built-in scalar exprs: no Python eval anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly one join (the exact one); the bloom is a Filter, not a join
    assert plan.count("Join") == 1
    assert "getbit" in plan  # the probe reached the fact side as a filter


def test_registry_transform_bloom(spark, sf_dir):
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    fact = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumnRenamed("l_partkey", "p_partkey")
        .select("p_partkey", "l_quantity")
    )
    tr = TRANSFORMS.get("bloom_prune_join")(
        {
            "table": f"{sf_dir}/part.parquet",
            "key": "p_partkey",
            "dim_filter": "p_size <= 10",
            "dim_columns": ["p_partkey", "p_size"],
        }
    )
    got = tr(fact)
    dim = spark.read.parquet(f"{sf_dir}/part.parquet").filter("p_size <= 10").select(
        "p_partkey", "p_size"
    )
    want = fact.join(dim, "p_partkey")
    assert sorted(got.collect()) == sorted(want.collect())


def test_native_runtime_bloom_filter_injects(spark, sf_dir):
    """Spark's own runtime row-level bloom filter (the conf-driven
    counterpart of operators/bloom.py) injects on a shuffle join when
    the thresholds allow — documents the native path and the confs that
    gate it; the explicit operator exists because these conditions are
    stats-dependent and the filter cannot be reused across queries."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_partkey", "l_quantity"
        )
        dim = (
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter("p_size <= 10")
            .selectExpr("p_partkey AS l_partkey")
        )
        plan = (
            fact.join(dim, "l_partkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
