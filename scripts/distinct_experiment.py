"""Benchmark: two-distinct Expand plan vs join-of-preaggregates.

Spark plans `count(DISTINCT a), count(DISTINCT b)` via Expand (3x row
replication, then two aggregate phases). The candidate alternative
computes each distinct with its own (suppkey, value) pre-aggregate and
joins the three small per-suppkey results. ROADMAP round-2 item:
measure at sf0.1 / 32 shuffle partitions; adopt whichever wins.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from etl_ml_pipeline_spark.queries.tables import t  # noqa: E402
from etl_ml_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def expand_variant(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("l_suppkey")
    )


def join_variant(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    parts = (
        li.select("l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_parts"))
    )
    orders = (
        li.select("l_suppkey", "l_orderkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_orders"))
    )
    qty = li.groupBy("l_suppkey").agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    return (
        parts.join(orders, "l_suppkey").join(qty, "l_suppkey").orderBy("l_suppkey")
    )


def time_one(fn, spark, n=3):
    fn(spark, SF_DIR).toPandas()  # warm
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).toPandas()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs), runs


def main():
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    a = expand_variant(spark, SF_DIR).toPandas().sort_values("l_suppkey")
    b = join_variant(spark, SF_DIR).toPandas().sort_values("l_suppkey")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True)), "variants disagree"
    m_expand, r1 = time_one(expand_variant, spark)
    m_join, r2 = time_one(join_variant, spark)
    print(f"expand: median {m_expand:.3f}s runs={[round(x,3) for x in r1]}")
    print(f"join:   median {m_join:.3f}s runs={[round(x,3) for x in r2]}")


if __name__ == "__main__":
    main()
