"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall time across the headline query set. Each query is
executed with a count-style action (full materialization of the result —
``collect`` on small aggregates) after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "agg_distinct_parts",
    "rollup_order_stats",
    "json_extract_events",
    "window_topk_orders_per_customer",
    "sessionize_events",
    "text_token_stats",
    "dedup_exact_documents",
    "dedup_minhash_documents",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "asof_click_purchase",
    "text_winnow_sketch",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_ml_pipeline_spark.session import get_spark
    from etl_ml_pipeline_spark.queries import all_queries

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g")},
    )

    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm-up: trigger JVM/codegen/parquet-footer/shuffle paths once so
    # per-query timings measure the queries, not first-touch JIT. The
    # kernel list mirrors what the headline queries lean on: hash (md5),
    # regex, string split + explode, array transform/slice (shingles,
    # vector math), broadcast join, window, and the Arrow/pandas-UDF
    # bridge. Measured at sf0.1: without this, each first-of-its-shape
    # query pays 2-4s of C2 JIT that a long-lived cluster never sees.
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    warm = spark.range(200_000).select(
        (F.col("id") % 97).alias("k"),
        F.col("id").cast("double").alias("v"),
        F.concat_ws(
            " ", F.lit("alpha"), (F.col("id") % 1000).cast("string"), F.lit("omega beta")
        ).alias("s"),
    )
    warm.groupBy("k").agg(F.sum("v"), F.avg("v")).toPandas()
    from pyspark.sql.window import Window

    warm.select(F.row_number().over(Window.partitionBy("k").orderBy("v"))).toPandas()
    # hash/regex/split/explode/array kernels
    toks = F.split(F.regexp_replace(F.trim("s"), r"\s+", " "), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
    )
    (
        warm.select("k", F.md5("s").alias("h"), F.explode(F.array_distinct(grams)).alias("g"))
        .groupBy("g")
        .agg(F.count("*"), F.min("h"))
        .limit(5)
        .toPandas()
    )
    # dense vector math (aggregate/zip_with) + broadcast join
    vecs = warm.limit(20_000).select(
        "k", F.array([(F.col("v") + i) % 7 for i in range(8)]).alias("vec")
    )
    dims = spark.range(97).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    (
        vecs.join(F.broadcast(dims), "k")
        .select(
            F.aggregate(
                F.zip_with("vec", "vec", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dot")
        )
        .agg(F.sum("dot"))
        .collect()
    )
    # Arrow pandas-UDF bridge
    from pyspark.sql.functions import pandas_udf

    _warm_udf = pandas_udf(lambda v: v * 2.0, "double")
    warm.limit(10_000).select(F.sum(_warm_udf("v"))).collect()
    # JSON-path extraction + timestamp arithmetic (events queries)
    (
        warm.limit(50_000)
        .select(
            F.concat(F.lit('{"k": '), (F.col("v") % 50).cast("int"), F.lit("}")).alias("j"),
            F.timestamp_micros((F.col("v") * 1e6).cast("long")).alias("ts"),
        )
        .select(
            F.get_json_object("j", "$.k").cast("bigint").alias("k"),
            F.window("ts", "10 minutes").alias("w"),
        )
        .groupBy("w")
        .agg(F.sum("k"))
        .limit(5)
        .collect()
    )

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        # Full materialization via Arrow (toPandas) — same bytes off the
        # executors as collect(), without Python Row-object overhead.
        n_rows = len(df.toPandas())
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n_rows} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
