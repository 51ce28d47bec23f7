"""A/B the wired bounds_df on training_data_prep_e2e (VERDICT r10 ask #2).

Round 10's commit 9dc4460 claimed this optimization but never consumed
the parameter (the A/B compared two identical plans). Now that
_ranged_with_pid actually reads bounds_df, measure the real delta:
the e2e with caller-supplied raw-table bounds (one column-pruned scan)
vs self-derived bounds (a third evaluation of the gate+dedup lineage).

Usage: python scripts/r11_bounds_ab.py [--sf-dirs d1,d2] [--reps 3]
Writes scripts/r11_bounds_ab.json.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def _variant(spark, sf_dir: str, use_bounds: bool):
    """training_data_prep_e2e with the bounds branch toggled."""
    from pyspark.sql import functions as F

    from etl_ml_pipeline_spark.operators import text as X
    from etl_ml_pipeline_spark.operators.dedup import exact_dedup
    from etl_ml_pipeline_spark.operators.relational import global_running_sum
    from etl_ml_pipeline_spark.queries.pipeline_q import (
        _DEFAULT_RATE,
        _EN_RATE,
        _GATE_LANGS,
        _PACK_BUDGET,
    )
    from etl_ml_pipeline_spark.queries.tables import t

    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    scored = docs.select(
        "doc_id", "lang", "text",
        X.token_count(c).cast("long").alias("n_tok"),
        X.quality_score(c).alias("q"),
    )
    gated = scored.filter(
        F.col("lang").isin(*_GATE_LANGS) & (F.col("q") >= 0.4) & (F.col("n_tok") >= 10)
    )
    deduped = exact_dedup(gated, "text", "doc_id")
    rate = F.when(F.col("lang") == "en", F.lit(_EN_RATE)).otherwise(F.lit(_DEFAULT_RATE))
    sampled = deduped.filter(
        X.token_hash60(F.col("doc_id").cast("string")) % 100 < rate
    ).select("doc_id", "lang", "n_tok")
    bounds = docs.agg(
        F.min(F.col("doc_id").cast("double")).alias("__lo"),
        F.max(F.col("doc_id").cast("double")).alias("__hi"),
    )
    cum = global_running_sum(
        sampled, "n_tok", ["doc_id"], "cum_tok",
        bounds_df=bounds if use_bounds else None,
    )
    packed = cum.withColumn(
        "pack_id", F.floor((F.col("cum_tok") - F.col("n_tok")) / _PACK_BUDGET).cast("long")
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("pack_id")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", default="/root/testdata/sf0.1,/root/repo/.sf1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"reps": args.reps, "results": {}}
    for sf_dir in args.sf_dirs.split(","):
        res: dict = {}
        variant_rows: dict = {}
        for label, use_bounds in (("bounds_wired", True), ("self_derived", False)):
            # warm-up once, then timed reps
            rows_ref = None
            times = []
            for i in range(args.reps + 1):
                t0 = time.monotonic()
                rows = _variant(spark, sf_dir, use_bounds).collect()
                dt = time.monotonic() - t0
                if i > 0:
                    times.append(round(dt, 3))
                if rows_ref is None:
                    rows_ref = rows
                else:
                    assert rows == rows_ref, f"nondeterminism in {label}@{sf_dir}"
            variant_rows[label] = rows_ref
            res[label] = {"times": times, "median": round(statistics.median(times), 3)}
        assert variant_rows["bounds_wired"] == variant_rows["self_derived"], sf_dir
        # the two variants must agree with each other too
        res["ratio_wired_over_self"] = round(
            res["bounds_wired"]["median"] / res["self_derived"]["median"], 3
        )
        out["results"][sf_dir] = res
        print(sf_dir, json.dumps(res))
    with open("/root/repo/scripts/r11_bounds_ab.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
