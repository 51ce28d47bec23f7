"""Round-14 A/B: adjudicate training_data_prep_e2e's r13 driver-bench
move (mid-spread 1.21s -> 1.83s on UNTOUCHED code; VERDICT r13 ask #4).

Both variants run in ONE session (median of 3) so host day-scale drift
cancels; the single-thread CPU probe is stamped before AND after so a
mid-session contention window is visible. Variants:

- current          the shipped shape: no lineage pin; the prefix sum's
                   two branches each re-evaluate the (map-side fused)
                   score->gate->dedup->sample lineage.
- narrow_pin       the decontam twin's treatment (pipeline_q.py:197):
                   lazy localCheckpoint on the post-sample 3-column
                   frame, one evaluation + a narrow storage write.

Decision rule (VERDICT r13 #4): if current/narrow_pin <= 1.1x at every
measured sf, the driver move was host drift and the shipped shape
stands; if the pin wins past 1.1x, apply it and pin the plan shape.

Usage: python scripts/r14_prep_ab.py [SF_DIR ...]
Writes scripts/r14_prep_ab.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bench import cpu_probe  # noqa: E402 — ONE standardized probe body
from etl_ml_pipeline_spark.session import get_spark  # noqa: E402


def narrow_pin_prep_e2e(spark, sf_dir):
    """training_data_prep_e2e with the decontam twin's narrow pin:
    lazy localCheckpoint on the 3-column post-sample frame."""
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
        F.col("lang").isin(*_GATE_LANGS)
        & (F.col("q") >= 0.4)
        & (F.col("n_tok") >= 10)
    )
    deduped = exact_dedup(gated, "text", "doc_id")
    rate = F.when(F.col("lang") == "en", F.lit(_EN_RATE)).otherwise(
        F.lit(_DEFAULT_RATE)
    )
    sampled = (
        deduped.filter(
            X.token_hash60(F.col("doc_id").cast("string")) % 100 < rate
        )
        .select("doc_id", "lang", "n_tok")
        .localCheckpoint(eager=False)
    )
    bounds = docs.agg(
        F.min(F.col("doc_id").cast("double")).alias("__lo"),
        F.max(F.col("doc_id").cast("double")).alias("__hi"),
    )
    cum = global_running_sum(
        sampled, "n_tok", ["doc_id"], "cum_tok", bounds_df=bounds
    )
    packed = cum.withColumn(
        "pack_id",
        F.floor((F.col("cum_tok") - F.col("n_tok")) / _PACK_BUDGET)
        .cast("long"),
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


def timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/.sf1"]
    from etl_ml_pipeline_spark.queries.pipeline_q import training_data_prep_e2e

    variants = [
        ("prep_e2e_current", training_data_prep_e2e),
        ("prep_e2e_narrow_pin", narrow_pin_prep_e2e),
    ]
    probe_before = cpu_probe()
    spark = get_spark(
        app_name="r14_prep_ab", master="local[32]", shuffle_partitions=32
    )
    out: dict = {"cpu_probe_before": probe_before, "sf": {}}
    for sf_dir in sf_dirs:
        runs: dict[str, list[float]] = {label: [] for label, _ in variants}
        # warm both plan shapes once (codegen/JIT), then TRULY
        # interleave the timed passes — A,B,A,B,A,B — so a transient
        # contention window inflates both variants' samples alike
        # instead of one variant's whole block (the flaw the first
        # version of this script shipped with)
        for _, fn in variants:
            fn(spark, sf_dir).collect()
        for _ in range(3):
            for label, fn in variants:
                runs[label].append(timed(fn, spark, sf_dir))
        rec = {
            label: {"median": statistics.median(ts), "runs": ts}
            for label, ts in runs.items()
        }
        rec["ratio_current_over_pin"] = round(
            rec["prep_e2e_current"]["median"]
            / rec["prep_e2e_narrow_pin"]["median"],
            3,
        )
        print(sf_dir, rec)
        out["sf"][sf_dir] = rec
    out["cpu_probe_after"] = cpu_probe()
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=2))
    print("wrote scripts/r14_prep_ab.json")


if __name__ == "__main__":
    main()
