"""Round-13 A/B: the two decontamination perf fixes, old shape vs new,
measured in ONE session (median of 3) so the host's day-scale drift
cancels out. Also records the single-thread CPU probe (VERDICT r12 #6)
so cross-round comparisons can be normalized.

Old shapes are reconstructed inline (forced benchmark-side broadcast,
no lineage pins) — they are the exact round-12 topologies, kept here
as measurement stand-ins only.

Usage: python scripts/r13_decontam_ab.py [SF_DIR ...]
Writes scripts/r13_decontam_ab.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from etl_ml_pipeline_spark.session import get_spark  # noqa: E402


def cpu_probe() -> float:
    """Single-thread CPU probe: fixed busy loop, seconds (lower=faster)."""
    t0 = time.time()
    acc = 0
    for i in range(20_000_000):
        acc += i * i
    return time.time() - t0


def old_split_stats(spark, sf_dir):
    from etl_ml_pipeline_spark.operators.text import (
        contamination_pairs,
        token_hash60,
    )
    from etl_ml_pipeline_spark.queries.tables import t

    docs = t(spark, sf_dir, "documents")
    h = token_hash60(F.col("doc_id").cast("string")) % 10
    train = docs.filter(h < 8)
    test = docs.filter(h >= 8)
    # round-12 shape: forced broadcast of the 80%-corpus gram side
    pairs = contamination_pairs(
        test, train, n=5, min_shared=1, broadcast_bench=True
    )
    per_doc = pairs.groupBy("corpus_id").agg(
        F.count("*").alias("n_partners"), F.sum("n_shared").alias("shared")
    )
    j = test.select("doc_id", "lang").join(
        per_doc, F.col("doc_id") == F.col("corpus_id"), "left"
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").alias("n_test"),
            F.count("corpus_id").alias("n_contaminated"),
            (F.floor(F.count("corpus_id") * 10000 / F.count("*")) / 10000)
            .alias("contamination_rate"),
            F.coalesce(F.sum("shared"), F.lit(0)).cast("long")
            .alias("shared_grams"),
        )
        .orderBy("lang")
    )


def old_decontam_e2e(spark, sf_dir):
    """Round-12 topology: broadcast holdout grams, NO lineage pins."""
    from etl_ml_pipeline_spark.operators import text as X
    from etl_ml_pipeline_spark.operators.dedup import exact_dedup
    from etl_ml_pipeline_spark.operators.relational import global_running_sum
    from etl_ml_pipeline_spark.operators.text import contamination_pairs
    from etl_ml_pipeline_spark.queries.pipeline_q import (
        _DEFAULT_RATE,
        _EN_RATE,
        _GATE_LANGS,
        _PACK_BUDGET,
    )
    from etl_ml_pipeline_spark.queries.tables import t

    docs = t(spark, sf_dir, "documents")
    b = X.token_hash60(F.col("doc_id").cast("string")) % 10
    train, holdout = docs.filter(b < 8), docs.filter(b >= 8)
    c = F.col("text")
    scored = train.select(
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
    contaminated = (
        contamination_pairs(
            deduped, holdout, n=5, min_shared=1, broadcast_bench=True
        )
        .select("corpus_id")
        .distinct()
    )
    clean = deduped.join(
        contaminated, F.col("doc_id") == F.col("corpus_id"), "left_anti"
    )
    rate = F.when(F.col("lang") == "en", F.lit(_EN_RATE)).otherwise(
        F.lit(_DEFAULT_RATE)
    )
    sampled = clean.filter(
        X.token_hash60(F.col("doc_id").cast("string")) % 100 < rate
    ).select("doc_id", "lang", "n_tok")
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


def pin_text_decontam_e2e(spark, sf_dir):
    """Rejected intermediate: pin `deduped` (full TEXT column) + narrow
    `clean`. Kept as a measured variant — the corpus-text storage
    write makes it SLOWER than no pin by sf1."""
    from etl_ml_pipeline_spark.operators import text as X
    from etl_ml_pipeline_spark.operators.dedup import exact_dedup
    from etl_ml_pipeline_spark.operators.relational import global_running_sum
    from etl_ml_pipeline_spark.operators.text import contamination_pairs
    from etl_ml_pipeline_spark.queries.pipeline_q import (
        _DEFAULT_RATE,
        _EN_RATE,
        _GATE_LANGS,
        _PACK_BUDGET,
    )
    from etl_ml_pipeline_spark.queries.tables import t

    docs = t(spark, sf_dir, "documents")
    b = X.token_hash60(F.col("doc_id").cast("string")) % 10
    train, holdout = docs.filter(b < 8), docs.filter(b >= 8)
    c = F.col("text")
    scored = train.select(
        "doc_id", "lang", "text",
        X.token_count(c).cast("long").alias("n_tok"),
        X.quality_score(c).alias("q"),
    )
    gated = scored.filter(
        F.col("lang").isin(*_GATE_LANGS)
        & (F.col("q") >= 0.4)
        & (F.col("n_tok") >= 10)
    )
    deduped = exact_dedup(gated.drop("q"), "text", "doc_id").localCheckpoint(
        eager=False
    )
    contaminated = (
        contamination_pairs(deduped, holdout, n=5, min_shared=1)
        .select("corpus_id")
        .distinct()
    )
    rate = F.when(F.col("lang") == "en", F.lit(_EN_RATE)).otherwise(
        F.lit(_DEFAULT_RATE)
    )
    clean = (
        deduped.join(
            contaminated, F.col("doc_id") == F.col("corpus_id"), "left_anti"
        )
        .select("doc_id", "lang", "n_tok")
        .localCheckpoint(eager=False)
    )
    sampled = clean.filter(
        X.token_hash60(F.col("doc_id").cast("string")) % 100 < rate
    ).select("doc_id", "lang", "n_tok")
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


def median3(fn, spark, sf_dir) -> list[float]:
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        ts.append(round(time.time() - t0, 3))
    return ts


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    from etl_ml_pipeline_spark.queries.pipeline_q import (
        training_data_prep_decontam_e2e,
    )
    from etl_ml_pipeline_spark.queries.text_q import split_decontamination_stats

    spark = get_spark(
        app_name="r13_ab", master="local[32]", shuffle_partitions=32
    )
    out: dict = {"cpu_probe_sec": round(cpu_probe(), 3), "sf": {}}
    for sf_dir in sf_dirs:
        rec = {}
        for label, fn in [
            ("split_stats_old_broadcast", old_split_stats),
            ("split_stats_new", split_decontamination_stats),
            ("decontam_e2e_old_unpinned", old_decontam_e2e),
            ("decontam_e2e_pin_text_rejected", pin_text_decontam_e2e),
            ("decontam_e2e_new_narrow_pin", training_data_prep_decontam_e2e),
        ]:
            ts = median3(fn, spark, sf_dir)
            rec[label] = {"median": statistics.median(ts), "runs": ts}
            print(sf_dir, label, rec[label])
        out["sf"][sf_dir] = rec
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=2))
    print("wrote scripts/r13_decontam_ab.json")


if __name__ == "__main__":
    main()
