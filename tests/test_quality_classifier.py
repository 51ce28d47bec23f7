"""Trained quality classifier: separability, AUC contract, plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.ml.quality import (
    score_quality,
    train_quality_classifier,
    weak_labels,
)


def _corpus(spark, n=300):
    # separable synthetic docs: "clean" varied prose vs degenerate spam
    clean = [
        (
            i,
            "the quick brown fox jumps over the lazy dog near a quiet river "
            f"while observers count sample number {i} with care and patience",
        )
        for i in range(n)
    ]
    spam = [(n + i, "buy buy buy now now now " * 5) for i in range(n)]
    return spark.createDataFrame(clean + spam, ["doc_id", "text"])


@pytest.fixture(scope="module")
def scored(spark):
    docs = _corpus(spark)
    labeled = weak_labels(docs)
    # weak labels must separate the two populations for training to mean anything
    by_pop = labeled.groupBy((F.col("doc_id") < 300).alias("is_clean")).agg(
        F.avg("label").alias("rate")
    )
    rates = {r["is_clean"]: r["rate"] for r in by_pop.collect()}
    assert rates[True] > 0.9 and rates[False] < 0.1
    model = train_quality_classifier(labeled, n_features=1 << 12, max_iter=10)
    return score_quality(model, labeled, n_features=1 << 12)


def test_auc_on_weak_labels(scored):
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    with_raw = scored.withColumn("raw", F.col("quality_prob"))
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="quality_prob", labelCol="label"
    ).evaluate(scored)
    assert auc > 0.95


def test_scoring_is_map_only_after_broadcast(scored):
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scoring adds no shuffle


def test_prob_bounds_and_direction(scored):
    rows = scored.select("doc_id", "quality_prob").collect()
    probs = {r["doc_id"]: r["quality_prob"] for r in rows}
    assert all(0.0 <= p <= 1.0 for p in probs.values())
    clean_avg = sum(probs[i] for i in range(300)) / 300
    spam_avg = sum(probs[300 + i] for i in range(300)) / 300
    assert clean_avg > 0.8 > 0.2 > spam_avg
