"""Trained document-quality classifier (MLlib): the model-based filter
stage of a training-data pipeline, with the TRAINING path distributed.

Extends the inference-only hashed-linear scorer
(operators/text.model_quality_score / `quality_model_score` transform)
with an in-Spark training loop: weak labels from the deterministic
heuristic quality score, hashed token features (HashingTF — the
fastText-style trick: no vocabulary shuffle, feature space fixed at
2^n), and LogisticRegression fit via MLlib's distributed LBFGS.

No reference counterpart (the reference trains price regressors,
/root/reference/predict.py:54-55); this is part of the LLM-pipeline
extension surface. Catalog-wise the model stays OUT of the oracle set:
LBFGS converges to reduction-order-dependent low bits, so cross-engine
hash parity is not a meaningful contract — the pytest contract is AUC
on held-out data plus determinism of the label/feature plumbing.

Scale: tokenization + hashing are per-row JVM/MLlib transforms;
LogisticRegression aggregates gradients via treeAggregate (no
per-row Python). Scoring is a broadcast of the coefficient vector.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, LogisticRegressionModel
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.text import quality_score


def weak_labels(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.55
) -> DataFrame:
    """Heuristic weak labels: 1 if the deterministic quality score
    clears ``threshold``. The label column is `label` (MLlib contract)."""
    return docs.withColumn(
        "label",
        (quality_score(F.col(text_col)) >= F.lit(threshold)).cast("double"),
    )


def _featurizer(text_col: str, n_features: int):
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+", minTokenLength=1
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="features", numFeatures=n_features
    )
    return tok, tf

def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 16,
    max_iter: int = 20,
    reg_param: float = 0.01,
) -> LogisticRegressionModel:
    """Fit LR on hashed token counts. ``labeled`` needs `label` (0/1)."""
    tok, tf = _featurizer(text_col, n_features)
    feats = tf.transform(tok.transform(labeled))
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features"
    )
    return lr.fit(feats)


def score_quality(
    model: LogisticRegressionModel,
    docs: DataFrame,
    text_col: str = "text",
    n_features: int = 1 << 16,
) -> DataFrame:
    """Append `quality_prob` (P(label=1)). Coefficients broadcast; the
    scoring pass is map-only."""
    from pyspark.ml.functions import vector_to_array

    tok, tf = _featurizer(text_col, n_features)
    feats = tf.transform(tok.transform(docs))
    scored = model.transform(feats)
    prob_1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.withColumn("quality_prob", prob_1).drop(
        "__tokens", "features", "rawPrediction", "probability", "prediction"
    )
