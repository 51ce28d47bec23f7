"""Distributed-PCA split: the cluster computes exact covariance moments
(embedding_covariance_pca — oracle-checked), the driver eigendecomposes
the tiny d x d matrix. These tests pin the driver half."""

from __future__ import annotations

import numpy as np


def _moments_to_cov(rows):
    n = rows[0]["n"]
    d = max(r["i"] for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        # cov_num = n*Sxy - Sx*Sy; sample covariance = cov_num / (n*(n-1))
        v = r["cov_num"] / (n * (n - 1))
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = v
    return cov


def test_pca_spectrum_from_moments(spark, sf_dir):
    from etl_ml_pipeline_spark.queries.ml_q import embedding_covariance_pca

    rows = embedding_covariance_pca(spark, sf_dir).collect()
    assert len(rows) == 36  # upper triangle of 8x8
    cov = _moments_to_cov(rows)
    # symmetric PSD up to float noise: eigh succeeds, eigenvalues >= -eps
    vals = np.linalg.eigvalsh(cov)
    assert vals[-1] > 0
    assert vals[0] > -1e-6 * abs(vals[-1])
    # variance accounting: sum of eigenvalues == trace
    assert np.isclose(vals.sum(), np.trace(cov))


def test_moments_match_numpy_covariance(spark):
    """The distributed moment formulas reproduce numpy's sample
    covariance exactly on the micro-unit integer grid."""
    from etl_ml_pipeline_spark.operators.kmeans import quantize_micro

    rng = np.random.default_rng(7)
    X = np.round(rng.standard_normal((50, 8)), 4).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    from pyspark.sql import functions as F

    emb = quantize_micro(df.select("embedding")).select("e")
    m = emb.agg(
        F.count("*").alias("n"),
        F.sum(F.element_at("e", 1)).alias("m0"),
        F.sum(F.element_at("e", 2)).alias("m1"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 2)).alias("s01"),
    ).collect()[0]
    Xi = np.round(X.astype(np.float64) * 1e6).astype(np.int64)
    n = m["n"]
    cov01 = (n * m["s01"] - m["m0"] * m["m1"]) / (n * (n - 1))
    assert np.isclose(cov01, np.cov(Xi[:, 0], Xi[:, 1], ddof=1)[0, 1])
