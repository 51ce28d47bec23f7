"""Unit tests for the distributed Lloyd k-means operator
(operators/kmeans.py); cross-engine exactness is covered by the
kmeans_lloyd_embeddings oracle row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.kmeans import (
    assign_clusters,
    lloyd_iterations,
    quantize_micro,
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_quantize_micro_exact_grid(spark):
    df = quantize_micro(_vec_df(spark, [[0.5, -0.25, 1.0]]))
    assert df.collect()[0]["e"] == [500000, -250000, 1000000]


def test_lloyd_separates_obvious_clusters(spark):
    # two tight blobs far apart; k=2 must split them regardless of seeds
    blob_a = [[0.0 + 0.001 * i, 0.0] for i in range(5)]
    blob_b = [[1.0 + 0.001 * i, 1.0] for i in range(5)]
    df = quantize_micro(_vec_df(spark, blob_a + blob_b)).select("vec_id", "e")
    cents = lloyd_iterations(df, k=2, iters=3)
    got = assign_clusters(df, cents).select("vec_id", "cluster").collect()
    groups = {}
    for r in got:
        groups.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert sorted(map(sorted, groups.values())) == [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]


def test_assign_tie_breaks_to_smallest_cluster_id(spark):
    df = quantize_micro(_vec_df(spark, [[0.5, 0.5]])).select("vec_id", "e")
    # equidistant centroids -> cluster 0 wins
    cents = {0: [0, 0], 1: [1000000, 1000000]}
    row = assign_clusters(df, cents).collect()[0]
    assert row["cluster"] == 0
    assert row["dist"] == 2 * 500000 * 500000


def test_empty_cluster_keeps_previous_centroid(spark):
    # all points sit on one seed; the other cluster never gets a member
    df = quantize_micro(_vec_df(spark, [[0.0, 0.0]] * 4)).select("vec_id", "e")
    cents = lloyd_iterations(df, k=1, iters=2)
    assert cents[0] == [0, 0]
    far = {0: [0, 0], 1: [9000000, 9000000]}
    a = assign_clusters(df, far).groupBy("cluster").count().collect()
    assert {r["cluster"] for r in a} == {0}


def test_lloyd_requires_k_rows(spark):
    df = quantize_micro(_vec_df(spark, [[0.0]])).select("vec_id", "e")
    with pytest.raises(ValueError, match="at least k=3"):
        lloyd_iterations(df, k=3, iters=1)


def test_assignment_is_map_only_plan(spark):
    """The assignment pass must not shuffle: centroids are literals and
    the argmin is a row-local expression."""
    df = quantize_micro(_vec_df(spark, [[0.1, 0.2]] * 8)).select("vec_id", "e")
    plan = assign_clusters(df, {0: [0, 0], 1: [1, 1]})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_kmeans_registry_transform_matches_operator(spark):
    import etl_ml_pipeline_spark.plugins  # noqa: F401 — registers transforms
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    blob_a = [[0.0, 0.0]] * 4
    blob_b = [[1.0, 1.0]] * 4
    df = _vec_df(spark, blob_a + blob_b)
    out = TRANSFORMS.get("kmeans_cluster")({"k": 2, "iters": 2}).transform(df)
    assert set(out.columns) == {"vec_id", "embedding", "cluster", "dist"}
    rows = out.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert sorted(map(sorted, by_cluster.values())) == [[0, 1, 2, 3], [4, 5, 6, 7]]
    # centroids land on the blobs -> zero distance everywhere
    assert all(r["dist"] == 0 for r in rows)


def test_np_kernel_matches_expression_path(spark):
    """The large-k*d Arrow kernel must be bit-identical to the JVM
    expression path (exact int64 math, same smallest-id tie-break)."""
    import numpy as np

    from etl_ml_pipeline_spark.operators import kmeans as km

    rng = [[(i * 37 + j * 11) % 100 / 50.0 - 1.0 for j in range(8)] for i in range(64)]
    df = km.quantize_micro(_vec_df(spark, rng)).select("vec_id", "e")
    cents = {i: [int(v) for v in r["e"]] for i, r in enumerate(df.orderBy("vec_id").limit(5).collect())}
    np_rows = {r["vec_id"]: (r["cluster"], r["dist"])
               for r in km._assign_clusters_np(df, cents).collect()}
    old = km._EXPR_PATH_MAX_TERMS
    try:
        km._EXPR_PATH_MAX_TERMS = 10**9
        expr_rows = {r["vec_id"]: (r["cluster"], r["dist"])
                     for r in km.assign_clusters(df, cents).collect()}
    finally:
        km._EXPR_PATH_MAX_TERMS = old
    assert np_rows == expr_rows
    # schema parity too: routing must not change column types
    a = km._assign_clusters_np(df, cents)
    b = km.assign_clusters(df, cents)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]


def test_fused_partial_sums_match_posexplode_update(spark):
    """r15: the fused Arrow update (_partial_sums_np — assignment +
    per-task k*d partial sums in one kernel) must produce centroids
    bit-identical to the posexplode update path, for the same seeds and
    schedule."""
    from etl_ml_pipeline_spark.operators import kmeans as km

    rng = [
        [((i * 53 + j * 29) % 97) / 48.0 - 1.0 for j in range(8)]
        for i in range(48)
    ]
    df = km.quantize_micro(_vec_df(spark, rng)).select("vec_id", "e")
    old = km._EXPR_PATH_MAX_TERMS
    try:
        km._EXPR_PATH_MAX_TERMS = 0  # force the fused numpy update
        c_np = km.lloyd_iterations(df, k=5, iters=2)
        km._EXPR_PATH_MAX_TERMS = 10**9  # force the posexplode update
        c_expr = km.lloyd_iterations(df, k=5, iters=2)
    finally:
        km._EXPR_PATH_MAX_TERMS = old
    assert c_np == c_expr
