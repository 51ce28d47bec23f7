"""ML feature-engineering queries (SURVEY.md §2.5 M2/M3, SQL-checkable).

The model-training side of the ML pipeline (GBT/ridge fits) is not
SQL-expressible and is covered by tests/test_ml_predict.py; the
DataFrame feature engineering that feeds it IS, and gets full oracle
checks here: target construction (M2, reference predict.py:39-44) and
sklearn-style expanding-fold assignment (M3, reference predict.py:52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_ml_pipeline_spark.queries.tables import t

_N_SPLITS = 5


def ml_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeSeriesSplit fold id per row over the per-user event series.

    fold i tests rows (n - (k-i)*size, ...]; size = n // (k+1); rows
    before every test block (the shared expanding-train prefix) get
    fold -1. Aggregated to (user, fold) counts so the result is compact.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    n = F.count("*").over(W.partitionBy("user_id"))
    rn = F.row_number().over(w)
    size = F.floor(n / (_N_SPLITS + 1))
    # fold = which test block rn falls in; -1 if in the initial train prefix
    fold = F.when(
        rn > n - _N_SPLITS * size,
        _N_SPLITS - 1 - F.floor((n - rn) / size),
    ).otherwise(F.lit(-1))
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("fold", fold.cast("bigint"))
        .groupBy("user_id", "fold")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("user_id", "fold")
    )


_FOLD_SQL = f"""
WITH numbered AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE user_id < 10
),
folded AS (
  SELECT user_id,
         CASE WHEN rn > n - {_N_SPLITS} * (n // {_N_SPLITS + 1})
              THEN {_N_SPLITS} - 1 - ((n - rn) // (n // {_N_SPLITS + 1}))
              ELSE -1 END AS fold
  FROM numbered
)
SELECT user_id, CAST(fold AS BIGINT) AS fold, count(*) AS n_rows
FROM folded
GROUP BY user_id, fold
ORDER BY user_id, fold
"""


def ml_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type standardization stats (mean/std/min/max of value) —
    the scaler-fit step of a feature pipeline, one map-side-combinable agg."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("mean_value"),
            F.round(F.stddev_samp("value"), 4).alias("std_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("event_type")
    )


_STATS_SQL = """
SELECT event_type,
       count(*) AS n,
       round(avg(value), 4) AS mean_value,
       round(stddev_samp(value), 4) AS std_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# kmeans_lloyd_embeddings — distributed Lloyd k-means (k=8, 2 exact
# integer iterations; see operators/kmeans.py for the scale shape:
# broadcast-literal map-only assignment + one k*d-row update shuffle
# per iteration). The DuckDB oracle UNROLLS the full schedule — seed,
# assign, update, assign, update, final assign — on the same micro-unit
# integer grid, so a green row proves every assignment and every
# centroid update matched exactly across engines (the BPE-training
# playbook applied to an iterative numeric algorithm).
# ---------------------------------------------------------------------------

_KM_K, _KM_ITERS = 8, 2


def kmeans_lloyd_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.kmeans import (
        assign_clusters,
        lloyd_iterations,
        quantize_micro,
    )

    emb = quantize_micro(
        t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ).select("vec_id", "e")
    # each iteration re-scans the input: cache the quantized vectors
    # (at 100 TB this persist is what makes Lloyd linear in iterations).
    # The k-row per-cluster aggregate is materialized EAGERLY while the
    # cache is hot, then the cache is released — the same no-pinned-
    # cache posture ADVICE r07 #4 set for SemDeDup: a catalog call must
    # not leave corpus-sized executor storage pinned for the rest of a
    # long-lived session. Checkpointing k rows is free.
    emb = emb.persist()
    try:
        cents = lloyd_iterations(emb, _KM_K, _KM_ITERS)
        per = (
            assign_clusters(emb, cents)
            .groupBy("cluster")
            .agg(
                F.count("*").alias("n_members"),
                F.sum("dist").alias("inertia"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        emb.unpersist()
    cdf = spark.createDataFrame(
        [(i, *cents[i][:4]) for i in sorted(cents)],
        "cluster int, c0 long, c1 long, c2 long, c3 long",
    )
    return (
        per.join(F.broadcast(cdf), "cluster")
        .select("cluster", "n_members", "inertia", "c0", "c1", "c2", "c3")
        .orderBy("cluster")
    )


def _km_dist(vec: str, ctr: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({vec}, {ctr}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def _km_round(prev: str, idx: int) -> str:
    """One unrolled Lloyd round: assign against `prev`, update -> c{idx}."""
    return f"""
a{idx} AS (
  SELECT v.vec_id, v.e,
         (SELECT i.cluster FROM {prev} i
          ORDER BY {_km_dist('v.e', 'i.c')}, i.cluster LIMIT 1) AS cluster
  FROM emb v
),
u{idx} AS (
  SELECT cluster, dim, sum(val) AS s, count(*) AS n
  FROM (SELECT cluster, unnest(e) AS val,
               unnest(list_transform(e, (x, i) -> i)) AS dim
        FROM a{idx})
  GROUP BY cluster, dim
),
c{idx} AS (
  SELECT p.cluster, coalesce(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT cluster,
           list(CAST(floor(s / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY dim) AS c
    FROM u{idx} GROUP BY cluster
  ) u ON p.cluster = u.cluster
)"""


_KMEANS_SQL = f"""
WITH emb AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS e
  FROM embeddings
),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
         e AS c
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT {_KM_K})
),{_km_round('init', 1)},{_km_round('c1', 2)},
af AS (
  SELECT v.vec_id,
         (SELECT i.cluster FROM c2 i
          ORDER BY {_km_dist('v.e', 'i.c')}, i.cluster LIMIT 1) AS cluster,
         (SELECT min({_km_dist('v.e', 'i.c')}) FROM c2 i) AS dist
  FROM emb v
)
SELECT a.cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(a.dist) AS BIGINT) AS inertia,
       c.c[1] AS c0, c.c[2] AS c1, c.c[3] AS c2, c.c[4] AS c3
FROM af a JOIN c2 c ON a.cluster = c.cluster
GROUP BY a.cluster, c.c[1], c.c[2], c.c[3], c.c[4]
ORDER BY a.cluster
"""


# ---------------------------------------------------------------------------
# ml_group_ols_trend — a model fit per group WITHOUT per-group Python:
# closed-form OLS (daily revenue ~ day) from algebraic moments
# (n, Σx, Σy, Σxx, Σxy) in ONE map-side-combined aggregation. This is
# the 100 TB shape for "fit millions of per-entity models": the naive
# applyInPandas-with-sklearn kernel ships every row to Python and holds
# a group per call; the moment formulation is a plain JVM aggregate —
# same shuffle as any groupBy, state is 5 numbers per group.
#
# Exactness: x = epoch day, y = daily revenue in cents — every moment
# is an exact int64 (magnitudes documented in-line), so slope =
# (nΣxy - ΣxΣy) / (nΣxx - ΣxΣx) divides identical integers on both
# engines and the doubles agree bit-for-bit before round().
# ---------------------------------------------------------------------------


def ml_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y")
        )
        .select(
            "event_type",
            # epoch-day x stays ~2e4; y is daily cents (~1e8 at sf1):
            # Σxy <= 365 * 2e4 * 1e8 = 7e14, Σxx <= 365 * 4e8 = 1.5e11 —
            # every moment far inside int64
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("x"),
            "y",
        )
    )
    from etl_ml_pipeline_spark.operators.relational import group_ols

    m = group_ols(daily, ["event_type"], "x", "y")
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round("slope", 6).alias("slope_cents_per_day"),
        F.round("intercept", 2).alias("intercept_cents"),
    ).orderBy("event_type")


_OLS_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
xy AS (
  SELECT event_type,
         CAST(datediff('day', DATE '1970-01-01', d) AS BIGINT) AS x, y
  FROM daily
),
m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM xy GROUP BY 1
)
SELECT event_type, n AS n_days,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_day,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 2) AS intercept_cents
FROM m
ORDER BY event_type
"""




# ---------------------------------------------------------------------------
# embedding_covariance_pca — the moment pass of distributed PCA: exact
# integer second moments of the first 8 embedding dims (micro-unit
# grid, one map-side-combined aggregation producing d*(d+1)/2 + d + 1
# numbers regardless of input size), emitted as unnormalized covariance
# numerators n*Sxy - Sx*Sy. The eigendecomposition itself is a driver-
# side numpy eigh over this tiny matrix (tests/test_pca.py asserts the
# spectrum) — exactly how distributed PCA splits at 100 TB: the data
# pass is the aggregation, the O(d^3) solve never touches the cluster.
# Magnitudes: |e| <= ~2e6 micro-units, so each product <= 4e12 and the
# sums stay far under 2^63 at any realistic corpus size per partition;
# cross-engine the moments are exact integers, hash-compared directly.
# ---------------------------------------------------------------------------


def embedding_covariance_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.kmeans import quantize_micro

    emb = quantize_micro(
        t(spark, sf_dir, "embeddings").select("embedding")
    ).select("e")
    m = emb.agg(
        F.count("*").alias("n"),
        F.sum(F.element_at("e", 1)).alias("m_0"),
        F.sum(F.element_at("e", 2)).alias("m_1"),
        F.sum(F.element_at("e", 3)).alias("m_2"),
        F.sum(F.element_at("e", 4)).alias("m_3"),
        F.sum(F.element_at("e", 5)).alias("m_4"),
        F.sum(F.element_at("e", 6)).alias("m_5"),
        F.sum(F.element_at("e", 7)).alias("m_6"),
        F.sum(F.element_at("e", 8)).alias("m_7"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 1)).alias("s_0_0"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 2)).alias("s_0_1"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 3)).alias("s_0_2"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 4)).alias("s_0_3"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 5)).alias("s_0_4"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 6)).alias("s_0_5"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 7)).alias("s_0_6"),
        F.sum(F.element_at("e", 1) * F.element_at("e", 8)).alias("s_0_7"),
        F.sum(F.element_at("e", 2) * F.element_at("e", 2)).alias("s_1_1"),
        F.sum(F.element_at("e", 2) * F.element_at("e", 3)).alias("s_1_2"),
        F.sum(F.element_at("e", 2) * F.element_at("e", 4)).alias("s_1_3"),
        F.sum(F.element_at("e", 2) * F.element_at("e", 5)).alias("s_1_4"),
        F.sum(F.element_at("e", 2) * F.element_at("e", 6)).alias("s_1_5"),
        F.sum(F.element_at("e", 2) * F.element_at("e", 7)).alias("s_1_6"),
        F.sum(F.element_at("e", 2) * F.element_at("e", 8)).alias("s_1_7"),
        F.sum(F.element_at("e", 3) * F.element_at("e", 3)).alias("s_2_2"),
        F.sum(F.element_at("e", 3) * F.element_at("e", 4)).alias("s_2_3"),
        F.sum(F.element_at("e", 3) * F.element_at("e", 5)).alias("s_2_4"),
        F.sum(F.element_at("e", 3) * F.element_at("e", 6)).alias("s_2_5"),
        F.sum(F.element_at("e", 3) * F.element_at("e", 7)).alias("s_2_6"),
        F.sum(F.element_at("e", 3) * F.element_at("e", 8)).alias("s_2_7"),
        F.sum(F.element_at("e", 4) * F.element_at("e", 4)).alias("s_3_3"),
        F.sum(F.element_at("e", 4) * F.element_at("e", 5)).alias("s_3_4"),
        F.sum(F.element_at("e", 4) * F.element_at("e", 6)).alias("s_3_5"),
        F.sum(F.element_at("e", 4) * F.element_at("e", 7)).alias("s_3_6"),
        F.sum(F.element_at("e", 4) * F.element_at("e", 8)).alias("s_3_7"),
        F.sum(F.element_at("e", 5) * F.element_at("e", 5)).alias("s_4_4"),
        F.sum(F.element_at("e", 5) * F.element_at("e", 6)).alias("s_4_5"),
        F.sum(F.element_at("e", 5) * F.element_at("e", 7)).alias("s_4_6"),
        F.sum(F.element_at("e", 5) * F.element_at("e", 8)).alias("s_4_7"),
        F.sum(F.element_at("e", 6) * F.element_at("e", 6)).alias("s_5_5"),
        F.sum(F.element_at("e", 6) * F.element_at("e", 7)).alias("s_5_6"),
        F.sum(F.element_at("e", 6) * F.element_at("e", 8)).alias("s_5_7"),
        F.sum(F.element_at("e", 7) * F.element_at("e", 7)).alias("s_6_6"),
        F.sum(F.element_at("e", 7) * F.element_at("e", 8)).alias("s_6_7"),
        F.sum(F.element_at("e", 8) * F.element_at("e", 8)).alias("s_7_7"),
    )
    return (
        m.select(
            "n",
            F.explode(
                F.array(
            F.struct(F.lit(0).alias("i"), F.lit(0).alias("j"), (F.col("n") * F.col("s_0_0") - F.col("m_0") * F.col("m_0")).alias("cov_num")),
            F.struct(F.lit(0).alias("i"), F.lit(1).alias("j"), (F.col("n") * F.col("s_0_1") - F.col("m_0") * F.col("m_1")).alias("cov_num")),
            F.struct(F.lit(0).alias("i"), F.lit(2).alias("j"), (F.col("n") * F.col("s_0_2") - F.col("m_0") * F.col("m_2")).alias("cov_num")),
            F.struct(F.lit(0).alias("i"), F.lit(3).alias("j"), (F.col("n") * F.col("s_0_3") - F.col("m_0") * F.col("m_3")).alias("cov_num")),
            F.struct(F.lit(0).alias("i"), F.lit(4).alias("j"), (F.col("n") * F.col("s_0_4") - F.col("m_0") * F.col("m_4")).alias("cov_num")),
            F.struct(F.lit(0).alias("i"), F.lit(5).alias("j"), (F.col("n") * F.col("s_0_5") - F.col("m_0") * F.col("m_5")).alias("cov_num")),
            F.struct(F.lit(0).alias("i"), F.lit(6).alias("j"), (F.col("n") * F.col("s_0_6") - F.col("m_0") * F.col("m_6")).alias("cov_num")),
            F.struct(F.lit(0).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_0_7") - F.col("m_0") * F.col("m_7")).alias("cov_num")),
            F.struct(F.lit(1).alias("i"), F.lit(1).alias("j"), (F.col("n") * F.col("s_1_1") - F.col("m_1") * F.col("m_1")).alias("cov_num")),
            F.struct(F.lit(1).alias("i"), F.lit(2).alias("j"), (F.col("n") * F.col("s_1_2") - F.col("m_1") * F.col("m_2")).alias("cov_num")),
            F.struct(F.lit(1).alias("i"), F.lit(3).alias("j"), (F.col("n") * F.col("s_1_3") - F.col("m_1") * F.col("m_3")).alias("cov_num")),
            F.struct(F.lit(1).alias("i"), F.lit(4).alias("j"), (F.col("n") * F.col("s_1_4") - F.col("m_1") * F.col("m_4")).alias("cov_num")),
            F.struct(F.lit(1).alias("i"), F.lit(5).alias("j"), (F.col("n") * F.col("s_1_5") - F.col("m_1") * F.col("m_5")).alias("cov_num")),
            F.struct(F.lit(1).alias("i"), F.lit(6).alias("j"), (F.col("n") * F.col("s_1_6") - F.col("m_1") * F.col("m_6")).alias("cov_num")),
            F.struct(F.lit(1).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_1_7") - F.col("m_1") * F.col("m_7")).alias("cov_num")),
            F.struct(F.lit(2).alias("i"), F.lit(2).alias("j"), (F.col("n") * F.col("s_2_2") - F.col("m_2") * F.col("m_2")).alias("cov_num")),
            F.struct(F.lit(2).alias("i"), F.lit(3).alias("j"), (F.col("n") * F.col("s_2_3") - F.col("m_2") * F.col("m_3")).alias("cov_num")),
            F.struct(F.lit(2).alias("i"), F.lit(4).alias("j"), (F.col("n") * F.col("s_2_4") - F.col("m_2") * F.col("m_4")).alias("cov_num")),
            F.struct(F.lit(2).alias("i"), F.lit(5).alias("j"), (F.col("n") * F.col("s_2_5") - F.col("m_2") * F.col("m_5")).alias("cov_num")),
            F.struct(F.lit(2).alias("i"), F.lit(6).alias("j"), (F.col("n") * F.col("s_2_6") - F.col("m_2") * F.col("m_6")).alias("cov_num")),
            F.struct(F.lit(2).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_2_7") - F.col("m_2") * F.col("m_7")).alias("cov_num")),
            F.struct(F.lit(3).alias("i"), F.lit(3).alias("j"), (F.col("n") * F.col("s_3_3") - F.col("m_3") * F.col("m_3")).alias("cov_num")),
            F.struct(F.lit(3).alias("i"), F.lit(4).alias("j"), (F.col("n") * F.col("s_3_4") - F.col("m_3") * F.col("m_4")).alias("cov_num")),
            F.struct(F.lit(3).alias("i"), F.lit(5).alias("j"), (F.col("n") * F.col("s_3_5") - F.col("m_3") * F.col("m_5")).alias("cov_num")),
            F.struct(F.lit(3).alias("i"), F.lit(6).alias("j"), (F.col("n") * F.col("s_3_6") - F.col("m_3") * F.col("m_6")).alias("cov_num")),
            F.struct(F.lit(3).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_3_7") - F.col("m_3") * F.col("m_7")).alias("cov_num")),
            F.struct(F.lit(4).alias("i"), F.lit(4).alias("j"), (F.col("n") * F.col("s_4_4") - F.col("m_4") * F.col("m_4")).alias("cov_num")),
            F.struct(F.lit(4).alias("i"), F.lit(5).alias("j"), (F.col("n") * F.col("s_4_5") - F.col("m_4") * F.col("m_5")).alias("cov_num")),
            F.struct(F.lit(4).alias("i"), F.lit(6).alias("j"), (F.col("n") * F.col("s_4_6") - F.col("m_4") * F.col("m_6")).alias("cov_num")),
            F.struct(F.lit(4).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_4_7") - F.col("m_4") * F.col("m_7")).alias("cov_num")),
            F.struct(F.lit(5).alias("i"), F.lit(5).alias("j"), (F.col("n") * F.col("s_5_5") - F.col("m_5") * F.col("m_5")).alias("cov_num")),
            F.struct(F.lit(5).alias("i"), F.lit(6).alias("j"), (F.col("n") * F.col("s_5_6") - F.col("m_5") * F.col("m_6")).alias("cov_num")),
            F.struct(F.lit(5).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_5_7") - F.col("m_5") * F.col("m_7")).alias("cov_num")),
            F.struct(F.lit(6).alias("i"), F.lit(6).alias("j"), (F.col("n") * F.col("s_6_6") - F.col("m_6") * F.col("m_6")).alias("cov_num")),
            F.struct(F.lit(6).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_6_7") - F.col("m_6") * F.col("m_7")).alias("cov_num")),
            F.struct(F.lit(7).alias("i"), F.lit(7).alias("j"), (F.col("n") * F.col("s_7_7") - F.col("m_7") * F.col("m_7")).alias("cov_num"))
                )
            ).alias("p"),
        )
        .select(F.col("p.i").alias("i"), F.col("p.j").alias("j"), "n", F.col("p.cov_num").alias("cov_num"))
        .orderBy("i", "j")
    )


_COV_SQL = """
WITH emb AS (
  SELECT list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS e
  FROM embeddings
),
m AS (
  SELECT count(*) AS n,
         CAST(sum(e[1]) AS BIGINT) AS m_0,
         CAST(sum(e[2]) AS BIGINT) AS m_1,
         CAST(sum(e[3]) AS BIGINT) AS m_2,
         CAST(sum(e[4]) AS BIGINT) AS m_3,
         CAST(sum(e[5]) AS BIGINT) AS m_4,
         CAST(sum(e[6]) AS BIGINT) AS m_5,
         CAST(sum(e[7]) AS BIGINT) AS m_6,
         CAST(sum(e[8]) AS BIGINT) AS m_7,
         CAST(sum(e[1] * e[1]) AS BIGINT) AS s_0_0,
         CAST(sum(e[1] * e[2]) AS BIGINT) AS s_0_1,
         CAST(sum(e[1] * e[3]) AS BIGINT) AS s_0_2,
         CAST(sum(e[1] * e[4]) AS BIGINT) AS s_0_3,
         CAST(sum(e[1] * e[5]) AS BIGINT) AS s_0_4,
         CAST(sum(e[1] * e[6]) AS BIGINT) AS s_0_5,
         CAST(sum(e[1] * e[7]) AS BIGINT) AS s_0_6,
         CAST(sum(e[1] * e[8]) AS BIGINT) AS s_0_7,
         CAST(sum(e[2] * e[2]) AS BIGINT) AS s_1_1,
         CAST(sum(e[2] * e[3]) AS BIGINT) AS s_1_2,
         CAST(sum(e[2] * e[4]) AS BIGINT) AS s_1_3,
         CAST(sum(e[2] * e[5]) AS BIGINT) AS s_1_4,
         CAST(sum(e[2] * e[6]) AS BIGINT) AS s_1_5,
         CAST(sum(e[2] * e[7]) AS BIGINT) AS s_1_6,
         CAST(sum(e[2] * e[8]) AS BIGINT) AS s_1_7,
         CAST(sum(e[3] * e[3]) AS BIGINT) AS s_2_2,
         CAST(sum(e[3] * e[4]) AS BIGINT) AS s_2_3,
         CAST(sum(e[3] * e[5]) AS BIGINT) AS s_2_4,
         CAST(sum(e[3] * e[6]) AS BIGINT) AS s_2_5,
         CAST(sum(e[3] * e[7]) AS BIGINT) AS s_2_6,
         CAST(sum(e[3] * e[8]) AS BIGINT) AS s_2_7,
         CAST(sum(e[4] * e[4]) AS BIGINT) AS s_3_3,
         CAST(sum(e[4] * e[5]) AS BIGINT) AS s_3_4,
         CAST(sum(e[4] * e[6]) AS BIGINT) AS s_3_5,
         CAST(sum(e[4] * e[7]) AS BIGINT) AS s_3_6,
         CAST(sum(e[4] * e[8]) AS BIGINT) AS s_3_7,
         CAST(sum(e[5] * e[5]) AS BIGINT) AS s_4_4,
         CAST(sum(e[5] * e[6]) AS BIGINT) AS s_4_5,
         CAST(sum(e[5] * e[7]) AS BIGINT) AS s_4_6,
         CAST(sum(e[5] * e[8]) AS BIGINT) AS s_4_7,
         CAST(sum(e[6] * e[6]) AS BIGINT) AS s_5_5,
         CAST(sum(e[6] * e[7]) AS BIGINT) AS s_5_6,
         CAST(sum(e[6] * e[8]) AS BIGINT) AS s_5_7,
         CAST(sum(e[7] * e[7]) AS BIGINT) AS s_6_6,
         CAST(sum(e[7] * e[8]) AS BIGINT) AS s_6_7,
         CAST(sum(e[8] * e[8]) AS BIGINT) AS s_7_7
  FROM emb
)
SELECT i, j, CAST(n AS BIGINT) AS n, CAST(cov_num AS BIGINT) AS cov_num
FROM (
  SELECT 0 AS i, 0 AS j, n * s_0_0 - m_0 * m_0 AS cov_num, n FROM m
  UNION ALL
  SELECT 0 AS i, 1 AS j, n * s_0_1 - m_0 * m_1 AS cov_num, n FROM m
  UNION ALL
  SELECT 0 AS i, 2 AS j, n * s_0_2 - m_0 * m_2 AS cov_num, n FROM m
  UNION ALL
  SELECT 0 AS i, 3 AS j, n * s_0_3 - m_0 * m_3 AS cov_num, n FROM m
  UNION ALL
  SELECT 0 AS i, 4 AS j, n * s_0_4 - m_0 * m_4 AS cov_num, n FROM m
  UNION ALL
  SELECT 0 AS i, 5 AS j, n * s_0_5 - m_0 * m_5 AS cov_num, n FROM m
  UNION ALL
  SELECT 0 AS i, 6 AS j, n * s_0_6 - m_0 * m_6 AS cov_num, n FROM m
  UNION ALL
  SELECT 0 AS i, 7 AS j, n * s_0_7 - m_0 * m_7 AS cov_num, n FROM m
  UNION ALL
  SELECT 1 AS i, 1 AS j, n * s_1_1 - m_1 * m_1 AS cov_num, n FROM m
  UNION ALL
  SELECT 1 AS i, 2 AS j, n * s_1_2 - m_1 * m_2 AS cov_num, n FROM m
  UNION ALL
  SELECT 1 AS i, 3 AS j, n * s_1_3 - m_1 * m_3 AS cov_num, n FROM m
  UNION ALL
  SELECT 1 AS i, 4 AS j, n * s_1_4 - m_1 * m_4 AS cov_num, n FROM m
  UNION ALL
  SELECT 1 AS i, 5 AS j, n * s_1_5 - m_1 * m_5 AS cov_num, n FROM m
  UNION ALL
  SELECT 1 AS i, 6 AS j, n * s_1_6 - m_1 * m_6 AS cov_num, n FROM m
  UNION ALL
  SELECT 1 AS i, 7 AS j, n * s_1_7 - m_1 * m_7 AS cov_num, n FROM m
  UNION ALL
  SELECT 2 AS i, 2 AS j, n * s_2_2 - m_2 * m_2 AS cov_num, n FROM m
  UNION ALL
  SELECT 2 AS i, 3 AS j, n * s_2_3 - m_2 * m_3 AS cov_num, n FROM m
  UNION ALL
  SELECT 2 AS i, 4 AS j, n * s_2_4 - m_2 * m_4 AS cov_num, n FROM m
  UNION ALL
  SELECT 2 AS i, 5 AS j, n * s_2_5 - m_2 * m_5 AS cov_num, n FROM m
  UNION ALL
  SELECT 2 AS i, 6 AS j, n * s_2_6 - m_2 * m_6 AS cov_num, n FROM m
  UNION ALL
  SELECT 2 AS i, 7 AS j, n * s_2_7 - m_2 * m_7 AS cov_num, n FROM m
  UNION ALL
  SELECT 3 AS i, 3 AS j, n * s_3_3 - m_3 * m_3 AS cov_num, n FROM m
  UNION ALL
  SELECT 3 AS i, 4 AS j, n * s_3_4 - m_3 * m_4 AS cov_num, n FROM m
  UNION ALL
  SELECT 3 AS i, 5 AS j, n * s_3_5 - m_3 * m_5 AS cov_num, n FROM m
  UNION ALL
  SELECT 3 AS i, 6 AS j, n * s_3_6 - m_3 * m_6 AS cov_num, n FROM m
  UNION ALL
  SELECT 3 AS i, 7 AS j, n * s_3_7 - m_3 * m_7 AS cov_num, n FROM m
  UNION ALL
  SELECT 4 AS i, 4 AS j, n * s_4_4 - m_4 * m_4 AS cov_num, n FROM m
  UNION ALL
  SELECT 4 AS i, 5 AS j, n * s_4_5 - m_4 * m_5 AS cov_num, n FROM m
  UNION ALL
  SELECT 4 AS i, 6 AS j, n * s_4_6 - m_4 * m_6 AS cov_num, n FROM m
  UNION ALL
  SELECT 4 AS i, 7 AS j, n * s_4_7 - m_4 * m_7 AS cov_num, n FROM m
  UNION ALL
  SELECT 5 AS i, 5 AS j, n * s_5_5 - m_5 * m_5 AS cov_num, n FROM m
  UNION ALL
  SELECT 5 AS i, 6 AS j, n * s_5_6 - m_5 * m_6 AS cov_num, n FROM m
  UNION ALL
  SELECT 5 AS i, 7 AS j, n * s_5_7 - m_5 * m_7 AS cov_num, n FROM m
  UNION ALL
  SELECT 6 AS i, 6 AS j, n * s_6_6 - m_6 * m_6 AS cov_num, n FROM m
  UNION ALL
  SELECT 6 AS i, 7 AS j, n * s_6_7 - m_6 * m_7 AS cov_num, n FROM m
  UNION ALL
  SELECT 7 AS i, 7 AS j, n * s_7_7 - m_7 * m_7 AS cov_num, n FROM m
)
ORDER BY i, j
"""


# ---------------------------------------------------------------------------
# preference_pair_construction — DPO/RLHF preference-pair assembly: the
# data-prep step that turns a scored candidate pool into (chosen,
# rejected) training pairs. Candidates are grouped by prompt key (here
# lang x length-bucket, the way response pools group by prompt id),
# scored with an integer-grid type-token-ratio quality (uniq_tokens *
# 1e6 DIV tokens — exact integer arithmetic, so both engines agree
# bit-for-bit), and each group emits its best-vs-worst pair with a
# positive-margin gate (ties produce no pair — a zero-margin pair is
# noise to a DPO loss). Tie-breaks inside a rank are deterministic on
# doc_id.
# Scale: one map-side tokenize + ONE exchange on the group key (both
# window sorts and the final groupBy reuse the same hash partitioning);
# output is |groups| rows. No self-join — the naive pairing formulation
# (candidates x candidates per prompt) is replaced by two rank-1
# windows, which is how this survives prompt pools of any size.
# ---------------------------------------------------------------------------


def preference_pair_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.expr("n_chars div 200").cast("long").alias("len_bucket"),
        F.expr(
            "CAST(CAST(size(array_distinct(split(trim(text), '\\\\s+'))) AS BIGINT)"
            " * 1000000 div size(split(trim(text), '\\\\s+')) AS BIGINT)"
        ).alias("q_ppm"),
    )
    grp = W.partitionBy("lang", "len_bucket")
    ranked = scored.select(
        "lang",
        "len_bucket",
        "doc_id",
        "q_ppm",
        F.row_number()
        .over(grp.orderBy(F.desc("q_ppm"), F.asc("doc_id")))
        .alias("rn_best"),
        F.row_number()
        .over(grp.orderBy(F.asc("q_ppm"), F.asc("doc_id")))
        .alias("rn_worst"),
    )
    pairs = ranked.groupBy("lang", "len_bucket").agg(
        F.count("*").alias("n_candidates"),
        F.max(F.when(F.col("rn_best") == 1, F.col("doc_id"))).alias("chosen_id"),
        F.max(F.when(F.col("rn_best") == 1, F.col("q_ppm"))).alias("chosen_q_ppm"),
        F.max(F.when(F.col("rn_worst") == 1, F.col("doc_id"))).alias("rejected_id"),
        F.max(F.when(F.col("rn_worst") == 1, F.col("q_ppm"))).alias("rejected_q_ppm"),
    )
    return (
        pairs.filter(
            (F.col("n_candidates") >= 2)
            & (F.col("chosen_q_ppm") > F.col("rejected_q_ppm"))
        )
        .select(
            "lang",
            "len_bucket",
            "n_candidates",
            "chosen_id",
            "rejected_id",
            "chosen_q_ppm",
            "rejected_q_ppm",
            (F.col("chosen_q_ppm") - F.col("rejected_q_ppm")).alias("margin_ppm"),
        )
        .orderBy("lang", "len_bucket")
    )


_PREF_PAIR_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
         n_chars // 200 AS len_bucket,
         CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
              * 1000000
              // len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS q_ppm
  FROM documents
),
ranked AS (
  SELECT lang, len_bucket, doc_id, q_ppm,
         row_number() OVER (PARTITION BY lang, len_bucket
                            ORDER BY q_ppm DESC, doc_id ASC) AS rn_best,
         row_number() OVER (PARTITION BY lang, len_bucket
                            ORDER BY q_ppm ASC, doc_id ASC) AS rn_worst
  FROM scored
),
pairs AS (
  SELECT lang, len_bucket,
         count(*) AS n_candidates,
         max(CASE WHEN rn_best = 1 THEN doc_id END) AS chosen_id,
         max(CASE WHEN rn_best = 1 THEN q_ppm END) AS chosen_q_ppm,
         max(CASE WHEN rn_worst = 1 THEN doc_id END) AS rejected_id,
         max(CASE WHEN rn_worst = 1 THEN q_ppm END) AS rejected_q_ppm
  FROM ranked
  GROUP BY 1, 2
)
SELECT lang, len_bucket, n_candidates, chosen_id, rejected_id,
       chosen_q_ppm, rejected_q_ppm,
       chosen_q_ppm - rejected_q_ppm AS margin_ppm
FROM pairs
WHERE n_candidates >= 2 AND chosen_q_ppm > rejected_q_ppm
ORDER BY lang, len_bucket
"""


QUERIES = {
    "ml_fold_assignment": ml_fold_assignment,
    "preference_pair_construction": preference_pair_construction,
    "ml_feature_stats": ml_feature_stats,
    "kmeans_lloyd_embeddings": kmeans_lloyd_embeddings,
    "ml_group_ols_trend": ml_group_ols_trend,
    "embedding_covariance_pca": embedding_covariance_pca,
}

ORACLES = {
    "ml_fold_assignment": _FOLD_SQL,
    "preference_pair_construction": _PREF_PAIR_SQL,
    "ml_feature_stats": _STATS_SQL,
    "kmeans_lloyd_embeddings": _KMEANS_SQL,
    "ml_group_ols_trend": _OLS_SQL,
    "embedding_covariance_pca": _COV_SQL,
}
