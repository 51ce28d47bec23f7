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


QUERIES = {
    "ml_fold_assignment": ml_fold_assignment,
    "ml_feature_stats": ml_feature_stats,
}

ORACLES = {
    "ml_fold_assignment": _FOLD_SQL,
    "ml_feature_stats": _STATS_SQL,
}
