"""As-of join + cube queries (time-series/point-in-time extension).

The reference has no joins (SURVEY.md §2.6); asof_join is the planned
custom time-series operator (SURVEY.md §7.1's "custom operators"
bucket: composition of existing DataFrame ops). DuckDB ships a native
ASOF JOIN, giving an exact oracle for our union+window formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.asof import asof_join
from etl_ml_pipeline_spark.queries.tables import t


def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent purchase at-or-before it.

    Scale note: one shuffle on user_id (the window partition); no range
    join. ~40% of clicks precede any purchase -> NULL match (LEFT asof).
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="ts", by="user_id", value_cols=["value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("click_ts"),
        F.round("value", 2).alias("click_value"),
        F.col("ts_right").cast("string").alias("purchase_ts"),
        F.round("value_right", 2).alias("purchase_value"),
    ).orderBy("event_id")


_ASOF_SQL = """
SELECT c.event_id,
       c.user_id,
       CAST(c.ts AS VARCHAR) AS click_ts,
       round(c.value, 2) AS click_value,
       CAST(p.ts AS VARCHAR) AS purchase_ts,
       round(p.value, 2) AS purchase_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


def asof_tolerance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 1-hour tolerance: stale matches dropped.

    Aggregated to matched/unmatched counts per user bucket so the result
    is compact at any sf while still pinning tolerance semantics.
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="ts", by="user_id",
        value_cols=["value"], tolerance=3600.0,
    )
    return (
        joined.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count("*").alias("n_clicks"),
            F.count("value_right").alias("n_matched"),
            F.round(F.sum("value_right"), 2).alias("sum_matched_value"),
        )
        .orderBy("user_bucket")
    )


_ASOF_TOL_SQL = """
SELECT user_id % 10 AS user_bucket,
       count(*) AS n_clicks,
       count(matched_value) AS n_matched,
       round(sum(matched_value), 2) AS sum_matched_value
FROM (
  SELECT c.event_id, c.user_id,
         CASE WHEN p.ts IS NOT NULL
                   AND epoch(c.ts) - epoch(p.ts) <= 3600
              THEN p.value END AS matched_value
  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ASOF LEFT JOIN
       (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id AND c.ts >= p.ts
)
GROUP BY user_id % 10
ORDER BY user_bucket
"""


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations.

    Complements rollup_order_stats (hierarchical); cube adds the
    priority-only and grand-total slices. Same one-pass expand+agg plan.
    """
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(avg(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# range_join_purchase_context — tolerance-window (interval) join via
# BANDING: clicks within ±10 min of each purchase by the same user.
# A raw BETWEEN predicate plans as a per-key cross product
# (BroadcastNestedLoop) — quadratic and fatal at scale; the banded
# operator buckets time into tolerance-sized bins and equi-joins on
# (user, bin) with the exact tolerance as a residual filter: ONE
# shuffle, linear in matches (operators/asof.py::banded_interval_join).
# The DuckDB oracle uses the naive inequality join — fine at oracle
# scale, and semantically identical.
# ---------------------------------------------------------------------------


def range_join_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.asof import banded_interval_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = banded_interval_join(
        purchases, clicks, by="user_id", ts="ts", tolerance_seconds=600
    )
    return (
        pairs.groupBy("event_id")
        .agg(
            F.count("*").alias("n_clicks"),
            F.round(F.sum("value_right"), 2).alias("click_value"),
        )
        .orderBy("event_id")
    )


_RANGE_JOIN_SQL = """
SELECT p.event_id,
       count(*) AS n_clicks,
       round(sum(c.value), 2) AS click_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND abs(CAST(floor(epoch(p.ts)) AS BIGINT)
         - CAST(floor(epoch(c.ts)) AS BIGINT)) <= 600
GROUP BY p.event_id
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# attribution_linear_events — linear multi-touch attribution: each
# purchase's value splits equally across the user's clicks in the
# preceding 24 hours; per click-day we report touches, credited
# revenue, and the undistributed remainder. Exactness: the split is
# integer micro-cents (cents * 1e6 div n_touches) so credits are
# bit-stable and the remainder (cents*1e6 - n*credit) accounts for
# every micro-cent — credited + remainder == total by construction.
# Scale: one per-user interval join (purchase x its bounded 24h click
# window — the range_join_purchase_context shape), then a day rollup.
# ---------------------------------------------------------------------------


def attribution_linear_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    touched = purchases.join(clicks, "user_id").filter(
        (F.col("click_ts") <= F.col("p_ts"))
        & (F.col("click_ts") > F.col("p_ts") - F.expr("INTERVAL 24 HOURS"))
    )
    per_p = touched.groupBy("p_id", "p_ts", "cents").agg(
        F.count("*").alias("n_touches")
    )
    credit = F.expr("cents * 1000000 div n_touches")
    credited = touched.join(
        per_p.select("p_id", "n_touches"), "p_id"
    ).select(
        F.to_date("click_ts").cast("string").alias("day"),
        credit.alias("credit_micro"),
    )
    leftover = per_p.select(
        F.to_date("p_ts").cast("string").alias("day"),
        (
            F.col("cents") * 1000000 - F.col("n_touches") * credit
        ).alias("rem_micro"),
    )
    return (
        credited.groupBy("day")
        .agg(
            F.count("*").alias("n_touches"),
            (F.sum("credit_micro") / 100000000.0).alias("credited_revenue"),
        )
        .join(
            leftover.groupBy("day").agg(
                (F.sum("rem_micro") / 100000000.0).alias("remainder_revenue")
            ),
            "day",
            "full_outer",
        )
        .fillna({"n_touches": 0, "credited_revenue": 0.0, "remainder_revenue": 0.0})
        .orderBy("day")
    )


_ATTRIBUTION_SQL = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, event_id AS p_id, ts AS p_ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
touched AS (
  SELECT p.p_id, p.p_ts, p.cents, c.click_ts
  FROM purchases p JOIN clicks c USING (user_id)
  WHERE c.click_ts <= p.p_ts AND c.click_ts > p.p_ts - INTERVAL 24 HOURS
),
per_p AS (
  SELECT p_id, p_ts, cents, count(*) AS n_touches
  FROM touched GROUP BY 1, 2, 3
),
credited AS (
  SELECT CAST(CAST(t.click_ts AS DATE) AS VARCHAR) AS day,
         p.cents * 1000000 // p.n_touches AS credit_micro
  FROM touched t JOIN per_p p USING (p_id)
),
leftover AS (
  SELECT CAST(CAST(p_ts AS DATE) AS VARCHAR) AS day,
         cents * 1000000 - n_touches * (cents * 1000000 // n_touches)
           AS rem_micro
  FROM per_p
)
SELECT coalesce(c.day, l.day) AS day,
       coalesce(c.n_touches, 0) AS n_touches,
       coalesce(c.credited_revenue, 0.0) AS credited_revenue,
       coalesce(l.remainder_revenue, 0.0) AS remainder_revenue
FROM (SELECT day, CAST(count(*) AS BIGINT) AS n_touches,
             CAST(sum(credit_micro) AS DOUBLE) / 100000000.0
               AS credited_revenue
      FROM credited GROUP BY day) c
FULL OUTER JOIN (SELECT day, CAST(sum(rem_micro) AS DOUBLE) / 100000000.0
                        AS remainder_revenue
                 FROM leftover GROUP BY day) l
  ON c.day = l.day
ORDER BY day
"""


QUERIES = {
    "attribution_linear_events": attribution_linear_events,
    "asof_click_purchase": asof_click_purchase,
    "range_join_purchase_context": range_join_purchase_context,
    "asof_tolerance_counts": asof_tolerance_counts,
    "cube_status_priority": cube_status_priority,
}

ORACLES = {
    "attribution_linear_events": _ATTRIBUTION_SQL,
    "asof_click_purchase": _ASOF_SQL,
    "range_join_purchase_context": _RANGE_JOIN_SQL,
    "asof_tolerance_counts": _ASOF_TOL_SQL,
    "cube_status_priority": _CUBE_SQL,
}
