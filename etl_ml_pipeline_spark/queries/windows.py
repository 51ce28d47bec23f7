"""Window-function queries: ranking, analytic, and frame aggregates.

The reference has no window functions (SURVEY.md §2.6); these are the
Spark-native extension. Scale posture: every window here is partitioned
by a high-cardinality key (customer/nation) — work distributes across
executors with one shuffle on the partition key and a per-partition
sort; there are no global single-partition windows except the quartile
query, which documents its scalable alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.queries.tables import t


def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number, deterministic tiebreak).

    Scale: the canonical distributed top-k — shuffle on o_custkey, sort
    within partition, early-stop at k. No global sort.
    """
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "rk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_custkey", "rk")
    )


_TOPK_SQL = """
SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
ORDER BY o_custkey, rk
"""


def window_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile within nation by account balance."""
    supp = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        F.round("s_acctbal", 2).alias("s_acctbal"),
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))).alias(
            "bal_quartile"
        ),
    ).orderBy("s_nationkey", "bal_rank", "s_suppkey")


_RANK_SQL = """
SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS s_acctbal,
       rank()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_rank,
       dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_dense_rank,
       ntile(4)     OVER (PARTITION BY s_nationkey
                          ORDER BY s_acctbal DESC, s_suppkey ASC) AS bal_quartile
FROM supplier
ORDER BY s_nationkey, bal_rank, s_suppkey
"""


def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order cadence: previous/next order and gap in days."""
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("d"),
            F.lag(F.col("o_orderdate").cast("date")).over(w).alias("prev_d"),
            F.lead(F.col("o_orderdate").cast("date")).over(w).alias("next_d"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("d").cast("string").alias("orderdate"),
            F.datediff("d", "prev_d").alias("days_since_prev"),
            F.datediff("next_d", "d").alias("days_until_next"),
        )
        .orderBy("o_custkey", "orderdate", "o_orderkey")
    )


_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(d AS VARCHAR) AS orderdate,
       CAST(datediff('day', prev_d, d) AS INT) AS days_since_prev,
       CAST(datediff('day', d, next_d) AS INT) AS days_until_next
FROM (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
         lag(CAST(o_orderdate AS DATE))  OVER w AS prev_d,
         lead(CAST(o_orderdate AS DATE)) OVER w AS next_d
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
ORDER BY o_custkey, orderdate, o_orderkey
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (rows unbounded-preceding frame)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
            F.count("*").over(w).alias("n_orders_so_far"),
            # avg derived from the rounded sum (bit-identical across
            # engines), truncated with floor: round() tie-breaking differs
            # between engines on exact .xxxx5 quotients (e.g. sum/8),
            # floor is implementation-independent.
            (
                F.floor(
                    F.round(F.sum("o_totalprice").over(w), 2)
                    / F.count("*").over(w)
                    * 10000
                )
                / 10000
            ).alias("avg_spend_so_far"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w, 2) AS cum_spend,
       count(*) OVER w AS n_orders_so_far,
       floor(round(sum(o_totalprice) OVER w, 2) / (count(*) OVER w) * 10000) / 10000 AS avg_spend_so_far
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
"""


def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over the full partition frame."""
    orders = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            F.last("o_orderkey").over(w).alias("last_orderkey"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


_FIRSTLAST_SQL = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_orderkey,
       last_value(o_orderkey)  OVER w AS last_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_custkey, o_orderkey
"""


def window_quartile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global price quartiles -> per-quartile stats.

    Scale: global ordering via the two-phase distributed rank
    (operators.relational.global_row_number — range repartition, local
    windows, offset join), NOT a bare ntile() window, which moves every
    row to a single task. ntile(k) is then pure arithmetic on the exact
    rank: the first N%k tiles get floor(N/k)+1 rows — same output,
    parallel plan.
    """
    from etl_ml_pipeline_spark.operators.relational import global_row_number

    orders = t(spark, sf_dir, "orders")
    ranked = global_row_number(orders, ["o_totalprice", "o_orderkey"], "rn")
    n_total = ranked.groupBy().agg(F.count("*").alias("__n"))
    k = 4
    big = F.col("__n") % k  # tiles 1..big have size+1 rows (ntile semantics)
    size = F.floor(F.col("__n") / k)
    rn = F.col("rn")
    quartile = F.when(
        rn <= big * (size + 1), F.ceil(rn / (size + 1))
    ).otherwise(big + F.ceil((rn - big * (size + 1)) / size))
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn("quartile", quartile.cast("int"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("quartile")
    )


_QUARTILE_SQL = """
SELECT quartile,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       round(avg(o_totalprice), 4) AS avg_price
FROM (
  SELECT o_totalprice,
         ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
  FROM orders
)
GROUP BY quartile
ORDER BY quartile
"""


# ---------------------------------------------------------------------------
# window_dist_functions — distribution window functions (percent_rank,
# cume_dist) over supplier balances within nation. Both derive from
# exact integer rank/count arithmetic ((rank-1)/(n-1), rank_hi/n), so
# the doubles are bit-identical cross-engine; truncation is belt and
# braces. One shuffle on the partition key, sort within partitions.
# ---------------------------------------------------------------------------


def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        (F.floor(F.percent_rank().over(w) * 10000) / 10000).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * 10000) / 10000).alias("cume"),
    ).orderBy("s_suppkey")


_DIST_SQL = """
SELECT s_suppkey, s_nationkey,
       round(s_acctbal, 2) AS acctbal,
       floor(percent_rank() OVER w * 10000) / 10000 AS pct_rank,
       floor(cume_dist()   OVER w * 10000) / 10000 AS cume
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
ORDER BY s_suppkey
"""




# ---------------------------------------------------------------------------
# window_mom_revenue_growth — month-over-month revenue growth per order
# priority: monthly revenue sums, then lag(1) within each priority's
# month series and the growth ratio from the two ALREADY-ROUNDED sums
# (identical doubles both engines; floor truncation belt-and-braces —
# the derived-ratio rule from the verify notes). The period-over-period
# shape every BI layer asks of an engine.
# Scale: one groupBy shuffle to month granularity (output is
# months x priorities — tiny at any input scale), then a window over
# that aggregate, not over raw orders.
# ---------------------------------------------------------------------------


def window_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = W.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        monthly.withColumn("prev_revenue", prev)
        .withColumn(
            "growth_pct",
            F.when(
                prev > 0,
                F.floor((F.col("revenue") - prev) / prev * 100 * 100) / 100,
            ),
        )
        .orderBy("o_orderpriority", "month")
    )


_MOM_SQL = """
WITH monthly AS (
  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month, revenue,
       lag(revenue) OVER w AS prev_revenue,
       CASE WHEN lag(revenue) OVER w > 0
            THEN floor((revenue - lag(revenue) OVER w)
                       / lag(revenue) OVER w * 100 * 100) / 100
       END AS growth_pct
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
ORDER BY o_orderpriority, month
"""


# ---------------------------------------------------------------------------
# window_activity_streaks — gaps-and-islands: longest run of CONSECUTIVE
# active days per user (the retention-streak metric), via the classic
# day_ordinal - row_number island key. Everything is integer day
# arithmetic; one shuffle on user_id, per-user windows over the
# distinct-day grid (|active days| rows, never |events|).
# ---------------------------------------------------------------------------


def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    days = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("od"),
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("od")
    islands = days.withColumn(
        "grp", F.col("od") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count("*").alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.max("len").alias("longest_streak"),
            F.count("*").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS od
  FROM events WHERE user_id < 200
),
islands AS (
  SELECT user_id, od,
         od - row_number() OVER (PARTITION BY user_id ORDER BY od) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, count(*) AS len FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "window_activity_streaks": window_activity_streaks,
    "window_dist_functions": window_dist_functions,
    "window_mom_revenue_growth": window_mom_revenue_growth,
    "window_topk_orders_per_customer": window_topk_orders_per_customer,
    "window_rank_suppliers": window_rank_suppliers,
    "window_lag_lead_orders": window_lag_lead_orders,
    "window_running_total": window_running_total,
    "window_first_last": window_first_last,
    "window_quartile_stats": window_quartile_stats,
}

ORACLES = {
    "window_activity_streaks": _STREAKS_SQL,
    "window_dist_functions": _DIST_SQL,
    "window_mom_revenue_growth": _MOM_SQL,
    "window_topk_orders_per_customer": _TOPK_SQL,
    "window_rank_suppliers": _RANK_SQL,
    "window_lag_lead_orders": _LAG_SQL,
    "window_running_total": _RUNNING_SQL,
    "window_first_last": _FIRSTLAST_SQL,
    "window_quartile_stats": _QUARTILE_SQL,
}
