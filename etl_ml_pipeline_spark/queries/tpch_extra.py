"""Remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q10/Q11/Q13/Q15/Q21 analogs),
adapted to the driver schema (no partsupp/commitdate/shipmode — the
part-supplier relation is derived from lineitem, "late" is defined against
o_orderdate).

The reference has no relational surface (SURVEY.md §2.6); these complete
the classic decorrelation/join-topology catalog the way Catalyst wants it:

- correlated MIN subquery (Q2)  -> window min over the group, filter ==
- region-gated nation-pair joins (Q7/Q8)  -> broadcast dims, one fact shuffle
- scalar-subquery thresholds (Q11/Q15)   -> 1-row aggregate broadcast join
- left-outer count histogram (Q13)       -> two-level aggregation
- multi-EXISTS self-probe (Q21)          -> single per-order aggregate with
  conditional count-distinct instead of two correlated probes

Cross-engine float parity: every aggregate is rounded identically on both
sides before any comparison/ordering; ratios derive from already-rounded
sums with floor-truncation (Spark rounds HALF_UP, DuckDB nearest-even).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ml_pipeline_spark.queries.tables import dim, maybe_broadcast, t


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# q2_min_cost_supplier — TPC-H Q2 analog (correlated MIN subquery).
# For each small part, the supplier(s) with the cheapest total supply value
# in lineitem. The correlated `min(...) WHERE partkey = p_partkey` becomes
# a window MIN over the (partkey, suppkey) aggregate — the aggregate and
# the argmin selection share ONE shuffle on partkey instead of a second
# self-join pass. At 100 TB: lineitem pre-aggregates map-side to
# |part|x|supp| pairs before the exchange; part and supplier broadcast.
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    s = t(spark, sf_dir, "supplier")
    per_ps = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum(_rev()), 4).alias("supply_value"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        per_ps.withColumn("min_value", F.min("supply_value").over(w))
        .filter(F.col("supply_value") == F.col("min_value"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "s_name",
            "supply_value",
        )
        .orderBy("partkey", "s_name")
    )


_Q2_SQL = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS supply_value
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size < 10
  GROUP BY l_partkey, l_suppkey
)
SELECT l_partkey AS partkey, s_name, supply_value
FROM per_ps JOIN supplier ON l_suppkey = s_suppkey
WHERE supply_value = (SELECT min(supply_value) FROM per_ps i
                      WHERE i.l_partkey = per_ps.l_partkey)
ORDER BY partkey, s_name
"""


# ---------------------------------------------------------------------------
# q7_nation_volume — TPC-H Q7 analog (nation-pair shipping volume).
# Revenue flowing between NATION_1 and NATION_2 in either direction, by
# year. Five-way join where every dimension (supplier, customer, nation)
# broadcasts; lineitem->orders is the only big-big join, shuffled once on
# orderkey. The disjunctive nation-pair predicate is a residual on the
# joined row — but the IN-list conjuncts it implies push into the dim scans.
# ---------------------------------------------------------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n1 = ("NATION_1", "NATION_2")
    c = (
        t(spark, sf_dir, "customer")
        .join(
            dim(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin(*n1))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            dim(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin(*n1))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    return (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 4) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q8_market_share — TPC-H Q8 analog (share-of-total conditional agg).
# NATION_3 suppliers' share of PROMO-part revenue sold to region-0
# customers, per order year. Numerator and denominator come out of ONE
# aggregation pass (CASE inside sum); share derives from the two rounded
# sums with floor-truncation for cross-engine parity.
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    region_nations = (
        t(spark, sf_dir, "nation")
        .join(
            maybe_broadcast(t(spark, sf_dir, "region").filter(F.col("r_name") == "REGION_0"), sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(region_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            dim(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = _rev()
    agg = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == F.col("c_custkey"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)), 4
            ).alias("nation_revenue"),
            F.round(F.sum(vol), 4).alias("total_revenue"),
        )
    )
    share = F.col("nation_revenue") / F.col("total_revenue") * 100.0
    return agg.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        (F.floor(share * 100) / 100).alias("mkt_share_pct"),
    ).orderBy("o_year")


_Q8_SQL = """
SELECT o_year, nation_revenue, total_revenue,
       floor(nation_revenue / total_revenue * 100.0 * 100) / 100 AS mkt_share_pct
FROM (
  SELECT year(o_orderdate) AS o_year,
         round(sum(CASE WHEN ns.n_name = 'NATION_3'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END), 4) AS nation_revenue,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'REGION_0'
  GROUP BY year(o_orderdate)
) a
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q9_product_profit — TPC-H Q9 analog (profit by supplier nation x year).
# No partsupp => supply cost is modeled as 10% of p_retailprice per unit.
# part is pre-filtered (ECONOMY) then broadcast; lineitem->orders is the
# one big shuffle. Profit expression folds entirely into the map side —
# the exchange carries (nation, year, partial sum) only.
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey", "p_retailprice")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            dim(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    # The profit expression has <=4 true decimal places (2dp prices x 2dp
    # discounts), so summing in decimal(18,6) is exact and order-independent
    # — double summation order differs between engines and (here) lands a
    # group exactly on a half-cent rounding boundary.
    amount = (_rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")).cast(
        "decimal(18,6)"
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - 0.1 * p_retailprice * l_quantity
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q10_returned_revenue — TPC-H Q10 analog (top-20 by revenue with dims).
# Returned-line revenue per customer for orders placed in 1996H2. The
# aggregation keys on custkey only; the name/balance/nation columns ride
# along via a post-agg broadcast join against customer (cheaper than
# carrying wide rows through the shuffle). Deterministic top-k: revenue
# DESC with custkey tiebreak.
# ---------------------------------------------------------------------------


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    per_cust = (
        li.join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )
    return (
        per_cust.join(maybe_broadcast(c, sf_dir, "customer"), F.col("o_custkey") == c.c_custkey)
        .join(maybe_broadcast(n, sf_dir, "nation"), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, revenue, round(c_acctbal, 2) AS acctbal, n_name
FROM (
  SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-07-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY o_custkey
) r
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q11_important_value — TPC-H Q11 analog (HAVING over a global scalar
# subquery). Per-part value of NATION_5-supplied lines, keeping parts
# whose value exceeds 0.1% of the grand total. The scalar total is a
# 1-row aggregate cross-broadcast into the filter — no second scan of the
# fact table (the per-part aggregate is reused for the total via a
# self-aggregation of the small grouped result, not the raw lineitem).
# ---------------------------------------------------------------------------


def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = (
        t(spark, sf_dir, "supplier")
        .join(
            dim(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_5")
        .select("s_suppkey")
    )
    per_part = (
        li.join(maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("raw_value"))
    )
    # r16 (VERDICT r15 #1): the r15 unpartitioned window forced the
    # whole per-part frame through ONE task, and |parts| SCALES WITH
    # THE DATA (~2e10 rows at TPC-H SF 100k) — the exact shape q22
    # correctly refuses. Pin the grouped frame once with a lazy
    # localCheckpoint (both consumers read the materialization — no
    # diamond re-deriving the lineitem join+aggregate), compute the
    # scalar as a PLAIN aggregate of the pin (partial aggregation ⇒
    # O(#tasks) bytes to the final reduce, never |parts| rows in one
    # task), and broadcast-crossJoin the 1-row total back. Still ONE
    # fact pass; no data-scaled single partition. Oracle re-proves the
    # filter boolean cross-engine at sf0.001/0.01/0.1.
    per_part = per_part.localCheckpoint(eager=False)
    total = per_part.agg(F.sum("raw_value").alias("grand_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > 0.001 * F.col("grand_total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("raw_value", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS raw_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, round(raw_value, 2) AS part_value
FROM per_part
WHERE raw_value > 0.001 * (SELECT sum(raw_value) FROM per_part)
ORDER BY part_value DESC, partkey
"""


# ---------------------------------------------------------------------------
# q13_order_histogram — TPC-H Q13 analog (left-outer count histogram).
# Two-level aggregation: orders-per-customer (left outer so zero-order
# customers survive with count 0), then customers-per-order-count. The
# orders side is filtered (non-urgent) and projected to the join key
# before the shuffle. Level-2 input is |customer|-sized — trivially
# re-shuffled at any scale.
# ---------------------------------------------------------------------------


def q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_custkey) AS c_count
  FROM customer
  LEFT OUTER JOIN (SELECT o_custkey FROM orders
                   WHERE o_orderpriority <> '1-URGENT') o
    ON c_custkey = o_custkey
  GROUP BY c_custkey
) a
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15 analog (view + scalar MAX subquery).
# Supplier revenue for 1996Q1; return the supplier(s) achieving the max.
# The revenue "view" is computed once and reused for both the max and the
# final filter (Spark: same DataFrame object; the 1-row max broadcasts
# into the filter). Comparison happens on identically-rounded values.
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 4).alias("total_revenue"))
    )
    # r16 (VERDICT r15 #1): the r15 unpartitioned window forced the
    # whole revenue frame through ONE task, and |suppliers| SCALES WITH
    # THE DATA (~1e9 rows at TPC-H SF 100k). Pin the grouped frame once
    # (lazy localCheckpoint — both consumers read the materialization),
    # take the max as a PLAIN aggregate of the pin (partial aggregation
    # ⇒ O(#tasks) bytes to the final reduce), broadcast-crossJoin the
    # 1-row max back. Still ONE fact pass; no data-scaled single
    # partition. Max over the same rounded doubles is order-free —
    # identical equality filter.
    s = t(spark, sf_dir, "supplier")
    revenue = revenue.localCheckpoint(eager=False)
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q21_waiting_supplier — TPC-H Q21 analog (EXISTS + NOT EXISTS self-probe).
# Suppliers who were the SOLE late supplier on a multi-supplier order
# ("late" = shipped >100 days after order date). The two correlated
# probes (another supplier exists / no other supplier was late) collapse
# into ONE per-order aggregate: count(distinct suppkey) and
# count(distinct suppkey if late) — one shuffle on orderkey instead of
# two self-joins of lineitem, which is the difference between 1 and 3
# fact-table shuffles at 100 TB.
# ---------------------------------------------------------------------------


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"),
        )
    )
    # Reduce to per-(order, supplier) FIRST: ONE lineitem-scale
    # map-side-combined shuffle replaces (a) the double countDistinct —
    # whose Expand doubles every row through the aggregate shuffle —
    # and (b) the separate lineitem-scale distinct() for the sole-late
    # pass; everything after dos is (order x supplier)-cardinality.
    # n_supp == countDistinct(l_suppkey) and n_late_supp ==
    # countDistinct(when(is_late, l_suppkey)) exactly, because dos has
    # one row per (order, supplier) with any_late = max(is_late).
    # Round-9 A/B at sf0.1: medians 1.31s -> 1.01s, identical rows.
    dos = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("any_late")
    )
    per_order = dos.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
    )
    sole = (
        dos.filter(F.col("any_late") == 1)
        .select("l_orderkey", F.col("l_suppkey").alias("late_suppkey"))
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
    )
    s = t(spark, sf_dir, "supplier")
    # Reduce on the join key FIRST (order-count rows collapse to one row
    # per supplier before anything is joined), then re-aggregate by
    # s_name after the broadcast join: TPC-H Q21's group key is the
    # supplier NAME, which is not necessarily unique per suppkey, and
    # the second aggregate runs over supplier-cardinality rows — free.
    return (
        sole.groupBy("late_suppkey")
        .agg(F.count("*").alias("per_supp_wait"))
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("late_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("per_supp_wait").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


_Q21_SQL = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 100 DAY) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM li GROUP BY l_orderkey
),
sole AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey AS late_suppkey
  FROM li
  JOIN per_order ON li.l_orderkey = per_order.l_orderkey
  WHERE li.is_late AND n_supp >= 2 AND n_late_supp = 1
)
SELECT s_name, count(*) AS numwait
FROM sole JOIN supplier ON late_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# ---------------------------------------------------------------------------
# q16_supplier_cnt — TPC-H Q16 analog (NOT IN + grouped count-distinct).
# Distinct suppliers per (brand, type, size) bucket, excluding one brand
# and excluding "complaint" suppliers (negative balance — the schema's
# stand-in for the comment LIKE filter). NOT IN compiles to a broadcast
# LEFT ANTI join on suppkey; the count-distinct runs on the already-
# reduced (brand,type,size,supp) distinct set, not raw lineitem.
# ---------------------------------------------------------------------------


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 4, 7, 10, 13)
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(bad_supp, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 4, 7, 10, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q20_dominant_supplier — TPC-H Q20 analog (nested IN + correlated share
# threshold). Suppliers who shipped >40% of a red part's total 1999
# volume ("excess stock" stand-in, no partsupp). The correlated
# half-of-sum becomes a window share over the per-(part,supp) aggregate
# — aggregate and threshold share ONE shuffle on partkey; the final
# supplier list joins the tiny qualifying key set.
# ---------------------------------------------------------------------------


def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    red_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    per_ps = (
        li.join(maybe_broadcast(red_parts, sf_dir, "part"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("part_total", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.4 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    return (
        dominant.join(maybe_broadcast(s, sf_dir, "supplier"), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_suppkey")
    )


_Q20_SQL = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
    AND l_shipdate < TIMESTAMP '2000-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY l_partkey, l_suppkey
),
dominant AS (
  SELECT DISTINCT l_suppkey
  FROM (SELECT l_suppkey, qty,
               sum(qty) OVER (PARTITION BY l_partkey) AS part_total
        FROM per_ps) a
  WHERE qty > 0.4 * part_total
)
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
FROM dominant JOIN supplier ON l_suppkey = s_suppkey
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q12_shipmode_priority — TPC-H Q12 analog (conditional priority counts
# over the orders⋈lineitem join). The driver schema has no
# l_shipmode/commitdate/receiptdate, so the adaptation keeps the Q12
# shape with what exists: "ship mode" -> l_returnflag, and the Q12
# "received late" predicate -> shipped >30 days after o_orderdate (a
# join-dependent filter that can only run post-join, exactly like the
# original's receipt/commit comparison). Scale: the shipdate-year filter
# pushes to the lineitem scan; one orderkey shuffle join (orders is not
# broadcastable at 100 TB); the CASE sums fold into map-side partial
# aggregation on a 3-key group — the exchange after the join carries
# (returnflag, partial counts) only.
# ---------------------------------------------------------------------------


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff("l_shipdate", "o_orderdate") > 30)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q12_SQL = """
SELECT l_returnflag,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END)                                   AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END)                                   AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q20_dominant_supplier": q20_dominant_supplier,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_revenue": q10_returned_revenue,
    "q11_important_value": q11_important_value,
    "q13_order_histogram": q13_order_histogram,
    "q15_top_supplier": q15_top_supplier,
    "q21_waiting_supplier": q21_waiting_supplier,
}

ORACLES = {
    "q2_min_cost_supplier": _Q2_SQL,
    "q12_shipmode_priority": _Q12_SQL,
    "q16_supplier_cnt": _Q16_SQL,
    "q20_dominant_supplier": _Q20_SQL,
    "q7_nation_volume": _Q7_SQL,
    "q8_market_share": _Q8_SQL,
    "q9_product_profit": _Q9_SQL,
    "q10_returned_revenue": _Q10_SQL,
    "q11_important_value": _Q11_SQL,
    "q13_order_histogram": _Q13_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q21_waiting_supplier": _Q21_SQL,
}
