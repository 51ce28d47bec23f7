"""Subquery-shaped relational queries: EXISTS / IN / correlated aggregates,
disjunctive join predicates, full-outer joins, grouping sets.

The reference has no relational surface at all (SURVEY.md §2.6); these are
the classic TPC-H decorrelation shapes (Q4/Q14/Q17/Q18/Q19/Q22 analogs,
adapted to the driver's slimmer schemas) expressed the way Catalyst wants
them: semi/anti joins instead of per-row EXISTS probes, join-on-aggregate
instead of correlated scalar subqueries, broadcast for the tiny build
sides. Scale notes on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.queries.tables import maybe_broadcast, t

# ---------------------------------------------------------------------------
# q4_priority_exists — TPC-H Q4 analog (EXISTS -> left-semi join).
# "Orders placed in 1996 that had at least one returned line, counted by
# priority." The EXISTS probe is a LEFT SEMI join: Spark shuffles both
# sides on l_orderkey/o_orderkey once, and the semi join needs no
# dedup-before-join (semantics dedupe for free). At 100 TB both sides are
# date/flag-filtered before the shuffle, so the exchange carries only the
# qualifying keys; AQE picks broadcast if the filtered build side is small.
# ---------------------------------------------------------------------------


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    returned = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18 analog (IN over an agg-HAVING subquery).
# Catalyst plans the IN-subquery as a semi join against the aggregated
# lineitem; we express it directly as agg -> inner join, which also lets
# the sum ride along without recomputation. Scale: one shuffle to build
# per-order quantity sums (map-side partials), the HAVING filter shrinks
# the key set massively before it joins orders/customer; customer join is
# broadcast-eligible after AQE sees the tiny filtered left side.
# ---------------------------------------------------------------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("sum_qty"), "o_orderkey")
    )


_Q18_SQL = """
SELECT c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS total_price, sum_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > 150) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty DESC, o_orderkey
"""


# ---------------------------------------------------------------------------
# q19_disjunctive_revenue — TPC-H Q19 analog (OR-of-ANDs join predicate).
# The disjunction references both sides, so it cannot be pushed below the
# join — but the single-side conjuncts Catalyst *derives* from it
# (p_brand IN (...), l_quantity <= 30) do push into both parquet scans.
# The join itself stays an equi-join on partkey with the disjunction as a
# residual filter; part is tiny relative to lineitem -> broadcast.
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS line_count
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10 AND 30)
"""


# ---------------------------------------------------------------------------
# q14_promo_share — TPC-H Q14 analog (conditional aggregation over a join).
# Both sums come out of ONE pass over the joined rows (a CASE inside the
# aggregate), not two scans. The share is derived from the two
# already-rounded sums with floor-truncation, not round(), because Spark
# rounds doubles HALF_UP while DuckDB rounds to nearest-even — identical
# inputs then guarantee identical output. part is broadcast.
# ---------------------------------------------------------------------------


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 4)
            .alias("promo_revenue"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
        )
    )
    share = F.col("promo_revenue") / F.col("total_revenue") * 100.0
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.floor(share * 100) / 100).alias("promo_share_pct"),
    )


_Q14_SQL = """
SELECT promo_revenue, total_revenue,
       floor(promo_revenue / total_revenue * 100.0 * 100) / 100 AS promo_share_pct
FROM (SELECT round(sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END), 4) AS promo_revenue,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01') a
"""


# ---------------------------------------------------------------------------
# q17_small_qty_revenue — TPC-H Q17 analog (correlated aggregate ->
# join-on-aggregate decorrelation). "Revenue lost to small orders": lines
# whose quantity is below 50% of that part's average quantity. The
# correlated `avg(l_quantity) WHERE l_partkey = p_partkey` becomes a
# groupBy(partkey) aggregate joined back to lineitem — one extra shuffle
# of (partkey, avg) pairs, which is |part|-sized, tiny next to lineitem;
# at scale AQE broadcasts it.
# ---------------------------------------------------------------------------


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    ).withColumnRenamed("l_partkey", "ap_partkey")
    return (
        li.join(
            maybe_broadcast(per_part, sf_dir, "part"), li.l_partkey == per_part.ap_partkey
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("small_lines"),
        )
    )


_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
       count(*) AS small_lines
FROM lineitem l
JOIN (SELECT l_partkey AS ap_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) a
  ON l.l_partkey = a.ap_partkey
WHERE l.l_quantity < 0.5 * a.avg_qty
"""


# ---------------------------------------------------------------------------
# q22_idle_big_balance — TPC-H Q22 analog (global scalar subquery +
# NOT EXISTS). Customers with above-average positive balances and no
# order in the dataset's final month ("idle"; at sf>=0.01 every customer
# has *some* order, so never-ordered would be vacuous). The scalar avg is
# a 1-row aggregate broadcast into a cross join (no shuffle of the big
# side); NOT EXISTS is a left-anti join on custkey. orders is date-
# filtered and projected to the single join column before the anti join,
# so the shuffle carries 8 bytes/row.
# ---------------------------------------------------------------------------


def q22_idle_big_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-07-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("num_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


_Q22_SQL = """
SELECT c_nationkey, count(*) AS num_cust,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-07-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# full_outer_nation_presence — FULL OUTER join coverage. Per-nation
# customer count vs supplier count; with 10 suppliers over 25 nations
# most rows are one-sided, exercising null-fill on both wings. Both
# inputs are pre-aggregated (nation-cardinality), so the full-outer join
# is between two tiny sets regardless of base-table scale — the pattern
# to reach for at 100 TB instead of outer-joining raw fact tables.
# ---------------------------------------------------------------------------


def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("customers"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("suppliers"))
    )
    n = t(spark, sf_dir, "nation")
    joined = cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
    return (
        joined.withColumn(
            "nationkey", F.coalesce("c_nationkey", "s_nationkey")
        )
        .join(maybe_broadcast(n, sf_dir, "nation"), F.col("nationkey") == n.n_nationkey)
        .select(
            "n_name",
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
        .orderBy("n_name")
    )


_FULL_OUTER_SQL = """
SELECT n_name,
       coalesce(customers, 0) AS customers,
       coalesce(suppliers, 0) AS suppliers
FROM (SELECT c_nationkey, count(*) AS customers
      FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, count(*) AS suppliers
                 FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
JOIN nation ON coalesce(c_nationkey, s_nationkey) = n_nationkey
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# grouping_sets_order_revenue — GROUPING SETS ((status), (priority), ()).
# Unlike cube/rollup (already covered), an explicit grouping-set list
# computes exactly the requested groupings in one shuffle (Spark expands
# rows once, aggregates once). Labels use coalesce-to-'ALL' rather than
# grouping_id() because the two engines number grouping bits differently;
# neither column is nullable in the data so the coalesce is unambiguous.
# ---------------------------------------------------------------------------


def grouping_sets_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    gs = o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    return gs.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status_g"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority_g"),
        "orders",
        "revenue",
    ).orderBy("status_g", "priority_g")


_GROUPING_SETS_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status_g,
       coalesce(o_orderpriority, 'ALL') AS priority_g,
       count(*) AS orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY status_g, priority_g
"""


# ---------------------------------------------------------------------------
# recursive_supplier_ancestry — WITH RECURSIVE (new SQL surface in Spark 4)
# driven end-to-end: a synthetic reporting hierarchy over supplier
# (parent = suppkey DIV 2, root at 1) walked from every supplier to
# the root, aggregated per depth. The engine executes the recursion as
# an iterative union loop — the managed counterpart of the manual
# per-round join+checkpoint loops in operators/graph.py — and
# termination is structural (the node halves every step), so total
# work is N log N rows with a log2(max_key) depth bound, never
# unbounded. Spark guards runaway recursion with
# spark.sql.cteRecursionRowLimit (default 1e6 — the part-table variant
# tripped it at sf1, which is how the knob earned this comment); the
# query raises it around a small eagerly-materialized result and
# restores the session value, the honest production posture for a
# deliberately large recursion. NOTE (ADVICE r08 #5): the conf is
# session-global, so a query running CONCURRENTLY in the same session
# would temporarily inherit the raised runaway-recursion guard — fine
# for the sequential catalog driver; concurrent deployments should run
# this in a cloned session (spark.newSession()) to scope the conf.
# Integer-only arithmetic; the oracle is
# the identical recursion in DuckDB (Spark spells integer division
# DIV, DuckDB spells it //).
# ---------------------------------------------------------------------------

_REC_ROW_LIMIT_CONF = "spark.sql.cteRecursionRowLimit"


def recursive_supplier_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    view = f"supp_rec_{uuid.uuid4().hex[:12]}"
    t(spark, sf_dir, "supplier").select("s_suppkey").createOrReplaceTempView(
        view
    )
    prev = spark.conf.get(_REC_ROW_LIMIT_CONF, None)
    try:
        spark.conf.set(_REC_ROW_LIMIT_CONF, str(200_000_000))
        out = spark.sql(f"""
          WITH RECURSIVE anc AS (
            SELECT s_suppkey AS supp, s_suppkey AS node, 0 AS depth
            FROM {view}
            UNION ALL
            SELECT supp, node DIV 2 AS node, depth + 1 AS depth
            FROM anc WHERE node > 1
          )
          SELECT depth,
                 CAST(count(*) AS BIGINT)   AS n_rows,
                 CAST(min(node) AS BIGINT)  AS min_node,
                 CAST(max(node) AS BIGINT)  AS max_node,
                 CAST(sum(node) AS BIGINT)  AS sum_node
          FROM anc
          GROUP BY depth
          ORDER BY depth
        """).localCheckpoint(eager=True)  # run under the raised limit
    finally:
        if prev is None:
            spark.conf.unset(_REC_ROW_LIMIT_CONF)
        else:
            spark.conf.set(_REC_ROW_LIMIT_CONF, prev)
        spark.catalog.dropTempView(view)
    return out


_RECURSIVE_SQL = """
WITH RECURSIVE anc AS (
  SELECT s_suppkey AS supp, s_suppkey AS node, 0 AS depth FROM supplier
  UNION ALL
  SELECT supp, node // 2 AS node, depth + 1 AS depth
  FROM anc WHERE node > 1
)
SELECT depth,
       CAST(count(*) AS BIGINT)  AS n_rows,
       CAST(min(node) AS BIGINT) AS min_node,
       CAST(max(node) AS BIGINT) AS max_node,
       CAST(sum(node) AS BIGINT) AS sum_node
FROM anc
GROUP BY depth
ORDER BY depth
"""


QUERIES = {
    "q4_priority_exists": q4_priority_exists,
    "recursive_supplier_ancestry": recursive_supplier_ancestry,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q14_promo_share": q14_promo_share,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q22_idle_big_balance": q22_idle_big_balance,
    "full_outer_nation_presence": full_outer_nation_presence,
    "grouping_sets_order_revenue": grouping_sets_order_revenue,
}

ORACLES = {
    "q4_priority_exists": _Q4_SQL,
    "recursive_supplier_ancestry": _RECURSIVE_SQL,
    "q18_large_orders": _Q18_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q14_promo_share": _Q14_SQL,
    "q17_small_qty_revenue": _Q17_SQL,
    "q22_idle_big_balance": _Q22_SQL,
    "full_outer_nation_presence": _FULL_OUTER_SQL,
    "grouping_sets_order_revenue": _GROUPING_SETS_SQL,
}
