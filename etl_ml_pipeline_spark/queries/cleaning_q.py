"""Oracle-matched queries exercising the cleaning + validation operators.

The driver tables are clean, so each query first *deterministically
dirties* its input (padding, NULLIF, duplicate union, invalid strings) in
a way the oracle SQL replicates exactly, then applies the real operator
implementations from ``operators.cleaning`` / ``operators.validation``.
This proves operator semantics (not just Spark built-ins) against SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators import cleaning
from etl_ml_pipeline_spark.operators.validation import compile_rules
from etl_ml_pipeline_spark.queries.tables import t


# ---------------------------------------------------------------------------
# clean_pipeline_customer — lowercase -> strip -> fill_nulls -> deduplicate
# over a dirtied, duplicated customer table (rule order = RULE_ORDER).
# Scale: pure narrow ops except the final dropDuplicates (one shuffle on
# the full row); the union doubling is metadata-only (same scan reused).
# ---------------------------------------------------------------------------


def clean_pipeline_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    dirty = cust.select(
        F.col("c_custkey").alias("C_CUSTKEY"),
        F.concat(F.lit("  "), F.col("c_name"), F.lit(" ")).alias("C_NAME"),
        F.expr("nullif(c_mktsegment, 'FURNITURE')").alias("C_MKTSEGMENT"),
    )
    dirty = dirty.unionByName(dirty)  # duplicate every row
    cleaned = cleaning.lowercase_columns(dirty)
    cleaned = cleaning.strip_whitespace(cleaned)
    cleaned = cleaning.fill_nulls(cleaned, {"c_mktsegment": "UNKNOWN"})
    cleaned = cleaning.deduplicate(cleaned)
    return cleaned.orderBy("c_custkey")


_CLEAN_PIPELINE_SQL = """
WITH dirty AS (
  SELECT c_custkey AS C_CUSTKEY,
         '  ' || c_name || ' ' AS C_NAME,
         nullif(c_mktsegment, 'FURNITURE') AS C_MKTSEGMENT
  FROM customer
  UNION ALL
  SELECT c_custkey, '  ' || c_name || ' ', nullif(c_mktsegment, 'FURNITURE')
  FROM customer
)
SELECT DISTINCT
       C_CUSTKEY AS c_custkey,
       trim(C_NAME) AS c_name,
       coalesce(C_MKTSEGMENT, 'UNKNOWN') AS c_mktsegment
FROM dirty
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# clean_dedup_keep_first — deduplicate_columns with explicit tiebreak:
# one row per customer = their earliest order (order_by o_orderdate,
# o_orderkey). Scale: single shuffle on the dedup key; row_number over a
# sorted partition — no global sort.
# ---------------------------------------------------------------------------


def clean_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    first = cleaning.deduplicate_columns(
        orders, ["o_custkey"], order_by=["o_orderdate", "o_orderkey"]
    )
    return first.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").cast("string").alias("first_orderdate"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    ).orderBy("o_custkey")


_DEDUP_FIRST_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS first_orderdate,
       round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# clean_standardize_cast — standardize_dates (coerce-to-null) + cast_types
# (permissive try_cast) over stringified/corrupted order columns.
# ---------------------------------------------------------------------------


def clean_standardize_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    stringified = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("not-a-date"))
        .otherwise(F.col("o_orderdate").cast("string"))
        .alias("o_orderdate"),
        F.when(F.col("o_orderkey") % 53 == 0, F.lit("oops"))
        .otherwise(F.format_number(F.col("o_totalprice"), 2))
        .alias("o_totalprice"),
    )
    # format_number inserts thousands separators -> strip before cast
    stringified = stringified.withColumn(
        "o_totalprice", F.regexp_replace("o_totalprice", ",", "")
    )
    out = cleaning.standardize_dates(stringified, ["o_orderdate"])
    out = cleaning.cast_types(out, {"o_totalprice": "double"}, mode="permissive")
    return out.select(
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("parsed_date"),
        F.round("o_totalprice", 2).alias("price"),
    ).orderBy("o_orderkey")


_STANDARDIZE_SQL = """
WITH stringified AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN 'not-a-date'
              ELSE CAST(o_orderdate AS VARCHAR) END AS o_orderdate,
         CASE WHEN o_orderkey % 53 = 0 THEN 'oops'
              ELSE format('{:.2f}', o_totalprice) END AS o_totalprice
  FROM orders
)
SELECT o_orderkey,
       CAST(try_cast(o_orderdate AS TIMESTAMP) AS VARCHAR) AS parsed_date,
       round(try_cast(o_totalprice AS DOUBLE), 2) AS price
FROM stringified
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# validate_drop_customers — predicate-compiled validation, drop mode:
# dirtied customers (negative keys, blank names, out-of-range balances)
# filtered by the compiled contract. Scale: one codegen'd filter, no
# Python, no shuffle.
# ---------------------------------------------------------------------------

_CUSTOMER_RULES = {
    "c_custkey": {"not_null": True, "min": 1},
    "c_name": {"not_null": True, "min_length": 1},
    "c_acctbal": {"not_null": True, "min": -999.0, "max": 10000.0},
}


def validate_drop_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    dirty = cust.select(
        F.when(F.col("c_custkey") % 101 == 0, -F.col("c_custkey"))
        .otherwise(F.col("c_custkey"))
        .alias("c_custkey"),
        F.when(F.col("c_custkey") % 53 == 0, F.lit(""))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(F.col("c_custkey") % 29 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    pred = compile_rules(_CUSTOMER_RULES)
    return dirty.filter(pred).select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    ).orderBy("c_custkey")


_VALIDATE_SQL = """
WITH dirty AS (
  SELECT CASE WHEN c_custkey % 101 = 0 THEN -c_custkey ELSE c_custkey END AS c_custkey,
         CASE WHEN c_custkey % 53 = 0 THEN '' ELSE c_name END AS c_name,
         CASE WHEN c_custkey % 29 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal
  FROM customer
)
SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
FROM dirty
WHERE c_custkey IS NOT NULL AND c_custkey >= 1
  AND c_name IS NOT NULL AND length(c_name) >= 1
  AND c_acctbal IS NOT NULL AND c_acctbal >= -999.0 AND c_acctbal <= 10000.0
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# validate_flag_summary — flag mode + aggregate: how many rows pass/fail
# the contract per segment (reject observability instead of destruction).
# ---------------------------------------------------------------------------


def validate_flag_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    dirty = cust.select(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 101 == 0, -F.col("c_custkey"))
        .otherwise(F.col("c_custkey"))
        .alias("c_custkey"),
    )
    pred = compile_rules({"c_custkey": {"not_null": True, "min": 1}})
    return (
        dirty.withColumn("_valid", pred)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("_valid").cast("bigint")).alias("n_valid"),
            F.sum((~F.col("_valid")).cast("bigint")).alias("n_invalid"),
        )
        .orderBy("c_mktsegment")
    )


_FLAG_SQL = """
WITH dirty AS (
  SELECT c_mktsegment,
         CASE WHEN c_custkey % 101 = 0 THEN -c_custkey ELSE c_custkey END AS c_custkey
  FROM customer
)
SELECT c_mktsegment,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN c_custkey IS NOT NULL AND c_custkey >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(CASE WHEN c_custkey IS NOT NULL AND c_custkey >= 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
FROM dirty
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES = {
    "clean_pipeline_customer": clean_pipeline_customer,
    "clean_dedup_keep_first": clean_dedup_keep_first,
    "clean_standardize_cast": clean_standardize_cast,
    "validate_drop_customers": validate_drop_customers,
    "validate_flag_summary": validate_flag_summary,
}

ORACLES = {
    "clean_pipeline_customer": _CLEAN_PIPELINE_SQL,
    "clean_dedup_keep_first": _DEDUP_FIRST_SQL,
    "clean_standardize_cast": _STANDARDIZE_SQL,
    "validate_drop_customers": _VALIDATE_SQL,
    "validate_flag_summary": _FLAG_SQL,
}
