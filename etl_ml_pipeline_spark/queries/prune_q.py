"""Bloom-filter join-pruning catalog queries.

Like the salted-skew queries (skew_q.py), these are 100 TB plan rewrites
made oracle-checkable: a Bloom pre-filter on the fact side must be
RESULT-IDENTICAL to the plain join — false positives survive the filter
but die in the exact join; members are never dropped — so the DuckDB
oracle is simply the plain join SQL, and a green row proves the rewrite
preserves semantics end to end. Plan shape (map-side filter before the
fact shuffle, no Python eval, single join) is guarded in
tests/test_plans.py.

Scale: at 100 TB the win is shuffle volume — only (join selectivity +
~0.8% fpp) of fact rows leave the scan stage. The filter costs
ndv*10/8 bytes broadcast in the plan (1.2 MB per million dim keys),
covering the regime where the dim is too big for an exact isin/broadcast
but its Bloom is cheap. Spark's own runtime row-level filtering
(spark.sql.optimizer.runtime.bloomFilter.enabled) injects the same
rewrite when stats allow; the operator makes it explicit and
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.bloom import bloom_prune_join
from etl_ml_pipeline_spark.queries.tables import t


def bloom_prune_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part size for one brand, with the lineitem side
    Bloom-pruned by the filtered part keys before the join shuffle.

    Brand#23 selects ~1/25 of parts, so ~96% of lineitem rows are
    dropped map-side; the exact join then removes the ~0.8% false
    positives. Result is identical to the plain join (the oracle)."""
    dim = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey", "p_size")
    )
    fact = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice", "l_discount"
    )
    joined = bloom_prune_join(fact, dim, "p_partkey")
    return (
        joined.groupBy("p_size")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
        .orderBy("p_size")
    )


_BLOOM_BRAND_SQL = """
SELECT p_size,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
GROUP BY p_size
ORDER BY p_size
"""


QUERIES = {
    "bloom_prune_brand_revenue": bloom_prune_brand_revenue,
}

ORACLES = {
    "bloom_prune_brand_revenue": _BLOOM_BRAND_SQL,
}
