"""Table loading helpers for the query catalog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Tables whose consumers do heavy per-row compute (JSON parsing, md5 /
# shingle hashing, vector math). For these a scan that can't split (one
# parquet row group) serializes the whole query on one core, so the
# rebalance shuffle pays for itself. Relational tables (lineitem/orders/
# ...) are NOT rebalanced: their queries are scan+join+agg, where an
# extra pre-join exchange only adds cost and fights AQE's own planning.
COMPUTE_HEAVY = {"events", "documents", "embeddings"}


_REBALANCE_MIN_BYTES_PER_CORE = 512 * 1024

# Opt-in threshold for queries that declare their per-row compute heavy
# (MinHash permutation hashing, SimHash bit aggregation, brute-force
# vector math): there even a ~20 KB/core sliver of input is worth
# spreading across the cluster — measured at sf0.1: simhash 1.85s ->
# 1.31s, brute-force ANN 0.92s -> 0.60s. Cheap-per-row queries (exact
# dedup, token stats) keep the conservative default: for them the extra
# exchange costs more than the parallelism recovers.
_HEAVY_MIN_BYTES_PER_CORE = 16 * 1024


def _rebalance(
    spark: SparkSession,
    df: DataFrame,
    input_bytes: int,
    min_bytes_per_core: int = _REBALANCE_MIN_BYTES_PER_CORE,
) -> DataFrame:
    """Adaptive scan rebalance: if the source yields far fewer partitions
    than the cluster's parallelism (e.g. a handful of single-row-group
    parquet files), round-robin repartition so downstream compute uses
    every core. Catalyst still pushes filters/pruning beneath the
    exchange. At real scale (splittable multi-row-group inputs) the
    partition count is already >= parallelism and this is a no-op.

    Size guard: below ~0.5 MB of input per core the exchange + AQE
    replanning costs more wall time than the parallelism recovers
    (measured at sf0.1: a 0.6 MB documents scan ran 3× slower
    rebalanced), so tiny inputs stay unshuffled.
    """
    target = spark.sparkContext.defaultParallelism
    if input_bytes < target * min_bytes_per_core:
        return df
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def t(spark: SparkSession, sf_dir: str, name: str, heavy: bool = False) -> DataFrame:
    """Lazy parquet scan for one test table (predicate/column pushdown intact).

    ``heavy=True`` marks the *consumer* as compute-bound per row (MinHash/
    SimHash hashing, dense vector math), lowering the rebalance size guard
    so even small scans fan out across all cores. At real scale the scan
    is already wide and both paths are no-ops.

    The ``events`` table stores TIMESTAMP(NANOS) which Spark's parquet
    reader rejects; read nanos as long (legacy conf) and truncate to
    microseconds with integer division (matches DuckDB's ns->us cast;
    double division would lose precision on ~1.7e18 nanosecond epochs).
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        input_bytes = os.path.getsize(path)
    except OSError:  # non-local path (hdfs/s3): assume big enough
        input_bytes = 1 << 40
    min_bpc = _HEAVY_MIN_BYTES_PER_CORE if heavy else _REBALANCE_MIN_BYTES_PER_CORE
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return _rebalance(
            spark, spark.read.parquet(path), input_bytes, min_bpc
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.parquet(path)
    if name in COMPUTE_HEAVY:
        df = _rebalance(spark, df, input_bytes, min_bpc)
    return df
