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


def _rebalance(spark: SparkSession, df: DataFrame, input_bytes: int) -> DataFrame:
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
    if input_bytes < target * _REBALANCE_MIN_BYTES_PER_CORE:
        return df
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one test table (predicate/column pushdown intact).

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
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return _rebalance(
            spark, spark.read.parquet(path), input_bytes
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = spark.read.parquet(path)
    if name in COMPUTE_HEAVY:
        df = _rebalance(spark, df, input_bytes)
    return df
