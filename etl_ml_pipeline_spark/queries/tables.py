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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one test table (predicate/column pushdown intact).

    The ``events`` table stores TIMESTAMP(NANOS) which Spark's parquet
    reader rejects; read nanos as long (legacy conf) and truncate to
    microseconds with integer division (matches DuckDB's ns->us cast;
    double division would lose precision on ~1.7e18 nanosecond epochs).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
