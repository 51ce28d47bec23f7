"""Shared generation-retention machinery for persisted index tables.

Three indexes persist as gen-partitioned parquet (the benchmark gram
index, the perceptual-hash image index, and — with its own tombstone
variant — the IVF index). Retiring a generation is the same dance
everywhere: validate the gen exists, refuse to delete the LAST one
(an empty parquet directory fails schema inference on the next read),
count the doomed rows, and drop the ``gen=K`` partition directory via
the Hadoop FS API — a partition-pruned delete, never a rewrite of the
survivors. One definition here so a fix to the guard rails or the FS
error path cannot silently miss a sibling index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def retire_generation(
    spark: SparkSession,
    index_path: str,
    gen: int,
    live: DataFrame,
    label: str,
) -> int:
    """Drop one generation of a gen-partitioned index. ``live`` is the
    index's current scan (must carry a ``gen`` column); ``label`` names
    the caller in error messages. Returns the number of rows dropped."""
    gens = {r["gen"] for r in live.select("gen").distinct().collect()}
    if gen not in gens:
        raise ValueError(
            f"{label}: gen {gen} not in index (have {sorted(gens)})"
        )
    if gens == {gen}:
        raise ValueError(
            f"{label}: refusing to retire the last remaining generation "
            "— an empty index cannot be read back; delete the index "
            "directory instead"
        )
    n = live.filter(F.col("gen") == gen).count()
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    part = jvm.org.apache.hadoop.fs.Path(
        index_path.rstrip("/") + f"/gen={gen}"
    )
    fs = part.getFileSystem(conf)
    if not fs.delete(part, True):
        raise IOError(f"{label}: delete {part} failed")
    return n


def generation_stats(live: DataFrame, count_col: str) -> DataFrame:
    """Per-generation row counts: (gen, <count_col>) — the ops view."""
    return (
        live.groupBy("gen")
        .agg(F.count("*").alias(count_col))
        .orderBy("gen")
    )
