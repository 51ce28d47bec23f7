"""Data-layout operators: Z-order (Morton) clustering keys and
small-file compaction.

``sort_by`` on the file sinks clusters ONE column per file; predicates
on a second column still read every file. Z-ordering interleaves the
bits of several columns' normalized ranks into one sort key, so each
output file covers a small hyper-rectangle of the key space and parquet
min/max row-group statistics prune on EVERY z-ordered column — the same
layout Delta's ``OPTIMIZE ZORDER BY`` produces.

Everything is a JVM expression (normalize via a broadcast 1-row min/max
aggregate, interleave via shift/or chains inside codegen); the only
data movement is the range repartition that the clustering itself
requires — identical to any layout rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    out_col: str = "__z",
    bits: int = 16,
) -> DataFrame:
    """Append the Morton (Z-curve) key over ``cols``.

    Each column is min/max-normalized to a ``bits``-bit integer rank
    (one tiny aggregate, broadcast back — the plan stays lazy), then the
    ranks' bits are interleaved: bit b of column i lands at position
    ``b * n_cols + i``. Constant columns contribute rank 0. Total key
    width = bits * n_cols, so keep ``bits * len(cols) <= 63``.
    """
    m = len(cols)
    if bits * m > 63:
        raise ValueError(f"z-key needs {bits * m} bits; max 63 (lower bits or cols)")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"__zmin_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__zmax_{i}") for i, c in enumerate(cols)],
    )
    joined = df.crossJoin(F.broadcast(stats))
    max_rank = (1 << bits) - 1
    ranks: list[Column] = []
    for i, c in enumerate(cols):
        vmin, vmax = F.col(f"__zmin_{i}"), F.col(f"__zmax_{i}")
        v = F.col(c).cast("double")
        ranks.append(
            F.when(
                vmax > vmin,
                F.floor((v - vmin) / (vmax - vmin) * max_rank),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, rank in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(rank, b).bitwiseAND(F.lit(1)), b * m + i)
            )
    return joined.withColumn(out_col, z).drop(
        *[f"__zmin_{i}" for i in range(m)], *[f"__zmax_{i}" for i in range(m)]
    )


def input_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the files backing ``df``'s scan.

    Metadata-only: lists file statuses through the Hadoop FileSystem
    API (works for file://, hdfs://, s3a:// alike). Listing cost is
    O(files) on the driver — the same listing any compaction planner
    (Delta OPTIMIZE, Iceberg rewrite_data_files) performs.
    """
    sc = df.sparkSession.sparkContext
    conf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(conf)
        total += fs.getFileStatus(p).getLen()
    return total


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> dict:
    """Small-file compaction: rewrite a fragmented parquet directory
    into files of ~``target_file_bytes`` each.

    The 100 TB problem this solves: streaming ingestion and
    over-parallel writes leave tables as millions of KB-sized files;
    every downstream scan then pays per-file open/footer costs and the
    driver pays O(files) listing. Output file count is computed from
    the ACTUAL input bytes (ceil(bytes / target)), so the rewrite is
    one shuffle to exactly the right width — not a guess.

    With ``sort_col`` the rewrite range-partitions + locally sorts on
    it, so compaction doubles as a clustering pass and parquet min/max
    pruning works on that column afterwards (pair with
    ``zorder_layout`` for multi-column pruning). Without it, a plain
    round-robin ``repartition`` gives uniform file sizes. ``coalesce``
    is deliberately NOT used: it skips the shuffle but inherits the
    input's size skew — compaction exists to fix skew, not keep it.

    Returns {files_before, files_after, bytes, target_files}.
    """
    import math

    df = spark.read.parquet(src_path)
    nbytes = input_bytes(df)
    files_before = len(df.inputFiles())
    n_out = max(1, math.ceil(nbytes / target_file_bytes))
    if sort_col is None:
        shaped = df.repartition(n_out)
    else:
        shaped = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    shaped.write.mode("overwrite").parquet(dst_path)
    files_after = len(spark.read.parquet(dst_path).inputFiles())
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": nbytes,
        "target_files": n_out,
    }


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows by their Z-curve key: range-repartition on the key
    (each output partition owns a contiguous key range -> a compact
    hyper-rectangle) then sort locally so row groups inside each file
    are tight too. The key is dropped; only the physical order remains.

    ``num_partitions`` pins the output file count — without it AQE may
    coalesce a small input into one file, which defeats file-level
    pruning (at real scale the default shuffle parallelism is fine).
    """
    keyed = with_zorder_key(df, cols, "__z", bits)
    if num_partitions:
        ranged = keyed.repartitionByRange(num_partitions, "__z")
    else:
        ranged = keyed.repartitionByRange("__z")
    return ranged.sortWithinPartitions("__z").drop("__z")
