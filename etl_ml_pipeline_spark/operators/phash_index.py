"""Persistent perceptual-hash (dHash) image index for cross-run near-dup.

``queries/similarity_q.dedup_images_phash`` finds Hamming-ball image
near-dups WITHIN one corpus pass. A crawl pipeline additionally needs
the cross-RUN question: "is this new image a near-dup of anything we
already ingested?" — re-hashing the whole historical corpus per run is
rebuild waste, the same argument behind the persisted MinHash dedup
index (``streaming/dedup_index``) and the benchmark gram index
(``operators/decontam_index``). This module persists image dHashes as
a parquet table so each run pays ONE banded equi-join against the
index:

- :func:`build_phash_index` — batch-build from a hashed frame;
- :func:`append_phash_index` — incremental: new images only (anti-join
  on id against the live index — linear in the new batch);
- :func:`gate_against_phash_index` — per-probe near-dup verdict via
  the banded join (pigeonhole-guaranteed recall for any radius below
  the band count, same algebra as dedup_images_phash);
- :func:`retire_phash_index_generation` — per-generation retention as
  a partition-pruned delete (mirrors the gram index, incl. the
  last-generation guard);
- :func:`phash_index_stats` — per-generation ops view.

Scale posture: the index stores (id, 64-char hash) — bytes per image,
MBs per billion images; band values derive at read (map-side), the
gate join shuffles on (band_idx, band_value) buckets, and Hamming
verification is the JVM bit_count(xor) fold on band-collision
candidates only. No forced broadcast hints anywhere: AQE picks the
strategy from real index-side sizes (the r12/r13 lesson). The hash
extraction itself (PNG decode -> dhash_bits) stays with the caller —
the HASH side is modality-agnostic over any fixed-width bit-string
hash, while the ID side is a fixed LONG key by contract (string-keyed
corpora pre-map with e.g. ``F.xxhash64``; see ``_normalized``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_HASH_BITS = 64


def dhash_bands(hash_col: Column, n_bands: int = 8) -> Column:
    """Split a 64-char '0'/'1' hash string into ``n_bands`` integer
    band values (each ``64/n_bands`` bits) — the LSH bucketing key and
    the Hamming-verify operand (bit_count over xor of band ints).

    ``n_bands`` must divide the hash width exactly (a remainder would
    silently drop trailing bits from every Hamming computation) and
    band values must fit a signed int32 (width >= 32 would make
    F.conv overflow the int cast into nulls, nulling the join keys) —
    both are loud errors, not silent corruption."""
    if _HASH_BITS % n_bands != 0:
        raise ValueError(
            f"dhash_bands: n_bands {n_bands} does not divide the "
            f"{_HASH_BITS}-bit hash — trailing bits would be dropped "
            "from every Hamming distance"
        )
    width = _HASH_BITS // n_bands
    if width >= 32:
        raise ValueError(
            f"dhash_bands: band width {width} >= 32 bits overflows the "
            "int32 band value — use more bands"
        )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda j: F.conv(F.substring(hash_col, j * width + 1, width), 2, 10)
        .cast("int"),
    )


def hamming_from_bands(bands1, bands2) -> Column:
    """Exact Hamming distance between two band-int arrays: the JVM-side
    bit_count(xor) fold. ONE definition shared by the batch dedup query
    and the index gate so the two can never desynchronize."""
    return F.aggregate(
        F.zip_with(
            bands1, bands2, lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _normalized(hashed: DataFrame, id_col: str, hash_col: str) -> DataFrame:
    """Project to (id, dhash) and collapse intra-batch duplicate ids —
    the index invariant is one row per id, and the append anti-join
    only protects against ids ALREADY indexed. min(dhash) makes the
    survivor deterministic; an id arriving with conflicting hashes is
    an upstream bug this layer resolves reproducibly rather than
    nondeterministically.

    Index keys are LONG by contract: the hash side is modality-agnostic
    (any fixed-width bit string), but the id side is a fixed 8-byte key
    so the index stays MBs-per-billion-rows and the anti-join/gate keys
    never compare across types. A string-keyed corpus (URLs, content
    hashes) must pre-map to a long — e.g. ``F.xxhash64(url)`` — BEFORE
    indexing; silently casting such ids would null them out and
    collapse every row into one id=NULL group, so a non-numeric id
    column is rejected at plan time (ADVICE/VERDICT r14 #4)."""
    id_type = hashed.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"phash_index: id column {id_col!r} is {id_type}, but index "
            "keys are long by contract — pre-map string keys with e.g. "
            "F.xxhash64(col) before indexing (a silent cast would null "
            "them out)"
        )
    return (
        hashed.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(hash_col).cast("string").alias("dhash"),
        )
        .groupBy("id")
        .agg(F.min("dhash").alias("dhash"))
    )


def build_phash_index(
    hashed: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> int:
    """Batch-build the index parquet: (id long, dhash string, gen int),
    gen=0. Returns the number of images indexed. Refuses an empty
    input loudly — a partitioned write of zero rows leaves a directory
    that fails parquet schema inference on the next read (the same
    unreadable-empty-index condition the retire guard protects)."""
    rows = _normalized(hashed, id_col, hash_col).withColumn(
        "gen", F.lit(0).cast("int")
    )
    if rows.isEmpty():
        raise ValueError(
            "build_phash_index: empty input — an empty partitioned "
            "index cannot be read back; build from the first non-empty "
            "batch instead"
        )
    rows.write.mode("overwrite").partitionBy("gen").parquet(index_path)
    return read_phash_index(hashed.sparkSession, index_path).count()


def read_phash_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Live index scan: (id long, dhash string, gen int)."""
    return spark.read.parquet(index_path).select(
        F.col("id").cast("long").alias("id"),
        F.col("dhash").cast("string").alias("dhash"),
        F.col("gen").cast("int").alias("gen"),
    )


def append_phash_index(
    new_hashed: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> int:
    """Incrementally index a NEW image batch: only ids not already
    present are appended (anti-join on id — an image's hash is
    immutable under this index; re-hashing an id is a no-op), under
    the next ``gen`` partition. Returns the number appended, counted
    from storage AFTER the write (committed truth, same contract as
    the gram index)."""
    spark = new_hashed.sparkSession
    live = read_phash_index(spark, index_path)
    next_gen = live.agg(F.max("gen")).first()[0] + 1
    fresh = (
        _normalized(new_hashed, id_col, hash_col)
        .join(live.select("id"), "id", "left_anti")
        .withColumn("gen", F.lit(next_gen).cast("int"))
    )
    fresh.write.mode("append").partitionBy("gen").parquet(index_path)
    return (
        read_phash_index(spark, index_path)
        .filter(F.col("gen") == next_gen)
        .count()
    )


def gate_against_phash_index(
    probes: DataFrame,
    index: DataFrame,
    radius: int = 1,
    n_bands: int = 8,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Per-probe near-dup verdict against the persisted index:
    (id, n_index_dups long, nearest_index_id long?, duplicate bool).

    Banded-LSH candidates (probe bands vs index bands on (band_idx,
    band_value)) then exact Hamming <= radius via the bit_count(xor)
    fold — recall is GUARANTEED while radius < n_bands (pigeonhole),
    so the verdicts are exact, never approximate. ``nearest_index_id``
    is the smallest matching index id (deterministic tie-break), NULL
    for clean probes. A probe whose id also exists in the index will
    match itself at distance 0 by design — gate BEFORE appending the
    batch, as the replay query does."""
    if radius >= n_bands:
        raise ValueError(
            f"gate_against_phash_index: radius {radius} >= n_bands "
            f"{n_bands} voids the pigeonhole recall guarantee — raise "
            "n_bands or lower the radius"
        )
    p = _normalized(probes, id_col, hash_col).withColumn(
        "bands", dhash_bands(F.col("dhash"), n_bands)
    )
    ix = index.select(
        F.col("id").alias("ix_id"),
        dhash_bands(F.col("dhash"), n_bands).alias("ix_bands"),
    )
    pb = p.select(
        "id", "bands", F.posexplode("bands").alias("pos", "bv")
    )
    ib = ix.select(
        "ix_id", "ix_bands", F.posexplode("ix_bands").alias("pos", "bv")
    )
    hamming = hamming_from_bands("bands", "ix_bands")
    hits = (
        pb.join(ib, ["pos", "bv"])
        .select("id", "bands", "ix_id", "ix_bands")
        .distinct()
        .withColumn("hd", hamming)
        .filter(F.col("hd") <= radius)
        .groupBy("id")
        .agg(
            F.count("*").alias("n_index_dups"),
            F.min("ix_id").alias("nearest_index_id"),
        )
    )
    return (
        p.select("id")
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_index_dups", F.lit(0))
            .cast("long")
            .alias("n_index_dups"),
            F.col("nearest_index_id").cast("long").alias("nearest_index_id"),
            (F.coalesce("n_index_dups", F.lit(0)) > 0).alias("duplicate"),
        )
    )


def retire_phash_index_generation(
    spark: SparkSession, index_path: str, gen: int
) -> int:
    """Retention: drop one ingest generation — a partition-pruned
    directory delete (gen is the parquet partition column), no rewrite
    of survivors; last-generation guard included. Shared machinery in
    operators/gen_index.py (same dance as the gram index). Returns the
    number of index rows dropped."""
    from etl_ml_pipeline_spark.operators.gen_index import retire_generation

    return retire_generation(
        spark,
        index_path,
        gen,
        read_phash_index(spark, index_path),
        "retire_phash_index_generation",
    )


def phash_index_stats(spark: SparkSession, index_path: str) -> DataFrame:
    """Per-generation index summary: (gen, n_images) — the ops view."""
    from etl_ml_pipeline_spark.operators.gen_index import generation_stats

    return generation_stats(read_phash_index(spark, index_path), "n_images")
