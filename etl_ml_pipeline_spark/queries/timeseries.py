"""Time-series queries over the events table: moving aggregates with
min_periods semantics, sessionization, tumbling windows, target
engineering. RSI/MACD (recursive EWMAs) are oracle-checked via a DuckDB
RECURSIVE CTE that replays the pandas ewm(adjust=False) recursion
step-for-step (plus golden pandas tests in tests/test_indicators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.indicators import (
    add_holt_linear,
    add_rsi_macd,
    bollinger,
    sma,
)
from etl_ml_pipeline_spark.operators.sessionize import sessionize
from etl_ml_pipeline_spark.queries.tables import t


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# sma_events — 5-row moving average per user with Pandas min_periods
# null-semantics (warmup rows dropped). Scale: shuffle on user_id + sorted
# frame aggregate; series parallelize across users.
# ---------------------------------------------------------------------------


def sma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    out = sma(ev, "value", 5, w, "sma_5")
    return (
        out.filter(F.col("sma_5").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round("sma_5", 4).alias("sma_5"),
        )
        .orderBy("user_id", "event_id")
    )


_SMA_SQL = """
SELECT user_id, event_id, round(value, 2) AS value, round(sma_5, 4) AS sma_5
FROM (
  SELECT user_id, event_id, value,
         CASE WHEN count(value) OVER w >= 5 THEN avg(value) OVER w END AS sma_5
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
WHERE sma_5 IS NOT NULL
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# bollinger_events — 10-row mean ± 2 * sample stddev per user.
# ---------------------------------------------------------------------------


def bollinger_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    out = bollinger(ev, "value", 10, 2.0, w, "bb")
    return (
        out.filter(F.col("bb_upper").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round("bb_upper", 4).alias("bb_upper"),
            F.round("bb_lower", 4).alias("bb_lower"),
        )
        .orderBy("user_id", "event_id")
    )


_BOLLINGER_SQL = """
SELECT user_id, event_id,
       round(m + 2.0 * sd, 4) AS bb_upper,
       round(m - 2.0 * sd, 4) AS bb_lower
FROM (
  SELECT user_id, event_id,
         CASE WHEN count(value) OVER w >= 10 THEN avg(value) OVER w END AS m,
         CASE WHEN count(value) OVER w >= 10 THEN stddev_samp(value) OVER w END AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
WHERE m IS NOT NULL
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# sessionize_events — 30-minute-gap sessions per user, one row per session.
# ---------------------------------------------------------------------------


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    sess = sessionize(ev, "user_id", "ts", 30.0, order_cols=["ts", "event_id"])
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").cast("string").alias("session_start"),
            F.max("ts").cast("string").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, CAST(sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       count(*) AS n_events,
       CAST(min(ts) AS VARCHAR) AS session_start,
       CAST(max(ts) AS VARCHAR) AS session_end,
       round(sum(value), 2) AS session_value
FROM numbered
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# tumble_hourly_events — tumbling event-time windows per event_type.
# window() aligns to the epoch for divisor durations == date_trunc('hour').
# ---------------------------------------------------------------------------


def tumble_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


_TUMBLE_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# ml_target_events — next-event % change target per user (predict.py M2
# analog: lead-based target engineering, last row per series dropped).
# ---------------------------------------------------------------------------


def ml_target_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("value").over(w)
    return (
        ev.withColumn(
            "target_pct",
            # try_divide: a zero-price row has no defined return -> null
            # target, filtered below (ANSI mode would otherwise throw
            # DIVIDE_BY_ZERO the first time a zero value appears — it
            # did at sf0.1).
            F.round(F.try_divide(nxt - F.col("value"), F.col("value")) * 100.0, 4),
        )
        .filter(F.col("target_pct").isNotNull())
        .select("user_id", "event_id", F.round("value", 2).alias("value"), "target_pct")
        .orderBy("user_id", "event_id")
    )


_TARGET_SQL = """
SELECT user_id, event_id, round(value, 2) AS value, target_pct
FROM (
  SELECT user_id, event_id, value,
         round((lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                - value) / nullif(value, 0) * 100.0, 4) AS target_pct
  FROM events
)
WHERE target_pct IS NOT NULL
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# rsi_macd_events — recursive EWMAs via partition-batched mapInPandas
# (GroupBy.ewm); oracle below replays the recursion in a DuckDB
# RECURSIVE CTE.
# ---------------------------------------------------------------------------


def rsi_macd_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    out = add_rsi_macd(ev, "user_id", "ts", "value", rsi_n=14)
    return (
        out.filter(F.col("rsi_14").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round("rsi_14", 4).alias("rsi_14"),
            F.round("macd", 4).alias("macd"),
            F.round("macd_signal", 4).alias("macd_signal"),
            F.round("macd_histogram", 4).alias("macd_histogram"),
        )
        .orderBy("user_id", "event_id")
    )


# Oracle for the recursive EWMAs: a DuckDB RECURSIVE CTE advancing every
# user's series one row per iteration (depth = max rows/user, ~86 at
# sf0.01). Each arithmetic step mirrors pandas ewm(adjust=False)
# EXACTLY — y = ((1-a)*prev + a*x) / ((1-a)+a), including the
# divide-by-weight-sum — so doubles agree bit-for-bit before round(4).
# Wilder avg gain/loss seed at the first delta (leading NaN skipped,
# pandas ignore_na default), masked until min_periods=14 valid obs.
_RSI_MACD_SQL = """
WITH RECURSIVE ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
),
rec AS (
  SELECT user_id, event_id, rn, value,
         value AS ema_f, value AS ema_s, 0.0::DOUBLE AS sig,
         CAST(NULL AS DOUBLE) AS avg_gain,
         CAST(NULL AS DOUBLE) AS avg_loss
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.rn, o.value,
         ((1 - 2.0/13.0) * r.ema_f + 2.0/13.0 * o.value) / ((1 - 2.0/13.0) + 2.0/13.0),
         ((1 - 2.0/27.0) * r.ema_s + 2.0/27.0 * o.value) / ((1 - 2.0/27.0) + 2.0/27.0),
         ((1 - 2.0/10.0) * r.sig
            + 2.0/10.0 * (((1 - 2.0/13.0) * r.ema_f + 2.0/13.0 * o.value) / ((1 - 2.0/13.0) + 2.0/13.0)
                          - ((1 - 2.0/27.0) * r.ema_s + 2.0/27.0 * o.value) / ((1 - 2.0/27.0) + 2.0/27.0)))
           / ((1 - 2.0/10.0) + 2.0/10.0),
         CASE WHEN r.avg_gain IS NULL THEN greatest(o.value - r.value, 0.0::DOUBLE)
              ELSE ((1 - 1.0/14.0) * r.avg_gain + 1.0/14.0 * greatest(o.value - r.value, 0.0::DOUBLE))
                     / ((1 - 1.0/14.0) + 1.0/14.0) END,
         CASE WHEN r.avg_loss IS NULL THEN greatest(r.value - o.value, 0.0::DOUBLE)
              ELSE ((1 - 1.0/14.0) * r.avg_loss + 1.0/14.0 * greatest(r.value - o.value, 0.0::DOUBLE))
                     / ((1 - 1.0/14.0) + 1.0/14.0) END
  FROM rec r
  JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id,
       round(CASE WHEN avg_loss = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END, 4) AS rsi_14,
       round(ema_f - ema_s, 4) AS macd,
       round(sig, 4) AS macd_signal,
       round((ema_f - ema_s) - sig, 4) AS macd_histogram
FROM rec
WHERE rn >= 15
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# resample_gapfill_events — calendar-regular resampling with gap fill.
# Per user: daily buckets from first to last active day; days with no
# events appear with n_events=0 and the value forward-filled from the
# last observation (LOCF) — the classic time-series regularization step
# (pandas .resample('D').last().ffill()) the reference's pandas stack
# would do before indicator math.
# Scale: one shuffle for the daily agg, one for the per-user spine agg,
# an equi-join back on (user_id, day), and a per-user window for the
# forward fill — all partitioned by user; the date spine explodes at
# most span-days rows per user (bounded, no cross join). At 100 TB the
# join keys would be pre-partitioned by user_id to share one exchange.
# ---------------------------------------------------------------------------


def resample_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        # deterministic "last value of the day": lexicographic struct max
        # on (ts, event_id) — event_id is unique, so ties are impossible
        F.max(F.struct("ts", "event_id", "value"))["value"].alias("last_value"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = W.partitionBy("user_id").orderBy("day")
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.round(
                F.last("last_value", ignorenulls=True).over(w), 2
            ).alias("ffill_value"),
        )
        .orderBy("user_id", "day")
    )


_GAPFILL_SQL = """
WITH daily AS (
  -- arg_max on a single HUGEINT (ts, event_id) composite, NOT
  -- max(struct_pack(...)): DuckDB's struct-max aggregate is ~1ms per
  -- GROUP (measured 400s+ on sf1's 400k (user, day) groups vs 0.5s for
  -- arg_max); event_id is unique so the composite is tie-free.
  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n_events,
         arg_max(value,
                 CAST(epoch_us(ts) AS HUGEINT) * 1000000000000 + event_id
         ) AS last_value
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT user_id,
         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily GROUP BY user_id
)
SELECT s.user_id, s.day,
       coalesce(d.n_events, 0) AS n_events,
       round(last_value(d.last_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day), 2) AS ffill_value
FROM spine s LEFT JOIN daily d USING (user_id, day)
ORDER BY s.user_id, s.day
"""


# ---------------------------------------------------------------------------
# stream_sessionize_replay — the STREAMING stateful sessionizer
# (streaming/joins.stateful_sessionizer: applyInPandasWithState +
# event-time timeout), replayed over the events table as a bounded
# stream and oracle-checked against the same gap-sessionization SQL
# the batch query uses. This is the one catalog entry that gives the
# custom-stateful-streaming path a driver-recorded differential; the
# rest of the streaming suite is pytest-only by nature.
#
# Determinism contract: the watermark delay is set far beyond the
# dataset's time span, so no row is ever late-dropped and no timeout
# ever fires — the emitted set is EXACTLY the sessions closed by a
# later in-stream event, i.e. every session except each user's last
# (which stays parked in state when the bounded stream ends). The
# oracle mirrors that by excluding each user's final session. Arrival
# order per user is guaranteed by the single-file source (one
# micro-batch; the kernel sorts within a batch). sum_value is omitted:
# the kernel's float accumulation order is not contract-stable.
# Scale: identical shuffle/state shape as production streaming — one
# shuffle on user_id per micro-batch, O(open sessions) state.
# ---------------------------------------------------------------------------


def _table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A test table as a bounded stream.

    The physical schema comes from the batch reader (readStream needs
    it up front). FileStreamSource requires a directory or glob (a
    bare file path is rejected as basePath); the glob pins the single
    table file, which also guarantees ONE micro-batch — the in-order /
    all-at-once arrival contract the replay oracles rely on.
    """
    raw_schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    return spark.readStream.schema(raw_schema).parquet(f"{sf_dir}/{name}.*")


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a bounded stream, ts-normalized like t()
    (the normalization dispatches on the scanned type, same as the
    batch loader)."""
    from etl_ml_pipeline_spark.queries.tables import _normalize_events_ts

    return _normalize_events_ts(_table_stream(spark, sf_dir, "events"))


def _events_bytes(sf_dir: str) -> int:
    """On-disk size of the replay source table (state-sizing hint)."""
    from etl_ml_pipeline_spark.queries.tables import _table_bytes

    return _table_bytes(sf_dir, "events") or (1 << 40)


def _replay_ckpt_root() -> str:
    """One session-scoped checkpoint root, removed at process exit —
    repeated correctness/bench runs no longer accumulate per-invocation
    mkdtemp directories (ADVICE r05)."""
    global _CKPT_ROOT
    if _CKPT_ROOT is None:
        import atexit
        import tempfile

        _CKPT_ROOT = tempfile.TemporaryDirectory(prefix="replay_ckpt_")
        atexit.register(_CKPT_ROOT.cleanup)
    return _CKPT_ROOT.name


_CKPT_ROOT = None


def _write_batches_spark(
    df: DataFrame, root: str, ts_col: str = "ts", conds=None
) -> None:
    """Materialize a DataFrame as 3 mtime-ordered single-file parquet
    batches (min(ts)+10d / +20d cuts, or explicit ``conds`` predicates)
    for the file-source replay harness — WITH SPARK WRITES, not a
    driver ``toPandas()`` slice (VERDICT r07 #5): the only driver sync
    is the 1-row min(ts) aggregate, so the harness shape scales with
    the engine. Each batch is written ``coalesce(1)`` (the file
    source's maxFilesPerTrigger=1 contract needs exactly one file per
    trigger; the write runs on an executor and spills to disk, never
    through driver memory) and the single part file is renamed to
    ``root/b{i}.parquet`` with an explicit utime stamp — the file
    source orders triggers by mtime, and same-ms writes reorder
    nondeterministically (see tests/test_streaming.py)."""
    import datetime as _dt
    import glob
    import os
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    if conds is None:
        t0 = df.agg(F.min(ts_col).alias("t0")).first()["t0"]
        c1 = t0 + _dt.timedelta(days=10)
        c2 = t0 + _dt.timedelta(days=20)
        conds = (
            F.col(ts_col) < F.lit(c1),
            (F.col(ts_col) >= F.lit(c1)) & (F.col(ts_col) < F.lit(c2)),
            F.col(ts_col) >= F.lit(c2),
        )

    # The three batch writes are independent single-task jobs — submit
    # them from a thread pool so they overlap instead of serializing
    # three driver syncs (guide §2.6; r15). Bytes, file names and the
    # explicit mtime stamps are identical to the sequential form, so
    # trigger order is unchanged.
    def _write_one(i_cond: tuple[int, object]) -> None:
        i, cond = i_cond
        tmp = f"{root}/_tmp_b{i}"
        df.filter(cond).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        path = f"{root}/b{i}.parquet"
        shutil.move(part, path)
        shutil.rmtree(tmp)
        stamp = 1_700_000_000 + i * 10
        os.utime(path, (stamp, stamp))

    conds = list(conds)
    if not conds:  # ADVICE r15 #2: ThreadPoolExecutor(0) raises
        return
    with ThreadPoolExecutor(max_workers=len(conds)) as pool:
        list(pool.map(_write_one, enumerate(conds, 1)))


# Streaming state partitioning is FIXED at query start (the count is
# baked into the checkpoint; AQE cannot coalesce it at runtime the way
# it coalesces batch shuffles), and every partition of every stateful
# operator pays per-trigger file/commit overhead on the checkpoint
# volume. So size it from the bounded input the way AQE's advisory
# target sizes batch partitions: one state partition per ~32 MB of
# source input, clamped to [1, session shuffle partitions]. For a
# 100 TB stream input_bytes/32MB >> cores, so the clamp leaves the
# session's own parallelism in charge — the derivation only shrinks
# tiny bounded replays, where it is pure fixed-cost removal (measured:
# stream_late_outer_join_replay at sf0.1, 32 -> 4 partitions, identical
# rows, 14.2s -> 5.0s interleaved in one session). Cluster operators
# can pin an explicit count with SPARK_GRAFT_STREAM_SHUFFLE.
_STREAM_STATE_TARGET_BYTES = 32 * 1024 * 1024

# applyInPandasWithState replays use a much smaller per-partition byte
# target: their per-trigger fixed cost per partition is one Arrow
# channel round trip (a few ms), not the JVM state store's checkpoint
# file set (tens of ms), so the break-even bytes per partition is
# correspondingly smaller — while the per-GROUP Python compute still
# wants to spread across workers. Swept at sf0.1/local[32]
# (events source ~2 MB): 32 parts / 16 / 8 / 4 / 1 read
# ttl 6.5 / 4.8 / 4.5 / 5.4 / 9.4s and sessionize 2.9 / 2.1 / 2.5 /
# 3.9s — the 128 KB target lands at the measured sweet spot and, like
# the JVM rule, leaves the session's own parallelism in charge as soon
# as the source outgrows target*cores (any 100 TB stream), so the
# derivation only ever shrinks tiny bounded replays.
_STREAM_PYSTATE_TARGET_BYTES = 128 * 1024


def _stream_state_partitions(
    spark: SparkSession,
    input_bytes: int,
    target_bytes: int = _STREAM_STATE_TARGET_BYTES,
) -> int:
    import os

    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "")
    if env.isdigit() and int(env) > 0:
        return int(env)
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    derived = (input_bytes + target_bytes - 1) // target_bytes
    return max(1, min(cur, derived))


def _replay(
    stream_result: DataFrame,
    output_mode: str,
    input_bytes: int | None = None,
    python_state: bool = False,
) -> DataFrame:
    """Run a bounded streaming plan to completion into a memory sink
    and return its contents.

    The sink's temp view is dropped before returning (forcing analysis
    first pins the resolved plan, so the returned DataFrame stays valid
    — verified behavior) and the checkpoint lives under the session-
    scoped root above: a long session running many replays leaks
    neither registered tables nor checkpoint directories.

    ``input_bytes`` (the on-disk size of the stream's source) drives
    the state-partition sizing above; the conf is set only for the
    stream's start and restored right after (replays are sequential in
    this process). Partition count never changes results — stateful
    operators key state by value hash, not by partition layout (pinned
    by tests/test_streaming.py::test_replay_invariant_to_state_partitions).

    ``python_state=True`` marks plans whose state transition is an
    ``applyInPandasWithState`` kernel: their per-trigger cost is
    per-GROUP Python compute plus one Arrow channel per partition, not
    JVM state-store file overhead — so they size from the SMALLER
    python-state byte target (``_STREAM_PYSTATE_TARGET_BYTES``) instead
    of the 32 MB JVM target. Shrinking all the way to 1 serializes the
    groups through one Python worker (measured at sf0.1:
    stream_sessionize_replay 2.4s at 32 parts -> 9.4s at 1, with the
    sweet spot at the 128 KB-derived 8-16 — see the target's comment).
    """
    import uuid

    name = f"replay_{uuid.uuid4().hex}"
    spark = stream_result.sparkSession
    prev_parts = None
    if input_bytes is not None:
        target = (
            _STREAM_PYSTATE_TARGET_BYTES
            if python_state
            else _STREAM_STATE_TARGET_BYTES
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(_stream_state_partitions(spark, input_bytes, target)),
        )
    try:
        q = (
            stream_result.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{_replay_ckpt_root()}/{name}")
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()  # terminated already (availableNow); releases the handle
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    out = spark.table(name)
    out.schema  # force analysis: resolve the view reference NOW
    spark.catalog.dropTempView(name)
    return out


def stream_sessionize_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.joins import stateful_sessionizer

    sessions = stateful_sessionizer(
        _events_stream(spark, sf_dir),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        gap_minutes=30,
        watermark="36500 days",  # >> data span: nothing late, no timeouts
    )
    return (
        _replay(sessions, "append", input_bytes=_events_bytes(sf_dir), python_state=True)
        .select(
            "user_id",
            F.col("session_start").cast("string").alias("session_start"),
            F.col("session_end").cast("string").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


_STREAM_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
sess AS (
  SELECT user_id, session_seq,
         CAST(min(ts) AS VARCHAR) AS session_start,
         CAST(max(ts) AS VARCHAR) AS session_end,
         count(*) AS n_events
  FROM numbered
  GROUP BY user_id, session_seq
)
SELECT user_id, session_start, session_end, n_events
FROM sess
QUALIFY session_seq < max(session_seq) OVER (PARTITION BY user_id)
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# stream_tumble_replay — the streaming watermarked tumbling-window
# aggregation (streaming/windows.tumbling_window_agg) replayed over the
# bounded events stream in COMPLETE mode, which emits every window
# regardless of watermark progress — so the result must equal the batch
# hourly rollup exactly (same grouping, same rounding grid as
# tumble_hourly_events' oracle). Covers the watermark+window streaming
# path with a driver-recorded differential.
# Scale: identical to the production stream — one shuffle on
# (window, event_type) per micro-batch with partial aggregation; state
# is one row per open window x type. (Complete mode is for the bounded
# replay; unbounded production uses append + watermark eviction.)
# ---------------------------------------------------------------------------


def stream_tumble_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.windows import tumbling_window_agg

    agg = tumbling_window_agg(
        _events_stream(spark, sf_dir),
        ts_col="ts",
        window="1 hour",
        watermark="2 hours",
        group_cols=("event_type",),
    )
    return (
        _replay(agg, "complete", input_bytes=_events_bytes(sf_dir))
        .select(
            F.col("window_start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


# Same rollup as _TUMBLE_SQL, with the streaming helper's intermediate
# round-4 applied before the final round-2 (round twice on both sides).
_STREAM_TUMBLE_SQL = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
       event_type,
       count(*) AS n_events,
       round(round(sum(value), 4), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# stream_running_totals_replay — the per-key cumulative count/sum
# stateful operator (streaming/windows.stateful_running_totals,
# applyInPandasWithState in UPDATE mode) replayed over the bounded
# events stream. The single micro-batch emits exactly one final row
# per user — the state each key would carry into the next trigger —
# which must equal the batch per-user aggregate.
# Scale: state is O(1) per key (n, total); the replay exercises the
# same state-store write path as production.
# ---------------------------------------------------------------------------


def stream_running_totals_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.windows import stateful_running_totals

    totals = stateful_running_totals(_events_stream(spark, sf_dir))
    return (
        _replay(totals, "update", input_bytes=_events_bytes(sf_dir), python_state=True)
        .select(
            "user_id",
            "n",
            F.round("total", 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


_STREAM_TOTALS_SQL = """
SELECT user_id, count(*) AS n,
       round(round(sum(value), 4), 2) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# stream_topk_replay — the streaming leaderboard: per event_type, the
# top-5 users by cumulative value cents maintained as stateful state
# (streaming/windows.stateful_topk, applyInPandasWithState UPDATE
# mode), replayed over the bounded stream. The single micro-batch's
# final emission must equal the batch groupBy + rank — same integer
# cents (HALF_UP per event), same (total desc, user asc) tie order.
# Scale: exact per-key member map while member cardinality is bounded;
# the docstring names the SpaceSaving swap for open-world keys.
# ---------------------------------------------------------------------------


def stream_topk_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.windows import stateful_topk

    board = stateful_topk(_events_stream(spark, sf_dir), k=5)
    return _replay(board, "update", input_bytes=_events_bytes(sf_dir), python_state=True).orderBy("event_type", "rank")


# ---------------------------------------------------------------------------
# window_time_range_rolling — event-TIME range frame, not a row frame:
# per user, the trailing-3600-second count and cent sum at every event
# (RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW over epoch seconds).
# Distinct from every ROWS-frame query in the catalog: the frame width
# varies with event density, and RANGE includes all ORDER-BY peers —
# identical peer semantics in both engines, so ties on the timestamp
# are safe by construction (no tiebreak column needed or allowed).
# Scale: one shuffle on user_id; frame state is bounded by the time
# horizon — the batch shape of a Flink-style sliding time window.
# ---------------------------------------------------------------------------


def window_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, 0)
    )
    return (
        ev.withColumn("n_1h", F.count("*").over(w))
        .withColumn("cents_1h", F.sum("c").over(w))
        .select("user_id", "event_id", "epoch_s", "n_1h", "cents_1h")
        .orderBy("user_id", "event_id")
    )


_TIME_RANGE_SQL = """
SELECT user_id, event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(c) OVER w AS BIGINT) AS cents_1h
FROM (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


_STREAM_TOPK_SQL = """
WITH totals AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
  FROM events
  GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, user_id, total_cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY total_cents DESC, user_id ASC) AS rank
  FROM totals
)
SELECT event_type, CAST(rank AS INT) AS rank, user_id, total_cents
FROM ranked
WHERE rank <= 5
ORDER BY event_type, rank
"""


# ---------------------------------------------------------------------------
# stream_dedup_replay — bounded-state streaming dedup
# (dropDuplicatesWithinWatermark) replayed over the events stream
# UNIONED WITH ITSELF, so every event arrives (at least) twice across
# two file sources; the deduped output must collapse back to exactly
# the distinct event set, proven by per-type counts against the raw
# batch table. The beyond-span watermark keeps every key's state live
# for the whole bounded replay (no late drops) — production uses a
# real horizon so state expires; semantics over the retained horizon
# are identical.
# Scale: state is one 64-bit key per event inside the horizon — the
# reason the operator exists; an unbounded dropDuplicates would
# accumulate keys forever.
# ---------------------------------------------------------------------------


def stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.windows import stream_dedup

    doubled = _events_stream(spark, sf_dir).unionByName(
        _events_stream(spark, sf_dir)
    )
    deduped = stream_dedup(
        doubled, keys=("event_id",), ts_col="ts", watermark="36500 days"
    )
    return (
        _replay(deduped, "append", input_bytes=_events_bytes(sf_dir))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_id").alias("n_distinct"),
        )
        .orderBy("event_type")
    )


_STREAM_DEDUP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT event_id) AS n_distinct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# stream_dedup_index_replay — incremental corpus dedup against a
# PERSISTENT MinHash signature index, replayed over 3 mtime-ordered
# document batches (streaming/dedup_index.py — the production
# ingestion question: "is this NEW doc a near-dup of anything we
# already hold", answered per batch without recomputing corpus
# signatures). Batch k's docs dedup against (a) the index = unique
# SURVIVORS of batches < k and (b) earlier-id docs of batch k itself;
# each batch's survivors append their 16-int signatures so batch k+1
# sees them. The oracle unrolls that exact 3-batch survivorship chain
# in SQL on top of the same md5 MinHash algebra dedup_minhash_documents
# pins, so a green hash proves the foreachBatch state machine
# (read-index-before-append ordering, intra-batch id ordering, the
# >=8/16 threshold, the argmax/min-id dup_of tie-break) bit-for-bit.
# Corpus: the deterministically dup'd corpus restricted to even
# doc_ids (bounds the DuckDB band joins; the Spark path scales),
# batched by (doc_id div 2) % 3 — 1M and 2M are != 0 mod 6, so a doc
# and its injected dups usually land in DIFFERENT batches and the
# cross-batch index path does real work.
# ---------------------------------------------------------------------------


def _dedup_index_run(
    spark: SparkSession, sf_dir: str, compact_every: int | None
) -> DataFrame:
    """The 3-batch MinHash-index ingest loop, parameterized on the
    compaction cadence — shared by the catalog query (compact_every=2)
    and scripts/compaction_ladder.py's maintenance-cost A/B (on vs
    off at each ladder rung; verdicts are invariant by contract)."""
    import os
    import uuid

    from etl_ml_pipeline_spark.queries.dedup_q import _dup_corpus
    from etl_ml_pipeline_spark.streaming.dedup_index import (
        build_minhash_index,
        stream_dedup_against_index,
    )

    corpus = _dup_corpus(spark, sf_dir, heavy=True).filter(
        F.col("doc_id") % 2 == 0
    )
    run = uuid.uuid4().hex
    root = f"{_replay_ckpt_root()}/dedup_in_{run}"
    os.makedirs(root)
    _write_batches_spark(
        corpus,
        root,
        conds=[F.expr("doc_id div 2") % 3 == i for i in range(3)],
    )
    index_path = f"{_replay_ckpt_root()}/dedup_idx_{run}"
    build_minhash_index(corpus.limit(0), index_path)  # schema-only seed
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    view = f"dedup_verdicts_{run}"
    q = stream_dedup_against_index(
        stream,
        index_path,
        f"{_replay_ckpt_root()}/dedup_ck_{run}",
        verdicts_view=view,
        threshold=0.5,
        compact_every=compact_every,
    )
    q.awaitTermination()
    q.stop()
    out = spark.table(f"global_temp.{view}")
    out.schema  # force analysis: resolve the view reference NOW
    spark.catalog.dropGlobalTempView(view)
    return out


def stream_dedup_index_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # compact_every=2: batch 2 compacts the index batches 0-1 appended
    # BEFORE reading it, so every round's driver differential proves
    # compaction verdict-invariance, not just the unit test
    out = _dedup_index_run(spark, sf_dir, compact_every=2)
    return out.select(
        "doc_id",
        "dup_of",
        # est_jaccard is k/16 (exact binary fraction): *16 recovers the
        # integer match count losslessly
        (F.col("est_jaccard") * 16).cast("long").alias("n_match16"),
    ).orderBy("doc_id")


def _dedup_index_oracle() -> str:
    from etl_ml_pipeline_spark.operators.dedup import (
        MINHASH_COEFFS,
        MINHASH_PRIME,
    )
    from etl_ml_pipeline_spark.queries.dedup_q import _DUP_CORPUS_SQL

    np_, bands, rows = 16, 4, 4
    coeff_rows = ", ".join(
        f"({i}, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(MINHASH_COEFFS[:np_])
    )
    min_cols = ", ".join(
        f"min(CASE WHEN perm = {i} THEN ph END) AS m{i}" for i in range(np_)
    )
    band_exprs = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"m{b * rows + r}" for r in range(rows))
        + f") AS band{b}"
        for b in range(bands)
    )
    band_joins = "\nUNION ALL\n".join(
        f"SELECT a.id AS id_a, b.id AS id_b FROM banded a JOIN banded b "
        f"ON a.band{b} = b.band{b} AND a.id < b.id"
        for b in range(bands)
    )
    matches = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(np_)
    )
    return f"""
WITH corpus AS (
  SELECT * FROM ({_DUP_CORPUS_SQL}) WHERE doc_id % 2 = 0
),
toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM corpus
),
sh AS (
  SELECT id, unnest(list_distinct(
           list_transform(range(1, len(tk) - 1),
                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
         )) AS shingle
  FROM toks
),
hashed AS (
  SELECT id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_PRIME} AS h
  FROM sh
),
perms(perm, a, b) AS (VALUES {coeff_rows}),
permuted AS (
  SELECT id, perm, (a * h + b) % {MINHASH_PRIME} AS ph
  FROM hashed CROSS JOIN perms
),
sigs AS (SELECT id, {min_cols} FROM permuted GROUP BY id),
banded AS (SELECT id, *, {band_exprs} FROM sigs),
p AS (  -- band-sharing pairs at/above the 8/16 threshold, undirected
  SELECT c.id_a, c.id_b, ({matches}) AS nm
  FROM (SELECT DISTINCT id_a, id_b FROM ({band_joins})) c
  JOIN sigs sa ON sa.id = c.id_a
  JOIN sigs sb ON sb.id = c.id_b
  WHERE ({matches}) >= 8
),
dp AS (
  SELECT id_a AS old_id, id_b AS new_id, nm FROM p
  UNION ALL SELECT id_b, id_a, nm FROM p
),
bd AS (SELECT id, (id // 2) % 3 AS bat FROM sigs),
dpb AS (
  SELECT dp.old_id, dp.new_id, dp.nm, bo.bat AS bo, bn.bat AS bn
  FROM dp
  JOIN bd bo ON bo.id = dp.old_id
  JOIN bd bn ON bn.id = dp.new_id
),
-- batch 1: intra-batch only (the index is empty)
e1 AS (SELECT * FROM dpb WHERE bn = 0 AND bo = 0 AND old_id < new_id),
s1 AS (SELECT id FROM bd WHERE bat = 0
       AND id NOT IN (SELECT new_id FROM e1)),
-- batch 2: survivors of batch 1 (any id) OR earlier-id batch-2 docs
e2 AS (SELECT * FROM dpb WHERE bn = 1
       AND (old_id IN (SELECT id FROM s1) OR (bo = 1 AND old_id < new_id))),
s2 AS (SELECT id FROM bd WHERE bat = 1
       AND id NOT IN (SELECT new_id FROM e2)),
-- batch 3: survivors of batches 1+2 OR earlier-id batch-3 docs
e3 AS (SELECT * FROM dpb WHERE bn = 2
       AND (old_id IN (SELECT id FROM s1 UNION ALL SELECT id FROM s2)
            OR (bo = 2 AND old_id < new_id))),
allv AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
         UNION ALL SELECT * FROM e3)
SELECT new_id AS doc_id,
       (min(struct_pack(negnm := -nm, oid := old_id))).oid AS dup_of,
       CAST(max(nm) AS BIGINT) AS n_match16
FROM allv
GROUP BY new_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# stream_slide_replay — sliding event-time windows (1 hour, 15-minute
# slide: every event lands in exactly 4 overlapping windows) replayed
# in complete mode. The oracle materializes the window membership
# explicitly: window_start = time_bucket(15 min, ts) - k*15min for
# k in 0..3 (both engines' buckets are epoch-aligned at this
# granularity), so the streaming expansion must match the relational
# unrolling bucket-for-bucket.
# ---------------------------------------------------------------------------


def stream_slide_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.windows import sliding_window_agg

    agg = sliding_window_agg(
        _events_stream(spark, sf_dir),
        ts_col="ts",
        window="1 hour",
        slide="15 minutes",
        watermark="2 hours",
    )
    return (
        _replay(agg, "complete", input_bytes=_events_bytes(sf_dir))
        .select(
            F.col("window_start").cast("string").alias("window_start"),
            "n_events",
        )
        .orderBy("window_start")
    )


_STREAM_SLIDE_SQL = """
WITH ks AS (SELECT unnest(range(4)) AS k),
w AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts)
           - to_minutes(15 * k) AS window_start
  FROM events, ks
)
SELECT CAST(window_start AS VARCHAR) AS window_start,
       count(*) AS n_events
FROM w
GROUP BY window_start
ORDER BY window_start
"""


# ---------------------------------------------------------------------------
# stream_session_window_replay — Spark's built-in session_window
# aggregation (streaming/windows.session_window_agg) replayed in
# complete mode: every gap-merged session emits, so the result must
# equal the batch lag+cumsum sessionization with session_end mapped to
# last-event + gap (session_window's closed bound). Together with
# stream_sessionize_replay this pins BOTH sessionization paths — the
# built-in window merge and the custom applyInPandasWithState kernel —
# to the same relational definition.
# ---------------------------------------------------------------------------


def stream_session_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.windows import session_window_agg

    agg = session_window_agg(
        _events_stream(spark, sf_dir),
        ts_col="ts",
        gap="30 minutes",
        watermark="2 hours",
        key_col="user_id",
    )
    return (
        _replay(agg, "complete", input_bytes=_events_bytes(sf_dir))
        .select(
            "user_id",
            F.col("session_start").cast("string").alias("session_start"),
            F.col("session_end").cast("string").alias("session_end"),
            "n_events",
            F.round("sum_value", 2).alias("session_value"),
        )
        .orderBy("user_id", "session_start")
    )


_STREAM_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id,
       CAST(min(ts) AS VARCHAR) AS session_start,
       CAST(max(ts) + INTERVAL 30 MINUTE AS VARCHAR) AS session_end,
       count(*) AS n_events,
       round(round(sum(value), 4), 2) AS session_value
FROM numbered
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# stream_interval_join_replay — the watermarked stream-stream interval
# join (streaming/joins.stream_stream_interval_join): click events
# joined to purchase events of the same user within a 1-hour lookback,
# BOTH sides unbounded streams. On the bounded replay every match is
# emitted (inner join emits as matches form, independent of watermark
# progress), so per-user match counts must equal the relational
# interval self-join. Join state in production stays bounded by
# watermark + interval — the property that makes this join possible on
# infinite streams.
# ---------------------------------------------------------------------------


def stream_interval_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.joins import stream_stream_interval_join

    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
    )
    joined = stream_stream_interval_join(
        clicks,
        purchases,
        key_left="c_user",
        key_right="p_user",
        ts_left="c_ts",
        ts_right="p_ts",
        lookback="1 hour",
        watermark="36500 days",
    )
    return (
        _replay(joined, "append", input_bytes=_events_bytes(sf_dir))
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("p_id").alias("n_purchases_matched"),
        )
        .orderBy("user_id")
    )


_STREAM_INTERVAL_JOIN_SQL = """
SELECT c.user_id AS user_id,
       count(*) AS n_pairs,
       count(DISTINCT p.event_id) AS n_purchases_matched
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
GROUP BY c.user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# stream_cdc_view_replay — the foreachBatch-maintained merge-on-read
# CURRENT VIEW (streaming/windows.write_stream_cdc_view): the same
# base + v2-update change set cdc_current_orders uses, but delivered
# as a CDC stream and folded per micro-batch through cdc_latest_view
# into a global temp view. The final snapshot's per-status aggregate
# must equal the batch merge — one fold code path for both worlds,
# now under the driver differential. (Single micro-batch by the
# one-file-source contract; across batches the fold is version-
# ordered, pinned by tests/test_streaming.py.)
# ---------------------------------------------------------------------------


def stream_cdc_view_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from etl_ml_pipeline_spark.streaming.windows import write_stream_cdc_view

    o = _table_stream(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = o.withColumn("version", F.lit(1)).withColumn("deleted", F.lit(False))
    updates = (
        o.filter((F.col("o_orderkey") % 13 == 0) | (F.col("o_orderkey") % 17 == 0))
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("o_orderkey") % 17 == 0, F.col("o_orderstatus"))
            .otherwise(F.lit("U"))
            .alias("o_orderstatus"),
            (F.floor(F.col("o_totalprice") * 1.1 * 100) / 100).alias("o_totalprice"),
            F.lit(2).alias("version"),
            (F.col("o_orderkey") % 17 == 0).alias("deleted"),
        )
    )
    view_name = f"cdc_replay_{uuid.uuid4().hex}"
    q = write_stream_cdc_view(
        base.unionByName(updates),
        keys=["o_orderkey"],
        version_col="version",
        delete_col="deleted",
        view_name=view_name,
        checkpoint_dir=tempfile.mkdtemp(prefix="cdc_replay_ckpt_"),
    )
    q.awaitTermination()
    return (
        spark.table(f"global_temp.{view_name}")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# Same merge as the batch cdc_current_orders oracle.
_STREAM_CDC_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         1 AS version, FALSE AS deleted, 0 AS src
  FROM orders
),
updates AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 17 = 0 THEN o_orderstatus ELSE 'U' END AS o_orderstatus,
         floor(o_totalprice * 1.1 * 100) / 100 AS o_totalprice,
         2 AS version, o_orderkey % 17 = 0 AS deleted, 1 AS src
  FROM orders
  WHERE o_orderkey % 13 = 0 OR o_orderkey % 17 = 0
),
merged AS (SELECT * FROM base UNION ALL SELECT * FROM updates),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY o_orderkey ORDER BY version DESC, src DESC) AS rn
  FROM merged
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM ranked
WHERE rn = 1 AND NOT deleted
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# sketch_rolling_distinct_users — mergeable-sketch rollup: one pass
# builds a per-day HLL sketch of user_id (Datasketches HllSketch via
# hll_sketch_agg), then every trailing-7-day distinct count is a
# UNION OF THE 7 DAILY SKETCHES — no second scan of the raw events.
# This is the sketch-rollup pattern that makes rolling/cube distinct
# counts feasible at 100 TB: exact rolling distinct must re-shuffle
# the raw (day x user) pairs for every window, while sketch state is
# O(days x 2^lgK) and merges are associative (same story as the
# GK/HLL aggregates in queries/relational.py).
# The estimate is sketch-implementation-specific, so the compared
# output carries the exact count and a generous ~5-sigma error
# contract (lgConfigK=12 -> rsd ~1.6%; bound max(5, 8%)) as a boolean,
# like agg_approx_distinct_parts.
# ---------------------------------------------------------------------------


def sketch_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    )
    daily_sk = ev.groupBy("day").agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    spine = daily_sk.select(F.col("day").alias("anchor"))
    rolled = (
        spine.join(
            daily_sk,
            (F.col("day") <= F.col("anchor"))
            & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
        )
        .groupBy("anchor")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
    )
    exact = (
        ev.distinct()
        .alias("e")
        .join(
            spine,
            (F.col("e.day") <= F.col("anchor"))
            & (F.col("e.day") >= F.date_sub(F.col("anchor"), 6)),
        )
        .groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        exact.join(rolled, "anchor")
        .select(
            F.col("anchor").cast("date").cast("string").alias("day"),
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.greatest(F.lit(5), F.ceil(F.col("exact_users") * 0.08))
            ).alias("within_bound"),
        )
        .orderBy("day")
    )


_ROLLING_DISTINCT_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
spine AS (SELECT DISTINCT day AS anchor FROM du)
SELECT CAST(CAST(anchor AS DATE) AS VARCHAR) AS day,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM spine JOIN du
  ON du.day <= spine.anchor AND du.day >= spine.anchor - INTERVAL 6 DAY
GROUP BY anchor
ORDER BY day
"""


# ---------------------------------------------------------------------------
# stream_static_join_replay — the stream-static lookup join
# (streaming/joins.stream_static_enrich): the bounded events stream
# broadcast-joined per micro-batch to the static customer dimension,
# then aggregated per (segment, event_type) in COMPLETE mode, which
# must equal the batch join + rollup exactly.
# Scale: stream-static joins hold NO join state; the broadcast hint
# makes each micro-batch a map-side hash join, so the stream side never
# shuffles for the join — the enrich pattern that survives 100 TB/day.
# ---------------------------------------------------------------------------


def stream_static_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.queries.tables import t
    from etl_ml_pipeline_spark.streaming.joins import stream_static_enrich

    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = stream_static_enrich(_events_stream(spark, sf_dir), dim, "user_id")
    agg = enriched.groupBy("segment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return _replay(agg, "complete", input_bytes=_events_bytes(sf_dir)).orderBy("segment", "event_type")


_STREAM_STATIC_JOIN_SQL = """
SELECT c.c_mktsegment AS segment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
ORDER BY segment, event_type
"""


# ---------------------------------------------------------------------------
# forecast_holt_events — Holt's linear-trend exponential smoothing over
# the daily revenue series of each event type: the classic short-term
# forecaster with both a level and a trend state (two COUPLED
# recursions, so neither a window frame nor GroupBy.ewm expresses it).
#
# Scale shape: the events table reduces FIRST (one map-side-combined
# shuffle to |event_type x day| rows, daily sums on the exact cent
# grid so both engines see bit-identical y), and only the reduced
# calendar-bounded series runs the sequential recursion. The oracle
# replays the recursion in a DuckDB RECURSIVE CTE with the SAME
# floating-point expression tree ((1 - 0.2) etc., never pre-folded
# constants), so doubles agree bit-for-bit before round(4) — the
# rsi_macd_events playbook.
# ---------------------------------------------------------------------------


def forecast_holt_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("long")) / F.lit(100.0)
            ).alias("y")
        )
    )
    out = add_holt_linear(daily, "event_type", "day", "y", alpha=0.2, beta=0.1)
    return out.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "y",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("forecast", 4).alias("forecast"),
    ).orderBy("event_type", "day")


_HOLT_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS y
  FROM events GROUP BY 1, 2
),
ordered AS (
  SELECT event_type, day, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
),
rec AS (
  SELECT event_type, day, rn, y, y AS lv, 0.0::DOUBLE AS tr
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.event_type, o.day, o.rn, o.y,
         0.2 * o.y + (1 - 0.2) * (r.lv + r.tr),
         0.1 * ((0.2 * o.y + (1 - 0.2) * (r.lv + r.tr)) - r.lv)
           + (1 - 0.1) * r.tr
  FROM rec r
  JOIN ordered o ON o.event_type = r.event_type AND o.rn = r.rn + 1
)
SELECT event_type, CAST(day AS VARCHAR) AS day, y,
       round(lv, 4) AS level,
       round(tr, 4) AS trend,
       round(lv + tr, 4) AS forecast
FROM rec
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# changepoint_cusum_events — one-sided CUSUM change-point detection on
# each event type's daily revenue: baseline mean over the first 10
# days, then s_t = max(0, s_{t-1} + (y_t*10 - mu_num - mu_num div 20))
# — the classic upward-shift detector with 5% slack, monitored from day
# 11. EVERY quantity is an exact integer (cents scaled by the baseline
# denominator), so the recursion has no float anywhere and the DuckDB
# RECURSIVE CTE replays it exactly. Alarm fires when the accumulated
# excess tops 3x the scaled baseline mean.
#
# Scale shape: reduce-first like forecast_holt_events — one map-side-
# combined daily aggregation, then the bounded per-type series runs the
# sequential recursion in a partition-batched kernel.
# ---------------------------------------------------------------------------

_CUSUM_BASE, _CUSUM_SLACK_DIV, _CUSUM_ALARM_X = 10, 20, 3


def changepoint_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    daily = (
        _events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"))
    )
    schema = "event_type string, day string, y long, s long, alarm boolean"

    def kernel(batches):
        parts = [p for p in batches]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(["event_type", "day"]).reset_index(drop=True)
        rows = []
        for _, g in pdf.groupby("event_type", sort=False):
            ys = [int(v) for v in g["y"]]
            if len(ys) <= _CUSUM_BASE:
                continue
            mu_num = sum(ys[:_CUSUM_BASE])
            slack = mu_num // _CUSUM_SLACK_DIV
            s = 0
            for day, y in zip(
                g["day"].iloc[_CUSUM_BASE:], ys[_CUSUM_BASE:]
            ):
                s = max(0, s + y * _CUSUM_BASE - mu_num - slack)
                rows.append(
                    {
                        "event_type": g["event_type"].iloc[0],
                        "day": str(day),
                        "y": y,
                        "s": s,
                        "alarm": s > _CUSUM_ALARM_X * mu_num,
                    }
                )
        yield pd.DataFrame(
            rows, columns=["event_type", "day", "y", "s", "alarm"]
        )

    sess = spark
    n_parts = max(
        int(sess.conf.get("spark.sql.shuffle.partitions")),
        sess.sparkContext.defaultParallelism,
    )
    out = daily.repartition(n_parts, "event_type").mapInPandas(kernel, schema)
    return out.orderBy("event_type", "day")


_CUSUM_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
ordered AS (
  SELECT event_type, day, y,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
),
mu AS (
  SELECT event_type, CAST(sum(y) AS BIGINT) AS mu_num
  FROM ordered WHERE rn <= {_CUSUM_BASE}
  GROUP BY 1 HAVING count(*) = {_CUSUM_BASE}
),
rec AS (
  SELECT m.event_type, {_CUSUM_BASE} AS rn, CAST(0 AS BIGINT) AS s,
         CAST(NULL AS BIGINT) AS y, CAST(NULL AS DATE) AS day
  FROM mu m
  UNION ALL
  SELECT o.event_type, o.rn,
         greatest(0, r.s + o.y * {_CUSUM_BASE} - m.mu_num
                     - m.mu_num // {_CUSUM_SLACK_DIV}),
         o.y, o.day
  FROM rec r
  JOIN ordered o ON o.event_type = r.event_type AND o.rn = r.rn + 1
  JOIN mu m ON m.event_type = r.event_type
)
SELECT r.event_type, CAST(r.day AS VARCHAR) AS day, r.y, r.s,
       r.s > {_CUSUM_ALARM_X} * m.mu_num AS alarm
FROM rec r JOIN mu m USING (event_type)
WHERE r.rn > {_CUSUM_BASE}
ORDER BY r.event_type, r.day
"""


# ---------------------------------------------------------------------------
# stream_cusum_replay — the CUSUM change-point monitor as a STREAMING
# stateful operator (streaming/windows.stateful_cusum): state per key
# is the day -> cents map (bounded by |days|, never |events|), each
# trigger folds the batch in and re-emits the monitor table in update
# mode. The recursion is the same exact-integer math as the batch
# query, so the bounded replay (one file -> one micro-batch) is
# hash-checked against the SAME RECURSIVE-CTE oracle — batch/stream
# parity for a production drift monitor.
# ---------------------------------------------------------------------------


def stream_cusum_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.streaming.windows import stateful_cusum

    monitor = stateful_cusum(_events_stream(spark, sf_dir))
    return (
        _replay(monitor, "update", input_bytes=_events_bytes(sf_dir), python_state=True)
        .select("event_type", "day", "y", "s", "alarm")
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# concurrency_peak_events — exact max concurrent sessions per day via a
# DISTRIBUTED SWEEP LINE: sessions (30-min gap, same schedule as
# sessionize_events) become +1/-1 boundary events; the running sum of
# deltas in time order is the live concurrency, and its per-day max is
# the peak. A naive running sum is a single-partition global window
# (the classic scale-killer); here it is two-phase, the prefix-sum
# analog of operators/relational.global_row_number:
#   1. per-day boundary partial sums (one small aggregate),
#   2. cumulative carry-in offset per day (window over ~#days rows),
#   3. within-day running sum (windows partitioned by day, parallel)
#      + broadcast carry-in — identical to the global scan.
# Tie order (ts asc, delta desc: a session starting the instant another
# ends counts as overlapping) is mirrored in the oracle; among equal
# (ts, delta) rows prefix sums are order-invariant, so the per-day max
# is deterministic.
# ---------------------------------------------------------------------------


def concurrency_peak_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    sess = (
        sessionize(ev, "user_id", "ts", 30.0, order_cols=["ts", "event_id"])
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    # r15 optimization: the old shape evaluated the session-scale
    # subtree FOUR times — the +1/-1 boundary union re-derived `sess`
    # per branch (column pruning de-identifies the branches, so
    # exchange reuse never fires), and the day_sums/running diamond
    # doubled that again. Now: explode emits both boundaries in one
    # pass, the within-day running sum comes first, and ONE per-day
    # aggregate yields max_run + dsum + n_started, with the cross-day
    # carry a |days|-row window downstream. peak = max(run) + carry ==
    # max(run + carry) exactly (carry is constant within a day), so
    # the integers are unchanged. 4 sessionize evaluations -> 1, and
    # the broadcast offsets join disappears.
    b = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("bt"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("bt"), F.lit(-1).alias("delta")),
            )
        ).alias("__b")
    ).select(
        F.col("__b.bt").alias("bt"),
        F.col("__b.delta").alias("delta"),
        F.to_date("__b.bt").alias("day"),
    )
    w_run = (
        W.partitionBy("day")
        .orderBy(F.col("bt"), F.desc("delta"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    per_day = (
        b.withColumn("run", F.sum("delta").over(w_run))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions_started"),
            F.max("run").alias("max_run"),
            F.sum("delta").alias("dsum"),
        )
    )
    w_days = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    return (
        per_day.withColumn(
            "carry", F.coalesce(F.sum("dsum").over(w_days), F.lit(0))
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "n_sessions_started",
            (F.col("max_run") + F.col("carry"))
            .cast("long")
            .alias("peak_concurrency"),
        )
        .orderBy("day")
    )


_CONCURRENCY_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq,
         ts
  FROM flagged
),
iv AS (SELECT min(ts) AS s, max(ts) AS e FROM sess GROUP BY user_id, session_seq),
bounds AS (
  SELECT s AS bt, 1 AS delta FROM iv
  UNION ALL
  SELECT e AS bt, -1 AS delta FROM iv
),
run AS (
  SELECT CAST(bt AS DATE) AS day, delta,
         sum(delta) OVER (ORDER BY bt, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM bounds
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions_started,
       CAST(max(running) AS BIGINT) AS peak_concurrency
FROM run
GROUP BY day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# stream_ttl_eviction_replay — MULTI-micro-batch streaming replay with
# real state EVICTION, driver-recorded: a sparse slice of events
# (event_id % 37) is re-materialized as THREE mtime-ordered parquet
# files split at min(ts)+10d/+20d, streamed with maxFilesPerTrigger=1
# (3 genuine triggers), watermark 1 day, through
# streaming/windows.stateful_running_totals_ttl (TTL 3 days). Keys
# silent past their TTL by the watermark clock emit evicted=true
# tombstones and restart from zero — the timeout/eviction semantics a
# single-batch replay can NEVER exercise (VERDICT r06 #6, now under
# the driver's correctness gate, not just pytest).
#
# The oracle UNROLLS the 3-batch schedule in SQL — per-batch
# watermarks (monotonic from 0, max event-ms minus delay), late-row
# drops against the PREVIOUS batch's watermark, per-key cumulative
# integer-cent state, the timeout arm max(last_ms+ttl, wm+1), the
# eviction condition wm > timeout evaluated only in no-presence
# batches (a batch where a key's rows are ALL late still shields it
# from timeout processing — Spark calls the function with data, so
# hasTimedOut stays false), and post-eviction restart. Every emission
# row (update mode) is re-derived, so a green hash proves the full
# cross-batch state machine matches Spark's execution bit-for-bit.
# ---------------------------------------------------------------------------

_TTL_MS = 3 * 24 * 3600 * 1000
_TTL_DELAY_MS = 24 * 3600 * 1000


def stream_ttl_eviction_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from etl_ml_pipeline_spark.streaming.windows import (
        stateful_running_totals_ttl,
    )

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_id") % 37 == 0)
        .select("user_id", "ts", "value")
    )
    root = f"{_replay_ckpt_root()}/ttl_in_{uuid.uuid4().hex}"
    os.makedirs(root)
    _write_batches_spark(ev, root)
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    out = stateful_running_totals_ttl(
        stream.withWatermark("ts", "1 day"),
        ttl_minutes=_TTL_MS // 60000,
    )
    return (
        # input_bytes: pre-filter table size as the sizing hint — the
        # python-state floor wants group parallelism, not the (tiny)
        # filtered batch bytes
        _replay(out, "update", input_bytes=_events_bytes(sf_dir), python_state=True)
        .select(
            "user_id", "n", F.round("total", 2).alias("total"), "evicted"
        )
        .orderBy("user_id", "n", "evicted", "total")
    )


_TTL_REPLAY_SQL = f"""
WITH ev AS (
  SELECT user_id, ts, epoch_ms(ts) AS ms,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_id % 37 = 0
),
c AS (SELECT min(ts) + INTERVAL 10 DAY AS c1,
             min(ts) + INTERVAL 20 DAY AS c2 FROM ev),
b AS (
  SELECT ev.*, CASE WHEN ts < c1 THEN 1 WHEN ts < c2 THEN 2 ELSE 3 END AS bat
  FROM ev, c
),
wm AS (  -- watermark BEFORE batches 2/3/4 (monotonic from 0); "batch 4"
         -- is the extra no-data trigger availableNow runs after the
         -- last file because the watermark advanced — end-of-stream
         -- timeout processing happens there (verified: without it the
         -- replay under-counts exactly the final tombstones)
  SELECT greatest(0, coalesce((SELECT max(ms) FROM b WHERE bat = 1), 0)
                     - {_TTL_DELAY_MS}) AS w1,
         greatest(0, coalesce((SELECT max(ms) FROM b WHERE bat <= 2), 0)
                     - {_TTL_DELAY_MS}) AS w2,
         greatest(0, coalesce((SELECT max(ms) FROM b), 0)
                     - {_TTL_DELAY_MS}) AS w3
),
ot AS (  -- late rows dropped against the PREVIOUS batch's watermark
  SELECT b.*,
         CASE bat WHEN 1 THEN TRUE
                  WHEN 2 THEN ms >= w1
                  ELSE ms >= w2 END AS ontime
  FROM b, wm
),
pk AS (
  SELECT user_id, bat,
         count(*) AS n_any,
         CAST(sum(CASE WHEN ontime THEN 1 ELSE 0 END) AS BIGINT) AS n_ot,
         CAST(sum(CASE WHEN ontime THEN cents ELSE 0 END) AS BIGINT) AS c_ot,
         max(CASE WHEN ontime THEN ms END) AS last_ms
  FROM ot GROUP BY 1, 2
),
u AS (
  SELECT user_id,
    coalesce(max(CASE WHEN bat = 1 THEN n_any END), 0) AS any1,
    coalesce(max(CASE WHEN bat = 2 THEN n_any END), 0) AS any2,
    coalesce(max(CASE WHEN bat = 3 THEN n_any END), 0) AS any3,
    coalesce(max(CASE WHEN bat = 1 THEN n_ot END), 0) AS n1,
    coalesce(max(CASE WHEN bat = 2 THEN n_ot END), 0) AS n2,
    coalesce(max(CASE WHEN bat = 3 THEN n_ot END), 0) AS n3,
    coalesce(max(CASE WHEN bat = 1 THEN c_ot END), 0) AS cc1,
    coalesce(max(CASE WHEN bat = 2 THEN c_ot END), 0) AS cc2,
    coalesce(max(CASE WHEN bat = 3 THEN c_ot END), 0) AS cc3,
    max(CASE WHEN bat = 1 THEN last_ms END) AS lm1,
    max(CASE WHEN bat = 2 THEN last_ms END) AS lm2,
    max(CASE WHEN bat = 3 THEN last_ms END) AS lm3
  FROM pk GROUP BY user_id
),
st AS (
  SELECT u.*, w1, w2, w3,
    CASE WHEN n1 > 0 THEN greatest(lm1 + {_TTL_MS}, 1) END AS to1,
    CASE WHEN n2 > 0 THEN greatest(lm2 + {_TTL_MS}, w1 + 1) END AS to2,
    CASE WHEN n3 > 0 THEN greatest(lm3 + {_TTL_MS}, w2 + 1) END AS to3
  FROM u, wm
),
flags AS (
  SELECT *,
    (any2 = 0 AND n1 > 0 AND w1 > to1) AS evict2,
    -- at batch 3: key absent, not already evicted, live state, and the
    -- effective timeout (re-armed by a batch-2 update when there was
    -- one, else the batch-1 arm) has fallen behind the watermark
    (any3 = 0
     AND NOT (any2 = 0 AND n1 > 0 AND w1 > to1)
     AND (n1 > 0 OR n2 > 0)
     AND w2 > coalesce(to2, to1)) AS evict3
  FROM st
),
flags4 AS (
  SELECT *,
    -- end-of-stream batch 4 (no data, every live key timeout-checked):
    -- a key that evicted at 2 and restarted at 3 carries (n3, cc3) with
    -- the batch-3 arm; an unevicted key carries the full cumulative
    (NOT evict2 AND NOT evict3 AND (n1 + n2 + n3) > 0
     AND w3 > coalesce(to3, to2, to1)) AS evict4_full,
    (evict2 AND n3 > 0 AND w3 > to3) AS evict4_restart
  FROM flags
)
SELECT user_id, n, round(total, 2) AS total, evicted FROM (
  SELECT user_id, n1 AS n, cc1 / 100.0 AS total, FALSE AS evicted
  FROM flags4 WHERE n1 > 0
  UNION ALL
  SELECT user_id, n1 + n2, (cc1 + cc2) / 100.0, FALSE
  FROM flags4 WHERE n2 > 0
  UNION ALL  -- batch-2 tombstone carries the batch-1 state
  SELECT user_id, n1, cc1 / 100.0, TRUE
  FROM flags4 WHERE evict2
  UNION ALL  -- batch-3 update: restart from zero after an eviction
  SELECT user_id,
         CASE WHEN evict2 THEN n3 ELSE n1 + n2 + n3 END,
         CASE WHEN evict2 THEN cc3 ELSE cc1 + cc2 + cc3 END / 100.0,
         FALSE
  FROM flags4 WHERE n3 > 0
  UNION ALL  -- batch-3 tombstone carries the pre-silence state
  SELECT user_id, n1 + n2, (cc1 + cc2) / 100.0, TRUE
  FROM flags4 WHERE evict3
  UNION ALL  -- end-of-stream tombstones (the extra no-data trigger)
  SELECT user_id, n1 + n2 + n3, (cc1 + cc2 + cc3) / 100.0, TRUE
  FROM flags4 WHERE evict4_full
  UNION ALL
  SELECT user_id, n3, cc3 / 100.0, TRUE
  FROM flags4 WHERE evict4_restart
)
ORDER BY user_id, n, evicted, total
"""


# ---------------------------------------------------------------------------
# stream_topk_multibatch_replay — the streaming leaderboard across THREE
# genuine micro-batches: same 3-file mtime-ordered construction as
# stream_ttl_eviction_replay (min(ts)+10d/+20d cuts over the event_id%7
# slice), driven through streaming/windows.stateful_topk in update
# mode. Each trigger re-emits, for every key that received data, the
# top-5 members by CUMULATIVE cents — so the oracle re-derives every
# emission as the top-5 over the batch PREFIX (totals through batch i,
# ranked cents desc / member asc, emitted only for (key, batch) pairs
# with data). The single-batch stream_topk_replay pins the final state;
# this one pins the full cross-batch emission sequence — intermediate
# leaderboards, rank churn, and the data-presence emission rule.
# ---------------------------------------------------------------------------


def stream_topk_multibatch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from etl_ml_pipeline_spark.streaming.windows import stateful_topk

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_id") % 7 == 0)
        .select("event_type", "user_id", "ts", "value")
    )
    root = f"{_replay_ckpt_root()}/topk_in_{uuid.uuid4().hex}"
    os.makedirs(root)
    _write_batches_spark(ev, root)
    stream = (
        spark.readStream.schema(
            "event_type string, user_id bigint, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    out = stateful_topk(stream, k=5)
    return (
        # input_bytes: pre-filter table size as the sizing hint — the
        # python-state floor wants group parallelism, not the (tiny)
        # filtered batch bytes
        _replay(out, "update", input_bytes=_events_bytes(sf_dir), python_state=True)
        .select("event_type", "rank", "user_id", "total_cents")
        .orderBy("event_type", "rank", "total_cents", "user_id")
    )


_TOPK_MULTIBATCH_SQL = """
WITH ev AS (
  SELECT event_type, user_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_id % 7 = 0
),
c AS (SELECT min(ts) + INTERVAL 10 DAY AS c1,
             min(ts) + INTERVAL 20 DAY AS c2 FROM ev),
b AS (
  SELECT ev.*, CASE WHEN ts < c1 THEN 1 WHEN ts < c2 THEN 2 ELSE 3 END AS bat
  FROM ev, c
),
pres AS (SELECT DISTINCT event_type, bat FROM b),
cum AS (  -- per emission batch i: totals through the batch prefix
  SELECT p.event_type, p.bat AS i, m.user_id,
         CAST(sum(m.cents) AS BIGINT) AS total_cents
  FROM pres p JOIN b m ON m.event_type = p.event_type AND m.bat <= p.bat
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT event_type, i, user_id, total_cents,
         CAST(row_number() OVER (PARTITION BY event_type, i
                                 ORDER BY total_cents DESC, user_id)
              AS INT) AS rank
  FROM cum
)
SELECT event_type, rank, user_id, total_cents
FROM ranked WHERE rank <= 5
ORDER BY event_type, rank, total_cents, user_id
"""


# ---------------------------------------------------------------------------
# stream_late_data_window_replay — WATERMARK CORRECTNESS under genuinely
# late data: the one stateful dimension the other stream replays never
# pin (they use beyond-span watermarks so nothing is ever dropped).
# Three mtime-ordered micro-batches where batch 3 carries old stragglers
# (half of batch 1's time range arrives LAST), over an append-mode
# 1-day tumbling aggregation with a 3-day watermark.
#
# Pinned Spark semantics (verified empirically on this build, and the
# contract the DuckDB oracle replicates exactly):
#   * two watermarks are live during batch b (the multi-stateful-
#     operator design): the LATE-RECORD FILTER uses the PREVIOUS
#     watermark, max(event time over batches <= b-2) - delay, while
#     state eviction/emission uses the CURRENT one,
#     max(batches <= b-1) - delay — the filter lags one batch (a
#     straggler is dropped only once the watermark that passed its
#     window has itself been superseded);
#   * a row is DROPPED iff its window end < that (previous) watermark;
#   * append mode emits a window iff window_end <= final watermark
#     (non-strict; availableNow runs a final no-data batch that
#     advances the watermark to global max - delay and flushes).
# So batch 3's stragglers (10+ days older than the watermark) are
# dropped, rows near the watermark survive, and the last ~3 days of
# windows are never emitted — the exact production behavior of a
# late-data pipeline, oracle-checked.
# Value sums ride an exact integer cents column (round-half-up on both
# engines), so state-merge order cannot drift the hash.
# Scale: identical to production — one shuffle on the window key per
# micro-batch, state = open windows only (watermark eviction is the
# point of this entry).
# ---------------------------------------------------------------------------


def stream_late_data_window_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt
    import os
    import uuid

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_id") % 5 == 0)
        .select("event_id", "ts", "value")
    )
    t0 = ev.agg(F.min("ts").alias("t0")).first()["t0"]  # 1-row driver sync
    c1 = t0 + _dt.timedelta(days=10)
    c2 = t0 + _dt.timedelta(days=20)
    conds = (
        (F.col("ts") < F.lit(c1)) & (F.col("event_id") % 2 == 0),
        (F.col("ts") >= F.lit(c1)) & (F.col("ts") < F.lit(c2)),
        (F.col("ts") >= F.lit(c2))
        | ((F.col("ts") < F.lit(c1)) & (F.col("event_id") % 2 == 1)),
    )
    root = f"{_replay_ckpt_root()}/late_win_{uuid.uuid4().hex}"
    os.makedirs(root)
    _write_batches_spark(ev, root, conds=conds)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    agg = (
        stream.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .withWatermark("ts", "3 days")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents"))
        .select(
            F.col("win.start").cast("string").alias("window_start"),
            "n_events",
            "sum_cents",
        )
    )
    return _replay(agg, "append", input_bytes=_events_bytes(sf_dir)).orderBy("window_start")


_LATE_WINDOW_SQL = """
WITH ev AS (
  SELECT event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_id % 5 = 0
),
b AS (
  SELECT min(ts) + INTERVAL 10 DAY AS c1,
         min(ts) + INTERVAL 20 DAY AS c2
  FROM ev
),
tagged AS (
  SELECT e.*, CASE WHEN e.ts < b.c1 AND e.event_id % 2 = 0 THEN 1
                   WHEN e.ts >= b.c1 AND e.ts < b.c2 THEN 2
                   ELSE 3 END AS bid
  FROM ev e, b
),
wm AS (
  -- the late filter for batch b uses the PREVIOUS watermark
  -- (batches <= b-2): batch 2's filter watermark is still epoch 0,
  -- batch 3's is batch 1's max; emission uses the final (current) one
  SELECT (SELECT max(ts) FROM tagged WHERE bid = 1) - INTERVAL 3 DAY AS f3,
         (SELECT max(ts) FROM tagged) - INTERVAL 3 DAY AS wf
),
kept AS (
  SELECT t.* FROM tagged t, wm
  WHERE t.bid <= 2
     OR (t.bid = 3 AND date_trunc('day', t.ts) + INTERVAL 1 DAY >= wm.f3)
)
SELECT CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR)
         AS window_start,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM kept, wm
GROUP BY date_trunc('day', ts), wm.wf
HAVING date_trunc('day', min(ts)) + INTERVAL 1 DAY <= wm.wf
ORDER BY window_start
"""


# ---------------------------------------------------------------------------
# stream_late_dedup_eviction_replay — bounded-state streaming dedup
# where the watermark actually EVICTS: dropDuplicatesWithinWatermark
# with a 4-day delay over three micro-batches, each key arriving as an
# identical same-batch pair (classic at-least-once double delivery)
# plus one far-late duplicate shifted +22 days into the last batch.
#
# Pinned Spark semantics (verified empirically on this build):
#   * there is NO late-input filter — a record older than the watermark
#     still passes through and is emitted if no live state matches;
#   * key state created at event time t expires when the watermark
#     passes t + delay, but eviction runs at the END of each batch
#     using the watermark in effect DURING that batch — one batch of
#     lag vs the naive model;
#   * an arrival matching live state is dropped; matching expired state
#     is RE-EMITTED (the documented WithinWatermark contract — dedup is
#     only guaranteed within the delay of the first arrival).
# Net: keys from the first ~(batch1 span - 2*delay) days re-emit when
# their +22d duplicate lands (state evicted at end of batch 2); later
# keys' duplicates are still deduped. The oracle computes each key's
# emission count from the same watermark arithmetic. Output is
# (event_id, n_emits) — within-batch survivor choice is engine-
# arbitrary, so only stable columns are emitted.
# Scale: state is one 64-bit key + expiry per live key, bounded by the
# watermark horizon — the reason WithinWatermark exists.
# ---------------------------------------------------------------------------


def stream_late_dedup_eviction_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import uuid

    from etl_ml_pipeline_spark.streaming.windows import stream_dedup

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_id") % 11 == 0)
        .select("event_id", "ts")
    )
    late = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 22 DAYS"))
    rows = ev.unionByName(ev).unionByName(late)
    root = f"{_replay_ckpt_root()}/late_dedup_{uuid.uuid4().hex}"
    os.makedirs(root)
    _write_batches_spark(rows, root)  # min(ts)+10d/+20d cuts
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    out = stream_dedup(stream, keys=("event_id",), ts_col="ts", watermark="4 days")
    return (
        _replay(out, "append", input_bytes=_events_bytes(sf_dir))
        .groupBy("event_id")
        .agg(F.count("*").alias("n_emits"))
        .orderBy("event_id")
    )


# Every key's original arrives in exactly one batch (x2 identical
# copies -> 1 emit); its +22d duplicate always lands in batch 3. The
# duplicate re-emits iff the key's state was evicted at the end of
# batch 2, i.e. ts + 4d < (max ts of batch 1) - 4d. Batch-2/3 originals
# always survive to batch 3 (their expiry is past the batch-2
# watermark), so only early batch-1 keys re-emit.
_LATE_DEDUP_SQL = """
WITH ev AS (
  SELECT event_id, ts FROM events WHERE event_id % 11 = 0
),
b AS (SELECT min(ts) + INTERVAL 10 DAY AS c1 FROM ev),
wm2 AS (
  SELECT max(e.ts) - INTERVAL 4 DAY AS w
  FROM ev e, b WHERE e.ts < b.c1
)
SELECT e.event_id,
       1 + CASE WHEN e.ts < b.c1
                 AND e.ts + INTERVAL 4 DAY < wm2.w
                THEN 1 ELSE 0 END AS n_emits
FROM ev e, b, wm2
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# stream_late_join_replay — stream-stream INNER time-bound join under
# late data: clicks joined to purchases within 1 day per user, 3-day
# watermark on BOTH sides, three micro-batches where half of the
# first-batch purchases arrive LAST (the at-least-once upstream that
# delivers a partition late). Completes the streaming-correctness triad
# (windowed agg, dedup, join — each with a watermark that actually
# bites).
#
# Pinned Spark semantics (verified empirically on this build; the
# DuckDB oracle replicates them exactly):
#   * the effective watermark is the MIN across both sides
#     (multipleWatermarkPolicy=min): W_b = min(maxL, maxR over batches
#     <= b-1) - delay; W_1 = epoch 0;
#   * each side's INPUT is filtered against the PREVIOUS watermark
#     (one batch of lag, same as the aggregation path): a row arriving
#     in batch b is dropped iff ts < W_{b-1};
#   * join STATE eviction runs at the end of batch b with the
#     during-batch watermark W_b: a left row is evicted once
#     lts + join_window < W_b (no future right row can match it), a
#     right row once rts < W_b;
#   * inner-join pairs emit as soon as both rows have been seen (same
#     batch, or one side matched against the other's surviving state).
# Net: a cross-batch pair survives iff the late arrival clears the
# lagged input filter AND its partner's state outlived every
# intervening eviction — the oracle enumerates all qualifying pairs and
# applies exactly that predicate.
# Scale: per micro-batch, one shuffle of each side on user_id; state is
# bounded by the watermark horizon on both sides (the point of this
# entry — without the watermark, join state grows without bound).
# ---------------------------------------------------------------------------


def _late_join_replay(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    """Shared harness for the inner/left-outer late-join replays:
    clicks and purchases as two 3-batch file streams (purchases' first
    time slice half-delivered last), watermark 3 days on both sides,
    joined on user within [lts, lts + 1 day]."""
    import datetime as _dt
    import os
    import uuid

    ev = _events(spark, sf_dir)
    t0 = ev.agg(F.min("ts").alias("t0")).first()["t0"]  # 1-row driver sync
    c1 = t0 + _dt.timedelta(days=10)
    c2 = t0 + _dt.timedelta(days=20)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("lts"), F.col("event_id").alias("click_id")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("rts"), F.col("event_id").alias("buy_id")
    )
    root = f"{_replay_ckpt_root()}/late_join_{uuid.uuid4().hex}"
    os.makedirs(f"{root}/L")
    os.makedirs(f"{root}/R")
    _write_batches_spark(
        clicks,
        f"{root}/L",
        conds=(
            F.col("lts") < F.lit(c1),
            (F.col("lts") >= F.lit(c1)) & (F.col("lts") < F.lit(c2)),
            F.col("lts") >= F.lit(c2),
        ),
    )
    _write_batches_spark(
        buys,
        f"{root}/R",
        conds=(
            (F.col("rts") < F.lit(c1)) & (F.col("buy_id") % 2 == 0),
            (F.col("rts") >= F.lit(c1)) & (F.col("rts") < F.lit(c2)),
            (F.col("rts") >= F.lit(c2))
            | ((F.col("rts") < F.lit(c1)) & (F.col("buy_id") % 2 == 1)),
        ),
    )
    ls = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{root}/L")
        .withWatermark("lts", "3 days")
    )
    rs = (
        spark.readStream.schema(buys.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{root}/R")
        .withWatermark("rts", "3 days")
    )
    j = ls.join(
        rs,
        (ls.user_id == rs.user_id)
        & (rs.rts >= ls.lts)
        & (rs.rts <= ls.lts + F.expr("INTERVAL 1 DAY")),
        how,
    ).select(ls.user_id, "lts", "click_id", "buy_id")
    return _replay(j, "append", input_bytes=_events_bytes(sf_dir))


def stream_late_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _late_join_replay(spark, sf_dir, "inner")
        .groupBy(F.to_date("lts").cast("string").alias("click_day"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("buy_id").alias("n_buys"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("click_day")
    )


_LATE_JOIN_SQL = """
WITH b AS (
  SELECT min(ts) + INTERVAL 10 DAY AS c1,
         min(ts) + INTERVAL 20 DAY AS c2
  FROM events
),
L AS (
  SELECT user_id, ts AS lts, event_id AS click_id,
         CASE WHEN ts < b.c1 THEN 1 WHEN ts < b.c2 THEN 2 ELSE 3 END AS bl
  FROM events, b WHERE event_type = 'click'
),
R AS (
  SELECT user_id, ts AS rts, event_id AS buy_id,
         CASE WHEN ts < b.c1 AND event_id % 2 = 0 THEN 1
              WHEN ts >= b.c1 AND ts < b.c2 THEN 2
              ELSE 3 END AS br
  FROM events, b WHERE event_type = 'purchase'
),
wm AS (
  SELECT least((SELECT max(lts) FROM L WHERE bl = 1),
               (SELECT max(rts) FROM R WHERE br = 1))
           - INTERVAL 3 DAY AS w2
),
emitted AS (
  SELECT l.user_id, l.lts, l.click_id, r.buy_id
  FROM L l
  JOIN R r ON l.user_id = r.user_id
          AND r.rts >= l.lts AND r.rts <= l.lts + INTERVAL 1 DAY,
       wm
  WHERE
    -- lagged input filter (prev wm is epoch 0 for batches 1-2)
        (r.br <= 2 OR r.rts >= wm.w2)
    AND (l.bl <= 2 OR l.lts >= wm.w2)
    -- cross-batch pairs need the earlier row's state to survive every
    -- intervening end-of-batch eviction (W_1 = 0, so only W_2 bites)
    AND (NOT (l.bl < r.br AND r.br = 3)
         OR l.lts + INTERVAL 1 DAY >= wm.w2)
    AND (NOT (r.br < l.bl AND l.bl = 3) OR r.rts >= wm.w2)
)
SELECT CAST(CAST(lts AS DATE) AS VARCHAR) AS click_day,
       count(*) AS n_pairs,
       count(DISTINCT buy_id) AS n_buys,
       count(DISTINCT user_id) AS n_users
FROM emitted
GROUP BY 1
ORDER BY click_day
"""


# ---------------------------------------------------------------------------
# stream_late_outer_join_replay — LEFT OUTER stream-stream join under
# the same late-delivery harness: the production "clicks with no
# purchase within a day" attribution query, where the NULL-padded rows
# are the interesting output and their EMISSION TIMING is the
# correctness trap. Pinned empirically (same build, same harness):
#   * a matched left row emits its pair(s) like the inner join;
#   * an UNMATCHED left row emits (l, NULL) only when its state is
#     evicted — i.e. once the min-across-sides watermark passes
#     lts + join_window;
#   * left rows still live at stream end (lts + window >= final
#     watermark) emit NOTHING — availableNow's final no-data batch
#     flushes exactly the evictable ones.
# A row is "unmatched" against the EMITTED pair set, not the raw join
# condition: a click whose only purchase was late-dropped does produce
# a NULL row — the oracle encodes that by reusing the inner-join
# predicate. Scale: same shape as the inner replay; the NULL-row flush
# is part of the eviction pass, no extra shuffle.
# ---------------------------------------------------------------------------


def stream_late_outer_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _late_join_replay(spark, sf_dir, "leftOuter")
    return (
        out.groupBy(F.to_date("lts").cast("string").alias("click_day"))
        .agg(
            F.count("buy_id").alias("n_pairs"),
            F.sum(F.col("buy_id").isNull().cast("int")).alias("n_unmatched"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("click_day")
    )


_LATE_OUTER_JOIN_SQL = """
WITH b AS (
  SELECT min(ts) + INTERVAL 10 DAY AS c1,
         min(ts) + INTERVAL 20 DAY AS c2
  FROM events
),
L AS (
  SELECT user_id, ts AS lts, event_id AS click_id,
         CASE WHEN ts < b.c1 THEN 1 WHEN ts < b.c2 THEN 2 ELSE 3 END AS bl
  FROM events, b WHERE event_type = 'click'
),
R AS (
  SELECT user_id, ts AS rts, event_id AS buy_id,
         CASE WHEN ts < b.c1 AND event_id % 2 = 0 THEN 1
              WHEN ts >= b.c1 AND ts < b.c2 THEN 2
              ELSE 3 END AS br
  FROM events, b WHERE event_type = 'purchase'
),
wm AS (
  SELECT least((SELECT max(lts) FROM L WHERE bl = 1),
               (SELECT max(rts) FROM R WHERE br = 1))
           - INTERVAL 3 DAY AS w2,
         least((SELECT max(lts) FROM L), (SELECT max(rts) FROM R))
           - INTERVAL 3 DAY AS wf
),
emitted AS (
  SELECT l.user_id, l.lts, l.click_id, r.buy_id
  FROM L l
  JOIN R r ON l.user_id = r.user_id
          AND r.rts >= l.lts AND r.rts <= l.lts + INTERVAL 1 DAY,
       wm
  WHERE
        (r.br <= 2 OR r.rts >= wm.w2)
    AND (l.bl <= 2 OR l.lts >= wm.w2)
    AND (NOT (l.bl < r.br AND r.br = 3)
         OR l.lts + INTERVAL 1 DAY >= wm.w2)
    AND (NOT (r.br < l.bl AND l.bl = 3) OR r.rts >= wm.w2)
),
null_rows AS (
  -- unmatched-against-EMITTED left rows whose state was evicted by
  -- stream end (lts + window < final watermark); later rows stay
  -- parked in state and emit nothing
  SELECT l.user_id, l.lts, l.click_id
  FROM L l, wm
  WHERE l.lts + INTERVAL 1 DAY < wm.wf
    AND NOT EXISTS (SELECT 1 FROM emitted e WHERE e.click_id = l.click_id)
)
SELECT click_day, n_pairs, n_unmatched, n_users
FROM (
  SELECT CAST(CAST(lts AS DATE) AS VARCHAR) AS click_day,
         count(buy_id) AS n_pairs,
         CAST(sum(CASE WHEN buy_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unmatched,
         count(DISTINCT user_id) AS n_users
  FROM (
    SELECT user_id, lts, buy_id FROM emitted
    UNION ALL
    SELECT user_id, lts, NULL AS buy_id FROM null_rows
  )
  GROUP BY 1
)
ORDER BY click_day
"""


# ---------------------------------------------------------------------------
# feature_store_snapshot — multi-horizon feature materialization (the
# feature-store build every behavioral model trains on): for each
# user, AT their latest event, the rolling 1h / 24h / 7d activity
# counts and cent-exact value sums. All three horizons are RANGE
# windows over ONE (user, epoch) sort — Catalyst plans a single
# Exchange + Sort and evaluates the frames in the same Window
# operator, so adding horizons is free of extra shuffles; the
# snapshot pick is a row_number over the same partitioning.
# This is the batch materialization twin of the streaming running
# totals; write the output keyed by user_id and the serving join is a
# point lookup.
# ---------------------------------------------------------------------------


def feature_store_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    base = W.partitionBy("user_id").orderBy("epoch_s")
    w1h = base.rangeBetween(-3600, 0)
    w24h = base.rangeBetween(-86400, 0)
    w7d = base.rangeBetween(-604800, 0)
    feat = (
        ev.withColumn("n_1h", F.count("*").over(w1h))
        .withColumn("cents_1h", F.sum("c").over(w1h))
        .withColumn("n_24h", F.count("*").over(w24h))
        .withColumn("cents_24h", F.sum("c").over(w24h))
        .withColumn("n_7d", F.count("*").over(w7d))
        .withColumn("cents_7d", F.sum("c").over(w7d))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.desc("epoch_s"), F.desc("event_id")
                )
            ),
        )
    )
    return (
        feat.filter(F.col("rn") == 1)
        .select(
            "user_id",
            "epoch_s",
            "n_1h",
            "cents_1h",
            "n_24h",
            "cents_24h",
            "n_7d",
            "cents_7d",
        )
        .orderBy("user_id")
    )


_FEATURE_SNAPSHOT_SQL = """
WITH ev AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
         CAST(round(value * 100, 0) AS BIGINT) AS c
  FROM events
),
feat AS (
  SELECT user_id, event_id, epoch_s,
         CAST(count(*) OVER w1h AS BIGINT) AS n_1h,
         CAST(sum(c) OVER w1h AS BIGINT) AS cents_1h,
         CAST(count(*) OVER w24h AS BIGINT) AS n_24h,
         CAST(sum(c) OVER w24h AS BIGINT) AS cents_24h,
         CAST(count(*) OVER w7d AS BIGINT) AS n_7d,
         CAST(sum(c) OVER w7d AS BIGINT) AS cents_7d,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_s DESC, event_id DESC) AS rn
  FROM ev
  WINDOW w1h AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
         w24h AS (PARTITION BY user_id ORDER BY epoch_s
                  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW),
         w7d AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
)
SELECT user_id, epoch_s, n_1h, cents_1h, n_24h, cents_24h, n_7d, cents_7d
FROM feat WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# stream_decontam_replay — incremental ingest decontamination: new
# documents arriving on a stream are gated against a STATIC benchmark
# gram table (built once from the held-out hash split) — the streaming
# twin of the decontaminate transform / decontam e2e, for the ingest
# topology where the corpus grows continuously but the eval set is
# fixed. Per micro-batch: map-side 5-gram explode -> stream-static
# LEFT join on the 60-bit gram hash (stateless) -> keyed max(hit)
# aggregation flags each doc; the materialized complete-mode table
# rolls up per language batch-side. Replayed over 3 mtime-ordered
# file batches of the train split.
# State note: the flag aggregation keys on doc_id, so state grows with
# documents seen — fine for the hermetic replay; a production ingest
# bounds it with a watermark/TTL on an arrival-time column (the
# stream_ttl_eviction_replay machinery, orthogonal here). Documents
# with fewer than 5 tokens produce no grams and are not gated (they
# cannot be contaminated AT the gram size); the oracle mirrors that.
# ---------------------------------------------------------------------------


def stream_decontam_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import uuid

    from etl_ml_pipeline_spark.operators.text import token_hash60, word_ngrams
    from etl_ml_pipeline_spark.queries.tables import t

    docs = t(spark, sf_dir, "documents")
    b = token_hash60(F.col("doc_id").cast("string")) % 10
    train = docs.filter(b < 8).select("doc_id", "lang", "text")
    holdout = docs.filter(b >= 8)
    bench = (
        holdout.select(
            F.explode(
                F.array_distinct(word_ngrams(F.col("text"), 5))
            ).alias("gram")
        )
        .select(token_hash60(F.col("gram")).alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    root = f"{_replay_ckpt_root()}/decontam_{uuid.uuid4().hex[:8]}"
    os.makedirs(root)
    _write_batches_spark(
        train, root, conds=[F.col("doc_id") % 3 == i for i in range(3)]
    )
    stream = (
        spark.readStream.schema("doc_id bigint, lang string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    grams = stream.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 5))).alias(
            "gram"
        ),
    ).withColumn("gh", token_hash60(F.col("gram")))
    flagged = (
        grams.join(bench, "gh", "left")
        .groupBy("doc_id", "lang")
        .agg(F.max(F.coalesce("hit", F.lit(0))).alias("contaminated"))
    )
    table = _replay(flagged, "complete", input_bytes=_events_bytes(sf_dir))
    return (
        table.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("contaminated").cast("long").alias("n_contaminated"),
        )
        .orderBy("lang")
    )


_STREAM_DECONTAM_SQL = """
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10
           AS b,
         regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id, lang, b,
         unnest(list_distinct(list_transform(range(1, len(tk) - 3),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                 || ' ' || tk[i+4]))) AS gram
  FROM toks
),
hashed AS (
  SELECT doc_id, lang, b,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
  FROM grams
),
bench AS (SELECT DISTINCT gh FROM hashed WHERE b >= 8),
flagged AS (
  SELECT h.doc_id, h.lang,
         max(CASE WHEN bench.gh IS NOT NULL THEN 1 ELSE 0 END)
           AS contaminated
  FROM (SELECT * FROM hashed WHERE b < 8) h
  LEFT JOIN bench ON h.gh = bench.gh
  GROUP BY 1, 2
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(contaminated) AS BIGINT) AS n_contaminated
FROM flagged
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# sft_episode_construction — behavior-sequence training-example
# construction: per user, the time-ordered event-type sequence becomes
# one episode (the SFT/next-action-model prep step that turns a raw
# event log into model inputs). Emits the episode length, an md5
# fingerprint of the space-joined sequence (keeps the oracle payload
# narrow — the downstream writer would carry the sequence itself), and
# the final event type as the label. user_id < 300 bounds the per-row
# output, the usual oracle convention.
# Scale: ONE user-key shuffle; the per-user collect is bounded by a
# user's own event count (the natural episode bound — a cap/windowed
# variant slots into the same plan for heavy users). array_sort on
# (ts, event_id) structs makes the sequence deterministic under any
# partitioning; no Python anywhere.
# ---------------------------------------------------------------------------


def sft_episode_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    episode = F.array_join(
        F.transform(F.col("seq"), lambda x: x["event_type"]), " "
    )
    return seq.select(
        "user_id",
        F.size("seq").cast("long").alias("episode_len"),
        F.md5(episode).alias("episode_md5"),
        F.element_at("seq", -1)["event_type"].alias("label"),
    ).orderBy("user_id")


_SFT_EPISODE_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events WHERE user_id < 300
),
agg AS (
  SELECT user_id,
         count(*) AS episode_len,
         md5(string_agg(event_type, ' ' ORDER BY ts, event_id))
           AS episode_md5
  FROM e GROUP BY 1
),
last AS (
  SELECT user_id, event_type AS label FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
)
SELECT a.user_id, CAST(a.episode_len AS BIGINT) AS episode_len,
       a.episode_md5, l.label
FROM agg a JOIN last l USING (user_id)
ORDER BY a.user_id
"""


# ---------------------------------------------------------------------------
# sft_loss_masking_stats — loss-mask token accounting for SFT episodes:
# the number a fine-tuning run reads off its data loader. Each user's
# event stream is a chat episode (turns ordered by ts); prompt-side
# turns (click/view/signup) are MASKED from the loss, completion-side
# turns (purchase/error) are TRAINED. Per-turn token cost is a
# deterministic proxy (7 + event_id % 29: 4 content + 3 template
# tokens). On top of the full-episode mask split, a 64-token context
# cap truncates from the LEFT (keep the most recent turns — standard
# chat truncation), computed as a reverse cumulative sum, and the
# kept-suffix trained tokens are what actually reach the optimizer.
# All arithmetic is exact integer (ppm via integer div).
# Scale: ONE exchange on user_id serves both the reverse-cumsum window
# and the groupBy; output is one row per episode (bounded by the
# user_id < 300 episode pool at every SF).
# ---------------------------------------------------------------------------

_SFT_CTX_TOK = 64


def sft_loss_masking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    turns = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.lit(7) + F.col("event_id") % 29).cast("long").alias("n_tok"),
        F.col("event_type").isin("purchase", "error").cast("int").alias("is_asst"),
    )
    wrev = (
        W.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rev = turns.withColumn("rev_cum", F.sum("n_tok").over(wrev))
    kept = F.col("rev_cum") <= _SFT_CTX_TOK
    out = rev.groupBy("user_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("is_asst").cast("long").alias("n_assistant_turns"),
        F.sum("n_tok").alias("total_tok"),
        F.sum(F.when(F.col("is_asst") == 1, F.col("n_tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("trained_tok"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_turns"),
        F.sum(F.when(kept & (F.col("is_asst") == 1), F.col("n_tok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("kept_trained_tok"),
    )
    return out.select(
        "user_id",
        "n_turns",
        "n_assistant_turns",
        "total_tok",
        "trained_tok",
        (F.col("total_tok") - F.col("trained_tok")).alias("masked_tok"),
        F.expr("trained_tok * 1000000 div total_tok").alias("trained_ppm"),
        "kept_turns",
        "kept_trained_tok",
    ).orderBy("user_id")


_SFT_MASK_SQL = f"""
WITH turns AS (
  SELECT user_id, ts, event_id,
         CAST(7 + event_id % 29 AS BIGINT) AS n_tok,
         CASE WHEN event_type IN ('purchase', 'error') THEN 1 ELSE 0 END
           AS is_asst
  FROM events WHERE user_id < 300
),
rev AS (
  SELECT *,
         sum(n_tok) OVER (PARTITION BY user_id
                          ORDER BY ts DESC, event_id DESC
                          ROWS UNBOUNDED PRECEDING) AS rev_cum
  FROM turns
)
SELECT user_id,
       count(*) AS n_turns,
       CAST(sum(is_asst) AS BIGINT) AS n_assistant_turns,
       CAST(sum(n_tok) AS BIGINT) AS total_tok,
       CAST(sum(CASE WHEN is_asst = 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS trained_tok,
       CAST(sum(n_tok)
            - sum(CASE WHEN is_asst = 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS masked_tok,
       CAST(sum(CASE WHEN is_asst = 1 THEN n_tok ELSE 0 END) * 1000000
            // sum(n_tok) AS BIGINT) AS trained_ppm,
       CAST(sum(CASE WHEN rev_cum <= {_SFT_CTX_TOK} THEN 1 ELSE 0 END)
            AS BIGINT) AS kept_turns,
       CAST(sum(CASE WHEN rev_cum <= {_SFT_CTX_TOK} AND is_asst = 1
                     THEN n_tok ELSE 0 END) AS BIGINT) AS kept_trained_tok
FROM rev
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "feature_store_snapshot": feature_store_snapshot,
    "sft_loss_masking_stats": sft_loss_masking_stats,
    "stream_decontam_replay": stream_decontam_replay,
    "sft_episode_construction": sft_episode_construction,
    "sma_events": sma_events,
    "stream_late_data_window_replay": stream_late_data_window_replay,
    "stream_late_dedup_eviction_replay": stream_late_dedup_eviction_replay,
    "stream_late_join_replay": stream_late_join_replay,
    "stream_late_outer_join_replay": stream_late_outer_join_replay,
    "concurrency_peak_events": concurrency_peak_events,
    "stream_ttl_eviction_replay": stream_ttl_eviction_replay,
    "stream_topk_multibatch_replay": stream_topk_multibatch_replay,
    "stream_sessionize_replay": stream_sessionize_replay,
    "stream_tumble_replay": stream_tumble_replay,
    "stream_running_totals_replay": stream_running_totals_replay,
    "stream_topk_replay": stream_topk_replay,
    "window_time_range_rolling": window_time_range_rolling,
    "stream_dedup_replay": stream_dedup_replay,
    "stream_dedup_index_replay": stream_dedup_index_replay,
    "stream_slide_replay": stream_slide_replay,
    "stream_session_window_replay": stream_session_window_replay,
    "stream_interval_join_replay": stream_interval_join_replay,
    "stream_cdc_view_replay": stream_cdc_view_replay,
    "stream_static_join_replay": stream_static_join_replay,
    "sketch_rolling_distinct_users": sketch_rolling_distinct_users,
    "bollinger_events": bollinger_events,
    "sessionize_events": sessionize_events,
    "tumble_hourly_events": tumble_hourly_events,
    "ml_target_events": ml_target_events,
    "rsi_macd_events": rsi_macd_events,
    "resample_gapfill_events": resample_gapfill_events,
    "forecast_holt_events": forecast_holt_events,
    "changepoint_cusum_events": changepoint_cusum_events,
    "stream_cusum_replay": stream_cusum_replay,
}

ORACLES = {
    "feature_store_snapshot": _FEATURE_SNAPSHOT_SQL,
    "stream_decontam_replay": _STREAM_DECONTAM_SQL,
    "sft_episode_construction": _SFT_EPISODE_SQL,
    "sft_loss_masking_stats": _SFT_MASK_SQL,
    "sma_events": _SMA_SQL,
    "stream_late_data_window_replay": _LATE_WINDOW_SQL,
    "stream_late_dedup_eviction_replay": _LATE_DEDUP_SQL,
    "stream_late_join_replay": _LATE_JOIN_SQL,
    "stream_late_outer_join_replay": _LATE_OUTER_JOIN_SQL,
    "concurrency_peak_events": _CONCURRENCY_SQL,
    "stream_ttl_eviction_replay": _TTL_REPLAY_SQL,
    "stream_topk_multibatch_replay": _TOPK_MULTIBATCH_SQL,
    "stream_sessionize_replay": _STREAM_SESSIONIZE_SQL,
    "stream_tumble_replay": _STREAM_TUMBLE_SQL,
    "stream_running_totals_replay": _STREAM_TOTALS_SQL,
    "stream_topk_replay": _STREAM_TOPK_SQL,
    "window_time_range_rolling": _TIME_RANGE_SQL,
    "stream_dedup_replay": _STREAM_DEDUP_SQL,
    "stream_dedup_index_replay": _dedup_index_oracle(),
    "stream_slide_replay": _STREAM_SLIDE_SQL,
    "stream_session_window_replay": _STREAM_SESSION_WINDOW_SQL,
    "stream_interval_join_replay": _STREAM_INTERVAL_JOIN_SQL,
    "stream_cdc_view_replay": _STREAM_CDC_SQL,
    "stream_static_join_replay": _STREAM_STATIC_JOIN_SQL,
    "sketch_rolling_distinct_users": _ROLLING_DISTINCT_SQL,
    "bollinger_events": _BOLLINGER_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
    "tumble_hourly_events": _TUMBLE_SQL,
    "ml_target_events": _TARGET_SQL,
    "rsi_macd_events": _RSI_MACD_SQL,
    "resample_gapfill_events": _GAPFILL_SQL,
    "forecast_holt_events": _HOLT_SQL,
    "changepoint_cusum_events": _CUSUM_SQL,
    "stream_cusum_replay": _CUSUM_SQL,
}
