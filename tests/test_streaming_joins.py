"""Stream-stream interval join + timeout-based stateful sessionizer.

Hermetic file-source streams with maxFilesPerTrigger=1 (multiple
micro-batches), asserting on the memory sink — same harness as
test_streaming.py.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from etl_ml_pipeline_spark.streaming import read_json_stream, run_available_now
from etl_ml_pipeline_spark.streaming.joins import (
    stateful_sessionizer,
    stream_stream_interval_join,
)


def _write_jsonl(
    dir_path: Path, name: str, rows: list[dict], mtime: float | None = None
) -> None:
    dir_path.mkdir(parents=True, exist_ok=True)
    p = dir_path / name
    p.write_text("\n".join(json.dumps(r) for r in rows))
    if mtime is not None:
        # FileStreamSource orders by modification time; same-ms writes
        # make micro-batch order nondeterministic, so pin it.
        os.utime(p, (mtime, mtime))


def test_stream_stream_interval_join_inner(spark, tmp_path):
    """Purchases join clicks of the same user within the 1h lookback;
    older clicks fall outside the interval and must not match."""
    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purchases"
    _write_jsonl(
        clicks_dir,
        "c1.json",
        [
            {"c_user": 1, "click_ts": "2024-01-01 08:00:00", "page": "old"},
            {"c_user": 1, "click_ts": "2024-01-01 09:45:00", "page": "a"},
            {"c_user": 1, "click_ts": "2024-01-01 10:20:00", "page": "b"},
            {"c_user": 2, "click_ts": "2024-01-01 10:25:00", "page": "c"},
        ],
    )
    _write_jsonl(
        purch_dir,
        "p1.json",
        [
            {"p_user": 1, "purchase_ts": "2024-01-01 10:30:00", "amount": 9.99},
            {"p_user": 3, "purchase_ts": "2024-01-01 10:40:00", "amount": 1.0},
        ],
    )
    clicks = read_json_stream(
        spark, str(clicks_dir), "c_user bigint, click_ts timestamp, page string"
    )
    purchases = read_json_stream(
        spark, str(purch_dir), "p_user bigint, purchase_ts timestamp, amount double"
    )
    joined = stream_stream_interval_join(
        clicks,
        purchases,
        "c_user",
        "p_user",
        "click_ts",
        "purchase_ts",
        lookback="1 hour",
        watermark="2 hours",
    )
    run_available_now(joined, "ssj_out", str(tmp_path / "ckpt"))
    got = sorted(
        (r["c_user"], r["page"], str(r["purchase_ts"]))
        for r in spark.table("ssj_out").collect()
    )
    # user 1's 09:45 and 10:20 clicks are within [09:30, 10:30]; the
    # 08:00 click is not; users 2 (no purchase) and 3 (no click) drop.
    assert got == [
        (1, "a", "2024-01-01 10:30:00"),
        (1, "b", "2024-01-01 10:30:00"),
    ]


def test_stream_stream_join_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer: unmatched clicks surface with null purchase columns
    once the watermark closes their match window (forced here by a
    far-future purchase batch that advances the watermark)."""
    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purchases"
    _write_jsonl(
        clicks_dir,
        "c1.json",
        [
            {"c_user": 1, "click_ts": "2024-01-01 10:20:00", "page": "hit"},
            {"c_user": 2, "click_ts": "2024-01-01 10:25:00", "page": "miss"},
        ],
    )
    _write_jsonl(
        purch_dir,
        "p1.json",
        [{"p_user": 1, "purchase_ts": "2024-01-01 10:30:00", "amount": 5.0}],
    )
    # The GLOBAL watermark is the MIN over both streams' watermarks, so
    # BOTH sides need a far-future row to advance it past the clicks'
    # match windows; the extra p3 batch then forces one more micro-batch
    # in which the now-expired unmatched left rows actually emit.
    _write_jsonl(
        clicks_dir,
        "c2.json",
        [{"c_user": 99, "click_ts": "2024-01-03 00:00:00", "page": "future"}],
    )
    _write_jsonl(
        purch_dir,
        "p2.json",
        [{"p_user": 98, "purchase_ts": "2024-01-03 00:00:00", "amount": 0.0}],
    )
    _write_jsonl(
        purch_dir,
        "p3.json",
        [{"p_user": 98, "purchase_ts": "2024-01-04 00:00:00", "amount": 0.0}],
    )
    clicks = read_json_stream(
        spark,
        str(clicks_dir),
        "c_user bigint, click_ts timestamp, page string",
        max_files_per_trigger=1,
    )
    purchases = read_json_stream(
        spark,
        str(purch_dir),
        "p_user bigint, purchase_ts timestamp, amount double",
        max_files_per_trigger=1,
    )
    joined = stream_stream_interval_join(
        clicks,
        purchases,
        "c_user",
        "p_user",
        "click_ts",
        "purchase_ts",
        lookback="1 hour",
        watermark="30 minutes",
        how="leftOuter",
    )
    run_available_now(joined, "ssj_outer", str(tmp_path / "ckpt"))
    got = {r["page"]: r["p_user"] for r in spark.table("ssj_outer").collect()}
    assert got.get("hit") == 1
    assert "miss" in got and got["miss"] is None


def test_stateful_sessionizer_emits_closed_sessions(spark, tmp_path):
    """Sessions closed in-batch emit immediately; the trailing open
    session emits via event-time timeout once later batches push the
    watermark past its gap deadline."""
    d = tmp_path / "sess_in"
    # batch 1: user 1 — two sessions' worth of events (the 12:00 event
    # closes the 10:00-10:10 session inside the batch).
    _write_jsonl(
        d,
        "b1.json",
        [
            {"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0},
            {"user_id": 1, "ts": "2024-01-01 10:10:00", "value": 2.0},
            {"user_id": 1, "ts": "2024-01-01 12:00:00", "value": 5.0},
        ],
        mtime=1_700_000_000,
    )
    # batch 2 advances max event time to 20:00 -> watermark 19:00 (1h).
    _write_jsonl(
        d,
        "b2.json",
        [{"user_id": 2, "ts": "2024-01-01 20:00:00", "value": 1.0}],
        mtime=1_700_000_100,
    )
    # batch 3 runs under that watermark -> user 1's 12:30 deadline fires.
    _write_jsonl(
        d,
        "b3.json",
        [{"user_id": 3, "ts": "2024-01-01 23:00:00", "value": 1.0}],
        mtime=1_700_000_200,
    )

    stream = read_json_stream(
        spark,
        str(d),
        "user_id bigint, ts timestamp, value double",
        max_files_per_trigger=1,
    )
    sessions = stateful_sessionizer(
        stream, gap_minutes=30, watermark="1 hour"
    )
    run_available_now(sessions, "sess_state_out", str(tmp_path / "ckpt"))
    got = sorted(
        (
            r["user_id"],
            str(r["session_start"]),
            str(r["session_end"]),
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.table("sess_state_out").collect()
    )
    assert (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.0) in got
    assert (1, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1, 5.0) in got
    # each session emits exactly once (append-mode finality)
    assert len(got) == len(set(got))
    # user 3's trailing session (deadline 23:30) is beyond any watermark
    # this stream can reach (max 22:00) — correctly withheld.
    assert not any(u == 3 for u, *_ in got)


def test_stream_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    """Restarting a stopped stream from its checkpoint must process
    only NEW files — the file-sink + checkpoint contract that gives
    exactly-once output across restarts."""
    d = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_jsonl(
        d, "b1.json",
        [{"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0},
         {"user_id": 2, "ts": "2024-01-01 10:01:00", "value": 2.0}],
        mtime=1_700_000_000,
    )

    def run_once():
        stream = read_json_stream(
            spark, str(d), "user_id bigint, ts timestamp, value double"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out).count() == 2

    # second run over the SAME checkpoint: b1 must not reprocess
    _write_jsonl(
        d, "b2.json",
        [{"user_id": 3, "ts": "2024-01-01 10:02:00", "value": 3.0}],
        mtime=1_700_000_100,
    )
    run_once()
    rows = sorted(r.user_id for r in spark.read.parquet(out).collect())
    assert rows == [1, 2, 3]  # exactly once: no duplicates, nothing lost
