"""Physical-schema contract tests for the catalog table loader.

The driver's testdata has been regenerated with different parquet writers
across rounds (``events.ts`` flipped from TIMESTAMP(NANOS) int64 storage
to plain ``timestamp[us]`` between rounds 2 and 3, silently breaking every
events consumer). These tests pin the loader's contract: it must dispatch
on the type the scan actually produces, never on an assumption about
physical storage.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_ml_pipeline_spark.queries import tables as tables_mod
from etl_ml_pipeline_spark.queries.tables import t

_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in microseconds


def _write_events(tmp_path, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "user_id": pa.array([10, 10, 11], type=pa.int64()),
            "ts": ts_array,
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.fixture()
def fresh_cache():
    """Isolate the module-level scan cache per test."""
    saved = dict(tables_mod._SCAN_CACHE)
    tables_mod._SCAN_CACHE.clear()
    yield
    tables_mod._SCAN_CACHE.clear()
    for k, v in saved.items():
        tables_mod._SCAN_CACHE[k] = v


def _expected_ts():
    base = datetime.datetime(2023, 11, 14, 22, 13, 20)
    return [base, base + datetime.timedelta(seconds=1), base + datetime.timedelta(seconds=2)]


def test_loader_handles_micros_timestamp(spark, tmp_path, fresh_cache):
    """Modern storage: parquet timestamp[us] must pass through untouched."""
    us = [_EPOCH_US, _EPOCH_US + 1_000_000, _EPOCH_US + 2_000_000]
    sf_dir = _write_events(tmp_path, pa.array(us, type=pa.timestamp("us")))
    df = t(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() in ("timestamp", "timestamp_ntz")
    got = sorted(r["ts"].replace(tzinfo=None) for r in df.select("ts").collect())
    assert got == _expected_ts()


def test_loader_handles_nanos_int64(spark, tmp_path, fresh_cache):
    """Legacy storage: TIMESTAMP(NANOS) read as int64 via the nanosAsLong
    conf must be truncated ns->us with integer division and re-typed."""
    ns = [(_EPOCH_US + off) * 1000 + 999 for off in (0, 1_000_000, 2_000_000)]
    sf_dir = _write_events(tmp_path, pa.array(ns, type=pa.int64()))
    df = t(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() in ("timestamp", "timestamp_ntz")
    got = sorted(r["ts"].replace(tzinfo=None) for r in df.select("ts").collect())
    assert got == _expected_ts()  # the +999 ns must truncate away, not round


def test_loader_rejects_unsupported_ts_type(spark, tmp_path, fresh_cache):
    sf_dir = _write_events(
        tmp_path, pa.array(["2023-01-01", "2023-01-02", "2023-01-03"], type=pa.string())
    )
    with pytest.raises(TypeError, match="unsupported physical type"):
        t(spark, sf_dir, "events")


def test_scan_cache_keyed_by_session_object(spark, tmp_path, fresh_cache):
    """The cache must be keyed by the live session object (not id()), and
    serve the same immutable plan for repeat reads."""
    us = [_EPOCH_US, _EPOCH_US + 1_000_000, _EPOCH_US + 2_000_000]
    sf_dir = _write_events(tmp_path, pa.array(us, type=pa.timestamp("us")))
    df1 = t(spark, sf_dir, "events")
    df2 = t(spark, sf_dir, "events")
    assert df1 is df2
    assert spark in tables_mod._SCAN_CACHE


def test_tuning_marker_is_session_scoped(spark):
    """Tuning state lives on the session as a conf, so a recycled object
    address can never skip tuning: clearing the marker re-tunes."""
    tables_mod._tune_session(spark)
    assert spark.conf.get(tables_mod._TUNED_MARKER) == "true"
    # Simulate a fresh session at the same address: unset the marker.
    spark.conf.unset(tables_mod._TUNED_MARKER)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    tables_mod._tune_session(spark)
    assert spark.conf.get(tables_mod._TUNED_MARKER) == "true"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
