"""Snapshot-versioned parquet tables: write/read/time-travel/rollback/
expire, with the atomic-manifest publication contract."""

from __future__ import annotations

import json

import pytest

from etl_ml_pipeline_spark.operators.versioned import (
    expire,
    history,
    read_version,
    rollback,
    write_version,
)


def test_versioned_write_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = write_version(spark.range(0, 10), path, note="initial")
    v2 = write_version(spark.range(0, 20), path, note="more rows")
    assert (v1, v2) == (1, 2)
    assert read_version(spark, path).count() == 20          # latest
    assert read_version(spark, path, version=1).count() == 10  # time travel
    assert [h["id"] for h in history(path)] == [1, 2]
    assert history(path)[0]["note"] == "initial"


def test_versioned_rollback_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(spark.range(0, 5), path)
    write_version(spark.range(0, 50), path)
    rollback(path, 1)
    assert read_version(spark, path).count() == 5
    # both snapshots still readable — nothing was rewritten
    assert read_version(spark, path, version=2).count() == 50
    with pytest.raises(ValueError, match="not in"):
        rollback(path, 99)


def test_versioned_expire_keeps_latest(spark, tmp_path):
    path = str(tmp_path / "tbl")
    for n in (1, 2, 3, 4):
        write_version(spark.range(0, n), path)
    rollback(path, 2)  # LATEST is an old version
    removed = expire(path, keep_last=1)
    # newest (4) kept by keep_last, 2 kept because LATEST points at it
    assert removed == [1, 3]
    assert read_version(spark, path).count() == 2
    assert read_version(spark, path, version=4).count() == 4
    with pytest.raises(ValueError):
        read_version(spark, path, version=1)


def test_versioned_manifest_swap_is_atomic(spark, tmp_path):
    """No torn manifests: the published file always parses, and a
    crash-orphaned version directory is invisible to readers."""
    path = str(tmp_path / "tbl")
    write_version(spark.range(0, 3), path)
    # simulate a crashed writer: data landed, manifest never swapped
    spark.range(0, 99).write.parquet(str(tmp_path / "tbl" / "_v=7"))
    man = json.load(open(tmp_path / "tbl" / "_manifest.json"))
    assert man["latest"] == 1
    assert read_version(spark, path).count() == 3
    with pytest.raises(ValueError):
        read_version(spark, path, version=7)  # unpublished => unknown
    # the next successful write publishes as v2, ignoring the orphan
    assert write_version(spark.range(0, 4), path) == 2
