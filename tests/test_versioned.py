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


def test_apply_changes_copy_on_write(spark, tmp_path):
    """CDC batches fold into new versions: updates win, tombstones drop,
    old versions stay readable, rollback undoes a batch, and re-applying
    a batch is row-identical (idempotent merge)."""
    from etl_ml_pipeline_spark.operators.versioned import apply_changes

    path = str(tmp_path / "cow")
    b1 = spark.createDataFrame(
        [(1, 1, False, "a"), (2, 1, False, "b")],
        "k int, version int, deleted boolean, payload string",
    )
    v1 = apply_changes(spark, path, b1, ["k"], "version", "deleted", note="seed")
    assert v1 == 1
    b2 = spark.createDataFrame(
        [(1, 2, False, "a2"), (2, 2, True, "dead"), (3, 1, False, "c")],
        "k int, version int, deleted boolean, payload string",
    )
    v2 = apply_changes(spark, path, b2, ["k"], "version", "deleted")
    got = {
        r.k: r.payload for r in read_version(spark, path).collect()
    }
    assert got == {1: "a2", 3: "c"}  # update applied, tombstone dropped
    # time travel still sees the pre-merge world
    got1 = {r.k: r.payload for r in read_version(spark, path, version=v1).collect()}
    assert got1 == {1: "a", 2: "b"}
    # idempotence: re-applying batch 2 produces a row-identical version
    v3 = apply_changes(spark, path, b2, ["k"], "version", "deleted")
    got3 = {r.k: r.payload for r in read_version(spark, path, version=v3).collect()}
    assert got3 == got
    # rollback undoes everything after v1 in O(1)
    rollback(path, v1)
    assert {r.k for r in read_version(spark, path).collect()} == {1, 2}
