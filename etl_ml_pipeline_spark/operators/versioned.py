"""Snapshot-versioned parquet tables: write-once versions + manifest.

A minimal time-travel layer over plain parquet — the lakehouse pattern
(Delta/Iceberg snapshots) reduced to its portable core for
environments without those libraries (this container ships neither):

- every write lands in an immutable ``_v=N`` subdirectory;
- a tiny JSON manifest names the LATEST version and the history;
- the manifest swap is atomic (temp + rename, same guarantee as
  ``state.py``), so readers never observe a half-written version:
  they either resolve the old manifest (old complete snapshot) or the
  new one (new complete snapshot);
- ``read(version=...)`` time-travels; ``rollback`` is a manifest edit
  — no data rewrite, O(1).

Scale posture: the manifest is O(versions) metadata on the driver;
data I/O is normal distributed parquet. Snapshots are full copies by
design (simple, immutable, trivially correct) — incremental/merge
semantics belong to the CDC/SCD2 operators (operators/relational.py)
or a real table format; compact old snapshots with
``layout.compact_files`` and prune with ``expire(keep_last=...)``.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _load_manifest(path: str) -> dict:
    try:
        with open(_manifest_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"latest": None, "versions": []}


def _store_manifest(path: str, manifest: dict) -> None:
    os.makedirs(path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path, prefix="._manifest", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(path))  # atomic on POSIX


def write_version(df: DataFrame, path: str, note: str | None = None) -> int:
    """Write ``df`` as the table's next immutable version; returns its id.

    The data write completes fully BEFORE the manifest swap publishes
    it — a crash mid-write leaves an orphan ``_v=N`` directory that no
    manifest references (harmless; re-written next attempt)."""
    manifest = _load_manifest(path)
    vid = (manifest["latest"] or 0) + 1
    vdir = os.path.join(path, f"_v={vid}")
    df.write.mode("overwrite").parquet(vdir)
    manifest["versions"].append(
        {"id": vid, "ts": time.time(), "note": note or ""}
    )
    manifest["latest"] = vid
    _store_manifest(path, manifest)
    return vid


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the latest version, or time-travel to a specific one."""
    manifest = _load_manifest(path)
    if manifest["latest"] is None:
        raise FileNotFoundError(f"no versions at {path}")
    vid = manifest["latest"] if version is None else version
    known = {v["id"] for v in manifest["versions"]}
    if vid not in known:
        raise ValueError(f"version {vid} not in {sorted(known)}")
    return spark.read.parquet(os.path.join(path, f"_v={vid}"))


def rollback(path: str, version: int) -> None:
    """Point LATEST back at an existing version — O(1), no data moves."""
    manifest = _load_manifest(path)
    known = {v["id"] for v in manifest["versions"]}
    if version not in known:
        raise ValueError(f"version {version} not in {sorted(known)}")
    manifest["latest"] = version
    _store_manifest(path, manifest)


def history(path: str) -> list[dict]:
    return list(_load_manifest(path)["versions"])


def expire(path: str, keep_last: int) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (never the one
    LATEST points at); returns the removed ids."""
    manifest = _load_manifest(path)
    versions = sorted(manifest["versions"], key=lambda v: v["id"])
    keep_ids = {v["id"] for v in versions[-keep_last:]} | {manifest["latest"]}
    removed = []
    for v in versions:
        if v["id"] not in keep_ids:
            shutil.rmtree(os.path.join(path, f"_v={v['id']}"), ignore_errors=True)
            removed.append(v["id"])
    manifest["versions"] = [v for v in versions if v["id"] in keep_ids]
    _store_manifest(path, manifest)
    return removed


def apply_changes(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    delete_col: str | None = None,
    note: str = "",
) -> int:
    """Copy-on-write upsert: merge a CDC change batch into the current
    snapshot and publish the result as the table's next version.

    The composition that makes the versioned store a mini-lakehouse:
    ``cdc_latest_view`` (one key-shuffle merge, latest-version-wins,
    tombstones drop — operators/relational.py) computes the new
    snapshot; ``write_version`` publishes it atomically. Readers on the
    previous version are never disturbed (their files are immutable),
    rollback undoes a bad batch in O(1), and re-applying the same batch
    is a no-op row-wise (the merge is idempotent) — effectively-once
    ingestion on top of at-least-once delivery.

    First call on an empty table bootstraps from the changes alone.
    Returns the published version id.
    """
    from etl_ml_pipeline_spark.operators.relational import cdc_latest_view

    manifest = _load_manifest(path)
    if manifest["latest"] is None:
        base = changes.limit(0)
    else:
        base = read_version(spark, path)
    merged = cdc_latest_view(base, changes, keys, version_col, delete_col)
    if delete_col is not None and delete_col in changes.columns:
        # keep the schema stable across versions: surviving rows are,
        # by definition, not deleted
        from pyspark.sql import functions as F

        merged = merged.withColumn(delete_col, F.lit(False)).select(
            *changes.columns
        )
    return write_version(merged, path, note=note)
