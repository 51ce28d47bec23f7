"""operators/ann_index.py — persisted IVF index contracts.

The catalog queries pin cross-engine parity; these pin the operator
invariants directly: serve-from-store equals the in-plan ivf_topk,
append equals rebuild, and the cent_id partitioning actually prunes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.ann_index import (
    ivf_index_append,
    ivf_index_read,
    ivf_index_write,
    ivf_topk_from_index,
)
from etl_ml_pipeline_spark.operators.similarity import ivf_topk


def _corpus(spark, n=120, d=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.standard_normal(d).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "c_id long, c_vec array<double>")


def _centroids(corpus):
    return corpus.filter(F.col("c_id") % 30 == 0).select(
        F.col("c_id").alias("cent_id"), F.col("c_vec").alias("cent_vec")
    )


def _queries(corpus, lo=0, hi=5):
    return corpus.filter((F.col("c_id") >= lo) & (F.col("c_id") < hi)).select(
        F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec")
    )


def _rows(df):
    return sorted(
        (r["q_id"], r["rank"], r["c_id"], round(r["cos"], 10), r["cent_id"])
        for r in df.collect()
    )


def test_serve_from_store_equals_in_plan_ivf(spark, tmp_path):
    corpus = _corpus(spark)
    cents = _centroids(corpus)
    path = str(tmp_path / "idx")
    ivf_index_write(corpus, cents, path)
    sc, sl = ivf_index_read(spark, path)
    got = ivf_topk_from_index(_queries(corpus), sc, sl, k=3, n_probe=2)
    want = ivf_topk(_queries(corpus), corpus, cents, k=3, n_probe=2)
    assert _rows(got) == _rows(want)


def test_append_equals_full_rebuild(spark, tmp_path):
    corpus = _corpus(spark)
    cents = _centroids(corpus)  # %30 stride ids are even -> frozen = full
    inc = str(tmp_path / "inc")
    ivf_index_write(corpus.filter(F.col("c_id") % 2 == 0), cents, inc)
    ivf_index_append(spark, corpus.filter(F.col("c_id") % 2 == 1), inc)
    full = str(tmp_path / "full")
    ivf_index_write(corpus, cents, full)
    q = _queries(corpus, 10, 16)
    got = ivf_topk_from_index(q, *ivf_index_read(spark, inc), k=4, n_probe=1)
    want = ivf_topk_from_index(q, *ivf_index_read(spark, full), k=4, n_probe=1)
    assert _rows(got) == _rows(want)
    # the appended rows really landed in the shared lists layout
    _, lists = ivf_index_read(spark, inc)
    assert lists.count() == 120


def test_lists_partitioning_prunes_probed_cells(spark, tmp_path):
    corpus = _corpus(spark)
    cents = _centroids(corpus)
    path = str(tmp_path / "idx")
    ivf_index_write(corpus, cents, path)
    pruned = spark.read.parquet(f"{path}/lists").filter(F.col("cent_id") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition-column filter never reaches the data scan as a row
    # filter — it prunes directories (PartitionFilters in the scan node)
    assert "PartitionFilters: [" in plan
    assert "isnotnull(cent_id" in plan or "cent_id" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]


def test_delete_tombstones_then_vacuum_equals_rebuild(spark, tmp_path):
    """Privacy-erasure contract (VERDICT r10 ask #8): a tombstoned id is
    excluded at serve time immediately; vacuum physically removes the
    rows and serves identically; both equal a from-scratch rebuild on
    the filtered corpus."""
    from etl_ml_pipeline_spark.operators.ann_index import (
        ivf_index_delete,
        ivf_index_tombstones,
        ivf_index_vacuum,
    )

    corpus = _corpus(spark)
    cents = _centroids(corpus)
    path = str(tmp_path / "idx")
    ivf_index_write(corpus, cents, path)
    deleted = corpus.filter(F.col("c_id") % 4 == 1).select("c_id")
    ivf_index_delete(deleted, path)

    q = _queries(corpus, 20, 26)
    tombs = ivf_index_tombstones(spark, path)
    assert tombs is not None
    served_tomb = ivf_topk_from_index(
        q, *ivf_index_read(spark, path), k=4, n_probe=2, tombstones=tombs
    )
    rows_tomb = _rows(served_tomb)
    assert all(r[2] % 4 != 1 for r in rows_tomb)  # no deleted id served
    # plan pin: tombstones exclude via a broadcast ANTI join (map-side,
    # no extra shuffle on the serve path)
    plan = served_tomb._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastExchange" in plan

    stats = ivf_index_vacuum(spark, path)
    assert stats == {"rows_before": 120, "rows_deleted": 30, "rows_after": 90}
    assert ivf_index_tombstones(spark, path) is None  # cleared
    _, lists = ivf_index_read(spark, path)
    assert lists.filter(F.col("c_id") % 4 == 1).count() == 0  # bytes gone
    served_vac = ivf_topk_from_index(
        q, *ivf_index_read(spark, path), k=4, n_probe=2
    )
    assert _rows(served_vac) == rows_tomb

    rebuilt = str(tmp_path / "rebuilt")
    ivf_index_write(corpus.filter(F.col("c_id") % 4 != 1), cents, rebuilt)
    want = ivf_topk_from_index(
        q, *ivf_index_read(spark, rebuilt), k=4, n_probe=2
    )
    assert _rows(want) == rows_tomb

    # idempotent: vacuum with no tombstones is a no-op
    stats2 = ivf_index_vacuum(spark, path)
    assert stats2 == {"rows_before": 90, "rows_deleted": 0, "rows_after": 90}


def test_vacuum_self_heals_interrupted_swap(spark, tmp_path):
    """The lists rewrite reuses the compaction swap dance; a death
    between the two renames must auto-restore on the next vacuum."""
    import os
    import shutil

    from etl_ml_pipeline_spark.operators.ann_index import ivf_index_vacuum

    corpus = _corpus(spark)
    path = str(tmp_path / "idx")
    ivf_index_write(corpus, _centroids(corpus), path)
    lists = f"{path}/lists"
    # simulate the crash window: live renamed away, tmp half-written
    shutil.move(lists, lists + ".__compact_bak")
    os.makedirs(lists + ".__compact_tmp")
    stats = ivf_index_vacuum(spark, path)  # entry self-heals, then no-op
    assert stats["rows_after"] == 120
    assert not os.path.exists(lists + ".__compact_bak")


def test_vacuum_refuses_all_tombstoned(spark, tmp_path):
    """ADVICE r11 #2: vacuuming an index whose every row is tombstoned
    must refuse BEFORE touching storage — a zero-row partitionBy
    overwrite writes no part files, so the post-swap read would fail
    schema inference after the live lists were already swapped away.
    Serve stays correct meanwhile (tombstones filter at read time)."""
    import pytest

    from etl_ml_pipeline_spark.operators.ann_index import (
        ivf_index_delete,
        ivf_index_tombstones,
        ivf_index_vacuum,
    )

    corpus = _corpus(spark)
    path = str(tmp_path / "idx")
    ivf_index_write(corpus, _centroids(corpus), path)
    ivf_index_delete(corpus.select("c_id"), path)  # tombstone everything

    with pytest.raises(ValueError, match="every row is tombstoned"):
        ivf_index_vacuum(spark, path)

    # storage untouched: lists still readable, tombstones still live,
    # and serving with them yields no rows (all ids deleted)
    cents, lists = ivf_index_read(spark, path)
    assert lists.count() == 120
    tombs = ivf_index_tombstones(spark, path)
    assert tombs is not None
    served = ivf_topk_from_index(
        _queries(corpus), cents, lists, k=4, n_probe=2, tombstones=tombs
    )
    assert served.count() == 0


def test_centroid_rows_pass_through_is_identical(spark, tmp_path):
    """r15 §12: pre-collected quantizer rows (collect-once pass-through)
    must be result-identical to each stage collecting for itself — for
    the index lifecycle (write/append/serve) AND the in-plan ivf_topk.
    Also pins that the job count actually drops: the pass-through build
    runs fewer driver-sync jobs than the per-stage-collect build."""
    from etl_ml_pipeline_spark.operators.similarity import (
        collect_centroid_rows,
    )

    corpus = _corpus(spark)
    cents = _centroids(corpus)
    even = corpus.filter(F.col("c_id") % 2 == 0)
    odd = corpus.filter(F.col("c_id") % 2 == 1)

    def build_and_serve(path, rows):
        ivf_index_write(even, cents, path, centroid_rows=rows)
        ivf_index_append(spark, odd, path, centroid_rows=rows)
        sc, sl = ivf_index_read(spark, path)
        return ivf_topk_from_index(
            _queries(corpus), sc, sl, k=3, n_probe=2, centroid_rows=rows
        )

    tracker = spark.sparkContext.statusTracker
    j0 = len(tracker().getJobIdsForGroup(None) or [])
    baseline = build_and_serve(str(tmp_path / "idx_a"), None)
    base_rows = _rows(baseline)
    j1 = len(tracker().getJobIdsForGroup(None) or [])

    pre = collect_centroid_rows(cents)
    passed = build_and_serve(str(tmp_path / "idx_b"), pre)
    assert _rows(passed) == base_rows
    j2 = len(tracker().getJobIdsForGroup(None) or [])
    # baseline ran 3 centroid collects (write/append/serve); the
    # pass-through side paid 1 (the explicit collect) — strictly fewer
    # jobs for the same result set. (collect() of the final frames and
    # the writes are common to both sides.)
    assert (j2 - j1) < (j1 - j0)

    # and the in-plan composite: ivf_topk with pre-collected rows
    want = ivf_topk(_queries(corpus), corpus, cents, k=3, n_probe=2)
    got = ivf_topk(
        _queries(corpus), corpus, cents, k=3, n_probe=2, centroid_rows=pre
    )
    assert _rows(got) == _rows(want)
