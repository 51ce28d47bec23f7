"""FFD bin packing (operators/packing.py): exact behavior pinned
against an independent reference packer, plus contract/bounds and
determinism properties."""

from __future__ import annotations

import random

import pytest

from etl_ml_pipeline_spark.operators.packing import (
    ffd_pack,
    ffd_segment_contract,
)


def _reference_ffd(items: list[tuple[int, int]], capacity: int):
    """Independent FFD: items (id, size) sorted (size desc, id asc);
    oversize items get dedicated bins. Returns {id: bin_id}."""
    out: dict[int, int] = {}
    loads: list[int] = []
    for id_, size in sorted(items, key=lambda t: (-t[1], t[0])):
        if size > capacity:
            out[id_] = len(loads)
            loads.append(size)
            continue
        for i, load in enumerate(loads):
            if load + size <= capacity:
                loads[i] += size
                out[id_] = i
                break
        else:
            out[id_] = len(loads)
            loads.append(size)
    return out


def _df(spark, items):
    return spark.createDataFrame(items, "doc_id long, n_tok long")


def test_ffd_matches_reference_single_segment(spark):
    rng = random.Random(7)
    items = [(i, rng.randint(1, 700)) for i in range(120)]
    df = _df(spark, items)
    got = {
        r["id"]: r["bin_id"]
        for r in ffd_pack(df, "n_tok", "doc_id", 512, n_segments=1).collect()
    }
    assert got == _reference_ffd(items, 512)


def test_ffd_matches_reference_per_segment(spark):
    from etl_ml_pipeline_spark.operators.text import token_hash60
    from pyspark.sql import functions as F

    rng = random.Random(13)
    items = [(i, rng.randint(1, 600)) for i in range(200)]
    df = _df(spark, items)
    rows = ffd_pack(df, "n_tok", "doc_id", 512, n_segments=4).collect()
    # recompute the segment hash Spark-side so the reference shards
    # identically (60-bit md5 hash of the id string, mod 4)
    seg_of = {
        r["doc_id"]: r["seg"]
        for r in df.select(
            "doc_id",
            (token_hash60(F.col("doc_id").cast("string")) % 4).alias("seg"),
        ).collect()
    }
    by_seg: dict[int, list[tuple[int, int]]] = {}
    for id_, size in items:
        by_seg.setdefault(seg_of[id_], []).append((id_, size))
    expected = {}
    for seg, seg_items in by_seg.items():
        for id_, b in _reference_ffd(seg_items, 512).items():
            expected[id_] = (seg, b)
    got = {r["id"]: (r["segment_id"], r["bin_id"]) for r in rows}
    assert got == expected


def test_ffd_oversize_get_dedicated_flagged_bins(spark):
    df = _df(spark, [(1, 1000), (2, 600), (3, 100), (4, 100)])
    rows = {
        r["id"]: r for r in ffd_pack(df, "n_tok", "doc_id", 512, 1).collect()
    }
    assert rows[1]["oversize"] and rows[2]["oversize"]
    assert not rows[3]["oversize"] and not rows[4]["oversize"]
    # oversize bins hold exactly one item each
    assert rows[1]["bin_id"] != rows[2]["bin_id"]
    # the two small items co-pack in a fresh bin
    assert rows[3]["bin_id"] == rows[4]["bin_id"]
    assert rows[3]["bin_id"] not in (rows[1]["bin_id"], rows[2]["bin_id"])


def test_ffd_contract_bounds_hold(spark):
    rng = random.Random(29)
    items = [(i, rng.randint(1, 800)) for i in range(500)]
    packed = ffd_pack(_df(spark, items), "n_tok", "doc_id", 512, n_segments=4)
    for r in ffd_segment_contract(packed, 512).collect():
        assert r["bins_fit"] and r["lb_ok"] and r["ub_ok"], r
        assert r["n_docs"] > 0 and r["lb_bins"] >= 1


def test_ffd_deterministic_under_repartition(spark):
    rng = random.Random(41)
    items = [(i, rng.randint(1, 512)) for i in range(300)]
    df = _df(spark, items)
    a = sorted(
        map(tuple, ffd_pack(df, "n_tok", "doc_id", 256, 4).collect())
    )
    b = sorted(
        map(
            tuple,
            ffd_pack(df.repartition(7), "n_tok", "doc_id", 256, 4).collect(),
        )
    )
    assert a == b


def test_ffd_rejects_bad_capacity(spark):
    with pytest.raises(ValueError, match="capacity"):
        ffd_pack(_df(spark, [(1, 1)]), "n_tok", "doc_id", 0)


def test_ffd_pack_transform(spark):
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 600)], "doc_id long, n_tok long"
    )
    cls = TRANSFORMS.get("ffd_pack")
    out = cls(
        {"size_col": "n_tok", "capacity": 512, "n_segments": 1}
    ).transform(df)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {
        "doc_id", "n_tok", "segment_id", "bin_id", "oversize"
    }
    assert rows[3]["oversize"] and not rows[1]["oversize"]
    assert rows[1]["bin_id"] != rows[2]["bin_id"]  # 300+300 > 512
    with pytest.raises(ValueError, match="config needs 'capacity'"):
        cls({"size_col": "n_tok"}).transform(df)
    with pytest.raises(ValueError, match="not in input"):
        cls({"size_col": "missing", "capacity": 8}).transform(df)


def test_ffd_zero_size_items_join_first_bin(spark):
    # zero-size items fit any bin: FFD places them in bin 0 (opened by
    # the largest item); they must never land on a phantom unopened bin
    df = _df(spark, [(1, 0), (2, 100), (3, 0)])
    rows = {
        r["id"]: r["bin_id"]
        for r in ffd_pack(df, "n_tok", "doc_id", 512, 1).collect()
    }
    assert rows == {1: 0, 2: 0, 3: 0}
    # all-zero segment still opens exactly one real bin
    rows2 = {
        r["id"]: r["bin_id"]
        for r in ffd_pack(_df(spark, [(1, 0), (2, 0)]), "n_tok", "doc_id", 8, 1).collect()
    }
    assert rows2 == {1: 0, 2: 0}


def test_ffd_zero_size_items_skip_oversize_bins(spark):
    # ADVICE r13 #1: size DESC puts an oversize item in bin 0 (load >
    # capacity, dedicated). First-fit's load+size <= capacity test must
    # skip it even for size 0 — the 0-size items join the first
    # NON-oversize bin instead.
    items = [(1, 600), (2, 100), (3, 0), (4, 0)]
    rows = {
        r["id"]: (r["bin_id"], r["oversize"])
        for r in ffd_pack(_df(spark, items), "n_tok", "doc_id", 512, 1).collect()
    }
    assert rows == {1: (0, True), 2: (1, False), 3: (1, False), 4: (1, False)}
    ref = _reference_ffd(items, 512)
    assert {k: v[0] for k, v in rows.items()} == ref
    # oversize-only + zero-size: the zero items open their own real bin
    items2 = [(1, 600), (2, 0)]
    rows2 = {
        r["id"]: (r["bin_id"], r["oversize"])
        for r in ffd_pack(_df(spark, items2), "n_tok", "doc_id", 512, 1).collect()
    }
    assert rows2 == {1: (0, True), 2: (1, False)}
    assert {k: v[0] for k, v in rows2.items()} == _reference_ffd(items2, 512)


def test_ffd_pack_transform_rejects_output_column_clash(spark):
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    df = spark.createDataFrame(
        [(1, 10, 0)], "doc_id long, n_tok long, bin_id long"
    )
    with pytest.raises(ValueError, match="output columns"):
        TRANSFORMS.get("ffd_pack")(
            {"size_col": "n_tok", "capacity": 64}
        ).transform(df)
