"""Persistent perceptual-hash image index (operators/phash_index.py):
build / incremental-append / banded gate / retention, pinned row-level
against brute-force Hamming."""

from __future__ import annotations

import itertools

import pytest

from etl_ml_pipeline_spark.operators.phash_index import (
    append_phash_index,
    build_phash_index,
    gate_against_phash_index,
    phash_index_stats,
    read_phash_index,
    retire_phash_index_generation,
)

# four hand-picked 64-bit hashes: B differs from A in 1 bit (pos 0),
# C in 2 bits (pos 0 and 2), D is A's complement (distance 64)
_A = "01" * 32
_B = "11" + "01" * 31
_C = "1111" + "01" * 30
_D = "10" * 32
assert sum(x != y for x, y in zip(_A, _B)) == 1
assert sum(x != y for x, y in zip(_A, _C)) == 2
assert sum(x != y for x, y in zip(_B, _C)) == 1
assert sum(x != y for x, y in zip(_A, _D)) == 64


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, dhash string")


@pytest.fixture()
def index_path(tmp_path):
    return str(tmp_path / "phash_ix")


def _brute(probe, idx, radius):
    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    hits = [(i, h) for i, h in idx if ham(probe, h) <= radius]
    return len(hits), (min(i for i, _ in hits) if hits else None)


def test_build_append_gate_against_brute_force(spark, index_path):
    assert build_phash_index(_df(spark, [(1, _A), (2, _D)]), index_path) == 2
    # append skips ids already indexed (hash immutable per id)
    assert append_phash_index(_df(spark, [(2, _B), (3, _B)]), index_path) == 1
    stats = {r["gen"]: r["n_images"] for r in
             phash_index_stats(spark, index_path).collect()}
    assert stats == {0: 2, 1: 1}

    idx = [(1, _A), (2, _D), (3, _B)]
    probes = [(10, _A), (11, _C), (12, _D)]
    got = {
        r["id"]: (r["n_index_dups"], r["nearest_index_id"], r["duplicate"])
        for r in gate_against_phash_index(
            _df(spark, probes), read_phash_index(spark, index_path), radius=1
        ).collect()
    }
    for pid, h in probes:
        n, mn = _brute(h, idx, 1)
        assert got[pid] == (n, mn, n > 0), pid
    # radius 2 widens the ball; still exact vs brute force
    got2 = {
        r["id"]: (r["n_index_dups"], r["nearest_index_id"])
        for r in gate_against_phash_index(
            _df(spark, probes), read_phash_index(spark, index_path), radius=2
        ).collect()
    }
    for pid, h in probes:
        assert got2[pid] == _brute(h, idx, 2), pid


def test_gate_rejects_radius_beyond_band_guarantee(spark, index_path):
    build_phash_index(_df(spark, [(1, _A)]), index_path)
    with pytest.raises(ValueError, match="pigeonhole"):
        gate_against_phash_index(
            _df(spark, [(9, _A)]),
            read_phash_index(spark, index_path),
            radius=8,
            n_bands=8,
        )


def test_retire_generation_lifecycle(spark, index_path):
    build_phash_index(_df(spark, [(1, _A)]), index_path)
    append_phash_index(_df(spark, [(2, _B)]), index_path)
    append_phash_index(_df(spark, [(3, _C)]), index_path)
    # probe at distance 1 of A sees A (d=1), B (d=0 vs? B=that probe)…
    # use B itself as the probe: hits A (1), B (0), C (1 vs B)
    full = gate_against_phash_index(
        _df(spark, [(9, _B)]), read_phash_index(spark, index_path), radius=1
    ).collect()[0]
    assert (full["n_index_dups"], full["nearest_index_id"]) == (3, 1)
    # retire the MIDDLE generation (gen 1 = id 2)
    assert retire_phash_index_generation(spark, index_path, 1) == 1
    stats = {r["gen"]: r["n_images"] for r in
             phash_index_stats(spark, index_path).collect()}
    assert stats == {0: 1, 2: 1}
    after = gate_against_phash_index(
        _df(spark, [(9, _B)]), read_phash_index(spark, index_path), radius=1
    ).collect()[0]
    assert (after["n_index_dups"], after["nearest_index_id"]) == (2, 1)
    # re-appending the retired image re-indexes it under a fresh gen
    assert append_phash_index(_df(spark, [(2, _B)]), index_path) == 1
    gens = sorted(r["gen"] for r in
                  phash_index_stats(spark, index_path).collect())
    assert gens == [0, 2, 3]
    # guards: unknown gen, last remaining gen
    with pytest.raises(ValueError, match="not in index"):
        retire_phash_index_generation(spark, index_path, 7)
    retire_phash_index_generation(spark, index_path, 2)
    retire_phash_index_generation(spark, index_path, 3)
    with pytest.raises(ValueError, match="last remaining"):
        retire_phash_index_generation(spark, index_path, 0)


def test_gate_keeps_clean_probes_with_nulls(spark, index_path):
    build_phash_index(_df(spark, [(1, _A)]), index_path)
    rows = {
        r["id"]: (r["n_index_dups"], r["nearest_index_id"], r["duplicate"])
        for r in gate_against_phash_index(
            _df(spark, [(10, _D)]), read_phash_index(spark, index_path)
        ).collect()
    }
    assert rows == {10: (0, None, False)}


def test_band_candidates_exact_under_radius_sweep(spark, index_path):
    """Exactness of the banded gate vs brute force over a random hash
    population, every radius under the guarantee."""
    import random

    rng = random.Random(17)
    idx = [(i, "".join(rng.choice("01") for _ in range(64)))
           for i in range(20)]
    # probes: mutated copies at known distances + randoms
    probes = []
    for j, (i, h) in enumerate(idx[:6]):
        flip = rng.sample(range(64), j)
        probes.append(
            (100 + j,
             "".join(("1" if c == "0" else "0") if p in flip else c
                     for p, c in enumerate(h)))
        )
    build_phash_index(_df(spark, idx), index_path)
    for radius in (0, 1, 3, 7):
        got = {
            r["id"]: (r["n_index_dups"], r["nearest_index_id"])
            for r in gate_against_phash_index(
                _df(spark, probes),
                read_phash_index(spark, index_path),
                radius=radius,
            ).collect()
        }
        for pid, h in probes:
            assert got[pid] == _brute(h, idx, radius), (radius, pid)


def test_normalization_and_guard_rails(spark, index_path):
    from pyspark.sql import functions as F

    from etl_ml_pipeline_spark.operators.phash_index import dhash_bands

    # intra-batch duplicate ids collapse deterministically (min hash)
    assert build_phash_index(
        _df(spark, [(1, _B), (1, _A), (2, _D)]), index_path
    ) == 2
    rows = {r["id"]: r["dhash"] for r in
            read_phash_index(spark, index_path).collect()}
    assert rows[1] == min(_A, _B)
    assert append_phash_index(_df(spark, [(3, _C), (3, _D)]), index_path) == 1

    # empty build is a loud error, not an unreadable directory
    empty = _df(spark, [(1, _A)]).filter(F.lit(False))
    with pytest.raises(ValueError, match="empty input"):
        build_phash_index(empty, str(index_path) + "_empty")

    # band arithmetic that would silently corrupt Hamming is rejected
    with pytest.raises(ValueError, match="does not divide"):
        dhash_bands(F.col("dhash"), n_bands=3)
    with pytest.raises(ValueError, match="overflows"):
        dhash_bands(F.col("dhash"), n_bands=2)

    # long-id contract (VERDICT r14 #4): a string-keyed corpus must
    # pre-map (e.g. xxhash64) — a silent cast("long") would null every
    # URL id and collapse the batch into one id=NULL group
    url_keyed = spark.createDataFrame(
        [("https://a.example/x", _A)], "doc_id string, dhash string"
    )
    with pytest.raises(ValueError, match="long by contract"):
        build_phash_index(url_keyed, str(index_path) + "_url")
    # pre-mapped long keys pass through the same door
    assert build_phash_index(
        url_keyed.select(
            F.xxhash64("doc_id").alias("doc_id"), "dhash"
        ),
        str(index_path) + "_url",
    ) == 1
