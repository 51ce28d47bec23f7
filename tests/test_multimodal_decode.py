"""Real (stdlib) PNG / netpbm decode tests for the multimodal operators.

The encoder deliberately cycles all five PNG scanline filters per row, so
an encode->decode round trip exercises every de-filter branch
(None/Sub/Up/Average/Paeth) — the part of a pure-Python PNG reader that
actually goes wrong.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_ml_pipeline_spark.operators.multimodal import (
    _decode_bytes,
    _decode_png,
    _decode_ppm,
    decode_image_features,
    encode_png,
)

rng = np.random.default_rng(42)


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def test_png_gray_roundtrip_all_filters():
    # 7 rows -> filter types 0,1,2,3,4,0,1 all hit.
    px = rng.integers(0, 256, size=(7, 11), dtype=np.uint8)
    w, h, luma = _decode_png(encode_png(px, color_type=0))
    assert (w, h) == (11, 7)
    assert luma == pytest.approx(px.mean() / 255.0, abs=1e-12)


def test_png_rgb_roundtrip_luma_weights():
    px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    w, h, luma = _decode_png(encode_png(px, color_type=2))
    f = px.astype(np.float64)
    expect = (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]).mean() / 255
    assert (w, h) == (5, 6)
    assert luma == pytest.approx(expect, abs=1e-12)


def test_png_rgba_alpha_ignored():
    rgb = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    alpha = rng.integers(0, 256, size=(5, 4, 1), dtype=np.uint8)
    _, _, luma_rgba = _decode_png(encode_png(np.dstack([rgb, alpha]), color_type=6))
    _, _, luma_rgb = _decode_png(encode_png(rgb, color_type=2))
    assert luma_rgba == pytest.approx(luma_rgb, abs=1e-12)


def test_png_gray_alpha():
    gray = rng.integers(0, 256, size=(4, 3, 1), dtype=np.uint8)
    alpha = np.full((4, 3, 1), 7, dtype=np.uint8)
    _, _, luma = _decode_png(encode_png(np.dstack([gray, alpha]), color_type=4))
    assert luma == pytest.approx(gray.mean() / 255.0, abs=1e-12)


def test_png_palette():
    # Handcrafted 2x2 palette image: indices into a 3-color PLTE.
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    stream = b"".join(b"\x00" + row.tobytes() for row in idx)  # filter 0 rows
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(stream))
        + _png_chunk(b"IEND", b"")
    )
    w, h, luma = _decode_png(data)
    rgb = palette[idx].astype(np.float64)
    expect = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]).mean() / 255
    assert (w, h, luma) == (2, 2, pytest.approx(expect, abs=1e-12))


def test_ppm_p6_and_pgm_p5():
    rgb = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    p6 = b"P6\n# a comment\n4 3\n255\n" + rgb.tobytes()
    w, h, luma = _decode_ppm(p6)
    f = rgb.astype(np.float64)
    expect = (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]).mean() / 255
    assert (w, h) == (4, 3)
    assert luma == pytest.approx(expect, abs=1e-12)

    gray = rng.integers(0, 256, size=(2, 5), dtype=np.uint8)
    p5 = b"P5 5 2 255 " + gray.tobytes()
    assert _decode_ppm(p5) == (5, 2, pytest.approx(gray.mean() / 255.0, abs=1e-12))


def test_decode_bytes_dispatch_and_errors():
    px = np.zeros((2, 2), dtype=np.uint8)
    assert _decode_bytes(encode_png(px), fake=False)[:2] == (2, 2)
    assert _decode_bytes(b"P5 2 2 255 \x00\x00\x00\x00", fake=False)[:2] == (2, 2)
    with pytest.raises(ValueError, match="unsupported image format"):
        _decode_bytes(b"\xff\xd8\xff\xe0 jpeg-ish", fake=False)
    with pytest.raises(ValueError):
        _decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage")


def test_png_truncated_stream_rejected():
    good = encode_png(np.zeros((3, 3), dtype=np.uint8))
    # Corrupt the IDAT payload length by rebuilding with a short stream.
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))  # 1 row missing 2
        + _png_chunk(b"IEND", b"")
    )
    assert _decode_png(good)[:2] == (3, 3)
    with pytest.raises(ValueError, match="pixel stream"):
        _decode_png(bad)


def test_decode_image_features_spark_real(spark):
    """Distributed real decode: encode gradient PNGs driver-side, decode
    through the mapInPandas path with fake=False."""
    rows = []
    for i in range(20):
        w, h = 1 + i % 6, 1 + i % 4
        base = i % 100
        px = np.add.outer(np.arange(h), np.arange(w)) + base  # < 256, no wrap
        rows.append((i, bytearray(encode_png(px.astype(np.uint8)))))
    df = spark.createDataFrame(rows, "doc_id: long, media: binary")
    out = decode_image_features(df, "media", fake=False).select(
        "doc_id", "img.width", "img.height", "img.mean_luma"
    )
    got = {r["doc_id"]: r for r in out.collect()}
    for i in range(20):
        w, h = 1 + i % 6, 1 + i % 4
        expect = (i % 100 + (w - 1) / 2 + (h - 1) / 2) / 255.0
        assert got[i]["width"] == w and got[i]["height"] == h
        assert got[i]["mean_luma"] == pytest.approx(expect, abs=1e-12)


def test_pcm_roundtrip_and_features():
    from etl_ml_pipeline_spark.operators.multimodal import _decode_pcm, encode_pcm

    s = np.array([0, 10, -10, 10, 0, -1], dtype=np.int8)
    n, rms, zc = _decode_pcm(encode_pcm(s))
    assert n == 6
    # strict sign flips: 10->-10, -10->10 (0 boundaries don't count)
    assert zc == 2
    expect = np.floor(np.sqrt((s.astype(np.int64) ** 2).mean()) * 10000) / 10000
    assert rms == expect

    n, rms, zc = _decode_pcm(encode_pcm(np.array([], dtype=np.int8)))
    assert (n, rms, zc) == (0, 0.0, 0)


def test_pcm_errors():
    from etl_ml_pipeline_spark.operators.multimodal import _decode_pcm, encode_pcm

    with pytest.raises(ValueError, match="not an FPCM blob"):
        _decode_pcm(b"RIFF....WAVE")
    blob = encode_pcm(np.arange(10, dtype=np.int8))
    with pytest.raises(ValueError, match="truncated"):
        _decode_pcm(blob[:-3])


def test_decode_audio_features_spark(spark):
    from etl_ml_pipeline_spark.operators.multimodal import (
        decode_audio_features,
        encode_pcm,
    )

    rows = [
        (0, bytearray(encode_pcm(np.array([5, -5, 5], dtype=np.int8)))),
        (1, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, media: binary")
    got = {
        r["doc_id"]: r
        for r in decode_audio_features(df, "media")
        .select("doc_id", "audio.n_samples", "audio.zero_crossings")
        .collect()
    }
    assert got[0]["n_samples"] == 3 and got[0]["zero_crossings"] == 2
    assert got[1]["n_samples"] is None


def test_ahash_brightness_invariance_and_roundtrip():
    """aHash must be invariant to uniform brightness shifts (samples and
    mean move together) but sensitive to structure; and hashing the
    REAL PNG round-trip must equal hashing the source pixels."""
    import numpy as np

    from etl_ml_pipeline_spark.operators.multimodal import (
        _png_luma,
        ahash_bits,
        encode_png,
    )

    base = np.add.outer(np.arange(9), np.arange(11)).astype(np.float64)
    shifted = base + 37.0
    assert ahash_bits(base) == ahash_bits(shifted)
    # structural change flips bits
    structured = base.copy()
    structured[0:4, :] += 100.0
    assert ahash_bits(structured) != ahash_bits(base)
    # decode round-trip preserves the hash bit-for-bit
    blob = encode_png(base.astype(np.uint8), color_type=0)
    assert ahash_bits(_png_luma(blob)) == ahash_bits(base)
    assert len(ahash_bits(base)) == 64 and set(ahash_bits(base)) <= {"0", "1"}


def test_dhash_invariances_and_identity_grid():
    """dHash must be invariant to uniform brightness shifts AND uniform
    contrast scaling (both preserve every horizontal-difference sign),
    flip bits on structural change, and reduce to the exact horizontal
    comparisons when the input is already grid x (grid+1)."""
    import numpy as np

    from etl_ml_pipeline_spark.operators.multimodal import (
        _png_luma,
        dhash_bits,
        encode_png,
    )

    rng = np.random.default_rng(5)
    base = rng.integers(20, 200, size=(16, 20)).astype(np.float64)
    assert dhash_bits(base) == dhash_bits(base + 31.0)
    assert dhash_bits(base) == dhash_bits(base * 1.5)
    flipped = np.fliplr(base)
    assert dhash_bits(flipped) != dhash_bits(base)
    assert len(dhash_bits(base)) == 64 and set(dhash_bits(base)) <= {"0", "1"}

    # identity case: an 8x9 image's dHash IS its horizontal diff signs
    px = np.zeros((8, 9), dtype=np.float64)
    px[:, 0] = 100
    want = []
    for r in range(8):
        for c in range(8):
            up = (r * 8 + c) % 3 == 0
            px[r, c + 1] = px[r, c] + (1 if up else -1)
            want.append("1" if up else "0")
    assert dhash_bits(px) == "".join(want)
    # and the REAL PNG round-trip preserves it bit-for-bit
    blob = encode_png(px.astype(np.uint8), color_type=0)
    assert dhash_bits(_png_luma(blob)) == dhash_bits(px)


def test_phash_analytic_model_separation():
    """The dedup_images_phash bit model must keep its documented
    geometry: within-class Hamming distances exactly {0, 1, 2} and
    cross-class minimum far above the radius — the property that makes
    the banded-LSH recall guarantee and the exact oracle sound."""
    import itertools

    def bits(d):
        k, v = d % 24, (d // 24) % 3
        b = [((k * 37 + p * 11 + ((k + 1) * (p + 3)) % 13) % 5) == 0
             for p in range(64)]
        for i in range(v):
            f = (k * 3 + i * 17) % 64
            b[f] = not b[f]
        return b

    B = {d: bits(d) for d in range(120)}

    def ham(a, b):
        return sum(x != y for x, y in zip(B[a], B[b]))

    within, cross_min = set(), 64
    for a, b in itertools.combinations(range(120), 2):
        if a % 24 == b % 24:
            within.add(ham(a, b))
        else:
            cross_min = min(cross_min, ham(a, b))
    assert within == {0, 1, 2}
    assert cross_min > 8  # > band count -> no guaranteed-collision FPs


def test_phash_band_candidates_cover_every_hamming_ball(spark):
    """The pigeonhole recall guarantee as data: for EVERY radius below
    the band count, band-collision candidate pairs must be a superset
    of the true Hamming-<=r pairs (computed brute-force over the
    120-doc analytic model). This is the property that makes the
    banded join a sound EXACT near-dup algorithm, not an approximate
    one — if it ever fails, the oracle-parity of dedup_images_phash
    was luck."""
    import itertools

    from pyspark.sql import functions as F

    def bits(d):
        k, v = d % 24, (d // 24) % 3
        b = [((k * 37 + p * 11 + ((k + 1) * (p + 3)) % 13) % 5) == 0
             for p in range(64)]
        for i in range(v):
            f = (k * 3 + i * 17) % 64
            b[f] = not b[f]
        return b

    B = {d: bits(d) for d in range(120)}
    bands = {
        d: tuple(
            int("".join("1" if x else "0" for x in B[d][j * 8 : j * 8 + 8]), 2)
            for j in range(8)
        )
        for d in range(120)
    }
    cand = {
        (a, b)
        for a, b in itertools.combinations(range(120), 2)
        if any(bands[a][j] == bands[b][j] for j in range(8))
    }

    def ham(a, b):
        return sum(x != y for x, y in zip(B[a], B[b]))

    for radius in range(8):  # guarantee holds for every r < n_bands
        true_pairs = {
            (a, b)
            for a, b in itertools.combinations(range(120), 2)
            if ham(a, b) <= radius
        }
        missed = true_pairs - cand
        assert not missed, (radius, sorted(missed)[:5])

    # and the shipped query's dup set equals brute force at its radius
    from etl_ml_pipeline_spark.queries.similarity_q import (
        _PHASH_RADIUS,
        dedup_images_phash,
    )

    got = {
        r["doc_id"]: r["n_dup_neighbors"]
        for r in dedup_images_phash(spark, "/root/testdata/sf0.01").collect()
    }
    want = {
        d: sum(1 for e in range(120) if e != d and ham(d, e) <= _PHASH_RADIUS)
        for d in range(120)
    }
    assert got == want
