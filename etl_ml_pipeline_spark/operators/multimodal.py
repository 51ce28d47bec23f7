"""Multimodal (image/audio/video) column plumbing.

LLM-data-pipeline extension (BASELINE.json north star): media travel as
opaque ``binary`` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.

Image decode is REAL for PNG and PPM/PGM using only the stdlib + numpy:
``_decode_png`` parses IHDR/PLTE/IDAT chunks, zlib-inflates the pixel
stream, and inverts all five PNG scanline filters (None/Sub/Up/Average/
Paeth) for 8-bit gray / gray+alpha / RGB / RGBA / palette images;
``_decode_ppm`` handles binary P5/P6. Formats needing a codec library
(JPEG/WebP/video) are not decodable here — ``_decode_bytes`` raises
``ValueError`` on an unrecognized magic, and ``fake=True`` selects the
deterministic md5-derived stub used by plumbing-only oracles. A tiny
``encode_png`` (same filter set, for synthesizing valid test images)
rounds out the pure-Python path.

Scale posture: media blobs stay in executor memory one Arrow batch at a
time (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
bytes); no collect, no driver round-trips; derived features are small
columns so downstream stages shed the blob via column pruning. The
pure-Python filter inversion is per-pixel for Sub/Average/Paeth rows —
fine for thumbnails/metadata extraction; a production cluster would mount
a codec library and swap only the body of ``_decode_bytes``.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.registry import register_transform

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)

# Minimal PCM container for the audio path: magic + big-endian uint32
# sample count + int8 mono samples. A real deployment swaps the parse
# body for soundfile/ffmpeg; the container keeps the header-parse +
# numpy-DSP plumbing real without a codec library in this image.
_PCM_MAGIC = b"FPCM"


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# Bytes-per-pixel channel count by PNG color type (8-bit depth).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# ITU-R BT.601 luma weights — the standard "perceived brightness" mix.
_LUMA_R, _LUMA_G, _LUMA_B = 0.299, 0.587, 0.114


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering: ``raw`` is the zlib-inflated stream
    of ``height`` rows, each 1 filter-type byte + ``stride`` data bytes.
    Returns the reconstructed (height, stride) uint8 array.

    Up/None rows are vectorized; Sub/Average/Paeth recurse on the prior
    pixel in the same row, so those run the per-pixel defining recurrence
    (spec: https://www.w3.org/TR/png-3/#9Filters).
    """
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes; expected {height * (1 + stride)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            recon = line
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            recon = line
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + (a + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                recon[x] = (recon[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
        out[y] = recon.astype(np.uint8)
    return out


def _decode_png(data: bytes) -> tuple[int, int, float]:
    """Stdlib PNG decode -> (width, height, mean_luma in [0, 1])."""
    luma = _png_luma(data)
    h, w = luma.shape
    return int(w), int(h), float(luma.mean() / 255.0)


def _png_luma(data: bytes) -> "np.ndarray":
    """Stdlib PNG decode -> (height, width) float64 luma grid in [0, 255].

    Supports non-interlaced 8-bit gray (0), RGB (2), palette (3),
    gray+alpha (4), RGBA (6). Alpha is ignored for luma (features, not
    compositing)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, bitdepth, colortype = 8, None, None, None, None
    idat: list[bytes] = []
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if interlace:
                raise ValueError("interlaced (Adam7) PNG not supported")
            if bitdepth != 8:
                raise ValueError(f"only 8-bit PNG supported, got bit depth {bitdepth}")
            if colortype not in _PNG_CHANNELS:
                raise ValueError(f"unknown PNG color type {colortype}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    bpp = _PNG_CHANNELS[colortype]
    px = _png_unfilter(zlib.decompress(b"".join(idat)), height, width * bpp, bpp)
    px = px.reshape(height, width, bpp)
    if colortype == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        rgb = palette[px[:, :, 0]].astype(np.float64)
        luma = _LUMA_R * rgb[:, :, 0] + _LUMA_G * rgb[:, :, 1] + _LUMA_B * rgb[:, :, 2]
    elif colortype in (2, 6):
        f = px.astype(np.float64)
        luma = _LUMA_R * f[:, :, 0] + _LUMA_G * f[:, :, 1] + _LUMA_B * f[:, :, 2]
    else:  # gray / gray+alpha: channel 0 IS luma
        luma = px[:, :, 0].astype(np.float64)
    return luma


def ahash_bits(luma: "np.ndarray", grid: int = 8) -> str:
    """Average-hash (aHash) of a luma grid as a ``grid*grid``-char bit
    string: nearest-neighbor downsample to grid x grid, threshold each
    sample against the SAMPLE mean (the standard aHash recipe).
    Brightness-invariant for uniform shifts: adding a constant to every
    pixel moves samples and mean together, so the bits — and therefore
    the dedup groups — are unchanged. Emitted as a '0'/'1' string so
    the value is engine-portable without 64-bit sign games."""
    h, w = luma.shape
    rows = (np.arange(grid) * h) // grid
    cols = (np.arange(grid) * w) // grid
    s = luma[np.ix_(rows, cols)]
    m = s.sum() / (grid * grid)  # exact for integer-valued luma
    return "".join("1" if v > m else "0" for v in s.ravel())


def dhash_bits(luma: "np.ndarray", grid: int = 8) -> str:
    """Difference-hash (dHash) of a luma grid as a ``grid*grid``-char
    bit string: nearest-neighbor downsample to grid x (grid+1), then
    bit(r, c) = 1 iff sample(r, c+1) > sample(r, c) — the standard
    horizontal-gradient recipe. Invariant to uniform brightness shifts
    AND to uniform contrast scaling (both preserve the sign of every
    horizontal difference), which is what makes it the perceptual
    near-dup hash: small local edits flip few bits, so near-dups are
    a small Hamming ball around each other. Emitted as a '0'/'1'
    string, engine-portable without 64-bit sign games."""
    h, w = luma.shape
    rows = (np.arange(grid) * h) // grid
    cols = (np.arange(grid + 1) * w) // (grid + 1)
    s = luma[np.ix_(rows, cols)]
    return "".join(
        "1" if s[r, c + 1] > s[r, c] else "0"
        for r in range(grid)
        for c in range(grid)
    )


def _decode_ppm(data: bytes) -> tuple[int, int, float]:
    """Binary netpbm decode (P5 = PGM gray, P6 = PPM RGB) ->
    (width, height, mean_luma in [0, 1])."""
    # Header: magic, width, height, maxval as whitespace/comment-separated
    # tokens, then a single whitespace byte before the raster.
    tokens: list[bytes] = []
    pos = 2  # past the P5/P6 magic
    while len(tokens) < 3 and pos < len(data):
        ch = data[pos : pos + 1]
        if ch == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(data[start:pos])
    pos += 1  # the single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if data[:2] == b"P6" else 1
    raster = np.frombuffer(data, np.uint8, width * height * channels, pos)
    px = raster.reshape(height, width, channels).astype(np.float64)
    if channels == 3:
        luma = _LUMA_R * px[:, :, 0] + _LUMA_G * px[:, :, 1] + _LUMA_B * px[:, :, 2]
    else:
        luma = px[:, :, 0]
    return width, height, float(luma.mean() / maxval)


def _decode_bytes(data: bytes, fake: bool) -> tuple[int, int, float]:
    """Decode an image blob -> (width, height, mean_luma).

    Real path: dispatch on magic bytes — PNG and binary netpbm (P5/P6)
    decode with the stdlib; anything else (JPEG/WebP/...) needs a codec
    library this container lacks and raises ``ValueError``.

    Fake path (``fake=True``): deterministic md5-derived pseudo-decode
    used by plumbing-only oracles: width = 1 + (h mod 64), height =
    1 + (h mod 48), luma = (h mod 256)/255, h = first 15 md5 hex chars.
    """
    if not fake:
        if data[:8] == _PNG_MAGIC:
            return _decode_png(data)
        if data[:2] in (b"P5", b"P6"):
            return _decode_ppm(data)
        raise ValueError(
            f"unsupported image format (magic {data[:4]!r}); this environment "
            "decodes PNG and binary netpbm only"
        )
    h = int(hashlib.md5(data).hexdigest()[:15], 16)
    return 1 + h % 64, 1 + h % 48, (h % 256) / 255.0


def encode_png(pixels: np.ndarray, color_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit, non-interlaced) for synthesizing valid
    test/catalog images without a codec library. ``pixels`` is uint8 with
    shape (h, w) for gray or (h, w, channels) matching ``color_type``.

    Rows cycle through all five filter types (y mod 5) so a round-trip
    exercises every de-filter branch — deliberately, not for compression.
    """
    if color_type == 3:
        raise ValueError("encoder does not emit PLTE chunks; use gray (0) or RGB (2)")
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    if channels != _PNG_CHANNELS[color_type]:
        raise ValueError(
            f"color type {color_type} needs {_PNG_CHANNELS[color_type]} "
            f"channels, got {channels}"
        )
    flat = arr.reshape(height, width * channels).astype(np.int32)
    bpp = channels
    stream = bytearray()
    for y in range(height):
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros_like(row)
        left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        ftype = y % 5
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - (left + prev) // 2
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = row - pred
        stream.append(ftype)
        stream.extend((filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def attach_media_meta(
    df: DataFrame, binary_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Typed metadata struct alongside the opaque blob."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        ),
    )


def decode_image_features(
    df: DataFrame, binary_col: str = "media", fake: bool = False
) -> DataFrame:
    """mapInPandas decode: blob batches in, feature struct out."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField("img", IMAGE_FEATURES_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(bytes(b), fake) if b is not None else (None, None, None)
                for b in pdf[binary_col]
            ]
            pdf = pdf.copy()
            pdf["img"] = [
                {"width": w, "height": h, "mean_luma": l} for (w, h, l) in feats
            ]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def encode_pcm(samples: np.ndarray) -> bytes:
    """Serialize int8 mono PCM into the FPCM container."""
    s = np.asarray(samples).astype(np.int8)
    return _PCM_MAGIC + struct.pack(">I", len(s)) + s.tobytes()


def _decode_pcm(data: bytes) -> tuple[int, float, int]:
    """Parse an FPCM blob -> (n_samples, rms, zero_crossings).

    rms is floor-truncated at 1e-4: the mean of int squares is an exact
    double and IEEE sqrt is correctly rounded, so the value is
    bit-reproducible across engines. Zero crossings count strict sign
    flips (product of neighbours < 0).
    """
    if data[:4] != _PCM_MAGIC:
        raise ValueError(
            f"not an FPCM blob (magic {data[:4]!r}); real codecs are not "
            "mounted in this environment — see module docstring"
        )
    (n,) = struct.unpack(">I", data[4:8])
    payload = data[8 : 8 + n]
    if len(payload) != n:
        raise ValueError(f"truncated FPCM payload: {len(payload)} of {n} bytes")
    s = np.frombuffer(payload, dtype=np.int8).astype(np.int64)
    if n == 0:
        return 0, 0.0, 0
    rms = float(np.floor(np.sqrt(float((s * s).mean())) * 10000) / 10000)
    zc = int(((s[:-1] * s[1:]) < 0).sum())
    return n, rms, zc


def decode_audio_features(df: DataFrame, binary_col: str = "media") -> DataFrame:
    """mapInPandas audio decode: FPCM blobs in, feature struct out.

    Same Arrow-batched shape as ``decode_image_features`` — blobs never
    leave the executor, downstream stages prune the binary column away.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField("audio", AUDIO_FEATURES_SCHEMA)]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_pcm(bytes(b)) if b is not None else (None, None, None)
                for b in pdf[binary_col]
            ]
            pdf = pdf.copy()
            pdf["audio"] = [
                {"n_samples": n, "rms": r, "zero_crossings": z}
                for (n, r, z) in feats
            ]
            yield pdf

    return df.mapInPandas(decode, schema=out_schema)


def sample_frames(
    df: DataFrame, binary_col: str = "media", n_frames: int = 4, fake: bool = False
) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    The fake path slices the blob into n equal chunks standing in for
    decoded frames; the real path would call an ffmpeg-style reader.
    """
    if not fake:
        raise NotImplementedError(
            "frame sampling needs a video codec not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = bytes(row[binary_col]) if row[binary_col] is not None else b""
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    r = row.to_dict()
                    r["frame_idx"] = i
                    r["frame_bytes"] = blob[i * step : (i + 1) * step]
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


@register_transform("decode_image")
class DecodeImage(BaseTransform):
    def transform(self, df: DataFrame) -> DataFrame:
        return decode_image_features(
            df,
            binary_col=self.config.get("binary_col", "media"),
            fake=bool(self.config.get("fake", False)),
        )


# --------------------------------------------------------------------------
# Video: FVID container (magic + width/height/frame-count header + raw
# 8-bit gray frames). Real codecs (ffmpeg et al.) are not mounted in
# this environment; the container parse, frame sampling, and per-frame
# feature math below are the REAL distributed plumbing — swap
# _decode_fvid for an ffmpeg reader and nothing else changes.
# --------------------------------------------------------------------------

_VID_MAGIC = b"FVID"


def encode_video(frames: np.ndarray) -> bytes:
    """Serialize (n_frames, h, w) uint8 gray frames into FVID."""
    f = np.asarray(frames).astype(np.uint8)
    n, h, w = f.shape
    return _VID_MAGIC + struct.pack(">HHH", w, h, n) + f.tobytes()


def _decode_fvid(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse FVID -> (w, h, frames[n, h, w])."""
    if data[:4] != _VID_MAGIC:
        raise ValueError(
            f"not an FVID blob (magic {data[:4]!r}); real video codecs are "
            "not mounted in this environment — see module docstring"
        )
    w, h, n = struct.unpack(">HHH", data[4:10])
    payload = data[10 : 10 + n * h * w]
    if len(payload) != n * h * w:
        raise ValueError(f"truncated FVID payload: {len(payload)} of {n * h * w} bytes")
    return w, h, np.frombuffer(payload, dtype=np.uint8).reshape(n, h, w)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("motion", T.DoubleType()),
    ]
)


def decode_video_frames(
    df: DataFrame, binary_col: str = "media", stride: int = 2
) -> DataFrame:
    """mapInPandas frame sampling + per-frame features: every
    ``stride``-th frame emits (frame_idx, w, h, mean_luma, motion).

    mean_luma is the frame's pixel mean; motion is the mean absolute
    pixel delta vs the PREVIOUS ORIGINAL frame (-1.0 for frame 0).
    Both derive from exact integer sums (uint8 pixels, counts far below
    2^53), so the floor-truncated doubles are bit-reproducible — the
    audio-rms determinism argument.

    Scale: blobs stay inside Arrow batches on executors; the fan-out is
    rows x sampled-frames with small feature columns, and the binary
    prunes away downstream. Frame loops are numpy, never per-pixel
    Python.
    """
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != binary_col]
        + list(VIDEO_FRAME_SCHEMA.fields)
    )
    keep = [f.name for f in df.schema.fields if f.name != binary_col]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                w, h, frames = _decode_fvid(bytes(row[binary_col]))
                f64 = frames.astype(np.int64)
                for i in range(0, frames.shape[0], stride):
                    mean_luma = np.floor(f64[i].mean() * 10000) / 10000
                    if i == 0:
                        motion = -1.0
                    else:
                        motion = (
                            np.floor(np.abs(f64[i] - f64[i - 1]).mean() * 10000)
                            / 10000
                        )
                    r = {k: row[k] for k in keep}
                    r.update(
                        frame_idx=i,
                        width=w,
                        height=h,
                        mean_luma=float(mean_luma),
                        motion=float(motion),
                    )
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)
