"""Multimodal (image/audio/video) column plumbing.

LLM-data-pipeline extension (BASELINE.json north star): media travel as
opaque ``binary`` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. The container has no image/audio codecs, so the
actual decode is STUBBED — ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic md5-derived fake decode runs instead. Everything around
the stub — schema, batch iteration, partitioning, UDF signatures — is
real and tested; swapping in Pillow/ffmpeg later only changes the body
of ``_decode_bytes``.

Scale posture: media blobs stay in executor memory one Arrow batch at a
time (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
bytes); no collect, no driver round-trips; derived features are small
columns so downstream stages shed the blob via column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def _decode_bytes(data: bytes, fake: bool) -> tuple[int, int, float]:
    """Decode an image blob -> (width, height, mean_luma).

    Real decode requires an image codec (Pillow / libvips) which is not
    in this container. The fake path derives deterministic pseudo-
    dimensions from the content hash so tests and oracles can pin it:
    width = 1 + (h mod 64), height = 1 + (h mod 48), luma = (h mod 256)/255
    where h = first 15 md5 hex chars as an integer.
    """
    if not fake:
        raise NotImplementedError(
            "image decode needs a codec library (Pillow/libvips) not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    h = int(hashlib.md5(data).hexdigest()[:15], 16)
    return 1 + h % 64, 1 + h % 48, (h % 256) / 255.0


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
