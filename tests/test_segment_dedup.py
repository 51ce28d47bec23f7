"""Segment-level ("paragraph") corpus dedup: survivor-set and reassembly
contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.dedup import segment_dedup


def _corpus(spark):
    rows = [
        (1, "a b c d e f"),          # 2 segments of 3: "a b c", "d e f"
        (2, "a b c x y z"),          # first segment duplicates doc 1's
        (3, "a b c d e f"),          # exact duplicate of doc 1 -> keeps nothing
        (4, "p q r"),                # unique single segment
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_survivors_cover_each_distinct_segment_once(spark):
    out = segment_dedup(_corpus(spark), seg_words=3)
    kept_segs = (
        out.select(F.explode(F.split("clean_text", " ")).alias("w")).count()
    )
    # distinct segments: "a b c", "d e f", "x y z", "p q r" -> 12 words
    assert kept_segs == 12
    assert out.agg(F.sum("n_kept")).first()[0] == 4


def test_exact_duplicate_doc_vanishes(spark):
    out = segment_dedup(_corpus(spark), seg_words=3)
    ids = {r["doc_id"] for r in out.collect()}
    assert 3 not in ids  # every segment already owned by doc 1
    assert ids == {1, 2, 4}


def test_first_doc_keeps_original_text_in_order(spark):
    out = {r["doc_id"]: r for r in segment_dedup(_corpus(spark), seg_words=3).collect()}
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[1]["n_segs"] == 2 and out[1]["n_kept"] == 2
    # doc 2 loses its first segment, keeps its novel tail
    assert out[2]["clean_text"] == "x y z"
    assert out[2]["n_segs"] == 2 and out[2]["n_kept"] == 1


def test_short_doc_single_partial_segment(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["doc_id", "text"])
    out = segment_dedup(df, seg_words=5)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["clean_text"] == "a b"


def test_registry_transform_segments(spark):
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y")], ["doc_id", "text"]
    )
    out = TRANSFORMS.get("dedup_segments")({"seg_words": 2})(df)
    rows = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert rows == {1: "a b c d", 3: "x y"}
