"""BPE tokenizer training: hand-computed merges on the classic corpus."""

from __future__ import annotations

from etl_ml_pipeline_spark.operators.text import bpe_train_merges, bpe_word_tokens


def test_known_merge_sequence(spark):
    # Sennrich-style toy corpus: low x2, lower x1, newest x3.
    words = spark.createDataFrame(
        [("low",)] * 2 + [("lower",)] * 1 + [("newest",)] * 3, ["w"]
    )
    rows = {r["round"]: r for r in bpe_train_merges(words, "w", rounds=4).collect()}
    # round 1: "w e" appears in lower (1) + newest (3) = 4 — unique max
    assert rows[1]["pair"] == "·w· ·e·" and rows[1]["n"] == 4
    assert rows[1]["merged"] == "·we·"
    # round 2: five pairs tie at 3; ascending pair text picks "·e· ·we·"
    assert rows[2]["pair"] == "·e· ·we·" and rows[2]["n"] == 3
    # round 3: tie at 3 again; "·ewe· ·s·" sorts first
    assert rows[3]["pair"] == "·ewe· ·s·" and rows[3]["merged"] == "·ewes·"
    # round 4: newest is now n/ewes/t; "·ewes· ·t·" wins the tie
    assert rows[4]["pair"] == "·ewes· ·t·" and rows[4]["merged"] == "·ewest·"


def test_word_tokens_after_schedule(spark):
    # Same toy corpus; merges learned above are we, ewe, ewes, ewest:
    #   low    -> l o w            (3, untouched)
    #   lower  -> l o we r         (4, round 1 only)
    #   newest -> n ewest          (2, all four rounds apply)
    words = spark.createDataFrame(
        [("low",)] * 2 + [("lower",)] * 1 + [("newest",)] * 3, ["w"]
    )
    toks = {r["w"]: r["n_tokens"] for r in bpe_word_tokens(words, "w", rounds=4).collect()}
    assert toks == {"low": 3, "lower": 4, "newest": 2}


def test_single_char_words_produce_no_pairs(spark):
    words = spark.createDataFrame([("a",), ("b",), ("ab",)], ["w"])
    rows = bpe_train_merges(words, "w", rounds=1).collect()
    assert len(rows) == 1
    assert rows[0]["pair"] == "·a· ·b·" and rows[0]["n"] == 1


def test_empty_words_filtered(spark):
    words = spark.createDataFrame([("",), ("xy",), ("xy",)], ["w"])
    rows = bpe_train_merges(words, "w", rounds=1).collect()
    assert rows[0]["pair"] == "·x· ·y·" and rows[0]["n"] == 2
