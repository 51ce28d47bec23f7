"""Unit tests for the cleaning rule pipeline + validation compiler.

Ports the reference's test strategy (tests/test_data_cleaning_transformer.py,
tests/test_pydantic_validation_transformer.py — SURVEY.md §5) to Spark.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators import cleaning
from etl_ml_pipeline_spark.operators.cleaning import DataCleaning
from etl_ml_pipeline_spark.operators.validation import Validate, compile_rules


@pytest.fixture()
def messy_df(spark):
    return spark.createDataFrame(
        [
            Row(ID=1, Name="  alice  ", email="a@x.com", age="30", joined="2024-01-05"),
            Row(ID=2, Name="bob", email=None, age="not-a-number", joined="bad-date"),
            Row(ID=2, Name="bob", email=None, age="not-a-number", joined="bad-date"),
            Row(ID=3, Name=" carol", email="c@y.org", age="41", joined="2023-12-31"),
        ]
    )


def test_drop_and_rename_and_lowercase(messy_df):
    out = cleaning.drop_columns(messy_df, ["email", "nonexistent"])
    assert "email" not in out.columns
    out = cleaning.rename_columns(out, {"Name": "full_name", "missing": "x"})
    assert "full_name" in out.columns
    out = cleaning.lowercase_columns(out)
    assert set(out.columns) == {"id", "full_name", "age", "joined"}


def test_strip_whitespace_only_string_cols(messy_df):
    out = cleaning.strip_whitespace(messy_df)
    names = [r.Name for r in out.orderBy("ID", "Name").collect()]
    assert names == ["alice", "bob", "bob", "carol"]
    # non-string column untouched
    assert [r.ID for r in out.orderBy("ID", "Name").collect()] == [1, 2, 2, 3]


def test_fill_and_drop_nulls(messy_df):
    filled = cleaning.fill_nulls(messy_df, {"email": "unknown", "missing_col": "x"})
    assert filled.filter(F.col("email").isNull()).count() == 0
    dropped = cleaning.drop_nulls(messy_df)
    assert dropped.count() == 2  # rows with null email removed
    subset = cleaning.drop_null_columns(messy_df, ["email"])
    assert subset.count() == 2


def test_deduplicate_full_row(messy_df):
    assert cleaning.deduplicate(messy_df).count() == 3


def test_deduplicate_columns_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="b", seq=2), Row(k=1, v="a", seq=1), Row(k=2, v="z", seq=9)]
    )
    out = cleaning.deduplicate_columns(df, ["k"], order_by=["seq"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a", 2: "z"}


def test_standardize_dates_coerces_invalid_to_null(messy_df):
    out = cleaning.standardize_dates(messy_df, ["joined"])
    rows = {r.ID: r.joined for r in out.collect()}
    assert rows[2] is None
    assert rows[1] is not None and str(rows[1]).startswith("2024-01-05")


def test_cast_types_permissive_vs_column_atomic(messy_df):
    perm = cleaning.cast_types(messy_df, {"age": "int"}, mode="permissive")
    vals = {r.ID: r.age for r in perm.collect()}
    assert vals[1] == 30 and vals[2] is None

    atomic = cleaning.cast_types(messy_df, {"age": "int"}, mode="column_atomic")
    vals = {r.ID: r.age for r in atomic.collect()}
    # one uncastable value -> whole column kept as original strings
    assert vals[1] == "30" and vals[2] == "not-a-number"

    clean = messy_df.filter(F.col("ID") != 2)
    atomic_ok = cleaning.cast_types(clean, {"age": "int"}, mode="column_atomic")
    assert {r.age for r in atomic_ok.collect()} == {30, 41}


def test_rule_pipeline_fixed_order(spark):
    """Rules apply in RULE_ORDER regardless of config dict order."""
    df = spark.createDataFrame(
        [Row(A=" x ", b=None), Row(A=" x ", b=None), Row(A="y", b="z")]
    )
    # config deliberately lists rules "out of order"
    out = DataCleaning(
        {
            "deduplicate": True,
            "fill_nulls": {"b": "filled"},
            "strip_whitespace": True,
            "lowercase_columns": True,
        }
    ).transform(df)
    rows = sorted((r.a, r.b) for r in out.collect())
    # strip+fill happen BEFORE dedup -> the two " x " rows collapse
    assert rows == [("x", "filled"), ("y", "z")]


def test_unknown_rule_warns_not_crashes(spark, caplog):
    df = spark.createDataFrame([Row(a=1)])
    out = DataCleaning({"not_a_rule": True}).transform(df)
    assert out.count() == 1


def test_validate_drop_and_flag_and_fail(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, name="ok", email="a@b.co"),
            Row(id=-5, name="bad-id", email="a@b.co"),
            Row(id=2, name="", email="a@b.co"),
            Row(id=3, name="bad-email", email="nope"),
        ]
    )
    rules = {
        "id": {"not_null": True, "min": 1},
        "name": {"min_length": 1},
        "email": {"email": True},
    }
    dropped = Validate({"rules": rules, "mode": "drop"}).transform(df)
    assert [r.id for r in dropped.collect()] == [1]

    flagged = Validate({"rules": rules, "mode": "flag"}).transform(df)
    assert {r.id: r._valid for r in flagged.collect()} == {
        1: True, -5: False, 2: False, 3: False,
    }

    with pytest.raises(ValueError, match="validation failed"):
        Validate({"rules": rules, "mode": "fail"}).transform(df)

    ok_only = df.filter(F.col("id") == 1)
    assert Validate({"rules": rules, "mode": "fail"}).transform(ok_only).count() == 1


def test_validate_empty_frame_short_circuits(spark):
    df = spark.createDataFrame([], "id long, name string")
    out = Validate({"rules": {"id": {"min": 1}}}).transform(df)
    assert out.count() == 0


def test_compile_rules_null_semantics():
    pred = compile_rules({"x": {"min": 1}})
    assert pred is not None
    # nulls fail a min constraint (SQL three-valued logic -> filter drops)


def test_validate_pydantic_model_compiles(spark):
    """The reference's TodoItem-style contract via a pydantic model path."""
    df = spark.createDataFrame(
        [
            Row(userId=1, id=1, title="do it", completed=True),
            Row(userId=0, id=2, title="bad-user", completed=False),
            Row(userId=2, id=3, title="", completed=False),
        ]
    )
    out = Validate({"model": "tests.schemas_fixture.TodoItem"}).transform(df)
    assert [r.id for r in out.collect()] == [1]


def test_cdc_latest_view_merge_and_tombstones(spark):
    """Latest version wins, change beats base on version ties
    (idempotent re-apply), tombstoned keys disappear."""
    from etl_ml_pipeline_spark.operators.relational import cdc_latest_view

    base = spark.createDataFrame(
        [
            Row(k=1, v="a", version=1, deleted=False),
            Row(k=2, v="b", version=1, deleted=False),
            Row(k=3, v="c", version=1, deleted=False),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(k=1, v="a2", version=2, deleted=False),   # update wins
            Row(k=2, v="dead", version=2, deleted=True),  # tombstone
            Row(k=3, v="c-same", version=1, deleted=False),  # tie -> update wins
            Row(k=4, v="new", version=1, deleted=False),  # insert
        ]
    )
    got = {
        r.k: r.v
        for r in cdc_latest_view(base, updates, ["k"], "version", "deleted").collect()
    }
    assert got == {1: "a2", 3: "c-same", 4: "new"}
    # re-applying the same change batch yields the same view (idempotent)
    view1 = cdc_latest_view(base, updates, ["k"], "version", "deleted")
    again = cdc_latest_view(
        view1.withColumn("deleted", F.lit(False)),
        updates,
        ["k"],
        "version",
        "deleted",
    )
    assert {r.k: r.v for r in again.collect()} == got


def test_table_diff_statuses(spark):
    """added/removed/changed classification, including a null-payload
    change (the delimiter+sentinel hashing must distinguish null from
    the string 'null')."""
    from etl_ml_pipeline_spark.operators.relational import table_diff

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "k int, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "null", 4.0), (5, "e", 5.0)],
        "k int, s string, v double",
    )
    got = {r.k: r.status for r in table_diff(left, right, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_scd2_history_interval_chaining(spark):
    """Three-version chains produce back-to-back validity intervals with
    exactly one current row per key; single-version keys are current
    with an open interval."""
    from etl_ml_pipeline_spark.operators.relational import scd2_history

    changes = spark.createDataFrame(
        [
            Row(k=1, v="a", version=1),
            Row(k=1, v="a2", version=2),
            Row(k=1, v="a3", version=5),  # gap in version numbers is fine
            Row(k=2, v="b", version=1),
        ]
    )
    rows = {
        (r.k, r.version): (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(changes, ["k"], "version").collect()
    }
    assert rows == {
        (1, 1): (1, 2, False),
        (1, 2): (2, 5, False),
        (1, 5): (5, None, True),
        (2, 1): (1, None, True),
    }
    # exactly one current row per key
    assert sum(1 for v in rows.values() if v[2]) == 2


def test_dq_expectations_pass_and_gate(spark):
    """All checks green -> frame passes through untouched; a violated
    uniqueness/domain check raises DataQualityError naming the checks;
    on_failure=warn logs and continues."""
    from etl_ml_pipeline_spark.operators.validation import (
        DataQualityError,
        DqExpectations,
    )

    good = spark.createDataFrame(
        [(1, 10.0, "F"), (2, 20.0, "O"), (3, 0.0, "P")], ["k", "price", "status"]
    )
    checks = [
        {"type": "row_count", "min": 1},
        {"type": "unique", "column": "k"},
        {"type": "not_null", "column": "price"},
        {"type": "accepted_values", "column": "status", "values": ["F", "O", "P"]},
        {"type": "min", "column": "price", "at_least": 0},
    ]
    out = DqExpectations({"checks": checks}).transform(good)
    assert out.count() == 3

    bad = spark.createDataFrame(
        [(1, -5.0, "F"), (1, 20.0, "X")], ["k", "price", "status"]
    )
    import pytest as _pytest

    with _pytest.raises(DataQualityError) as exc:
        DqExpectations({"checks": checks}).transform(bad)
    msg = str(exc.value)
    assert "unique:k" in msg and "accepted_values:status" in msg and "min:price" in msg

    # warn mode: same violations, frame still flows
    out = DqExpectations({"checks": checks, "on_failure": "warn"}).transform(bad)
    assert out.count() == 2


def test_dq_expectations_unknown_check_raises(spark):
    from etl_ml_pipeline_spark.operators.validation import DqExpectations

    df = spark.createDataFrame([(1,)], ["k"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown dq check"):
        DqExpectations({"checks": [{"type": "nope"}]}).transform(df)
    with _pytest.raises(ValueError, match="non-empty"):
        DqExpectations({"checks": []}).transform(df)


def test_parity_against_reference_cleaner(spark):
    """Run the REFERENCE's own DataCleaningTransformer (imported
    unmodified, skipped if the checkout is absent) and our data_cleaning
    transform with the identical config on the same messy frame; the
    surviving row multisets must match exactly."""
    import pathlib
    import sys

    import pytest as _pytest

    if not pathlib.Path("/root/reference/src").exists():
        _pytest.skip("reference checkout not mounted")
    sys.path.insert(0, "/root/reference/src")
    import pandas as pd

    from data_extractor.transformers.data_cleaning import DataCleaningTransformer

    from etl_ml_pipeline_spark.registry import TRANSFORMS

    mess = pd.DataFrame(
        {
            "Name": ["  Alice ", "Bob", "Bob", None, " Carol"],
            "City": [" NYC", None, None, "LA ", "SF"],
            "Amount": ["10.5", "bad", "bad", "3", None],
        }
    )
    cfg = {
        "lowercase_columns": True,
        "strip_whitespace": True,
        "fill_nulls": {"city": "unknown"},
        "deduplicate": True,
        "cast_types": {"amount": "float"},
    }
    ref = DataCleaningTransformer(dict(cfg)).transform(mess.copy())
    # reference cast is column-atomic (any failing value keeps the whole
    # column); select the matching mode on our side
    cfg["cast_mode"] = "column_atomic"
    ours = (
        TRANSFORMS.get("data_cleaning")(dict(cfg))
        .transform(spark.createDataFrame(mess))
        .toPandas()
    )
    key = lambda df: sorted(
        map(tuple, df[["name", "city", "amount"]].fillna("<null>").astype(str).values)
    )
    assert key(ref) == key(ours)


def test_parity_against_reference_validator(spark):
    """Run the REFERENCE's own PydanticValidationTransformer (its
    TodoItem schema, imported unmodified) against our predicate-compiled
    validate transform on the same frame; surviving id sets must match."""
    import pathlib
    import sys

    import pytest as _pytest

    if not pathlib.Path("/root/reference/src").exists():
        _pytest.skip("reference checkout not mounted")
    sys.path.insert(0, "/root/reference/src")
    import pandas as pd

    from data_extractor.transformers.pydantic_validation import (
        PydanticValidationTransformer,
    )

    from etl_ml_pipeline_spark.registry import TRANSFORMS

    rows = pd.DataFrame(
        {
            "userId": [1, 0, 3, 2, -5, 4],
            "id": [1, 2, 0, 4, 5, 6],
            "title": ["a", "b", "c", "", "e", "f"],
            "completed": [True, False, True, True, False, True],
        }
    )
    cfg = {"model": "data_extractor.schemas.todo.TodoItem"}
    ref = PydanticValidationTransformer(dict(cfg)).transform(rows.copy())
    ours = (
        TRANSFORMS.get("pydantic_validation")(dict(cfg))
        .transform(spark.createDataFrame(rows))
        .toPandas()
    )
    assert sorted(ref["id"]) == sorted(ours["id"]) == [1, 6]
