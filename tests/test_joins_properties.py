"""Property-based null_safe_join tests (hypothesis): the helper must
behave exactly like a pandas merge where NULL == NULL — for arbitrary
small frames, any mix of null/non-null single or composite keys, and
inner/left modes. The example-based tests pin the plan shape
(tests/test_plans.py::test_null_safe_join_plans_as_hash_join); these
pin the semantics by construction."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_ml_pipeline_spark.operators.joins import null_safe_join

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small key alphabet so collisions AND null-key groups are frequent
_key = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
_num = st.integers(min_value=-5, max_value=5)


@st.composite
def join_inputs(draw):
    nl = draw(st.integers(min_value=0, max_value=8))
    nr = draw(st.integers(min_value=0, max_value=8))
    left = pd.DataFrame(
        {
            "k1": pd.Series([draw(_key) for _ in range(nl)], dtype=object),
            "k2": pd.Series([draw(_key) for _ in range(nl)], dtype=object),
            "v": [draw(_num) for _ in range(nl)],
        }
    )
    # right side deduped on keys (the helper's join-back use case:
    # aggregates have one row per group)
    right = pd.DataFrame(
        {
            "k1": pd.Series([draw(_key) for _ in range(nr)], dtype=object),
            "k2": pd.Series([draw(_key) for _ in range(nr)], dtype=object),
            "w": [draw(_num) for _ in range(nr)],
        }
    ).drop_duplicates(subset=["k1", "k2"])
    return left, right


def _expected(left: pd.DataFrame, right: pd.DataFrame, keys, how):
    # pandas merge matches NaN keys to NaN keys — exactly NULL <=> NULL
    out = left.merge(right, on=keys, how=how)
    return out


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    def c(x):
        # None sorts before any string/number via a tag tuple
        return (0, "") if pd.isna(x) else (1, str(x))

    rows = [
        tuple(x for x in row)
        for row in pdf[["k1", "k2", "v", "w"]].itertuples(index=False)
    ]
    return sorted(
        ([None if pd.isna(x) else x for x in r] for r in rows),
        key=lambda r: [c(x) for x in r],
    )


def _to_spark(spark, pdf, val_col, schema):
    # explicit schema: an all-None object column would otherwise infer
    # as Spark NullType, which no real group column ever is
    rows = [
        tuple(None if pd.isna(x) else x for x in r)
        for r in pdf.itertuples(index=False)
    ]
    return spark.createDataFrame(rows, schema)


def test_null_safe_join_rejects_nulltype_keys(spark):
    """An untyped all-NULL key column (Spark NullType) makes `<=>`
    match nothing — the helper must fail loudly instead of returning a
    silently empty join (found by the property test below when frames
    were built without explicit schemas)."""
    left = spark.createDataFrame([(None, 1)], "k void, v long")
    right = spark.createDataFrame([("a", 2)], "k string, w long")
    with pytest.raises(TypeError, match="NullType"):
        null_safe_join(left, right, ["k"])


@pytest.mark.parametrize("how", ["right", "full", "outer", "cross"])
def test_null_safe_join_rejects_outer_modes(spark, how):
    """ADVICE r09 #3: key columns are emitted from the LEFT side, so
    right/full joins would silently NULL right-only rows' keys after
    the __nsj_* drop — those modes must raise, not corrupt."""
    left = spark.createDataFrame([("a", 1)], "k string, v long")
    right = spark.createDataFrame([("b", 2)], "k string, w long")
    with pytest.raises(ValueError, match="unsupported"):
        null_safe_join(left, right, ["k"], how)


@pytest.mark.parametrize("how", ["inner", "left"])
@given(data=join_inputs())
@settings(**_SETTINGS)
def test_null_safe_join_matches_pandas_null_matching(spark, data, how):
    left, right = data
    sl = _to_spark(spark, left, "v", "k1 string, k2 string, v long")
    sr = _to_spark(spark, right, "w", "k1 string, k2 string, w long")
    got = null_safe_join(sl, sr, ["k1", "k2"], how).toPandas()
    want = _expected(left, right, ["k1", "k2"], how)
    assert _canon(got) == _canon(want)
    # key columns emitted once, USING-join shape
    assert list(got.columns) == ["k1", "k2", "v", "w"]
