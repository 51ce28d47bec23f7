"""Property-based cleaning-rule tests (hypothesis): Spark rules vs the
pandas semantics they mirror (reference data_cleaning.py:61-159).

The reference ships only example-based tests (SURVEY.md §5, "no
property-based testing"); these generate arbitrary small frames and
assert rule-for-rule parity with pandas, so edge cases (all-null
columns, whitespace-only strings, duplicate rows in any arrangement)
are covered by construction.

Frames stay tiny (≤12 rows) — the point is semantic coverage, not
scale; each test runs a handful of hypothesis examples to keep the
suite's Spark-job count sane.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_ml_pipeline_spark.operators.cleaning import (
    deduplicate,
    deduplicate_columns,
    drop_null_columns,
    drop_nulls,
    fill_nulls,
    strip_whitespace,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# strings incl. whitespace edges; None for nulls
_cell = st.one_of(
    st.none(),
    st.text(
        alphabet=" abXY_",
        min_size=0,
        max_size=6,
    ),
)
_num = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    return pd.DataFrame(
        {
            "s": pd.Series([draw(_cell) for _ in range(n)], dtype=object),
            "t": pd.Series([draw(_cell) for _ in range(n)], dtype=object),
            "x": pd.Series([draw(_num) for _ in range(n)], dtype="Int64"),
        }
    )


def _to_spark(spark, pdf):
    return spark.createDataFrame(pdf, "s string, t string, x long")


def _back(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf = pdf.astype(object).where(pd.notna(pdf), None)  # nan -> None
    return pdf.sort_values(["s", "t", "x"], na_position="first").reset_index(drop=True)


def _norm(pdf) -> pd.DataFrame:
    out = pdf.astype(object).where(pd.notna(pdf), None)
    return out.sort_values(["s", "t", "x"], na_position="first").reset_index(drop=True)


@given(pdf=frames())
@settings(**_SETTINGS)
def test_drop_nulls_matches_pandas(spark, pdf):
    got = _back(drop_nulls(_to_spark(spark, pdf)))
    want = _norm(pdf.dropna(how="any"))
    pd.testing.assert_frame_equal(got.astype(object), want.astype(object))


@given(pdf=frames())
@settings(**_SETTINGS)
def test_drop_null_columns_subset(spark, pdf):
    got = _back(drop_null_columns(_to_spark(spark, pdf), ["s"]))
    want = _norm(pdf.dropna(subset=["s"]))
    pd.testing.assert_frame_equal(got.astype(object), want.astype(object))


@given(pdf=frames())
@settings(**_SETTINGS)
def test_deduplicate_full_row(spark, pdf):
    got = _back(deduplicate(_to_spark(spark, pdf)))
    want = _norm(pdf.drop_duplicates())
    pd.testing.assert_frame_equal(got.astype(object), want.astype(object))


@given(pdf=frames())
@settings(**_SETTINGS)
def test_strip_whitespace_string_cols_only(spark, pdf):
    got = _back(strip_whitespace(_to_spark(spark, pdf)))
    want = pdf.copy()
    for c in ("s", "t"):
        want[c] = want[c].map(lambda v: v.strip() if isinstance(v, str) else v)
    pd.testing.assert_frame_equal(got.astype(object), _norm(want).astype(object))


@given(pdf=frames())
@settings(**_SETTINGS)
def test_fill_nulls_value_map(spark, pdf):
    got = _back(fill_nulls(_to_spark(spark, pdf), {"s": "missing", "x": 0}))
    want = pdf.copy()
    want["s"] = want["s"].where(pd.notna(want["s"]), "missing")
    want["x"] = want["x"].fillna(0)
    pd.testing.assert_frame_equal(got.astype(object), _norm(want).astype(object))


@given(pdf=frames())
@settings(**_SETTINGS)
def test_dedup_keep_first_matches_pandas_order(spark, pdf):
    """dropDuplicates(subset) keep-first parity needs an explicit order:
    add a row index as the tiebreak (the engine's documented contract)."""
    pdf = pdf.reset_index().rename(columns={"index": "rid"})
    sdf = spark.createDataFrame(pdf, "rid long, s string, t string, x long")
    got = (
        deduplicate_columns(sdf, ["s"], order_by=["rid"])
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want = pdf.drop_duplicates(subset=["s"], keep="first").reset_index(drop=True)
    assert list(got["rid"]) == list(want["rid"])
