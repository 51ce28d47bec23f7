"""Differential test: every declared query hash-matches its DuckDB oracle.

This is a local mirror of the driver's CORRECTNESS gate, run at sf0.001
for speed (the driver runs sf0.01).
"""

from __future__ import annotations

import pytest

from etl_ml_pipeline_spark.oracle import compare_one
from etl_ml_pipeline_spark.queries import all_oracles, all_queries

_QUERIES = all_queries()
_ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, sf_dir):
    res = compare_one(name, spark, sf_dir, _QUERIES[name], _ORACLES[name])
    assert res.ok, f"{name}: {res.detail}"


def test_no_rows_only_queries_remain():
    """Round 13 closed the catalog to fully hash-checkable: every
    queries() entry now has an oracle (the theta matrix — the last
    rows-only member — folds its estimates into error-contract
    booleans). This replaces the old rows-only smoke parametrization,
    which would otherwise skip on its empty parameter set; if a future
    rows-only entry appears, this fails loudly instead and the smoke
    test should come back with it."""
    assert set(_QUERIES) == set(_ORACLES), (
        set(_QUERIES) ^ set(_ORACLES)
    )


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ sketch (rsd=0.02) stays within 3x the configured relative
    error of the exact count on every group. The catalog query's compared
    output carries the same max(3, 3*rsd*exact) contract as a boolean
    (the raw estimate can't hash-match DuckDB's different sketch); here
    we also pin the raw estimate against the exact count, independently
    of that projection."""
    from pyspark.sql import functions as F

    from etl_ml_pipeline_spark.queries.tables import t

    out = _QUERIES["agg_approx_distinct_parts"](spark, sf_dir).collect()
    assert out and all(r["within_bound"] for r in out)

    li = t(spark, sf_dir, "lineitem")
    raw = (
        li.groupBy("l_suppkey")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"))
        .join(
            li.select("l_suppkey", "l_partkey")
            .distinct()
            .groupBy("l_suppkey")
            .agg(F.count("*").alias("exact_parts")),
            "l_suppkey",
        )
        .collect()
    )
    for r in raw:
        exact, approx = r["exact_parts"], r["approx_parts"]
        assert abs(approx - exact) <= max(3, 0.06 * exact), (
            f"suppkey {r['l_suppkey']}: approx {approx} vs exact {exact}"
        )
