"""Property-based tests (hypothesis) for the graph/interval operators:
connected components vs a reference union-find, and the banded interval
join vs the naive quadratic definition, on arbitrary small inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node in component
    return {n: find(n) for n in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    from etl_ml_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    want = _union_find_components(edges)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(st.integers(-3000, 3000), min_size=1, max_size=8),
    rights=st.lists(st.integers(-3000, 3000), min_size=1, max_size=8),
    tol=st.sampled_from([60, 600, 777]),
)
def test_banded_interval_join_matches_quadratic(spark, lefts, rights, tol):
    from pyspark.sql import Row

    from etl_ml_pipeline_spark.operators.asof import banded_interval_join

    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    l = spark.createDataFrame(
        [Row(lid=i, user_id=1, ts=base + dt.timedelta(seconds=s)) for i, s in enumerate(lefts)]
    )
    r = spark.createDataFrame(
        [Row(rid=j, user_id=1, ts=base + dt.timedelta(seconds=s)) for j, s in enumerate(rights)]
    )
    got = sorted(
        (row["lid"], row["rid_right"])
        for row in banded_interval_join(l, r, by="user_id", ts="ts", tolerance_seconds=tol).collect()
    )
    want = sorted(
        (i, j)
        for i, ls in enumerate(lefts)
        for j, rs in enumerate(rights)
        if abs(ls - rs) <= tol
    )
    assert got == want
