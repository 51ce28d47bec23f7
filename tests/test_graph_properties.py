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


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    base=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 3)), min_size=0, max_size=10
    ),
    changes=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 3), st.booleans()),
        min_size=0,
        max_size=10,
    ),
)
def test_cdc_latest_view_matches_reference(spark, base, changes):
    """cdc_latest_view vs a dict-replay reference on arbitrary key/version
    streams: for every key the surviving row must be the highest-version
    row, changes beating base on ties, and absent if that row is a
    tombstone. Duplicate (key, version) rows inside one side are excluded
    (undefined order there, as in any real change batch)."""
    from etl_ml_pipeline_spark.operators.relational import cdc_latest_view

    def dedup_side(rows):
        seen = {}
        for r in rows:
            seen[(r[0], r[1])] = r  # last wins locally; stable enough
        return list(seen.values())

    base = dedup_side(base)
    changes = dedup_side(changes)

    expected = {}
    for k, v in base:
        cur = expected.get(k)
        if cur is None or v > cur[0] or (v == cur[0] and cur[1] == 0):
            expected[k] = (v, 0, False)
    for k, v, deleted in changes:
        cur = expected.get(k)
        if cur is None or v > cur[0] or (v == cur[0]):
            expected[k] = (v, 1, deleted)
    want = {k: v for k, (v, _src, deleted) in expected.items() if not deleted}

    base_df = spark.createDataFrame(
        [(k, v, False) for k, v in base] or [(None, None, None)],
        "k int, version int, deleted boolean",
    ).filter("k IS NOT NULL")
    ch_df = spark.createDataFrame(
        [(k, v, d) for k, v, d in changes] or [(None, None, None)],
        "k int, version int, deleted boolean",
    ).filter("k IS NOT NULL")
    got = {
        r.k: r.version
        for r in cdc_latest_view(base_df, ch_df, ["k"], "version", "deleted").collect()
    }
    assert got == want


def test_pagerank_cycle_uniform_and_star_center_wins(spark):
    """On a directed cycle every node has identical rank (symmetry); on
    a star (all leaves -> center) the center's rank dominates and leaves
    keep exactly the base term."""
    from etl_ml_pipeline_spark.operators.graph import pagerank

    cycle = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], ["src", "dst"]
    )
    ranks = {r.node: r.rank for r in pagerank(cycle, n_iter=10).collect()}
    assert all(abs(v - 0.2) < 1e-9 for v in ranks.values()), ranks

    star = spark.createDataFrame([(i, 99) for i in range(1, 6)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(star, n_iter=5).collect()}
    n = 6
    base = (1.0 - 0.85) / n
    assert got[99] > 5 * got[1]
    for leaf in range(1, 6):
        assert got[leaf] == base  # no in-edges -> base term only


def test_label_propagation_two_cliques_and_tiebreak(spark):
    """Two triangles joined by one bridge edge settle into two
    communities labeled by each clique's smallest node — the self-vote
    keeps the bridge from flooding one clique's label into the other.
    On a single edge the self-vote plus smallest-label tie-break
    converges both nodes to the smaller endpoint (without the
    self-vote, synchronous LPA label-swaps forever on a pair)."""
    from etl_ml_pipeline_spark.operators.graph import label_propagation

    tri = lambda o: [(o, o + 1), (o, o + 2), (o + 1, o + 2)]  # noqa: E731
    edges = spark.createDataFrame(
        tri(0) + tri(10) + [(2, 10)], ["a", "b"]
    )
    got = {r.node: r.lab for r in label_propagation(edges, n_iter=4).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[10] == got[11] == got[12] == 10

    pair = spark.createDataFrame([(7, 3)], ["a", "b"])
    got = {r.node: r.lab for r in label_propagation(pair, n_iter=2).collect()}
    assert got == {3: 3, 7: 3}


def test_operators_handle_empty_inputs(spark):
    """Empty frames flow through the core operators without errors —
    the shape every incremental/streaming caller eventually feeds them."""
    from etl_ml_pipeline_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from etl_ml_pipeline_spark.operators.graph import pagerank
    from etl_ml_pipeline_spark.operators.relational import (
        cdc_latest_view,
        global_row_number,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty_docs, "text", "doc_id").count() == 0
    assert ngram_jaccard_pairs(empty_docs, "text", "doc_id").count() == 0

    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty_pairs).count() == 0
    assert pagerank(empty_pairs, src="id_a", dst="id_b").count() == 0

    base = spark.createDataFrame(
        [(1, 1, False)], "k int, version int, deleted boolean"
    )
    no_changes = spark.createDataFrame([], "k int, version int, deleted boolean")
    got = cdc_latest_view(base, no_changes, ["k"], "version", "deleted").collect()
    assert [(r.k, r.version) for r in got] == [(1, 1)]

    empty_rows = spark.createDataFrame([], "a long")
    assert global_row_number(empty_rows, ["a"]).count() == 0


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    return d[len(b)]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_ed1_pairs_match_bruteforce_property(spark, strings):
    """Deletion-neighborhood fuzzy join == brute-force levenshtein<=1 on
    arbitrary small alphabets (where variant collisions are maximal)."""
    from etl_ml_pipeline_spark.operators.dedup import ed1_candidate_pairs

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    got = sorted(
        (r.name_a, r.name_b) for r in ed1_candidate_pairs(df, "s").collect()
    )
    want = sorted(
        (a, b)
        for i, a in enumerate(sorted(strings))
        for b in sorted(strings)[i + 1 :]
        if _lev(a, b) <= 1
    )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=20, max_size=300),
    st.integers(min_value=2, max_value=8),
)
def test_misra_gries_deficiency_property(spark, items, k):
    """On arbitrary streams and k: every item with frequency > n/k is in
    the candidate set, and merged counts never exceed true counts."""
    from collections import Counter

    from etl_ml_pipeline_spark.operators.sketch import misra_gries_candidates

    df = spark.createDataFrame([(f"t{i}",) for i in items], ["term"]).repartition(3)
    cands = {
        r.term: r.mg_count
        for r in misra_gries_candidates(df, "term", k).collect()
    }
    true = Counter(f"t{i}" for i in items)
    n = len(items)
    for term, freq in true.items():
        if freq * k > n:
            assert term in cands, (term, freq, n, k)
        if term in cands:
            assert cands[term] <= freq


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=10, max_size=200),
)
def test_count_min_one_sided_property(spark, items):
    """On arbitrary streams: the CMS estimate never undercounts any
    item (collisions only ADD), each sketch row's mass equals n, and
    the matrix never exceeds depth*width cells."""
    from collections import Counter

    import pyspark.sql.functions as F

    from etl_ml_pipeline_spark.operators.sketch import (
        count_min_estimate,
        count_min_matrix,
    )

    depth, width = 3, 32
    df = spark.createDataFrame([(f"t{i}",) for i in items], ["term"]).repartition(3)
    matrix = count_min_matrix(df, "term", depth, width)
    cells = matrix.collect()
    assert len(cells) <= depth * width
    per_row = {
        r.j: r.mass
        for r in matrix.groupBy("j").agg(F.sum("cnt").alias("mass")).collect()
    }
    assert per_row == {j: len(items) for j in range(depth)}

    true = Counter(f"t{i}" for i in items)
    probes = spark.createDataFrame(
        [(t,) for t in list(true) + ["never_seen"]], ["term"]
    )
    est = {
        r.term: r.cms_estimate
        for r in count_min_estimate(matrix, probes, "term", depth, width).collect()
    }
    for term, freq in true.items():
        assert est[term] >= freq, (term, est[term], freq)
    assert est["never_seen"] >= 0


def test_round5_operators_handle_empty_inputs(spark):
    """Same hardening for the round-5 operators: empty frames flow
    through without errors."""
    from etl_ml_pipeline_spark.operators.dedup import ed1_candidate_pairs
    from etl_ml_pipeline_spark.operators.graph import triangle_counts
    from etl_ml_pipeline_spark.operators.sketch import misra_gries_candidates

    empty_strs = spark.createDataFrame([], "s string")
    assert ed1_candidate_pairs(empty_strs, "s").count() == 0

    empty_edges = spark.createDataFrame([], "a long, b long")
    assert triangle_counts(empty_edges).count() == 0

    empty_terms = spark.createDataFrame([], "term string")
    assert misra_gries_candidates(empty_terms, "term", 8).count() == 0

    from etl_ml_pipeline_spark.operators.sketch import (
        count_min_estimate,
        count_min_matrix,
    )

    empty_matrix = count_min_matrix(empty_terms, "term", 3, 32)
    assert empty_matrix.count() == 0
    probe = spark.createDataFrame([("x",)], ["term"])
    est = count_min_estimate(empty_matrix, probe, "term", 3, 32).collect()
    assert est[0].cms_estimate == 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # key
            st.integers(min_value=0, max_value=3),    # group
            st.integers(min_value=-1000, max_value=1000),  # measure (exact)
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda r: r[0],
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=0,
        max_size=30,
        unique_by=lambda r: r[0],
    ),
    st.sets(st.integers(min_value=0, max_value=50), max_size=15),
)
def test_incremental_agg_refresh_equals_recompute(spark, base_rows, ups_rows, del_keys):
    """On arbitrary base/upsert/delete batches (disjoint upsert vs
    delete keys enforced), the incremental refresh equals a direct
    aggregate over the merged final state — including groups that
    appear only via inserts or empty out entirely."""
    from etl_ml_pipeline_spark.operators.relational import incremental_agg_refresh

    ups_keys = {r[0] for r in ups_rows}
    del_keys = del_keys - ups_keys
    schema = "k long, g long, m long"
    base = spark.createDataFrame(base_rows, schema)
    ups = spark.createDataFrame(ups_rows, schema)
    dels = spark.createDataFrame([(k,) for k in del_keys], "k long")

    import pyspark.sql.functions as F

    base_agg = base.groupBy("g").agg(
        F.count("*").alias("cnt"), F.sum("m").alias("tot")
    )
    got = {
        r.g: (r.cnt, r.tot)
        for r in incremental_agg_refresh(
            base, base_agg, ups, dels, "k", "g", "m"
        ).collect()
        if r.cnt != 0
    }

    final = {r[0]: r for r in base_rows if r[0] not in ups_keys and r[0] not in del_keys}
    for r in ups_rows:
        final[r[0]] = r
    want = {}
    for _, g, m in final.values():
        c, t = want.get(g, (0, 0))
        want[g] = (c + 1, t + m)
    # sum over empty/retracted-to-zero groups is (0, 0 or null) — dropped above
    assert {g: v for g, v in got.items()} == want
