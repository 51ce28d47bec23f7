"""Graph-analytics queries (oracle-matched).

PageRank over the supplier->part supply graph derived from lineitem.
The oracle unrolls the same fixed iteration count as chained CTEs —
feasible because the operator deliberately runs a deterministic number
of rounds instead of probing convergence.

Float parity notes:
- the base term is written ``(1.0 - 0.85) / N`` on BOTH sides: the
  Python double ``1.0 - 0.85`` is 0.15000000000000002, which is NOT the
  SQL literal 0.15 — spelling the subtraction out keeps the arithmetic
  identical;
- per-node inflow sums are unordered float additions in both engines,
  so ranks are floor-truncated to 6 decimals before hashing (ulp-level
  divergence sits ~1e-12 below that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.queries.tables import t

_N_ITER = 5
_DAMPING = 0.85
_PART_CAP = 150
_PART_OFFSET = 1_000_000  # part node ids live in a disjoint range


def pagerank_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.graph import pagerank

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < _PART_CAP)
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + _PART_OFFSET).alias("dst"),
    )
    ranks = pagerank(edges, n_iter=_N_ITER, damping=_DAMPING)
    return ranks.select(
        "node", (F.floor(F.col("rank") * 1e6) / 1e6).alias("rank")
    ).orderBy("node")


def _pagerank_oracle() -> str:
    iters = []
    prev = "r0"
    for k in range(1, _N_ITER + 1):
        iters.append(f"""
c{k} AS (
  SELECT e.dst AS node, sum(rp.rank / d.deg) AS inflow
  FROM edges e
  JOIN {prev} rp ON rp.node = e.src
  JOIN deg d ON d.src = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT n.node,
         ((1.0 - {_DAMPING}) / (SELECT nn FROM nc))
         + {_DAMPING} * coalesce(c.inflow, 0.0) AS rank
  FROM nodes n LEFT JOIN c{k} c USING (node)
)""")
        prev = f"r{k}"
    chain = ",".join(iters)
    return f"""
WITH edges AS (
  SELECT DISTINCT l_suppkey AS src, l_partkey + {_PART_OFFSET} AS dst
  FROM lineitem WHERE l_partkey < {_PART_CAP}
),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
nc AS (SELECT count(*) AS nn FROM nodes),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT nn FROM nc) AS rank FROM nodes),
{chain}
SELECT node, floor(rank * 1e6) / 1e6 AS rank
FROM {prev}
ORDER BY node
"""


# ---------------------------------------------------------------------------
# graph_triangle_counts — per-node triangle counts over the co-supply
# graph (suppliers adjacent when they ship the same part; parts capped
# to the same window pagerank uses so the projected graph stays
# non-degenerate). Ordered-wedge join (a<b<c): two equi-join shuffles,
# one closing-edge semi-check — no cross product; wedge centers above
# the degree cap drop gracefully (operators/graph.py:triangle_counts).
# The oracle replays the identical ordered-wedge algebra in SQL.
# ---------------------------------------------------------------------------

_TRI_PART_CAP = 40
_TRI_MAX_DEGREE = 10_000


def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.graph import triangle_counts

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < _TRI_PART_CAP)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    edges = (
        ps.alias("x")
        .join(ps.alias("y"), "l_partkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(
            F.col("x.l_suppkey").alias("a"), F.col("y.l_suppkey").alias("b")
        )
    )
    return triangle_counts(edges, max_degree=_TRI_MAX_DEGREE).orderBy("node")


_TRIANGLE_SQL = f"""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_partkey < {_TRI_PART_CAP}
), und AS (
  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
  FROM ps x JOIN ps y ON x.l_partkey = y.l_partkey
  WHERE x.l_suppkey < y.l_suppkey
), deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT a AS n FROM und UNION ALL SELECT b FROM und
  ) GROUP BY n
), tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN deg ON deg.n = e1.b AND deg.d <= {_TRI_MAX_DEGREE}
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY node
ORDER BY node
"""


# ---------------------------------------------------------------------------
# graph_label_propagation — synchronous LPA community detection over
# the co-supply graph (same projection as graph_triangle_counts). Fixed
# 4 synchronous rounds with a self-vote (the convergence fix for
# simultaneous-update LPA), argmax-by-count with smallest-label
# tie-break (a total order -> deterministic, pure integer arithmetic),
# so the oracle unrolls the identical rounds as chained CTEs. Per
# round: one join + two aggregates (operators/graph.py:label_propagation).
# ---------------------------------------------------------------------------

_LPA_PART_CAP = 40
_LPA_N_ITER = 4


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.graph import label_propagation

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < _LPA_PART_CAP)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    edges = (
        ps.alias("x")
        .join(ps.alias("y"), "l_partkey")
        .filter(F.col("x.l_suppkey") < F.col("y.l_suppkey"))
        .select(
            F.col("x.l_suppkey").alias("a"), F.col("y.l_suppkey").alias("b")
        )
    )
    labels = label_propagation(edges, n_iter=_LPA_N_ITER)
    sizes = labels.groupBy("lab").agg(F.count("*").cast("long").alias("n_members"))
    return (
        labels.join(sizes, "lab")
        .select("node", F.col("lab").alias("community"), "n_members")
        .orderBy("node")
    )


def _lpa_oracle() -> str:
    iters = []
    prev = "l0"
    for k in range(1, _LPA_N_ITER + 1):
        iters.append(f"""
c{k} AS (
  SELECT node, lab, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT s.dst AS node, l.lab
    FROM sym s JOIN {prev} l ON l.node = s.src
    UNION ALL SELECT node, lab FROM {prev}
  )
  GROUP BY node, lab
),
n{k} AS (
  SELECT node, (min(struct_pack(negc := -c, lab := lab))).lab AS lab
  FROM c{k} GROUP BY node
),
l{k} AS (
  SELECT n.node, coalesce(x.lab, n.node) AS lab
  FROM nodes n LEFT JOIN n{k} x USING (node)
)""")
        prev = f"l{k}"
    chain = ",".join(iters)
    return f"""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_partkey < {_LPA_PART_CAP}
),
und AS (
  SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
  FROM ps x JOIN ps y ON x.l_partkey = y.l_partkey
  WHERE x.l_suppkey < y.l_suppkey
),
sym AS (SELECT a AS src, b AS dst FROM und
        UNION ALL SELECT b, a FROM und),
nodes AS (SELECT DISTINCT src AS node FROM sym),
l0 AS (SELECT node, node AS lab FROM nodes),
{chain},
sizes AS (
  SELECT lab, CAST(count(*) AS BIGINT) AS n_members
  FROM {prev} GROUP BY lab
)
SELECT l.node, l.lab AS community, s.n_members
FROM {prev} l JOIN sizes s USING (lab)
ORDER BY l.node
"""


QUERIES = {
    "pagerank_supply": pagerank_supply,
    "graph_triangle_counts": graph_triangle_counts,
    "graph_label_propagation": graph_label_propagation,
}
ORACLES = {
    "pagerank_supply": _pagerank_oracle(),
    "graph_triangle_counts": _TRIANGLE_SQL,
    "graph_label_propagation": _lpa_oracle(),
}
