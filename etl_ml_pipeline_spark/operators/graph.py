"""Graph analytics over pair/edge lists: PageRank (connected
components lives in operators.dedup, where its dedup-clustering use
case is).

Iterative graph algorithms on Spark share one shape: a per-round
join + aggregate with checkpoint-based lineage truncation — the same
cost profile as GraphX/Pregel without the dependency, expressed in
DataFrame ops so Catalyst plans each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list -> (node, rank).

    Distributed shape per iteration: ONE join (ranks x edges on src) +
    ONE aggregate (sum contributions by dst) — identical cost profile to
    GraphX's Pregel PageRank without the dependency, and the same
    per-round localCheckpoint lineage truncation as connected_components.
    Dangling nodes (no out-edges) keep the base term only, matching the
    simplified formulation most SQL references use.

    Fixed n_iter (no convergence probe) keeps the result deterministic
    and cross-engine replayable: the oracle unrolls the same number of
    iterations in SQL. Contribution sums use plain double addition —
    per-node totals are aggregated in Spark in unspecified order, so the
    query layer floor-truncates ranks before hash comparison (additions
    of ~uniform magnitudes; observed stable at 6 decimal places).
    """
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst")).distinct()
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph: empty result, not a ZeroDivisionError in the
        # driver-side 1/N seed below
        return nodes.withColumn("rank", F.lit(0.0)).select("node", "rank")
    out_deg = e.groupBy("e_src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(n_iter):
        contribs = (
            ranks.join(out_deg, ranks.node == out_deg.e_src)
            .join(e, "e_src")
            .select(F.col("e_dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_counts(edges: DataFrame, max_degree: int = 10_000) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph.

    ``edges`` must carry columns (a, b); direction and duplicates are
    normalized here. Uses the standard ordered-wedge join: with every
    edge stored as a < b, a wedge (a<b<c) is e1=(a,b) ⋈ e2=(b,c), and
    a triangle is a wedge whose closing edge (a,c) exists — each
    triangle is generated exactly once. Two equi-join shuffles, no
    cross product.

    Scale guard: wedge count is sum(degree^2); a single celebrity node
    explodes it, so nodes above ``max_degree`` are dropped from wedge
    CENTERS (the b role) — the same graceful-degradation posture as the
    MinHash band cap. At the default cap nothing drops at test scale.
    """
    from pyspark.sql import functions as F

    und = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    ok_centers = deg.filter(F.col("d") <= max_degree).select(F.col("n").alias("b"))
    e1 = und.alias("e1")
    e2 = und.select(
        F.col("a").alias("b"), F.col("b").alias("c")
    ).alias("e2")
    wedges = (
        e1.join(ok_centers, "b")
        .join(e2, "b")
        .select("a", "b", "c")
    )
    closing = und.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
