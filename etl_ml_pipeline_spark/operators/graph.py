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
