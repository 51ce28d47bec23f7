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


def label_propagation(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    n_iter: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection -> (node, lab).

    ``edges`` is an undirected pair list (direction/duplicates are
    normalized here). Every node starts labeled with itself; each round
    every node simultaneously adopts the most frequent label among its
    neighbors PLUS its own current label (one self-vote), ties broken
    by the SMALLEST label — a total order, so the fixed-iteration
    schedule is fully deterministic and the oracle can unroll the
    identical rounds in SQL (same posture as ``pagerank``: no
    convergence probe). The self-vote is what makes synchronous LPA
    converge instead of oscillating: without it a single edge (or any
    bipartite-ish structure) label-swaps forever under simultaneous
    update. All arithmetic is integer (counts + label ids); no float
    parity concerns.

    Distributed shape per round: ONE join (labels x directed edges on
    src) + TWO aggregates (neighbor-label counts by (node, lab), then
    the per-node lexicographic struct-min argmax) — the standard
    Pregel LPA cost without the GraphX dependency. localCheckpoint
    truncates lineage each round so the plan stays flat at any n_iter.
    Isolated nodes cannot occur after symmetrization (every node has
    >= 1 edge), but the left-join + coalesce keeps the fallback
    explicit and mirrored in the oracle.
    """
    und = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=False)
    )
    nodes = (
        sym.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=False)
    )
    labels = nodes.select("node", F.col("node").alias("lab"))
    for _ in range(n_iter):
        votes = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("nbr"), "lab")
            .unionAll(labels.select(F.col("node").alias("nbr"), "lab"))
        )
        cnt = votes.groupBy("nbr", "lab").agg(F.count("*").alias("c"))
        # argmax by count, smallest label wins ties: lexicographic
        # struct-min on (-count, label) — the proven cross-engine
        # tie-safe extreme (see agg_stats_battery).
        new = cnt.groupBy("nbr").agg(
            F.min(
                F.struct((-F.col("c")).alias("negc"), F.col("lab").alias("lab"))
            )["lab"].alias("lab")
        )
        labels = (
            nodes.join(new.withColumnRenamed("nbr", "node"), "node", "left")
            .select("node", F.coalesce("lab", F.col("node")).alias("lab"))
            .localCheckpoint(eager=True)
        )
    return labels


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
