"""Similarity-search + multimodal queries (oracle-matched where exact).

Cosine math: Spark ``zip_with``+``aggregate`` sequential folds are
bit-identical to DuckDB's list functions on ``DOUBLE[]`` (verified
empirically), so brute-force results compare exactly after floor
truncation. The LSH ANN variant's seeded hyperplanes are embedded as
literal DOUBLE[] lists in generated oracle SQL (sign-bit bucket via
list_dot_product), so it is hash-compared too; a recall test
(tests/test_similarity.py) additionally pins ANN quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.similarity import (
    as_double,
    brute_force_topk,
    collect_centroid_rows as _collect_cent_rows,
    cosine,
    lsh_topk,
    make_hyperplanes,
)
from etl_ml_pipeline_spark.queries.tables import t


def _trunc4(c: F.Column) -> F.Column:
    return F.floor(c * 10000) / 10000


# ---------------------------------------------------------------------------
# ann_bruteforce_topk — exact cosine top-5 for 10 query vectors.
# ---------------------------------------------------------------------------


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings", heavy=True)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = brute_force_topk(queries, corpus, k=5)
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos")
    ).orderBy("q_id", "rank")


# ---------------------------------------------------------------------------
# ann_mmr_rerank_topk — maximal-marginal-relevance diversification: the
# re-rank step a RAG retriever runs after ANN shortlisting, trading
# relevance against redundancy (score = 0.7*cos(q,c) - 0.3*max cos to
# the already-selected set; step 1 is pure relevance). The greedy K=4
# selection runs as ONE Arrow cogroup-applyInPandas kernel over the
# 12-candidate pool + its pairwise cosines (operators/similarity.py::
# mmr_select) — the kernel only compares / linearly combines the
# Spark-computed cosine doubles with the same IEEE ops as the oracle's
# expression (0.7*a - 0.3*b over bit-identical, [-1,1]-clamped
# cosines; ties on c_id), so the picks hash-match DuckDB's unrolled
# CTEs exactly. An earlier formulation unrolled the greedy into 4
# DataFrame stages: identical results, but ~79 exchanges of <=132-row
# frames = ~1.5s of pure scheduling latency at ANY scale factor
# (sf0.1: 2.0-2.4s steady vs ~0.6s through the kernel).
# Scale: ONE corpus scan builds the pool (broadcast 8-query eval set +
# q_id-partitioned top-12 window), lineage-pinned with a lazy
# localCheckpoint so the pairs self-join doesn't rescan it; everything
# after is k-bounded (12 rows + 132 pair rows per query) regardless of
# corpus size.
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
# NOT computed as 1 - _MMR_LAMBDA: in Python that is 0.30000000000000004,
# which would diverge from the oracle's literal 0.3 at the double ulp.
_MMR_MU = 0.3
_MMR_POOL = 12
_MMR_K = 4


def _cos_clamped(a: F.Column, b: F.Column) -> F.Column:
    """Cosine clamped to [-1, 1]. The raw sequential fold returns
    1.0000000000000002 for identical vectors (s / (sqrt(s)*sqrt(s)))
    while DuckDB's list_cosine_similarity clamps — invisible under
    trunc4 until MMR's 0.7*rel - 0.3*div subtraction lands the ulp
    exactly on a truncation boundary (caught at synthetic sf1, where
    replication guarantees identical-vector pairs and mmr = 0.4). The
    oracle clamps explicitly too, so both engines share the exact
    post-clamp doubles."""
    return F.least(F.lit(1.0), F.greatest(F.lit(-1.0), cosine(a, b)))


def ann_mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings", heavy=True)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), as_double(F.col("embedding")).alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"), as_double(F.col("embedding")).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id", "c_id", "cv", _cos_clamped(F.col("qv"), F.col("cv")).alias("cos_qc")
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_qc"), F.asc("c_id"))
    cand = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MMR_POOL)
        .localCheckpoint(eager=False)
    )
    pairs = (
        cand.select("q_id", F.col("c_id").alias("ca"), F.col("cv").alias("av"))
        .join(
            cand.select("q_id", F.col("c_id").alias("cb"), F.col("cv").alias("bv")),
            "q_id",
        )
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "q_id", "ca", "cb", _cos_clamped(F.col("av"), F.col("bv")).alias("cos_cc")
        )
        # fresh attribute ids: the cogroup below groups cand AND this
        # cand-derived frame on q_id, which is self-join-ambiguous
        # while they share lineage
        .localCheckpoint(eager=False)
    )
    from etl_ml_pipeline_spark.operators.similarity import mmr_select

    out = mmr_select(
        cand.select("q_id", "c_id", "cos_qc", "rk"),
        pairs,
        k=_MMR_K,
        lam=_MMR_LAMBDA,
        mu=_MMR_MU,
    )
    return out.select(
        "q_id",
        "sel_rank",
        "c_id",
        _trunc4(F.col("mmr")).alias("mmr"),
    ).orderBy("q_id", "sel_rank")


def _mmr_step_sql(step: int, prev_sels: list[str]) -> str:
    prev_union = "\n    UNION ALL ".join(
        f"SELECT q_id, c_id FROM {s}" for s in prev_sels
    )
    return f"""
selset{step} AS (
  {prev_union}
),
ms{step} AS (
  SELECT c.q_id, c.c_id, c.cos_qc, max(p.cos_cc) AS msim
  FROM cand c
  LEFT JOIN selset{step} x ON x.q_id = c.q_id AND x.c_id = c.c_id
  JOIN pairs p ON p.q_id = c.q_id AND p.ca = c.c_id
  JOIN selset{step} s ON s.q_id = p.q_id AND s.c_id = p.cb
  WHERE x.c_id IS NULL
  GROUP BY 1, 2, 3
),
sel{step} AS (
  SELECT q_id, c_id, mmr FROM (
    SELECT q_id, c_id, 0.7 * cos_qc - 0.3 * msim AS mmr,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY 0.7 * cos_qc - 0.3 * msim DESC,
                                       c_id ASC) AS rn
    FROM ms{step}
  ) WHERE rn = 1
)"""


_MMR_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings
),
cand AS (
  SELECT q_id, c_id, cv, cos_qc FROM (
    SELECT q_id, c_id, cv,
           least(1.0, greatest(-1.0, list_cosine_similarity(qv, cv)))
             AS cos_qc,
           row_number() OVER (
             PARTITION BY q_id
             ORDER BY least(1.0, greatest(-1.0,
                            list_cosine_similarity(qv, cv))) DESC,
                      c_id ASC) AS rk
    FROM q CROSS JOIN c
    WHERE c_id <> q_id
  ) WHERE rk <= {_MMR_POOL}
),
pairs AS (
  SELECT a.q_id, a.c_id AS ca, b.c_id AS cb,
         least(1.0, greatest(-1.0, list_cosine_similarity(a.cv, b.cv)))
           AS cos_cc
  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.c_id <> b.c_id
),
sel1 AS (
  SELECT q_id, c_id, 0.7 * cos_qc AS mmr FROM (
    SELECT q_id, c_id, cos_qc,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_qc DESC, c_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
{_mmr_step_sql(2, ["sel1"])},
{_mmr_step_sql(3, ["sel1", "sel2"])},
{_mmr_step_sql(4, ["sel1", "sel2", "sel3"])}
SELECT q_id, CAST(sel_rank AS INTEGER) AS sel_rank, c_id,
       floor(mmr * 10000) / 10000 AS mmr
FROM (
  SELECT q_id, 1 AS sel_rank, c_id, mmr FROM sel1
  UNION ALL SELECT q_id, 2, c_id, mmr FROM sel2
  UNION ALL SELECT q_id, 3, c_id, mmr FROM sel3
  UNION ALL SELECT q_id, 4, c_id, mmr FROM sel4
)
ORDER BY q_id, sel_rank
"""


# ---------------------------------------------------------------------------
# semantic_decontam_stats — embedding-space decontamination: the gram-
# hash decontam family (split_decontamination_stats) catches verbatim
# and near-verbatim overlap, but paraphrased benchmark leakage only
# shows up in embedding space. Benchmark = 40 eval vectors; corpus =
# the rest PLUS deterministically injected contaminated copies
# (positively-scaled benchmark vectors, x*2.0 — exact IEEE exponent
# shift, the embedding_near_dup_pairs construction) so the query's
# recall on known leaks is itself part of the checked contract
# (all_injected_caught). A corpus row is contaminated when its max
# cosine against ANY benchmark vector clears 0.999.
# Scale: the benchmark is broadcast (eval sets are small by nature);
# the corpus is scanned ONCE with per-row cost |bench|, then two
# map-side-combined groupBys (c_id -> max, label rollup). This linear
# scan IS the production topology for small benchmarks; for huge
# benchmark suites the IVF shortlist path (ann_ivf_topk) bounds the
# per-row candidate set instead.
# ---------------------------------------------------------------------------

_SEM_DECON_THR = 0.999


def semantic_decontam_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings", heavy=True)
    bench = emb.filter(F.col("vec_id") < 40).select(
        as_double(F.col("embedding")).alias("bv")
    )
    base = emb.filter(F.col("vec_id") >= 40).select(
        F.col("vec_id").alias("c_id"),
        as_double(F.col("embedding")).alias("cv"),
        "label",
    )
    injected = emb.filter(
        (F.col("vec_id") < 40) & (F.col("vec_id") % 4 == 0)
    ).select(
        (F.col("vec_id") + 200000).alias("c_id"),
        F.transform(as_double(F.col("embedding")), lambda x: x * 2.0).alias("cv"),
        "label",
    )
    corpus = base.unionByName(injected)
    # r16 NEGATIVE RESULT (VERDICT r15 #3, measured and reverted): the
    # fold_cosine_max Arrow kernel (bit-identical, parity-pinned) was
    # tried here and measured 1.08-1.22x SLOWER in two interleaved A/B
    # sessions (scripts/r16_ab3_decontam.json, r16_ab3b_semstats.json:
    # 1.62->1.97, 1.27->1.37): the 64-dim x |bench|=40 fold is ~192
    # interpreted terms per pair — under the _EXPR_PATH_MAX_TERMS-style
    # threshold where HOF interpretation starts losing — while the
    # kernel pays a fixed bench-collect job + Python channel per
    # invocation. This is a HEADLINE query, so it keeps the HOF form;
    # the catalog shortlist contract keeps the kernel (its exact leg is
    # the scale-bound side there and the query is not bench-timed).
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "c_id", "label", cosine(F.col("cv"), F.col("bv")).alias("cos")
    )
    per = scored.groupBy("c_id", "label").agg(F.max("cos").alias("max_cos"))
    hit = F.col("max_cos") >= _SEM_DECON_THR
    inj = F.col("c_id") >= 200000
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n_corpus"),
            F.sum(hit.cast("long")).alias("n_contaminated"),
            F.sum(inj.cast("long")).alias("n_injected"),
            F.coalesce(F.min(F.when(inj, hit)), F.lit(True)).alias(
                "all_injected_caught"
            ),
        )
        .orderBy("label")
    )


_SEM_DECON_SQL = f"""
WITH bench AS (
  SELECT embedding::DOUBLE[] AS bv FROM embeddings WHERE vec_id < 40
),
base AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv, label
  FROM embeddings WHERE vec_id >= 40
),
injected AS (
  SELECT vec_id + 200000 AS c_id,
         list_transform(embedding::DOUBLE[], x -> x * 2.0) AS cv, label
  FROM embeddings WHERE vec_id < 40 AND vec_id % 4 = 0
),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM injected),
per AS (
  SELECT c_id, label, max(list_cosine_similarity(cv, bv)) AS max_cos
  FROM corpus CROSS JOIN bench
  GROUP BY 1, 2
)
SELECT label,
       count(*) AS n_corpus,
       CAST(sum(CASE WHEN max_cos >= {_SEM_DECON_THR} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(sum(CASE WHEN c_id >= 200000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_injected,
       coalesce(min(CASE WHEN c_id >= 200000
                         THEN max_cos >= {_SEM_DECON_THR} END), TRUE)
         AS all_injected_caught
FROM per
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# semantic_decontam_shortlist_stats — the IVF-shortlist decontamination
# path the SemanticDecontam transform takes ABOVE the broadcast cap
# (VERDICT r14 ask #3), as an oracle-checked contract: benchmark
# vectors land in cells (5 deterministic cell seeds, nearest-centroid
# assignment), every corpus row probes its 2 nearest cells, and exact
# cosine runs ONLY inside the probed-cell equi-join. The output pins
# BOTH recall contracts per label: all injected scaled-copy leaks are
# caught THROUGH the shortlist (an exactly-parallel leak shares its
# source's nearest cell bit-for-bit, so probe>=1 always finds it), and
# shortlist-vs-exact contamination counts ship side by side with a ppm
# recall so the approximation loss on organic hits is measured, not
# assumed. The exact leg is the same |bench|-per-row scan as
# semantic_decontam_stats (the yardstick); the shortlist leg's per-row
# cost is the probed cells' benchmark mass — the posture that holds
# when the benchmark suite itself is too big to broadcast.
# ---------------------------------------------------------------------------

_SHORTLIST_CELL_STEP = 8   # bench vec_id % 8 == 0 -> 5 cell seeds
_SHORTLIST_PROBE = 2


def semantic_decontam_shortlist_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import (
        _probe_exploded,
        collect_centroid_rows,
        ivf_assign,
    )

    emb = t(spark, sf_dir, "embeddings", heavy=True)
    cent = emb.filter(
        (F.col("vec_id") < 40) & (F.col("vec_id") % _SHORTLIST_CELL_STEP == 0)
    ).select(
        F.col("vec_id").alias("cent_id"),
        as_double(F.col("embedding")).alias("cent_vec"),
    )
    # r15 §12: one quantizer collect shared by the bench-assign and the
    # corpus-probe stages (each used to run its own driver-sync job)
    cent_rows = collect_centroid_rows(cent)
    bench = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("b_id"), as_double(F.col("embedding")).alias("bv")
    )
    bench_cells = ivf_assign(bench, cent, "bv", "b_id", rows=cent_rows).select(
        "cent_id", "bv"
    )
    base = emb.filter(F.col("vec_id") >= 40).select(
        F.col("vec_id").alias("c_id"),
        as_double(F.col("embedding")).alias("cv"),
        "label",
    )
    injected = emb.filter(
        (F.col("vec_id") < 40) & (F.col("vec_id") % 4 == 0)
    ).select(
        (F.col("vec_id") + 200000).alias("c_id"),
        F.transform(as_double(F.col("embedding")), lambda x: x * 2.0).alias("cv"),
        "label",
    )
    corpus = base.unionByName(injected)
    # exact leg (the yardstick): ONE scan x the bounded benchmark block.
    # r16 (VERDICT r15 #3, guide §4.2): interpreted HOF cosine (80k
    # pairs x 64 dims) → the fold_cosine_max Arrow kernel — the same
    # sequential fold vectorized, bit-identical doubles, no
    # quantization (parity pinned in tests/test_similarity.py). c_id is
    # unique by construction, so the per-row max IS the old
    # groupBy(c_id, label) max. The exact-vs-shortlist CONTRACT is
    # unchanged: still one full corpus pass against every bench vector.
    # Honest local numbers: interleaved A/B measured the kernel ~1.16x
    # at sf0.1 (scripts/r16_ab3c_shortlist.json, 2.44 -> 2.84 — the
    # fixed bench-collect job + Python channel outweighs the ~0.5s HOF
    # at this scale; an earlier 13.5 -> 5.5 reading was a stalled host
    # window). The kernel stays HERE because this leg is the one whose
    # per-pair interpreted cost SCALES with corpus x bench (the exact
    # yardstick is corpus-complete by contract), the overhead is fixed
    # per invocation, and this query is catalog-only (not bench-timed);
    # the headline semantic_decontam_stats keeps the HOF form (negative
    # result recorded there).
    from etl_ml_pipeline_spark.operators.similarity import fold_cosine_max

    bench_vecs = [r["bv"] for r in bench.select("bv").collect()]
    exact = fold_cosine_max(
        corpus,
        bench_vecs,
        "cv",
        "max_cos_exact",
        [("c_id", "long"), ("label", "int")],
    )
    # shortlist leg: probe 2 cells, cosine only inside the cell join
    probed = _probe_exploded(
        corpus, cent, _SHORTLIST_PROBE, "c_id", "cv", rows=cent_rows
    )
    short = (
        probed.join(bench_cells, "cent_id")
        .select("c_id", cosine(F.col("cv"), F.col("bv")).alias("cos"))
        .groupBy("c_id")
        .agg(F.max("cos").alias("max_cos_short"))
    )
    thr = F.lit(_SEM_DECON_THR)
    per = exact.join(short, "c_id", "left").select(
        "c_id",
        "label",
        (F.col("max_cos_exact") >= thr).alias("hit_exact"),
        F.coalesce(F.col("max_cos_short") >= thr, F.lit(False)).alias(
            "hit_short"
        ),
    )
    inj = F.col("c_id") >= 200000
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n_corpus"),
            F.sum(F.col("hit_exact").cast("long")).alias("n_contam_exact"),
            F.sum(F.col("hit_short").cast("long")).alias("n_contam_shortlist"),
            F.sum(inj.cast("long")).alias("n_injected"),
            F.coalesce(F.min(F.when(inj, F.col("hit_short"))), F.lit(True)).alias(
                "all_injected_caught"
            ),
            F.sum((F.col("hit_exact") & F.col("hit_short")).cast("long")).alias(
                "__both"
            ),
        )
        .select(
            "label",
            "n_corpus",
            "n_contam_exact",
            "n_contam_shortlist",
            "n_injected",
            "all_injected_caught",
            F.when(F.col("n_contam_exact") > 0,
                   F.expr("__both * 1000000 div n_contam_exact"))
            .otherwise(F.lit(1000000))
            .cast("long")
            .alias("shortlist_recall_ppm"),
        )
        .orderBy("label")
    )


_SHORTLIST_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cent_vec
  FROM embeddings WHERE vec_id < 40 AND vec_id % {_SHORTLIST_CELL_STEP} = 0
),
bench AS (
  SELECT vec_id AS b_id, embedding::DOUBLE[] AS bv
  FROM embeddings WHERE vec_id < 40
),
bench_cells AS (
  SELECT cent_id, bv FROM (
    SELECT b.b_id, c.cent_id, b.bv,
           row_number() OVER (
             PARTITION BY b.b_id
             ORDER BY list_cosine_similarity(b.bv, c.cent_vec) DESC,
                      c.cent_id ASC) AS rn
    FROM bench b CROSS JOIN cent c
  ) WHERE rn = 1
),
base AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv, label
  FROM embeddings WHERE vec_id >= 40
),
injected AS (
  SELECT vec_id + 200000 AS c_id,
         list_transform(embedding::DOUBLE[], x -> x * 2.0) AS cv, label
  FROM embeddings WHERE vec_id < 40 AND vec_id % 4 = 0
),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM injected),
exact AS (
  SELECT c_id, label, max(list_cosine_similarity(cv, bv)) AS max_cos_exact
  FROM corpus CROSS JOIN bench
  GROUP BY 1, 2
),
probed AS (
  SELECT c_id, cv, cent_id FROM (
    SELECT co.c_id, co.cv, c.cent_id,
           row_number() OVER (
             PARTITION BY co.c_id
             ORDER BY list_cosine_similarity(co.cv, c.cent_vec) DESC,
                      c.cent_id ASC) AS rn
    FROM corpus co CROSS JOIN cent c
  ) WHERE rn <= {_SHORTLIST_PROBE}
),
short AS (
  SELECT p.c_id, max(list_cosine_similarity(p.cv, b.bv)) AS max_cos_short
  FROM probed p JOIN bench_cells b USING (cent_id)
  GROUP BY 1
),
per AS (
  SELECT e.c_id, e.label,
         e.max_cos_exact >= {_SEM_DECON_THR} AS hit_exact,
         coalesce(s.max_cos_short >= {_SEM_DECON_THR}, FALSE) AS hit_short
  FROM exact e LEFT JOIN short s USING (c_id)
)
SELECT label,
       count(*) AS n_corpus,
       CAST(sum(CASE WHEN hit_exact THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contam_exact,
       CAST(sum(CASE WHEN hit_short THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contam_shortlist,
       CAST(sum(CASE WHEN c_id >= 200000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_injected,
       coalesce(min(CASE WHEN c_id >= 200000 THEN hit_short END), TRUE)
         AS all_injected_caught,
       CAST(CASE WHEN sum(CASE WHEN hit_exact THEN 1 ELSE 0 END) > 0
            THEN sum(CASE WHEN hit_exact AND hit_short THEN 1 ELSE 0 END)
                 * 1000000
                 // sum(CASE WHEN hit_exact THEN 1 ELSE 0 END)
            ELSE 1000000 END AS BIGINT) AS shortlist_recall_ppm
FROM per
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# retrieval_eval_metrics — the retrieval-eval harness: recall@10 and
# reciprocal rank for 20 eval queries against the full corpus, with the
# same-label vectors as each query's gold set (the standard proxy when
# no human judgments exist). Metrics land on an exact ppm integer grid
# (hits*1e6 div min(10, n_gold); 1e6 div first_gold_rank) so both
# engines agree bit-for-bit; cosine ranking reuses the established
# sequential-fold parity path with deterministic c_id tie-breaks.
# Scale: the eval set is broadcast (20 rows — eval sets are small by
# construction); the corpus is scanned ONCE, ranked per query on a
# q_id-partitioned window (20 partitions), and reduced to one row per
# query. This is linear in the corpus like any exact-eval pass; the
# sampled-candidate variant at 100 TB is the existing IVF path whose
# quality THIS query is the yardstick for (ann_recall_battery).
# ---------------------------------------------------------------------------


def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings", heavy=True)
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        as_double(F.col("embedding")).alias("qv"),
        F.col("label").alias("q_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        as_double(F.col("embedding")).alias("cv"),
        F.col("label").alias("c_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            "c_id",
            "c_label",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    gold = F.col("c_label") == F.col("q_label")
    per = ranked.groupBy("q_id", "q_label").agg(
        F.sum(gold.cast("long")).alias("n_gold"),
        F.sum((gold & (F.col("rank") <= 10)).cast("long")).alias("hits10"),
        F.min(F.when(gold, F.col("rank"))).cast("long").alias("fgr"),
    )
    return (
        per.select(
            "q_id",
            F.col("q_label").alias("label"),
            "n_gold",
            "hits10",
            F.coalesce("fgr", F.lit(0)).cast("long").alias("first_gold_rank"),
            F.when(
                F.col("n_gold") > 0,
                F.expr("hits10 * 1000000 div least(10, n_gold)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("recall10_ppm"),
            F.when(F.col("fgr").isNotNull(), F.expr("1000000 div fgr"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_ppm"),
        )
        .orderBy("q_id")
    )


_RETRIEVAL_EVAL_SQL = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv, label AS q_label
  FROM embeddings WHERE vec_id < 20
),
c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv, label AS c_label
  FROM embeddings
),
ranked AS (
  SELECT q_id, q_label, c_id, c_label,
         row_number() OVER (
           PARTITION BY q_id
           ORDER BY list_cosine_similarity(qv, cv) DESC, c_id ASC) AS rank
  FROM q CROSS JOIN c
  WHERE c_id <> q_id
),
per AS (
  SELECT q_id, q_label,
         CAST(sum(CASE WHEN c_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_gold,
         CAST(sum(CASE WHEN c_label = q_label AND rank <= 10
                       THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
         min(CASE WHEN c_label = q_label THEN rank END) AS fgr
  FROM ranked
  GROUP BY 1, 2
)
SELECT q_id, q_label AS label, n_gold, hits10,
       CAST(coalesce(fgr, 0) AS BIGINT) AS first_gold_rank,
       CAST(CASE WHEN n_gold > 0
                 THEN hits10 * 1000000 // least(10, n_gold)
                 ELSE 0 END AS BIGINT) AS recall10_ppm,
       CAST(CASE WHEN fgr IS NOT NULL THEN 1000000 // fgr
                 ELSE 0 END AS BIGINT) AS rr_ppm
FROM per
ORDER BY q_id
"""


_BRUTE_SQL = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10
),
c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings
),
scored AS (
  SELECT q_id, c_id, list_cosine_similarity(qv, cv) AS cos FROM q CROSS JOIN c
),
ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM scored
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# embedding_near_dup_pairs — cosine near-dup detection on a corpus with
# deterministically injected duplicates (scaled copies, cosine == 1.0).
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed (multi-table sign-LSH) near-dup pairs — NOT a cross join.

    The injected dups are positively-scaled copies (cosine exactly 1.0),
    and sign buckets are invariant to positive scaling, so the LSH path's
    recall on them is exactly 1 and the output matches the oracle's
    all-pairs formulation row for row. The oracle SQL keeps the O(N²)
    definition as the cross-check; the Spark plan is the scale path
    (plan-guarded: no CartesianProduct / BroadcastNestedLoopJoin).
    """
    from etl_ml_pipeline_spark.operators.similarity import lsh_near_dup_pairs

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    base = emb.select(F.col("vec_id").alias("id"), as_double(F.col("embedding")).alias("v"))
    scaled = base.filter(F.col("id") % 5 == 0).select(
        (F.col("id") + 100_000).alias("id"),
        F.transform(F.col("v"), lambda x: x * 2.0).alias("v"),
    )
    corpus = base.unionByName(scaled)
    pairs = lsh_near_dup_pairs(
        corpus, dim=64, vec_col="v", id_col="id", threshold=0.999
    )
    return pairs.select(
        "id_a", "id_b", _trunc4(F.col("cos")).alias("cos")
    ).orderBy("id_a", "id_b")


_NEAR_DUP_SQL = """
WITH base AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200
),
scaled AS (
  SELECT id + 100000 AS id, list_transform(v, x -> x * 2.0) AS v
  FROM base WHERE id % 5 = 0
),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM scaled),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, list_cosine_similarity(a.v, b.v) AS cos
  FROM corpus a JOIN corpus b ON a.id < b.id
)
SELECT id_a, id_b, floor(cos * 10000) / 10000 AS cos
FROM pairs
WHERE cos >= 0.999
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# embedding_label_centroids — per-label centroid geometry via posexplode
# (the distributed way to do dimension-wise means; no vectors collected).
# ---------------------------------------------------------------------------


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "x")
    )
    cent = dims.groupBy("label", "pos").agg(
        F.avg("x").alias("cx"), F.count("*").alias("n")
    )
    return (
        cent.groupBy("label")
        .agg(
            F.first("n").alias("n_vecs"),
            _trunc4(F.sqrt(F.sum(F.col("cx") * F.col("cx")))).alias("centroid_l2"),
        )
        .orderBy("label")
    )


_CENTROID_SQL = """
WITH vecs AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
),
dims AS (
  -- parallel unnests in one SELECT zip positionally in DuckDB
  SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x FROM vecs
),
cent AS (
  SELECT label, pos, avg(x) AS cx, count(*) AS n FROM dims GROUP BY 1, 2
)
SELECT label,
       CAST(min(n) AS BIGINT) AS n_vecs,
       floor(sqrt(sum(cx * cx)) * 10000) / 10000 AS centroid_l2
FROM cent
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# ann_lsh_topk — hyperplane-LSH ANN. The hyperplanes are deterministic
# (seeded Gaussian), so the oracle SQL embeds them as literal DOUBLE[]
# lists and recomputes the sign-bit bucket with list_dot_product — the
# same generated-constant technique as the MinHash oracle. Sign
# disagreement would need |dot| < ~1e-13 (never at dim=64).
# ---------------------------------------------------------------------------


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    planes = make_hyperplanes(dim=64, n_bits=8, seed=0)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = lsh_topk(queries, corpus, planes, k=5)
    return out.select("q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos")).orderBy(
        "q_id", "rank"
    )


def _lsh_oracle() -> str:
    planes = make_hyperplanes(dim=64, n_bits=8, seed=0)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in row)}]) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, row in enumerate(planes)
    )
    return f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, v, ({bucket_terms}) AS bucket FROM vecs
),
q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM bucketed WHERE vec_id < 10),
c AS (SELECT vec_id AS c_id, v AS cv, bucket FROM bucketed),
scored AS (
  SELECT q_id, c_id, list_cosine_similarity(qv, cv) AS cos
  FROM q JOIN c USING (bucket)
),
ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM scored
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# multimodal_image_features — binary media column + mapInPandas decode
# (deterministic fake): real plumbing, oracle-matched via the md5 formula.
# ---------------------------------------------------------------------------


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.multimodal import (
        attach_media_meta,
        decode_image_features,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("media")
    )
    media = attach_media_meta(media, "media", "image", "fake")
    decoded = decode_image_features(media, "media", fake=True)
    return decoded.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("img.width").alias("width"),
        F.col("img.height").alias("height"),
        _trunc4(F.col("img.mean_luma")).alias("mean_luma"),
    ).orderBy("doc_id")


_MULTIMODAL_SQL = """
WITH h AS (
  SELECT doc_id,
         length(text) AS n_bytes,
         ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
  FROM documents WHERE doc_id < 500
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(1 + hv % 64 AS INT) AS width,
       CAST(1 + hv % 48 AS INT) AS height,
       floor((hv % 256) / 255.0 * 10000) / 10000 AS mean_luma
FROM h
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_png_decode — REAL image decode, end to end and distributed:
# each doc gets a deterministic gradient PNG synthesized executor-side
# (stdlib encoder, rows cycling all five PNG filters), then decoded back
# through the fake=False mapInPandas path (zlib inflate + de-filtering).
# Geometry uses odd dimensions (w = 1+2*(id%8), h = 1+2*(id%6)) and pixel
# value base + x + y (< 256, no wrap), so mean luma * 255 is the exact
# integer base + (id%8) + (id%6) — both engines compute int/255.0 and the
# doubles match bit-for-bit, no rounding fudge needed.
# ---------------------------------------------------------------------------


def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd  # noqa: F401 — mapInPandas batch type

    from etl_ml_pipeline_spark.operators.multimodal import (
        decode_image_features,
        encode_png,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select("doc_id")

    def gen_png(batches):
        for pdf in batches:
            media = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 1 + 2 * (d % 8), 1 + 2 * (d % 6)
                px = (np.add.outer(np.arange(h), np.arange(w)) + d % 100).astype(
                    np.uint8
                )
                media.append(encode_png(px, color_type=0))
            pdf = pdf.copy()
            pdf["media"] = media
            yield pdf

    with_media = docs.mapInPandas(gen_png, schema="doc_id: long, media: binary")
    decoded = decode_image_features(with_media, "media", fake=False)
    return decoded.select(
        "doc_id",
        F.col("img.width").alias("width"),
        F.col("img.height").alias("height"),
        F.col("img.mean_luma").alias("mean_luma"),
    ).orderBy("doc_id")


_PNG_DECODE_SQL = """
SELECT doc_id,
       CAST(1 + 2 * (doc_id % 8) AS INT) AS width,
       CAST(1 + 2 * (doc_id % 6) AS INT) AS height,
       ((doc_id % 100) + (doc_id % 8) + (doc_id % 6)) / 255.0 AS mean_luma
FROM documents WHERE doc_id < 300
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_image_dedup — the decode -> dedup composition every image
# corpus pipeline runs: synthesize real PNGs executor-side (modulo
# space chosen so exact duplicates EXIST: w from d%4, h from d%3,
# luma offset d%5 -> lcm 60 classes over 300 docs = 5 copies each),
# decode through the real mapInPandas PNG path, then exact-dedup on
# the decoded feature tuple (width, height, mean_luma) — group count +
# canonical min doc_id. The oracle replays the analytic pixel stats,
# so a decode bug ANYWHERE in the path breaks the group structure.
# Scale: blobs stay in Arrow batches on executors; the dedup shuffles
# only the small feature tuple.
# ---------------------------------------------------------------------------


def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd  # noqa: F401 — mapInPandas batch type

    from etl_ml_pipeline_spark.operators.multimodal import (
        decode_image_features,
        encode_png,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select("doc_id")

    def gen_png(batches):
        for pdf in batches:
            media = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 1 + 2 * (d % 4), 1 + 2 * (d % 3)
                px = (np.add.outer(np.arange(h), np.arange(w)) + d % 5).astype(
                    np.uint8
                )
                media.append(encode_png(px, color_type=0))
            pdf = pdf.copy()
            pdf["media"] = media
            yield pdf

    with_media = docs.mapInPandas(gen_png, schema="doc_id: long, media: binary")
    decoded = decode_image_features(with_media, "media", fake=False)
    return (
        decoded.select(
            "doc_id",
            F.col("img.width").alias("width"),
            F.col("img.height").alias("height"),
            F.col("img.mean_luma").alias("mean_luma"),
        )
        .groupBy("width", "height", "mean_luma")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
        )
        .orderBy("canonical_id")
    )


_IMAGE_DEDUP_SQL = """
WITH feats AS (
  SELECT doc_id,
         CAST(1 + 2 * (doc_id % 4) AS INT) AS width,
         CAST(1 + 2 * (doc_id % 3) AS INT) AS height,
         ((doc_id % 5) + (doc_id % 4) + (doc_id % 3)) / 255.0 AS mean_luma
  FROM documents WHERE doc_id < 300
)
SELECT width, height, mean_luma,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM feats
GROUP BY 1, 2, 3
ORDER BY canonical_id
"""


# ---------------------------------------------------------------------------
# multimodal_image_ahash_dedup — PERCEPTUAL near-dup on the decode
# path: the same synthetic gradient images as multimodal_image_dedup,
# but grouped by average-hash (8x8 nearest-neighbor downsample of the
# REAL decoded luma grid, thresholded at the sample mean). aHash is
# invariant to uniform brightness shifts, so the 5 luma-offset
# variants that exact feature dedup keeps apart collapse into one
# perceptual group per (w, h) shape — n_brightness_variants proves it.
# The oracle derives the same bit string analytically (the gradient's
# sampled value is row_idx + col_idx + offset; the offset cancels
# against the mean), so any decode or downsample bug breaks the hash.
# Scale: blobs stay in Arrow batches; only the 64-char hash shuffles.
# ---------------------------------------------------------------------------


def multimodal_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd  # noqa: F401 — mapInPandas batch type

    from etl_ml_pipeline_spark.operators.multimodal import (
        _png_luma,
        ahash_bits,
        encode_png,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select("doc_id")

    def gen_hash(batches):
        for pdf in batches:
            hashes, lumas = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 1 + 2 * (d % 4), 1 + 2 * (d % 3)
                px = (np.add.outer(np.arange(h), np.arange(w)) + d % 5).astype(
                    np.uint8
                )
                luma = _png_luma(encode_png(px, color_type=0))  # real round-trip
                hashes.append(ahash_bits(luma))
                lumas.append(float(luma.mean() / 255.0))
            pdf = pdf.copy()
            pdf["ahash"] = hashes
            pdf["mean_luma"] = lumas
            yield pdf

    hashed = docs.mapInPandas(
        gen_hash, schema="doc_id: long, ahash: string, mean_luma: double"
    )
    return (
        hashed.groupBy("ahash")
        .agg(
            F.count("*").alias("n_images"),
            F.countDistinct("mean_luma").alias("n_brightness_variants"),
            F.min("doc_id").alias("canonical_id"),
        )
        .orderBy("canonical_id")
    )


# ---------------------------------------------------------------------------
# dedup_images_phash — perceptual-hash image NEAR-dup (VERDICT r13 ask
# #6): the Hamming-BALL completion of the exact-group aHash dedup
# above. Images are synthesized executor-side from a verified analytic
# bit model (24 base classes x 3 variants over 120 docs; within-class
# dHash distances {0,1,2}, cross-class minimum 13 — checked by
# tests/test_multimodal_decode.py), PNG-encoded, and pushed through the REAL
# decode path (encode_png -> _png_luma -> dhash_bits), so a decode or
# downsample bug anywhere breaks the hashes (model separation pinned by
# tests/test_multimodal_decode.py::test_phash_analytic_model_separation).
# Near-dups are pairs at Hamming distance <= 1: variants v0-v1 and
# v1-v2 match, v0-v2 (d=2) correctly does NOT — the clusters are not
# transitive cliques, which pins ball semantics, not components.
#
# Scale posture: NO all-pairs join. The 64-bit dHash splits into 8
# 8-bit bands; candidate pairs come from a self-equi-join on
# (band_idx, band_value) — by pigeonhole two hashes within Hamming
# distance d share an identical band whenever d < n_bands, so recall
# at radius 1 (or any radius < 8) is GUARANTEED, not probabilistic,
# and exact-oracle parity is sound. Hamming verification runs only on
# band-collision candidates via bit_count(xor) over the 8 band ints
# (JVM-side, 8-element zip_with). At 100 TB the shuffle key is the
# band value; skewed bands (e.g. flat images) salt naturally across
# the 8 band indexes. The DuckDB oracle recomputes the bit model
# analytically and does all-pairs Hamming — an oracle-scale-only
# recompute (120 docs), never the engine plan.
# ---------------------------------------------------------------------------

_PHASH_DOCS = 120          # 24 classes x 5 copies (variants 0,1,2,0,1)
_PHASH_RADIUS = 1          # near-dup = Hamming ball of radius 1
_PHASH_BANDS = 8           # 8 bands x 8 bits; guaranteed recall for d < 8


def _phash_gen_hash(batches):
    """mapInPandas kernel shared by dedup_images_phash and the index
    replay: synthesize each doc's 8x9 gray PNG from the analytic bit
    model, round-trip it through the REAL decode path, emit the dHash.
    Top-level (not a closure) so both queries serialize the same code."""
    import numpy as np

    from etl_ml_pipeline_spark.operators.multimodal import (
        _png_luma,
        dhash_bits,
        encode_png,
    )

    for pdf in batches:
        hashes = []
        for d in pdf["doc_id"]:
            d = int(d)
            k, v = d % 24, (d // 24) % 3
            bits = [
                ((k * 37 + p * 11 + ((k + 1) * (p + 3)) % 13) % 5) == 0
                for p in range(64)
            ]
            for i in range(v):
                f = (k * 3 + i * 17) % 64
                bits[f] = not bits[f]
            # build the 8x9 gray PNG whose horizontal differences
            # ARE the target bits: px[r,c+1] = px[r,c] +- 1; the
            # 8x9 -> 8x(8+1) dHash downsample is the identity, so
            # the decoded hash equals the analytic model exactly
            px = np.zeros((8, 9), dtype=np.uint8)
            px[:, 0] = 100
            for r in range(8):
                for c in range(8):
                    step = 1 if bits[r * 8 + c] else -1
                    px[r, c + 1] = px[r, c] + step
            luma = _png_luma(encode_png(px, color_type=0))
            hashes.append(dhash_bits(luma))
        pdf = pdf.copy()
        pdf["dhash"] = hashes
        yield pdf


def dedup_images_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PHASH_DOCS)
        .select("doc_id")
    )
    # The hashing lineage (Python PNG encode -> decode -> dHash) feeds
    # FIVE plan branches (both band-join sides, both Hamming sides, the
    # final doc list) that shuffle on DIFFERENT keys, so ReusedExchange
    # cannot collapse them — pin the narrow (id, bands) frame once
    # (lazy localCheckpoint, the VERDICT r12 #2 narrow-pin pattern) so
    # the expensive decode pass runs exactly once per execution.
    from etl_ml_pipeline_spark.operators.phash_index import (
        dhash_bands,
        hamming_from_bands,
    )

    hashed = (
        docs.mapInPandas(_phash_gen_hash, schema="doc_id: long, dhash: string")
        .select(
            "doc_id",
            dhash_bands(F.col("dhash"), _PHASH_BANDS).alias("bands"),
        )
        .localCheckpoint(eager=False)
    )

    band = F.posexplode("bands")
    c1 = hashed.select("doc_id", band.alias("pos", "bv")).alias("c1")
    c2 = hashed.select("doc_id", band.alias("pos", "bv")).alias("c2")
    cand = (
        c1.join(
            c2,
            (F.col("c1.pos") == F.col("c2.pos"))
            & (F.col("c1.bv") == F.col("c2.bv"))
            & (F.col("c1.doc_id") < F.col("c2.doc_id")),
        )
        .select(
            F.col("c1.doc_id").alias("id1"), F.col("c2.doc_id").alias("id2")
        )
        .distinct()
    )
    h1 = hashed.select(
        F.col("doc_id").alias("id1"), F.col("bands").alias("b1")
    )
    h2 = hashed.select(
        F.col("doc_id").alias("id2"), F.col("bands").alias("b2")
    )
    hamming = hamming_from_bands("b1", "b2")
    dup_pairs = (
        cand.join(h1, "id1")
        .join(h2, "id2")
        .withColumn("hd", hamming)
        .filter(F.col("hd") <= _PHASH_RADIUS)
        .select("id1", "id2")
    )
    nbrs = dup_pairs.select(
        F.col("id1").alias("id"), F.col("id2").alias("nb")
    ).unionAll(
        dup_pairs.select(F.col("id2").alias("id"), F.col("id1").alias("nb"))
    )
    agg = nbrs.groupBy("id").agg(
        F.count("*").alias("n"), F.min("nb").alias("mn")
    )
    return (
        hashed.select("doc_id")
        .join(agg, F.col("doc_id") == F.col("id"), "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_dup_neighbors"),
            F.least(
                F.col("doc_id"), F.coalesce("mn", F.col("doc_id"))
            ).alias("canonical_id"),
            (
                F.least(F.col("doc_id"), F.coalesce("mn", F.col("doc_id")))
                == F.col("doc_id")
            ).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


_PHASH_SQL = f"""
WITH docs AS (
  SELECT doc_id, doc_id % 24 AS k, (doc_id // 24) % 3 AS v
  FROM documents WHERE doc_id < {_PHASH_DOCS}
),
bits AS (
  SELECT doc_id, p,
         (CASE WHEN ((k*37 + p*11 + ((k+1)*(p+3)) % 13) % 5) = 0
               THEN 1 ELSE 0 END
          + CASE WHEN v >= 1 AND p = (k*3) % 64 THEN 1 ELSE 0 END
          + CASE WHEN v >= 2 AND p = (k*3 + 17) % 64 THEN 1 ELSE 0 END
         ) % 2 AS b
  FROM docs, (SELECT unnest(range(64)) AS p)
),
ham AS (
  SELECT a.doc_id AS id1, bb.doc_id AS id2,
         sum(CASE WHEN a.b <> bb.b THEN 1 ELSE 0 END) AS d
  FROM bits a JOIN bits bb ON a.p = bb.p AND a.doc_id < bb.doc_id
  GROUP BY 1, 2
),
nbrs AS (
  SELECT id1 AS id, id2 AS nb FROM ham WHERE d <= {_PHASH_RADIUS}
  UNION ALL
  SELECT id2, id1 FROM ham WHERE d <= {_PHASH_RADIUS}
),
agg AS (SELECT id, count(*) AS n, min(nb) AS mn FROM nbrs GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_dup_neighbors,
       CAST(least(d.doc_id, coalesce(a.mn, d.doc_id)) AS BIGINT)
         AS canonical_id,
       (least(d.doc_id, coalesce(a.mn, d.doc_id)) = d.doc_id)
         AS is_canonical
FROM docs d LEFT JOIN agg a ON d.doc_id = a.id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# dedup_audio_fingerprint — audio near-dup via a spectral-energy
# fingerprint (VERDICT r14 ask #6, completing the multimodal dedup
# mandate): each clip's int8 PCM round-trips through the REAL FPCM
# container (operators/multimodal.encode_pcm — the decode_audio_features
# path), is framed into 65 fixed-length windows, and the 64-bit
# fingerprint is the energy-delta sign chain (bit p = E(p+1) > E(p),
# the Shazam/Chromaprint-style landmark reduced to its deterministic
# core; energies are exact int64 sums, so both engines agree
# bit-for-bit). Near-dups come from the SAME banded Hamming-ball gate
# as the image family — operators/phash_index.dhash_bands +
# hamming_from_bands are hash-agnostic over any 64-bit string — with
# radius 2 (a silenced frame flips at most the two bits it borders).
# Corpus model: 24 clip classes x 5 copies; variant v of a class
# silences v deterministic frames (re-encoded ad jingles / dropped
# stream chunks), so each class carries planted near-dups at known
# distances. Scale: identical to dedup_images_phash — banded
# (pos, band-value) equi-join, pigeonhole-exact verification on
# band-collision candidates only, never an all-pairs product; the
# oracle replays the full PCM -> energy -> bit chain in SQL and does
# all-pairs Hamming at oracle scale only.
# ---------------------------------------------------------------------------

_AFP_DOCS = 120        # 24 classes x 5 copies (variants 0,1,2,0,1)
_AFP_FRAMES = 65       # 65 frames -> 64 energy-delta bits
_AFP_FRAME_LEN = 16    # samples per frame
_AFP_BANDS = 8
_AFP_RADIUS = 2        # one silenced frame flips <= 2 bits


def _audio_fp_kernel(batches):
    """mapInPandas kernel: synthesize each doc's class PCM, silence the
    variant frames, round-trip through the FPCM container, emit the
    64-bit energy-delta fingerprint. Top-level so every query/test
    serializes the same code (the _phash_gen_hash convention)."""
    import numpy as np

    from etl_ml_pipeline_spark.operators.multimodal import encode_pcm

    n = _AFP_FRAMES * _AFP_FRAME_LEN
    for pdf in batches:
        fps = []
        for d in pdf["doc_id"]:
            d = int(d)
            k, v = d % 24, (d // 24) % 3
            i = np.arange(n, dtype=np.int64)
            s = (k * 31 + i * 7) % 256 - 128
            for j in range(v):
                f = (k * 3 + j * 17) % _AFP_FRAMES
                s[f * _AFP_FRAME_LEN : (f + 1) * _AFP_FRAME_LEN] = 0
            blob = encode_pcm(s)
            ss = np.frombuffer(blob[8:], np.int8).astype(np.int64)
            e = (ss.reshape(_AFP_FRAMES, _AFP_FRAME_LEN) ** 2).sum(axis=1)
            bits = e[1:] > e[:-1]
            fps.append("".join("1" if b else "0" for b in bits))
        pdf = pdf.copy()
        pdf["afp"] = fps
        yield pdf


def dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.phash_index import (
        dhash_bands,
        hamming_from_bands,
    )

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _AFP_DOCS)
        .select("doc_id")
    )
    # narrow-pin the (id, bands) frame once: the fingerprint lineage
    # (PCM synth -> container round-trip -> energy chain) feeds five
    # differently-keyed plan branches (the dedup_images_phash pattern)
    hashed = (
        docs.mapInPandas(_audio_fp_kernel, schema="doc_id: long, afp: string")
        .select(
            "doc_id",
            dhash_bands(F.col("afp"), _AFP_BANDS).alias("bands"),
        )
        .localCheckpoint(eager=False)
    )

    band = F.posexplode("bands")
    c1 = hashed.select("doc_id", band.alias("pos", "bv")).alias("c1")
    c2 = hashed.select("doc_id", band.alias("pos", "bv")).alias("c2")
    cand = (
        c1.join(
            c2,
            (F.col("c1.pos") == F.col("c2.pos"))
            & (F.col("c1.bv") == F.col("c2.bv"))
            & (F.col("c1.doc_id") < F.col("c2.doc_id")),
        )
        .select(
            F.col("c1.doc_id").alias("id1"), F.col("c2.doc_id").alias("id2")
        )
        .distinct()
    )
    h1 = hashed.select(F.col("doc_id").alias("id1"), F.col("bands").alias("b1"))
    h2 = hashed.select(F.col("doc_id").alias("id2"), F.col("bands").alias("b2"))
    dup_pairs = (
        cand.join(h1, "id1")
        .join(h2, "id2")
        .withColumn("hd", hamming_from_bands("b1", "b2"))
        .filter(F.col("hd") <= _AFP_RADIUS)
        .select("id1", "id2")
    )
    nbrs = dup_pairs.select(
        F.col("id1").alias("id"), F.col("id2").alias("nb")
    ).unionAll(
        dup_pairs.select(F.col("id2").alias("id"), F.col("id1").alias("nb"))
    )
    agg = nbrs.groupBy("id").agg(F.count("*").alias("n"), F.min("nb").alias("mn"))
    return (
        hashed.select("doc_id")
        .join(agg, F.col("doc_id") == F.col("id"), "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_dup_neighbors"),
            F.least(
                F.col("doc_id"), F.coalesce("mn", F.col("doc_id"))
            ).alias("canonical_id"),
            (
                F.least(F.col("doc_id"), F.coalesce("mn", F.col("doc_id")))
                == F.col("doc_id")
            ).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


_AFP_SQL = f"""
WITH docs AS (
  SELECT doc_id, doc_id % 24 AS k, (doc_id // 24) % 3 AS v
  FROM documents WHERE doc_id < {_AFP_DOCS}
),
sv AS (
  SELECT doc_id, k, v, i // {_AFP_FRAME_LEN} AS f,
         ((k * 31 + i * 7) % 256) - 128 AS val
  FROM docs, (SELECT unnest(range({_AFP_FRAMES * _AFP_FRAME_LEN})) AS i)
),
sz AS (
  SELECT doc_id, f,
         CASE WHEN (v >= 1 AND f = (k * 3) % {_AFP_FRAMES})
                OR (v >= 2 AND f = (k * 3 + 17) % {_AFP_FRAMES})
              THEN 0 ELSE val END AS val
  FROM sv
),
en AS (SELECT doc_id, f, sum(val * val) AS e FROM sz GROUP BY 1, 2),
lagged AS (
  SELECT doc_id, f - 1 AS p,
         CASE WHEN e > lag(e) OVER (PARTITION BY doc_id ORDER BY f)
              THEN 1 ELSE 0 END AS b
  FROM en
),
bits AS (SELECT doc_id, p, b FROM lagged WHERE p >= 0),
ham AS (
  SELECT a.doc_id AS id1, bb.doc_id AS id2,
         sum(CASE WHEN a.b <> bb.b THEN 1 ELSE 0 END) AS d
  FROM bits a JOIN bits bb ON a.p = bb.p AND a.doc_id < bb.doc_id
  GROUP BY 1, 2
),
nbrs AS (
  SELECT id1 AS id, id2 AS nb FROM ham WHERE d <= {_AFP_RADIUS}
  UNION ALL
  SELECT id2, id1 FROM ham WHERE d <= {_AFP_RADIUS}
),
agg AS (SELECT id, count(*) AS n, min(nb) AS mn FROM nbrs GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_dup_neighbors,
       CAST(least(d.doc_id, coalesce(a.mn, d.doc_id)) AS BIGINT)
         AS canonical_id,
       (least(d.doc_id, coalesce(a.mn, d.doc_id)) = d.doc_id)
         AS is_canonical
FROM docs d LEFT JOIN agg a ON d.doc_id = a.id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# dedup_images_phash_replay — the persisted-index leg of the image
# family, completing the cross-run symmetry with the MinHash dedup
# index and the benchmark gram index: build the dHash index from an
# initial ingest (gen 0), append a second batch incrementally (gen 1,
# anti-join on id), gate a PROBE batch against the live index (banded
# join, Hamming <= 1, pigeonhole-guaranteed recall), then RETIRE gen 1
# (partition-pruned delete) and gate again — the retention lifecycle
# driver-recorded, not just unit-tested. Output = one row per probe:
# dup counts + nearest index id against the full and the retired
# index, plus the per-generation build/append arithmetic as literal
# columns. The DuckDB oracle recomputes everything from the analytic
# bit model (probe x index all-pairs — oracle-scale only, 30x90).
# Scale: index rows are (id, 64-char hash); band values derive
# map-side at read; the gate shuffles on (band_idx, band_value); no
# hints (AQE sizes the index side).
# ---------------------------------------------------------------------------

_PHASH_IX_BASE = 60       # gen 0: ids [0, 60)
_PHASH_IX_APPEND = 90     # gen 1: ids [60, 90); probes: [90, 120)


def dedup_images_phash_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.phash_index import (
        append_phash_index,
        build_phash_index,
        gate_against_phash_index,
        phash_index_stats,
        read_phash_index,
        retire_phash_index_generation,
    )

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PHASH_DOCS)
        .select("doc_id")
    )
    hashed = docs.mapInPandas(
        _phash_gen_hash, schema="doc_id: long, dhash: string"
    ).localCheckpoint(eager=False)
    base = hashed.filter(F.col("doc_id") < _PHASH_IX_BASE)
    batch2 = hashed.filter(
        (F.col("doc_id") >= _PHASH_IX_BASE)
        & (F.col("doc_id") < _PHASH_IX_APPEND)
    )
    probes = hashed.filter(F.col("doc_id") >= _PHASH_IX_APPEND)

    path = _run_scoped_index_dir("phash_ix")
    n_base = build_phash_index(base, path)
    n_app = append_phash_index(batch2, path)
    # EAGER checkpoint: the full-index verdicts must materialize BEFORE
    # the retire below deletes gen=1's part files — a lazy plan would
    # re-list the index at collect time and hit FileNotFoundException
    # on the retired partition.
    full = gate_against_phash_index(
        probes, read_phash_index(spark, path), radius=_PHASH_RADIUS
    ).select(
        "id",
        F.col("n_index_dups").alias("n_dups_full"),
        F.col("nearest_index_id").alias("nearest_full"),
    ).localCheckpoint()
    n_retired = retire_phash_index_generation(spark, path, 1)
    after = gate_against_phash_index(
        probes, read_phash_index(spark, path), radius=_PHASH_RADIUS
    ).select(
        "id",
        F.col("n_index_dups").alias("n_dups_after_retire"),
        F.col("nearest_index_id").alias("nearest_after_retire"),
    )
    stats = {
        r["gen"]: r["n_images"]
        for r in phash_index_stats(spark, path).collect()
    }
    return (
        full.join(after, "id")
        .select(
            F.col("id").alias("doc_id"),
            "n_dups_full",
            "nearest_full",
            "n_dups_after_retire",
            "nearest_after_retire",
            F.lit(n_base).cast("long").alias("idx_base"),
            F.lit(n_app).cast("long").alias("idx_appended"),
            F.lit(n_retired).cast("long").alias("idx_retired"),
            F.lit(stats.get(0, 0)).cast("long").alias("idx_live"),
        )
        .orderBy("doc_id")
    )


# Analytic bit model replayed in SQL (same arithmetic as _PHASH_SQL);
# probe x index all-pairs Hamming at oracle scale only (30 x 90 x 64).
_PHASH_REPLAY_SQL = f"""
WITH docs AS (
  SELECT doc_id, doc_id % 24 AS k, (doc_id // 24) % 3 AS v
  FROM documents WHERE doc_id < {_PHASH_DOCS}
),
bits AS (
  SELECT doc_id, p,
         (CASE WHEN ((k*37 + p*11 + ((k+1)*(p+3)) % 13) % 5) = 0
               THEN 1 ELSE 0 END
          + CASE WHEN v >= 1 AND p = (k*3) % 64 THEN 1 ELSE 0 END
          + CASE WHEN v >= 2 AND p = (k*3 + 17) % 64 THEN 1 ELSE 0 END
         ) % 2 AS b
  FROM docs, (SELECT unnest(range(64)) AS p)
),
ham AS (
  SELECT pr.doc_id AS probe_id, ix.doc_id AS ix_id,
         sum(CASE WHEN pr.b <> ix.b THEN 1 ELSE 0 END) AS d
  FROM bits pr JOIN bits ix
    ON pr.p = ix.p
   AND pr.doc_id >= {_PHASH_IX_APPEND}
   AND ix.doc_id < {_PHASH_IX_APPEND}
  GROUP BY 1, 2
),
full_hits AS (
  SELECT probe_id, count(*) AS n, min(ix_id) AS mn
  FROM ham WHERE d <= {_PHASH_RADIUS} GROUP BY 1
),
retired_hits AS (
  SELECT probe_id, count(*) AS n, min(ix_id) AS mn
  FROM ham WHERE d <= {_PHASH_RADIUS} AND ix_id < {_PHASH_IX_BASE}
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(f.n, 0) AS BIGINT) AS n_dups_full,
       CAST(f.mn AS BIGINT) AS nearest_full,
       CAST(coalesce(r.n, 0) AS BIGINT) AS n_dups_after_retire,
       CAST(r.mn AS BIGINT) AS nearest_after_retire,
       CAST({_PHASH_IX_BASE} AS BIGINT) AS idx_base,
       CAST({_PHASH_IX_APPEND} - {_PHASH_IX_BASE} AS BIGINT) AS idx_appended,
       CAST({_PHASH_IX_APPEND} - {_PHASH_IX_BASE} AS BIGINT) AS idx_retired,
       CAST({_PHASH_IX_BASE} AS BIGINT) AS idx_live
FROM docs d
LEFT JOIN full_hits f ON d.doc_id = f.probe_id
LEFT JOIN retired_hits r ON d.doc_id = r.probe_id
WHERE d.doc_id >= {_PHASH_IX_APPEND}
ORDER BY d.doc_id
"""


_AHASH_SQL = """
WITH imgs AS (
  SELECT doc_id,
         1 + 2 * (doc_id % 4) AS w, 1 + 2 * (doc_id % 3) AS h,
         ((doc_id % 5) + (doc_id % 4) + (doc_id % 3)) / 255.0 AS mean_luma
  FROM documents WHERE doc_id < 300
),
cells AS (
  SELECT i.w, i.h, r.r, c.c,
         CAST((r.r * i.h) // 8 + (c.c * i.w) // 8 AS DOUBLE) AS s
  FROM (SELECT DISTINCT w, h FROM imgs) i,
       UNNEST(range(8)) AS r(r), UNNEST(range(8)) AS c(c)
),
hashes AS (
  SELECT w, h,
         string_agg(CASE WHEN s > avg_s THEN '1' ELSE '0' END, ''
                    ORDER BY r, c) AS ahash
  FROM (SELECT *, avg(s) OVER (PARTITION BY w, h) AS avg_s FROM cells)
  GROUP BY w, h
)
SELECT ahash,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(count(DISTINCT mean_luma) AS BIGINT) AS n_brightness_variants,
       CAST(min(doc_id) AS BIGINT) AS canonical_id
FROM imgs JOIN hashes USING (w, h)
GROUP BY ahash
ORDER BY canonical_id
"""


# ---------------------------------------------------------------------------
# multimodal_audio_features — the audio leg of the media plumbing:
# deterministic int8 PCM synthesized executor-side into the FPCM
# container (magic + length header), then parsed back through the
# decode_audio_features mapInPandas path (real header parse + numpy
# DSP: RMS, strict-sign zero crossings). Sample i of doc d is
# ((d*31 + i*7) % 256) - 128 with n = 64 + d%64 samples, so DuckDB
# replays the waveform exactly; the squared-mean is an exact double
# and IEEE sqrt is correctly rounded, so rms matches bit-for-bit
# under the 1e-4 floor.
# Scale: blobs stay inside Arrow batches on executors; features are
# small columns and the binary prunes away downstream — same posture
# as the image path.
# ---------------------------------------------------------------------------


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from etl_ml_pipeline_spark.operators.multimodal import (
        attach_media_meta,
        decode_audio_features,
        encode_pcm,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400).select("doc_id")

    def gen_pcm(batches):
        for pdf in batches:
            media = []
            for d in pdf["doc_id"]:
                d = int(d)
                i = np.arange(64 + d % 64, dtype=np.int64)
                media.append(encode_pcm((d * 31 + i * 7) % 256 - 128))
            yield pdf.assign(media=media)

    media = docs.mapInPandas(gen_pcm, schema="doc_id long, media binary")
    media = attach_media_meta(media, "media", "audio", "fpcm")
    decoded = decode_audio_features(media, "media")
    return decoded.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("audio.n_samples").alias("n_samples"),
        F.col("audio.rms").alias("rms"),
        F.col("audio.zero_crossings").alias("zero_crossings"),
    ).orderBy("doc_id")


_AUDIO_SQL = """
WITH d AS (
  SELECT doc_id, 64 + doc_id % 64 AS n FROM documents WHERE doc_id < 400
),
s AS (SELECT doc_id, unnest(range(n)) AS i FROM d),
v AS (SELECT doc_id, i, ((doc_id * 31 + i * 7) % 256) - 128 AS val FROM s),
w AS (
  SELECT doc_id,
         val * lag(val) OVER (PARTITION BY doc_id ORDER BY i) AS prod
  FROM v
),
zc AS (
  SELECT doc_id,
         sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS zero_crossings
  FROM w GROUP BY doc_id
),
r AS (
  SELECT doc_id,
         count(*) AS n_samples,
         floor(sqrt(avg(CAST(val * val AS DOUBLE))) * 10000) / 10000 AS rms
  FROM v GROUP BY doc_id
)
SELECT r.doc_id,
       CAST(8 + n_samples AS BIGINT) AS n_bytes,
       CAST(n_samples AS BIGINT) AS n_samples,
       rms,
       CAST(zero_crossings AS BIGINT) AS zero_crossings
FROM r JOIN zc ON r.doc_id = zc.doc_id
ORDER BY r.doc_id
"""


# ---------------------------------------------------------------------------
# multimodal_video_frames — the video leg of the media plumbing:
# deterministic 8-bit gray frames synthesized executor-side into the
# FVID container (magic + w/h/frame-count header), then parsed back
# through decode_video_frames (real header parse + numpy per-frame
# features, every 2nd frame sampled). Pixel (f, y, x) of doc d is
# (d*7 + f*13 + y*3 + x) % 256 with w = 8 + d%5, h = 6 + d%4,
# nf = 4 + d%4, so DuckDB replays every frame exactly; mean luma and
# motion (mean |frame - prev frame|) are exact-integer means, so the
# floor-truncated doubles match bit-for-bit — the audio-rms argument.
# Scale: blobs stay in Arrow batches on executors; the output is
# rows x sampled frames of small feature columns.
# ---------------------------------------------------------------------------


def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from etl_ml_pipeline_spark.operators.multimodal import (
        attach_media_meta,
        decode_video_frames,
        encode_video,
    )

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select("doc_id")

    def gen_video(batches):
        for pdf in batches:
            media = []
            for d0 in pdf["doc_id"]:
                d = int(d0)
                w, h, nf = 8 + d % 5, 6 + d % 4, 4 + d % 4
                frames = (
                    d * 7
                    + 13 * np.arange(nf)[:, None, None]
                    + 3 * np.arange(h)[None, :, None]
                    + np.arange(w)[None, None, :]
                ) % 256
                media.append(encode_video(frames))
            yield pdf.assign(media=media)

    media = docs.mapInPandas(gen_video, schema="doc_id long, media binary")
    media = attach_media_meta(media, "media", "video", "fvid")
    out = decode_video_frames(media, "media", stride=2)
    return out.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        "frame_idx",
        "width",
        "height",
        "mean_luma",
        "motion",
    ).orderBy("doc_id", "frame_idx")


_VIDEO_SQL = """
WITH d AS (
  SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
         4 + doc_id % 4 AS nf
  FROM documents WHERE doc_id < 300
),
px AS (
  SELECT doc_id, w, h, nf, f.f AS f, y.y AS y, x.x AS x,
         (doc_id * 7 + f.f * 13 + y.y * 3 + x.x) % 256 AS val
  FROM d, UNNEST(range(nf)) AS f(f), UNNEST(range(h)) AS y(y),
       UNNEST(range(w)) AS x(x)
),
luma AS (
  SELECT doc_id, f, w, h, nf,
         floor(avg(CAST(val AS DOUBLE)) * 10000) / 10000 AS mean_luma
  FROM px GROUP BY 1, 2, 3, 4, 5
),
mot AS (
  SELECT a.doc_id, a.f,
         floor(avg(CAST(abs(a.val - b.val) AS DOUBLE)) * 10000) / 10000 AS motion
  FROM px a JOIN px b
    ON a.doc_id = b.doc_id AND b.f = a.f - 1 AND a.y = b.y AND a.x = b.x
  GROUP BY 1, 2
)
SELECT l.doc_id,
       CAST(10 + nf * h * w AS BIGINT) AS n_bytes,
       CAST(l.f AS INT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       l.mean_luma,
       coalesce(m.motion, -1.0) AS motion
FROM luma l LEFT JOIN mot m ON l.doc_id = m.doc_id AND l.f = m.f
WHERE l.f % 2 = 0
ORDER BY l.doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# ann_ivf_topk — IVF ANN: deterministic coarse centroids (every 50th
# vector), broadcast argmin assignment, probe-1 candidate lists, exact
# rerank. Fully oracle-checked: the quantizer is data-deterministic, so
# DuckDB replays assignment + probe with the same argmin.
# ---------------------------------------------------------------------------


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, centroid_rows: list | None = None
) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    # centroid_rows (r16, VERDICT r15 #7): a composing caller (the
    # recall battery) that already collected THIS EXACT quantizer frame
    # (vec_id % 50 == 0) in the same invocation passes the rows through
    # — same-definition subexpression reuse within one invocation, the
    # r15 §12 pattern lifted one level. Standalone default: unchanged.
    out = ivf_topk(
        queries, corpus, centroids, k=5, n_probe=1, centroid_rows=centroid_rows
    )
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos"), "cent_id"
    ).orderBy("q_id", "rank")


_IVF_SQL = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS q_id, v AS qv, cent_id FROM assigned WHERE vec_id < 10
),
cand AS (
  SELECT q.q_id, a.vec_id AS c_id, q.cent_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM q JOIN assigned a USING (cent_id)
),
ranked AS (
  SELECT q_id, c_id, cent_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM cand
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos, cent_id
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# ann_ivf_sqrtn_topk — IVF with sqrt(N)-sized coarse quantizer and
# multi-probe. ann_ivf_topk's fixed every-50th stride grows the centroid
# count LINEARLY with the corpus, so assignment cost is O(N^2/50) — fine
# for a demo, quadratic at 100 TB. The classic IVF balance is k_coarse ~
# sqrt(N) (per-list size == list count), which this query derives inside
# the plan: one count(*) aggregate feeds a broadcast stride, so index
# sizing adapts to the data with no hand-tuned constant. n_probe=2
# exercises the multi-probe path (recall recovery at region boundaries)
# under the oracle differential; probes are top-2 centroids by
# (cosine desc, cent_id asc) — the deterministic tie order both the
# numpy argsort(kind="stable") and the SQL row_number share.
# ---------------------------------------------------------------------------


def ann_ivf_sqrtn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    stride = emb.agg(
        F.greatest(F.lit(50).cast("long"), F.floor(F.sqrt(F.count("*"))).cast("long")).alias(
            "stride"
        )
    )
    centroids = (
        emb.crossJoin(F.broadcast(stride))
        .filter(F.col("vec_id") % F.col("stride") == 0)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec"))
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = ivf_topk(queries, corpus, centroids, k=5, n_probe=2)
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos"), "cent_id"
    ).orderBy("q_id", "rank")


_IVF_SQRTN_SQL = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
stride AS (
  SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT)) AS s FROM vecs
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs
  WHERE vec_id % (SELECT s FROM stride) = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS q_id, v AS qv, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
    WHERE a.vec_id < 10
  ) WHERE rn <= 2
),
cand AS (
  SELECT q.q_id, a.vec_id AS c_id, a.cent_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM qprobe q JOIN assigned a USING (cent_id)
),
ranked AS (
  SELECT q_id, c_id, cent_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM cand
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos, cent_id
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# embedding_quantize_sq8 — per-vector int8 scalar quantization + quality
# probe. Map-side only (no shuffle, no UDF): min/max/codes/MAE are all
# array expressions inside whole-stage codegen. At 100 TB this is the 4x
# vector-storage cut before an ANN index build; MAE is the standard
# quantization-quality metric shipped with it.
# ---------------------------------------------------------------------------


def embedding_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import (
        sq8_quantize,
        sq8_reconstruction_mae,
    )

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    q = sq8_quantize(F.col("embedding"))
    qc = F.col("__q")
    return (
        emb.withColumn("__q", q)
        .select(
            "vec_id",
            F.concat_ws(",", F.slice(qc["codes"], 1, 6)).alias("codes6"),
            _trunc4(qc["vmin"]).alias("vmin"),
            _trunc4(qc["vmax"]).alias("vmax"),
            (F.floor(sq8_reconstruction_mae(F.col("embedding"), qc) * 1e6) / 1e6).alias(
                "mae"
            ),
        )
        .orderBy("vec_id")
    )


_SQ8_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings WHERE vec_id < 500
),
q AS (
  SELECT vec_id, x,
         list_min(x) AS vmin, list_max(x) AS vmax,
         (list_max(x) - list_min(x)) / 255.0 AS scale
  FROM v
),
coded AS (
  SELECT vec_id, x, vmin, vmax, scale,
         CASE WHEN vmax > vmin
              THEN list_transform(x, e -> CAST(floor((e - vmin) / scale + 0.5) AS INT))
              ELSE list_transform(x, e -> 0) END AS codes
  FROM q
)
SELECT vec_id,
       array_to_string(codes[1:6], ',') AS codes6,
       floor(vmin * 10000) / 10000 AS vmin,
       floor(vmax * 10000) / 10000 AS vmax,
       floor(list_sum(list_transform(list_zip(x, codes),
                                     p -> abs(p[1] - (vmin + p[2] * scale))))
             / len(x) * 1e6) / 1e6 AS mae
FROM coded
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# ann_pq_adc_topk — product-quantization ANN: deterministic codebooks
# (subvectors of the k lowest vec_id % 37 == 0 vectors — replayable in
# SQL), corpus encoded to m=8 4-bit codes, asymmetric-distance top-k via
# per-query lookup tables. The full compress -> search path is
# oracle-checked; a recall test additionally pins quality vs brute force.
# ---------------------------------------------------------------------------

_PQ_M, _PQ_K, _PQ_STEP = 8, 16, 31


def ann_pq_adc_topk(
    spark: SparkSession, sf_dir: str, codebooks: list | None = None
) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_from_rows,
        pq_encode,
    )

    emb = t(spark, sf_dir, "embeddings")
    # codebooks: same-definition pass-through (r16, VERDICT r15 #7 —
    # see ann_ivfpq_topk); standalone default unchanged.
    if codebooks is None:
        codebooks = pq_codebooks_from_rows(
            emb, "embedding", "vec_id", m=_PQ_M, k=_PQ_K, id_step=_PQ_STEP
        )
    corpus = pq_encode(
        emb.select(F.col("vec_id").alias("c_id"), "embedding"),
        codebooks,
        "embedding",
    ).select("c_id", "pq_codes")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = pq_adc_topk(queries, corpus, codebooks, k=5)
    return out.select(
        "q_id", "rank", "c_id", (F.floor(F.col("adc") * 10000) / 10000).alias("adc")
    ).orderBy("q_id", "rank")


def _pq_oracle() -> str:
    dsub = 64 // _PQ_M
    sub_slices = ", ".join(
        f"v[{j * dsub + 1}:{(j + 1) * dsub}] AS s{j}" for j in range(_PQ_M)
    )
    return f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS cent
  FROM vecs WHERE vec_id % {_PQ_STEP} = 0 ORDER BY vec_id LIMIT {_PQ_K}
),
-- codebook: centroid `cent` of subspace j = seed vector slice j
codebook AS (
  SELECT cent, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS cv
  FROM seeds, unnest(range({_PQ_M})) AS u(j)
),
subs AS (
  SELECT vec_id, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS sv
  FROM vecs, unnest(range({_PQ_M})) AS u(j)
),
-- encode: nearest centroid per (vector, subspace); naive sequential
-- left-fold distance matches the numpy reduce exactly at dsub <= 8
dists AS (
  SELECT s.vec_id, s.j, c.cent,
         list_sum(list_transform(list_zip(s.sv, c.cv),
                                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM subs s JOIN codebook c USING (j)
),
codes AS (
  SELECT vec_id, j, cent AS code FROM (
    SELECT vec_id, j, cent,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cent ASC) AS rn
    FROM dists
  ) WHERE rn = 1
),
-- ADC: per-query LUT is the same dists table restricted to queries
lut AS (
  SELECT vec_id AS q_id, j, cent, d FROM dists WHERE vec_id < 10
),
scored AS (
  -- ordered list fold, NOT sum(): Spark's aggregate() adds the m
  -- lookups in subspace order; an unordered SQL sum could differ in
  -- the last ulp and flip near-equal ranks
  SELECT l.q_id, c.vec_id AS c_id,
         list_sum(list(l.d ORDER BY l.j)) AS adc
  FROM codes c JOIN lut l ON l.j = c.j AND l.cent = c.code
  GROUP BY 1, 2
),
ranked AS (
  SELECT q_id, c_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, c_id ASC) AS rank
  FROM scored
)
SELECT q_id, rank, c_id, floor(adc * 10000) / 10000 AS adc
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# ann_ivfpq_topk — IVF-PQ composition (FAISS IVFADC shape, raw-vector
# codes): coarse quantizer prunes to the probed inverted list, ADC
# scores only those candidates from PQ codes. Both building blocks are
# individually oracle-proven; this checks the composition end to end.
# ---------------------------------------------------------------------------


def ann_ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    centroid_rows: list | None = None,
    codebooks: list | None = None,
) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        pq_codebooks_from_rows,
    )

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    # centroid_rows/codebooks (r16, VERDICT r15 #7): same-definition
    # pass-throughs for a composing caller (the recall battery) — the
    # %50 quantizer and the (_PQ_M,_PQ_K,_PQ_STEP) codebooks are
    # byte-identical to the standalone builds. Standalone: unchanged.
    if codebooks is None:
        codebooks = pq_codebooks_from_rows(
            emb, "embedding", "vec_id", m=_PQ_M, k=_PQ_K, id_step=_PQ_STEP
        )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = ivfpq_topk(
        queries, corpus, centroids, codebooks, k=5, centroid_rows=centroid_rows
    )
    return out.select(
        "q_id",
        "rank",
        "c_id",
        (F.floor(F.col("adc") * 10000) / 10000).alias("adc"),
        "cent_id",
    ).orderBy("q_id", "rank")


def _ivfpq_oracle() -> str:
    dsub = 64 // _PQ_M
    return f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS cent
  FROM vecs WHERE vec_id % {_PQ_STEP} = 0 ORDER BY vec_id LIMIT {_PQ_K}
),
codebook AS (
  SELECT cent, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS cv
  FROM seeds, unnest(range({_PQ_M})) AS u(j)
),
subs AS (
  SELECT vec_id, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS sv
  FROM vecs, unnest(range({_PQ_M})) AS u(j)
),
dists AS (
  SELECT s.vec_id, s.j, c.cent,
         list_sum(list_transform(list_zip(s.sv, c.cv),
                                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM subs s JOIN codebook c USING (j)
),
codes AS (
  SELECT vec_id, j, cent AS code FROM (
    SELECT vec_id, j, cent,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cent ASC) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS q_id, j, cent, d FROM dists WHERE vec_id < 10
),
qassign AS (
  SELECT vec_id AS q_id, cent_id FROM assigned WHERE vec_id < 10
),
scored AS (
  SELECT q.q_id, co.vec_id AS c_id, a.cent_id,
         list_sum(list(l.d ORDER BY l.j)) AS adc
  FROM codes co
  JOIN assigned a ON a.vec_id = co.vec_id
  JOIN qassign q ON q.cent_id = a.cent_id
  JOIN lut l ON l.q_id = q.q_id AND l.j = co.j AND l.cent = co.code
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT q_id, c_id, cent_id, adc,
         row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, c_id ASC) AS rank
  FROM scored
)
SELECT q_id, rank, c_id, floor(adc * 10000) / 10000 AS adc, cent_id
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# ann_ivfpq_rerank_topk — the FULL production retrieval stack as one
# oracle-checked query: multi-probe IVF (8 cells) -> ADC over PQ codes
# prunes to 100 candidates -> EXACT cosine rescoring of just those
# candidates orders the final top-5. Raw single-probe ADC lands ~0.25
# recall@5 on this corpus; this stack measures 0.78-0.86 (pytest) —
# and the plan reads full vectors only for the candidate point-lookups,
# never scanning the corpus with exact math.
# ---------------------------------------------------------------------------

_RERANK_PROBE = 8
_RERANK_CANDS = 100


def ann_ivfpq_rerank_topk(
    spark: SparkSession,
    sf_dir: str,
    centroid_rows: list | None = None,
    codebooks: list | None = None,
) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import (
        ivfpq_rerank_topk,
        pq_codebooks_from_rows,
    )

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    # centroid_rows/codebooks: same-definition pass-throughs (r16,
    # VERDICT r15 #7 — see ann_ivfpq_topk); standalone default
    # unchanged.
    if codebooks is None:
        codebooks = pq_codebooks_from_rows(
            emb, "embedding", "vec_id", m=_PQ_M, k=_PQ_K, id_step=_PQ_STEP
        )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = ivfpq_rerank_topk(
        queries,
        corpus,
        centroids,
        codebooks,
        k=5,
        n_candidates=_RERANK_CANDS,
        n_probe=_RERANK_PROBE,
        centroid_rows=centroid_rows,
    )
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos")
    ).orderBy("q_id", "rank")


def _ivfpq_rerank_oracle() -> str:
    dsub = 64 // _PQ_M
    return f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS cent
  FROM vecs WHERE vec_id % {_PQ_STEP} = 0 ORDER BY vec_id LIMIT {_PQ_K}
),
codebook AS (
  SELECT cent, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS cv
  FROM seeds, unnest(range({_PQ_M})) AS u(j)
),
subs AS (
  SELECT vec_id, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS sv
  FROM vecs, unnest(range({_PQ_M})) AS u(j)
),
dists AS (
  SELECT s.vec_id, s.j, c.cent,
         list_sum(list_transform(list_zip(s.sv, c.cv),
                                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM subs s JOIN codebook c USING (j)
),
codes AS (
  SELECT vec_id, j, cent AS code FROM (
    SELECT vec_id, j, cent,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cent ASC) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS q_id, j, cent, d FROM dists WHERE vec_id < 10
),
qprobe AS (
  SELECT vec_id AS q_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c WHERE a.vec_id < 10
  ) WHERE rn <= {_RERANK_PROBE}
),
scored AS (
  SELECT q.q_id, co.vec_id AS c_id,
         list_sum(list(l.d ORDER BY l.j)) AS adc
  FROM codes co
  JOIN assigned a ON a.vec_id = co.vec_id
  JOIN qprobe q ON q.cent_id = a.cent_id
  JOIN lut l ON l.q_id = q.q_id AND l.j = co.j AND l.cent = co.code
  GROUP BY 1, 2
),
cand AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, c_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {_RERANK_CANDS}
),
rer AS (
  SELECT cand.q_id, cand.c_id, list_cosine_similarity(qv.v, cv.v) AS cos
  FROM cand
  JOIN vecs qv ON qv.vec_id = cand.q_id
  JOIN vecs cv ON cv.vec_id = cand.c_id
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos
FROM (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM rer
)
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# ann_mmr_ivf_topk — the production retrieval stack END-TO-END: IVF-PQ
# shortlist (8 probed cells, ADC over compressed codes prunes to 50
# candidates) -> exact cosine rescoring of JUST those candidates cuts
# the 12-candidate MMR pool -> greedy K=4 diversification through the
# cogroup kernel. This is VERDICT r14 ask #2: the standalone
# ann_mmr_rerank_topk builds its pool with an exact full-corpus scan
# per query (the oracle-baseline posture); here the corpus-side cost is
# the IVF probe and full vectors are read only for the 50 shortlist ids
# (point-lookup equi-join on c_id — plan-pinned: no nested-loop join
# anywhere in the pool build). Same lambda/mu/tie semantics as the
# standalone MMR query, so the two differ ONLY in pool construction.
# ---------------------------------------------------------------------------

_MMR_IVF_PROBE = 8
_MMR_IVF_CANDS = 50


def ann_mmr_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import (
        ivf_mmr_topk,
        pq_codebooks_from_rows,
    )

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    codebooks = pq_codebooks_from_rows(
        emb, "embedding", "vec_id", m=_PQ_M, k=_PQ_K, id_step=_PQ_STEP
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = ivf_mmr_topk(
        queries,
        corpus,
        centroids,
        codebooks,
        k=_MMR_K,
        pool=_MMR_POOL,
        n_candidates=_MMR_IVF_CANDS,
        n_probe=_MMR_IVF_PROBE,
        lam=_MMR_LAMBDA,
        mu=_MMR_MU,
    )
    return out.select(
        "q_id", "sel_rank", "c_id", _trunc4(F.col("mmr")).alias("mmr")
    ).orderBy("q_id", "sel_rank")


def _ivf_mmr_oracle() -> str:
    """IVF-PQ shortlist CTEs verbatim from _ivfpq_rerank_oracle (the
    hash-green ADC mirror), then the exact-cosine pool cut (self
    dropped AFTER the ADC shortlist, exactly like the Spark side) and
    the same unrolled greedy steps as _MMR_SQL.

    The multi-referenced CTEs (vecs/dists/cand/pairs) are AS
    MATERIALIZED: DuckDB inlines plain CTEs per reference, and here
    ``cand`` (referenced ~6x by pairs + the greedy steps) carries the
    WHOLE ADC chain — at synthetic sf1 the inlined form re-evaluated a
    ~25s/100GB pipeline per reference and ground for an hour where the
    materialized form finishes in seconds."""
    dsub = 64 // _PQ_M
    return f"""
WITH vecs AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS cent
  FROM vecs WHERE vec_id % {_PQ_STEP} = 0 ORDER BY vec_id LIMIT {_PQ_K}
),
codebook AS (
  SELECT cent, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS cv
  FROM seeds, unnest(range({_PQ_M})) AS u(j)
),
subs AS (
  SELECT vec_id, j, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS sv
  FROM vecs, unnest(range({_PQ_M})) AS u(j)
),
dists AS MATERIALIZED (
  SELECT s.vec_id, s.j, c.cent,
         list_sum(list_transform(list_zip(s.sv, c.cv),
                                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM subs s JOIN codebook c USING (j)
),
codes AS (
  SELECT vec_id, j, cent AS code FROM (
    SELECT vec_id, j, cent,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cent ASC) AS rn
    FROM dists
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS q_id, j, cent, d FROM dists WHERE vec_id < 8
),
qprobe AS (
  SELECT vec_id AS q_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c WHERE a.vec_id < 8
  ) WHERE rn <= {_MMR_IVF_PROBE}
),
adc_scored AS (
  SELECT q.q_id, co.vec_id AS c_id,
         list_sum(list(l.d ORDER BY l.j)) AS adc
  FROM codes co
  JOIN assigned a ON a.vec_id = co.vec_id
  JOIN qprobe q ON q.cent_id = a.cent_id
  JOIN lut l ON l.q_id = q.q_id AND l.j = co.j AND l.cent = co.code
  GROUP BY 1, 2
),
short AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, c_id ASC) AS rank
    FROM adc_scored
  ) WHERE rank <= {_MMR_IVF_CANDS}
),
cand AS MATERIALIZED (
  SELECT q_id, c_id, cos_qc, rk FROM (
    SELECT s.q_id, s.c_id,
           least(1.0, greatest(-1.0, list_cosine_similarity(qv.v, cv.v)))
             AS cos_qc,
           row_number() OVER (
             PARTITION BY s.q_id
             ORDER BY least(1.0, greatest(-1.0,
                            list_cosine_similarity(qv.v, cv.v))) DESC,
                      s.c_id ASC) AS rk
    FROM short s
    JOIN vecs qv ON qv.vec_id = s.q_id
    JOIN vecs cv ON cv.vec_id = s.c_id
    WHERE s.c_id <> s.q_id
  ) WHERE rk <= {_MMR_POOL}
),
pairs AS MATERIALIZED (
  SELECT a.q_id, a.c_id AS ca, b.c_id AS cb,
         least(1.0, greatest(-1.0, list_cosine_similarity(av.v, bv.v)))
           AS cos_cc
  FROM cand a
  JOIN cand b ON a.q_id = b.q_id AND a.c_id <> b.c_id
  JOIN vecs av ON av.vec_id = a.c_id
  JOIN vecs bv ON bv.vec_id = b.c_id
),
sel1 AS (
  SELECT q_id, c_id, 0.7 * cos_qc AS mmr FROM (
    SELECT q_id, c_id, cos_qc,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_qc DESC, c_id ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
{_mmr_step_sql(2, ["sel1"])},
{_mmr_step_sql(3, ["sel1", "sel2"])},
{_mmr_step_sql(4, ["sel1", "sel2", "sel3"])}
SELECT q_id, CAST(sel_rank AS INTEGER) AS sel_rank, c_id,
       floor(mmr * 10000) / 10000 AS mmr
FROM (
  SELECT q_id, 1 AS sel_rank, c_id, mmr FROM sel1
  UNION ALL SELECT q_id, 2, c_id, mmr FROM sel2
  UNION ALL SELECT q_id, 3, c_id, mmr FROM sel3
  UNION ALL SELECT q_id, 4, c_id, mmr FROM sel4
)
ORDER BY q_id, sel_rank
"""


# ---------------------------------------------------------------------------
# ann_recall_contract — recall@10 of the sqrt(N) IVF index vs the exact
# brute-force top-10, measured INSIDE the engine at two probe settings
# and asserted as data (VERDICT r04 #5: IVF recall lived only in pytest).
# Two contracts ride the compared output as booleans the oracle pins to
# literal TRUE:
#   monotone_ok — recall(n_probe=8) >= recall(n_probe=2). A theorem, not
#     a tuning fact: the probe-8 candidate set is a superset of probe-2's,
#     and any brute-force-top-10 member inside a candidate set is
#     necessarily inside that set's IVF top-10 (at most 9 other vectors
#     beat it anywhere, ties broken identically by (cos DESC, c_id ASC)).
#   floor_ok — recall(n_probe=8) >= 0.5. Data-dependent: measured 0.91 at
#     sf0.01 / 0.58 at sf0.1 for the stride quantizer (real k-means
#     centroids do better; the stride keeps the oracle SQL-expressible).
# The recall values themselves also hash-compare cross-engine — both
# sides derive them from identical deterministic rankings.
# Scale: brute force is the 10-query broadcast baseline (fine as a
# measurement harness; the measured artifact is the IVF path).
# ---------------------------------------------------------------------------


def ann_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = t(spark, sf_dir, "embeddings")
    stride = emb.agg(
        F.greatest(
            F.lit(50).cast("long"), F.floor(F.sqrt(F.count("*"))).cast("long")
        ).alias("stride")
    )
    centroids = (
        emb.crossJoin(F.broadcast(stride))
        .filter(F.col("vec_id") % F.col("stride") == 0)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec"))
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    bf = brute_force_topk(queries, corpus, k=10).select("q_id", "c_id")
    # r15 §12: the stride-derived quantizer is collected ONCE and shared
    # by both probe settings' assign+probe stages (was 4 driver-sync
    # jobs, each re-running the stride aggregate + filter)
    cent_rows = _collect_cent_rows(centroids)
    recalls = []
    for n_probe in (2, 8):
        iv = ivf_topk(
            queries, corpus, centroids, k=10, n_probe=n_probe,
            centroid_rows=cent_rows,
        ).select("q_id", "c_id")
        recalls.append(
            bf.join(iv, ["q_id", "c_id"]).agg(
                (F.count("*") / F.lit(100.0)).alias(f"recall_p{n_probe}")
            )
        )
    r2, r8 = recalls
    return r2.crossJoin(r8).select(
        F.lit(10).alias("k"),
        F.lit(10).alias("n_queries"),
        "recall_p2",
        "recall_p8",
        (F.col("recall_p8") >= F.col("recall_p2")).alias("monotone_ok"),
        (F.col("recall_p8") >= 0.5).alias("floor_ok"),
    )


def _recall_oracle() -> str:
    probe = """
probe{np} AS (
  SELECT q_id, c_id FROM (
    SELECT q.q_id, a.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.q_id
             ORDER BY list_cosine_similarity(q.qv, a.v) DESC, a.vec_id ASC) AS rank
    FROM (SELECT vec_id AS q_id, v AS qv, cent_id FROM (
            SELECT a.vec_id, a.v, c.cent_id,
                   row_number() OVER (PARTITION BY a.vec_id
                     ORDER BY list_cosine_similarity(a.v, c.cv) DESC,
                              c.cent_id ASC) AS rn
            FROM vecs a CROSS JOIN cent c WHERE a.vec_id < 10
          ) WHERE rn <= {np}) q
    JOIN assigned a USING (cent_id)
  ) WHERE rank <= 10
)"""
    return (
        """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
stride AS (
  SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT)) AS s FROM vecs
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs
  WHERE vec_id % (SELECT s FROM stride) = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
bf AS (
  SELECT q_id, c_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank
    FROM vecs q CROSS JOIN vecs c WHERE q.vec_id < 10
  ) WHERE rank <= 10
),"""
        + probe.format(np=2)
        + ","
        + probe.format(np=8)
        + """
SELECT 10 AS k, 10 AS n_queries,
       (SELECT count(*) FROM bf JOIN probe2 USING (q_id, c_id)) / 100.0 AS recall_p2,
       (SELECT count(*) FROM bf JOIN probe8 USING (q_id, c_id)) / 100.0 AS recall_p8,
       TRUE AS monotone_ok,
       TRUE AS floor_ok
"""
    )


# ---------------------------------------------------------------------------
# ann_recall_battery — recall@5 of EVERY ANN index vs the exact
# brute-force top-5, one row per index (VERDICT r05 #4: the contract
# covered only sqrt(N)-IVF). Each index pipeline is the exact catalog
# query above (same 10 queries, same k, same parameters), so the
# oracle reuses each proven per-index SQL verbatim as a derived table
# and intersects with the brute-force top-5 — the recall VALUES
# hash-compare cross-engine, and the per-index floor rides along as a
# boolean the oracle pins to literal TRUE (the
# agg_approx_distinct_parts bound pattern). Floors are set well under
# the measured recalls (sf0.01 / sf0.1: lsh .26/.22, ivf_p1 .44/.40,
# ivf_sqrtn_p2 .60/.46, pq_adc .28/.30, ivfpq .28/.30, rerank
# .86/.56) — they assert "the index is not broken", not a tuning fact.
# Scale: the battery is a measurement harness over the 10-query block;
# each index remains its bucketed/banded candidate generation.
# ---------------------------------------------------------------------------

_BATTERY = [
    # (row name, catalog query fn, oracle SQL thunk, recall floor)
    ("ivf_p1", ann_ivf_topk, lambda: _IVF_SQL, 0.20),
    ("ivf_sqrtn_p2", ann_ivf_sqrtn_topk, lambda: _IVF_SQRTN_SQL, 0.25),
    ("ivfpq", ann_ivfpq_topk, lambda: _ivfpq_oracle(), 0.10),
    ("ivfpq_rerank", ann_ivfpq_rerank_topk, lambda: _ivfpq_rerank_oracle(), 0.30),
    ("lsh", ann_lsh_topk, lambda: _lsh_oracle(), 0.10),
    ("pq_adc", ann_pq_adc_topk, lambda: _pq_oracle(), 0.10),
]


def ann_recall_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor
    from functools import reduce

    bf = ann_bruteforce_topk(spark, sf_dir).select("q_id", "c_id")
    # r16 (VERDICT r15 #7): audit of the members' eager build collects —
    # ivf_p1, ivfpq and ivfpq_rerank build the IDENTICAL %50 coarse
    # quantizer, and pq_adc/ivfpq/ivfpq_rerank the IDENTICAL
    # (_PQ_M, _PQ_K, _PQ_STEP) codebooks. Collect each ONCE here and
    # pass the rows through (6 driver-sync collects → 2). This is
    # same-definition subexpression reuse WITHIN one invocation (the
    # rows are re-collected from parquet every run); the only collects
    # left are the two shared ones plus sqrtn's stride aggregate, which
    # a DIFFERENT quantizer definition genuinely requires.
    from etl_ml_pipeline_spark.operators.similarity import (
        collect_centroid_rows,
        pq_codebooks_from_rows,
    )

    emb = t(spark, sf_dir, "embeddings")
    # r15 §13 (guide §2.6): each member builder runs small eager
    # driver-sync jobs before returning its lazy plan; build everything
    # CONCURRENTLY so the collects overlap in the scheduler. The two
    # shared collects are futures in the SAME pool (a serial
    # collect-then-build measured 1.17x — it gave back the r15 overlap
    # win); members that need them block on the future, the others
    # (sqrtn, lsh) proceed immediately. map() keeps _BATTERY order, so
    # the composed union (and the result) is identical.
    _needs_rows = {"ivf_p1", "ivfpq", "ivfpq_rerank"}
    _needs_cbs = {"ivfpq", "ivfpq_rerank", "pq_adc"}

    with ThreadPoolExecutor(max_workers=len(_BATTERY) + 2) as pool:
        rows_f = pool.submit(
            lambda: collect_centroid_rows(
                emb.filter(F.col("vec_id") % 50 == 0).select(
                    F.col("vec_id").alias("cent_id"),
                    F.col("embedding").alias("cent_vec"),
                )
            )
        )
        cbs_f = pool.submit(
            lambda: pq_codebooks_from_rows(
                emb, "embedding", "vec_id", m=_PQ_M, k=_PQ_K, id_step=_PQ_STEP
            )
        )

        def _build(m):
            name, fn = m[0], m[1]
            kw = {}
            if name in _needs_rows:
                kw["centroid_rows"] = rows_f.result()
            if name in _needs_cbs:
                kw["codebooks"] = cbs_f.result()
            return fn(spark, sf_dir, **kw).select("q_id", "c_id")

        idxs = list(pool.map(_build, _BATTERY))
    rows = []
    for (name, _fn, _sql, floor), idx in zip(_BATTERY, idxs):
        rows.append(
            bf.join(idx, ["q_id", "c_id"]).agg(
                F.lit(name).alias("index_name"),
                F.lit(5).alias("k"),
                F.lit(10).alias("n_queries"),
                (F.count("*") / F.lit(50.0)).alias("recall"),
                ((F.count("*") / F.lit(50.0)) >= F.lit(floor)).alias("floor_ok"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), rows).orderBy("index_name")


def _battery_oracle() -> str:
    parts = []
    for name, _fn, sql, _floor in _BATTERY:
        parts.append(
            f"""
SELECT '{name}' AS index_name, 5 AS k, 10 AS n_queries,
       (SELECT count(*) FROM ({sql()}) i
        JOIN ({_BRUTE_SQL}) b USING (q_id, c_id)) / 50.0 AS recall,
       TRUE AS floor_ok"""
        )
    return " UNION ALL ".join(parts) + "\nORDER BY index_name"


# ---------------------------------------------------------------------------
# ann_ivf_persisted_topk — the index-as-tables path (operators/
# ann_index.py): build the IVF index, WRITE it (centroids + cent_id-
# partitioned lists), read it back, and serve top-k from the stored
# tables with no corpus re-assignment. The oracle replays the same
# assignment from the raw embeddings, so a green row proves the
# persisted round-trip is result-identical to an in-plan rebuild —
# the parity contract a cross-run index needs. Serve probes 2 lists
# (multi-probe recall posture); queries are vec_id in [10, 20) so the
# record is distinct from ann_ivf_topk's.
# Scale: the partitioned write is one cent_id shuffle; the lists
# directory IS the inverted index (probe = partition-pruned read).
# ---------------------------------------------------------------------------


def _run_scoped_index_dir(name: str) -> str:
    """Session-stable scratch directory for persisted-index queries.

    These catalog entries are re-run many times per session (bench,
    scale ladder, oracle gate); a fresh ``mkdtemp`` per invocation
    leaked one full parquet index tree per run (ADVICE r10 #3). Each
    invocation gets a VERSIONED subdirectory (monotonic per-name
    counter) and the previous generation is deleted on the next call
    (ADVICE r11 #1: wiping the same path at invocation start broke
    DataFrames returned by a prior invocation that still read it
    lazily — harnesses that build several invocations' results before
    collecting would silently read a mid-rewrite index). With
    generations, a previously returned DataFrame stays valid until
    the NEXT call for the same name, which is the strongest guarantee
    a one-tree-alive bound allows; the whole root is removed at
    interpreter exit."""
    import atexit
    import os
    import shutil
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"spark_graft_idx_{os.getpid()}")
    if not getattr(_run_scoped_index_dir, "_registered", False):
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _run_scoped_index_dir._registered = True  # type: ignore[attr-defined]
    gens: dict[str, int] = getattr(_run_scoped_index_dir, "_gens", None) or {}
    _run_scoped_index_dir._gens = gens  # type: ignore[attr-defined]
    gen = gens.get(name, 0) + 1
    gens[name] = gen
    if gen > 1:
        shutil.rmtree(os.path.join(root, f"{name}.g{gen - 1}"), ignore_errors=True)
    path = os.path.join(root, f"{name}.g{gen}")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def ann_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.ann_index import (
        ivf_index_read,
        ivf_index_write,
        ivf_topk_from_index,
    )

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    path = _run_scoped_index_dir("ivf_persisted")
    # r15 §12: one quantizer collect shared by the build-assign and the
    # serve-probe stages (was one driver-sync job per stage)
    cent_rows = _collect_cent_rows(centroids)
    ivf_index_write(corpus, centroids, path, centroid_rows=cent_rows)
    stored_cents, stored_lists = ivf_index_read(spark, path)
    queries = emb.filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") < 20)
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = ivf_topk_from_index(
        queries, stored_cents, stored_lists, k=5, n_probe=2,
        centroid_rows=cent_rows,
    )
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos"), "cent_id"
    ).orderBy("q_id", "rank")


_IVF_PERSISTED_SQL = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS q_id, v AS qv, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
    WHERE a.vec_id >= 10 AND a.vec_id < 20
  ) WHERE rn <= 2
),
cand AS (
  SELECT q.q_id, a.vec_id AS c_id, a.cent_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM qprobe q JOIN assigned a USING (cent_id)
),
ranked AS (
  SELECT q_id, c_id, cent_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM cand
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos, cent_id
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# ann_ivf_incremental_topk — cross-run index growth: build + persist on
# the EVEN half of the corpus, then ivf_index_append the odd half
# (assigned against the STORED centroids, no re-cluster — FAISS `add`
# semantics), then serve from the merged lists. The %50-stride centroid
# ids are all even, so the frozen quantizer equals the full-corpus one
# and the oracle is simply full-corpus assignment: a green hash proves
# build+append is result-identical to a from-scratch rebuild — the
# invariant that makes incremental indexing trustworthy. Queries are
# vec_id in [20, 30) to keep the record distinct.
# Scale: the append run assigns and writes ONLY the delta — at 100 TB
# a daily increment costs O(delta), not O(corpus).
# ---------------------------------------------------------------------------


def ann_ivf_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.ann_index import (
        ivf_index_append,
        ivf_index_read,
        ivf_index_write,
        ivf_topk_from_index,
    )

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    path = _run_scoped_index_dir("ivf_incr")
    # r15 §12: one quantizer collect shared by build, append and serve
    # (was three driver-sync jobs; parquet round-trips doubles
    # bit-exactly so the build-time rows ARE the stored quantizer)
    cent_rows = _collect_cent_rows(centroids)
    ivf_index_write(
        corpus.filter(F.col("c_id") % 2 == 0), centroids, path,
        centroid_rows=cent_rows,
    )
    ivf_index_append(
        spark, corpus.filter(F.col("c_id") % 2 == 1), path,
        centroid_rows=cent_rows,
    )
    stored_cents, stored_lists = ivf_index_read(spark, path)
    queries = emb.filter(
        (F.col("vec_id") >= 20) & (F.col("vec_id") < 30)
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = ivf_topk_from_index(
        queries, stored_cents, stored_lists, k=5, n_probe=1,
        centroid_rows=cent_rows,
    )
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos"), "cent_id"
    ).orderBy("q_id", "rank")


# ---------------------------------------------------------------------------
# ann_ivf_delete_topk — the privacy-erasure path of the persisted index
# (operators/ann_index.py: ivf_index_delete / ivf_index_vacuum): build
# the full index, logically DELETE a slice of the corpus (vec_id % 7 ==
# 3 — tombstone append, O(delta), no list rewrite), then serve top-k
# with the tombstone anti-join applied. The oracle is simply full
# assignment MINUS the deleted candidates, so a green hash proves a
# deleted vector can never be returned even before vacuum physically
# rewrites the lists — the GDPR contract an index at 100 TB needs
# (tombstone now, rewrite on the maintenance schedule; vacuum ==
# tombstone-serve parity is pinned by tests/test_ann_index.py).
# Queries are vec_id in [30, 40) to keep the record distinct; deleted
# ids can still QUERY (a query vector is external input, not an index
# row). Scale: the tombstone table broadcasts into a map-side anti-join
# ahead of the probe join — no extra shuffle on the serve path.
# ---------------------------------------------------------------------------


def ann_ivf_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.ann_index import (
        ivf_index_delete,
        ivf_index_read,
        ivf_index_tombstones,
        ivf_index_write,
        ivf_topk_from_index,
    )

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    path = _run_scoped_index_dir("ivf_delete")
    # r15 §12: one quantizer collect shared by build and serve
    cent_rows = _collect_cent_rows(centroids)
    ivf_index_write(corpus, centroids, path, centroid_rows=cent_rows)
    ivf_index_delete(corpus.filter(F.col("c_id") % 7 == 3), path)
    stored_cents, stored_lists = ivf_index_read(spark, path)
    tombs = ivf_index_tombstones(spark, path)
    queries = emb.filter(
        (F.col("vec_id") >= 30) & (F.col("vec_id") < 40)
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = ivf_topk_from_index(
        queries, stored_cents, stored_lists, k=5, n_probe=2, tombstones=tombs,
        centroid_rows=cent_rows,
    )
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos"), "cent_id"
    ).orderBy("q_id", "rank")


_IVF_DELETE_SQL = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1 AND vec_id % 7 <> 3
),
qprobe AS (
  SELECT vec_id AS q_id, v AS qv, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
    WHERE a.vec_id >= 30 AND a.vec_id < 40
  ) WHERE rn <= 2
),
cand AS (
  SELECT q.q_id, a.vec_id AS c_id, a.cent_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM qprobe q JOIN assigned a USING (cent_id)
),
ranked AS (
  SELECT q_id, c_id, cent_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM cand
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos, cent_id
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# ann_ivf_update_topk — in-place UPDATE of indexed vectors (re-embedding
# a slice of the corpus, the recurring production event when the
# embedding model revs): delete the stale ids (tombstones), vacuum (the
# id-level tombstone would otherwise suppress the re-inserted rows —
# the constraint ivf_index_delete documents), then append the new
# vectors against the FROZEN centroids. vec_id % 9 == 4 gets its
# embedding REVERSED (deterministic, DuckDB-replicable, changes both
# the assignment and the cosines); the oracle is a from-scratch
# assignment of the modified corpus, so a green hash proves
# delete -> vacuum -> append == rebuild — the invariant that makes the
# index safely mutable. Queries are vec_id in [40, 50).
# Scale: delete is an O(delta) append; vacuum is the maintenance
# rewrite (anti-join + partitioned write); append assigns only the
# delta. No step touches the unmodified lists' rows twice.
# ---------------------------------------------------------------------------


def ann_ivf_update_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.ann_index import (
        ivf_index_append,
        ivf_index_delete,
        ivf_index_read,
        ivf_index_vacuum,
        ivf_index_write,
        ivf_topk_from_index,
    )

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    path = _run_scoped_index_dir("ivf_update")
    # r15 §12: one quantizer collect shared by build, append and serve
    # (the quantizer is FROZEN across the update by contract)
    cent_rows = _collect_cent_rows(centroids)
    ivf_index_write(corpus, centroids, path, centroid_rows=cent_rows)
    stale = corpus.filter(F.col("c_id") % 9 == 4)
    ivf_index_delete(stale.select("c_id"), path)
    ivf_index_vacuum(spark, path)
    ivf_index_append(
        spark, stale.withColumn("c_vec", F.reverse(F.col("c_vec"))), path,
        centroid_rows=cent_rows,
    )
    stored_cents, stored_lists = ivf_index_read(spark, path)
    queries = emb.filter(
        (F.col("vec_id") >= 40) & (F.col("vec_id") < 50)
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    out = ivf_topk_from_index(
        queries, stored_cents, stored_lists, k=5, n_probe=2,
        centroid_rows=cent_rows,
    )
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos"), "cent_id"
    ).orderBy("q_id", "rank")


_IVF_UPDATE_SQL = """
WITH vecs AS (
  SELECT vec_id,
         CASE WHEN vec_id % 9 = 4 THEN list_reverse(embedding::DOUBLE[])
              ELSE embedding::DOUBLE[] END AS v
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS q_id, v AS qv, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) a
         CROSS JOIN cent c
    WHERE a.vec_id >= 40 AND a.vec_id < 50
  ) WHERE rn <= 2
),
cand AS (
  SELECT q.q_id, a.vec_id AS c_id, a.cent_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM qprobe q JOIN assigned a USING (cent_id)
),
ranked AS (
  SELECT q_id, c_id, cent_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM cand
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos, cent_id
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


_IVF_INCREMENTAL_SQL = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS q_id, v AS qv, cent_id FROM assigned
  WHERE vec_id >= 20 AND vec_id < 30
),
cand AS (
  SELECT q.q_id, a.vec_id AS c_id, q.cent_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM q JOIN assigned a USING (cent_id)
),
ranked AS (
  SELECT q_id, c_id, cent_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM cand
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos, cent_id
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# ann_filtered_topk — metadata-filtered ANN (the production RAG serve
# shape: "top-k nearest among documents matching a predicate"). The
# corpus side is restricted by a BROADCAST SEMI-JOIN against the
# allowed doc-id set derived from the documents table (lang in
# (en, fr)) BEFORE centroid assignment and candidate rerank, so
# disallowed vectors never cost an exact distance. Queries are drawn
# from the unfiltered corpus (a caller's query need not pass its own
# filter); vec_id in [30, 40) keeps the record distinct from the
# other ann_* entries. Pre- vs post-filtering is result-identical
# here because IVF assignment is per-vector — with a persisted index
# the same semi-join applies to the probed lists (see
# ivf_topk_from_index's tombstone path, the identical plan shape).
# Scale: filter = map-side broadcast semi-join while the documents
# table is under the broadcast bound (the RAG-serve case: a selective
# filter over a bounded metadata table); past the bound the hint
# drops and the semi-join shuffles on c_id — an UNselective predicate
# over a 100 TB corpus yields an ids-set linear in corpus size, which
# must never be forced driver-side (VERDICT r12 #3). Candidate
# generation stays the cent_id equi-join; no all-pairs.
# ---------------------------------------------------------------------------


def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.similarity import ivf_topk

    from etl_ml_pipeline_spark.queries.tables import maybe_broadcast

    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    allowed = maybe_broadcast(
        docs.filter(F.col("lang").isin("en", "fr")).select(
            F.col("doc_id").alias("c_id")
        ),
        sf_dir,
        "documents",
    )
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    queries = emb.filter(
        (F.col("vec_id") >= 30) & (F.col("vec_id") < 40)
    ).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    ).join(allowed, "c_id", "left_semi")
    out = ivf_topk(queries, corpus, centroids, k=5, n_probe=2)
    return out.select(
        "q_id", "rank", "c_id", _trunc4(F.col("cos")).alias("cos"), "cent_id"
    ).orderBy("q_id", "rank")


_FILTERED_SQL = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
allowed AS (
  SELECT doc_id AS c_id FROM documents WHERE lang IN ('en', 'fr')
),
corpus AS (
  SELECT vec_id, v FROM vecs WHERE vec_id IN (SELECT c_id FROM allowed)
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM corpus a CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS q_id, v AS qv, cent_id FROM (
    SELECT a.vec_id, a.v, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
    WHERE a.vec_id >= 30 AND a.vec_id < 40
  ) WHERE rn <= 2
),
cand AS (
  SELECT q.q_id, a.vec_id AS c_id, a.cent_id,
         list_cosine_similarity(q.qv, a.v) AS cos
  FROM q JOIN assigned a USING (cent_id)
),
ranked AS (
  SELECT q_id, c_id, cent_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rank
  FROM cand
)
SELECT q_id, rank, c_id, floor(cos * 10000) / 10000 AS cos, cent_id
FROM ranked
WHERE rank <= 5
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# embedding_drift_snapshots — distribution drift between two corpus
# snapshots (the re-embedding / model-upgrade audit: did this label's
# region move?). Snapshots A/B are the vec_id parity halves; per label
# the two per-dimension centroids are computed via posexplode + avg
# (no vectors collected, same shape as embedding_label_centroids),
# then compared: cosine(centA, centB) and the L2 displacement. At
# 100 TB both snapshots reduce map-side to |labels| x dim partials —
# the output is labels rows regardless of corpus size.
# ---------------------------------------------------------------------------


def embedding_drift_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("snap"),
        F.posexplode(as_double(F.col("embedding"))).alias("pos", "x"),
    )
    cent = dims.groupBy("label", "snap", "pos").agg(F.avg("x").alias("cx"))
    a = cent.filter(F.col("snap") == 0).select(
        "label", "pos", F.col("cx").alias("ca")
    )
    b = cent.filter(F.col("snap") == 1).select(
        "label", "pos", F.col("cx").alias("cb")
    )
    j = a.join(b, ["label", "pos"])
    return (
        j.groupBy("label")
        .agg(
            _trunc4(
                F.sum(F.col("ca") * F.col("cb"))
                / (
                    F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                    * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
                )
            ).alias("centroid_cos"),
            _trunc4(
                F.sqrt(F.sum((F.col("ca") - F.col("cb")) ** 2))
            ).alias("drift_l2"),
        )
        .orderBy("label")
    )


_DRIFT_SQL = """
WITH vecs AS (
  SELECT label, vec_id % 2 AS snap, embedding::DOUBLE[] AS v FROM embeddings
),
dims AS (
  SELECT label, snap, unnest(range(len(v))) AS pos, unnest(v) AS x FROM vecs
),
cent AS (
  SELECT label, snap, pos, avg(x) AS cx FROM dims GROUP BY 1, 2, 3
),
j AS (
  SELECT a.label, a.pos, a.cx AS ca, b.cx AS cb
  FROM (SELECT * FROM cent WHERE snap = 0) a
  JOIN (SELECT * FROM cent WHERE snap = 1) b USING (label, pos)
)
SELECT label,
       floor(sum(ca * cb) / (sqrt(sum(ca * ca)) * sqrt(sum(cb * cb)))
             * 10000) / 10000 AS centroid_cos,
       floor(sqrt(sum((ca - cb) * (ca - cb))) * 10000) / 10000 AS drift_l2
FROM j
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# ann_index_stats — index observability / maintenance planning: the
# per-list size distribution of the persisted IVF index plus the
# signals an index-maintenance job alerts on — each list's share of
# the corpus and a needs_split flag for lists over 2x the ideal size
# (the rebalance trigger; oversized lists are exactly the ones whose
# probes stop being sub-linear). Reads the stats from the STORED
# lists, so a green row also re-proves the persisted round-trip
# against the oracle's from-scratch assignment replay.
# Scale: one groupBy over the lists table keyed by cent_id (the
# index's own partition column — map-side combine makes this a
# metadata-priced scan); the ideal-size divisor is a 1-row broadcast.
# ---------------------------------------------------------------------------


def ann_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_ml_pipeline_spark.operators.ann_index import (
        ivf_index_read,
        ivf_index_write,
    )

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    path = _run_scoped_index_dir("ivf_stats")
    ivf_index_write(corpus, centroids, path)
    _, lists = ivf_index_read(spark, path)
    sizes = lists.groupBy("cent_id").agg(F.count("*").alias("list_size"))
    # r15 optimization: totals as window aggregates over the |cells|-row
    # frame instead of an agg + crossJoin diamond (which re-read and
    # re-aggregated the lists table for the totals branch). Same
    # integers — identical shares/flags.
    from pyspark.sql import Window as W

    w_all = W.partitionBy()
    return (
        sizes.withColumn("__n", F.sum("list_size").over(w_all))
        .withColumn("__k", F.count("*").over(w_all))
        .select(
            "cent_id",
            "list_size",
            (F.floor(F.col("list_size") * 10000 / F.col("__n")) / 10000).alias(
                "size_share"
            ),
            (F.col("list_size") * F.col("__k") > 2 * F.col("__n"))
            .cast("int")
            .alias("needs_split"),
        )
        .orderBy("cent_id")
    )


_INDEX_STATS_SQL = """
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM vecs WHERE vec_id % 50 = 0
),
assigned AS (
  SELECT vec_id, cent_id FROM (
    SELECT a.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cent_id ASC
           ) AS rn
    FROM vecs a CROSS JOIN cent c
  ) WHERE rn = 1
),
sizes AS (
  SELECT cent_id, count(*) AS list_size FROM assigned GROUP BY 1
),
tot AS (SELECT sum(list_size) AS n, count(*) AS k FROM sizes)
SELECT s.cent_id,
       s.list_size,
       floor(s.list_size * 10000 / t.n) / 10000 AS size_share,
       CASE WHEN s.list_size * t.k > 2 * t.n THEN 1 ELSE 0 END AS needs_split
FROM sizes s CROSS JOIN tot t
ORDER BY s.cent_id
"""


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "retrieval_eval_metrics": retrieval_eval_metrics,
    "semantic_decontam_stats": semantic_decontam_stats,
    "semantic_decontam_shortlist_stats": semantic_decontam_shortlist_stats,
    "ann_mmr_rerank_topk": ann_mmr_rerank_topk,
    "ann_filtered_topk": ann_filtered_topk,
    "ann_index_stats": ann_index_stats,
    "embedding_drift_snapshots": embedding_drift_snapshots,
    "ann_ivf_persisted_topk": ann_ivf_persisted_topk,
    "ann_ivf_incremental_topk": ann_ivf_incremental_topk,
    "ann_ivf_delete_topk": ann_ivf_delete_topk,
    "ann_ivf_update_topk": ann_ivf_update_topk,
    "ann_recall_battery": ann_recall_battery,
    "ann_recall_contract": ann_recall_contract,
    "ann_pq_adc_topk": ann_pq_adc_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivfpq_rerank_topk": ann_ivfpq_rerank_topk,
    "ann_mmr_ivf_topk": ann_mmr_ivf_topk,
    "embedding_quantize_sq8": embedding_quantize_sq8,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "embedding_label_centroids": embedding_label_centroids,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_sqrtn_topk": ann_ivf_sqrtn_topk,
    "multimodal_image_features": multimodal_image_features,
    "multimodal_png_decode": multimodal_png_decode,
    "multimodal_image_dedup": multimodal_image_dedup,
    "multimodal_image_ahash_dedup": multimodal_image_ahash_dedup,
    "dedup_images_phash": dedup_images_phash,
    "dedup_audio_fingerprint": dedup_audio_fingerprint,
    "dedup_images_phash_replay": dedup_images_phash_replay,
    "multimodal_audio_features": multimodal_audio_features,
    "multimodal_video_frames": multimodal_video_frames,
}

ORACLES = {
    "ann_bruteforce_topk": _BRUTE_SQL,
    "retrieval_eval_metrics": _RETRIEVAL_EVAL_SQL,
    "semantic_decontam_stats": _SEM_DECON_SQL,
    "semantic_decontam_shortlist_stats": _SHORTLIST_SQL,
    "ann_mmr_rerank_topk": _MMR_SQL,
    "ann_filtered_topk": _FILTERED_SQL,
    "ann_index_stats": _INDEX_STATS_SQL,
    "embedding_drift_snapshots": _DRIFT_SQL,
    "ann_ivf_persisted_topk": _IVF_PERSISTED_SQL,
    "ann_ivf_incremental_topk": _IVF_INCREMENTAL_SQL,
    "ann_ivf_delete_topk": _IVF_DELETE_SQL,
    "ann_ivf_update_topk": _IVF_UPDATE_SQL,
    "ann_recall_battery": _battery_oracle(),
    "ann_recall_contract": _recall_oracle(),
    "ann_pq_adc_topk": _pq_oracle(),
    "ann_ivfpq_topk": _ivfpq_oracle(),
    "ann_ivfpq_rerank_topk": _ivfpq_rerank_oracle(),
    "ann_mmr_ivf_topk": _ivf_mmr_oracle(),
    "embedding_quantize_sq8": _SQ8_SQL,
    "embedding_near_dup_pairs": _NEAR_DUP_SQL,
    "embedding_label_centroids": _CENTROID_SQL,
    "ann_lsh_topk": _lsh_oracle(),
    "ann_ivf_topk": _IVF_SQL,
    "ann_ivf_sqrtn_topk": _IVF_SQRTN_SQL,
    "multimodal_image_features": _MULTIMODAL_SQL,
    "multimodal_png_decode": _PNG_DECODE_SQL,
    "multimodal_image_dedup": _IMAGE_DEDUP_SQL,
    "multimodal_image_ahash_dedup": _AHASH_SQL,
    "dedup_images_phash": _PHASH_SQL,
    "dedup_audio_fingerprint": _AFP_SQL,
    "dedup_images_phash_replay": _PHASH_REPLAY_SQL,
    "multimodal_audio_features": _AUDIO_SQL,
    "multimodal_video_frames": _VIDEO_SQL,
}
