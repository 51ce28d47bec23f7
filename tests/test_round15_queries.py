"""Round-15 additions: MMR over the IVF-PQ shortlist and the
IVF-shortlist semantic-decontamination contract (VERDICT r14 asks
#2/#3). Oracle parity is covered by the catalog differential; these
pin the behavioral invariants the hash can't express."""

from __future__ import annotations

import pytest

from etl_ml_pipeline_spark.queries.similarity_q import (
    _MMR_K,
    ann_mmr_ivf_topk,
    ann_mmr_rerank_topk,
    semantic_decontam_shortlist_stats,
)


def test_ivf_mmr_selection_structure(spark, sf_dir):
    out = ann_mmr_ivf_topk(spark, sf_dir).toPandas()
    assert set(out.q_id.unique()) == set(range(8))
    for _, g in out.groupby("q_id"):
        assert sorted(g.sel_rank) == list(range(1, _MMR_K + 1))
        assert g.c_id.nunique() == _MMR_K
        # every mmr score is bounded by the algebra: 0.7*cos - 0.3*msim
        # with both cosines clamped to [-1, 1] -> |mmr| <= 1.0 (NOT
        # monotone down the ranks: a diverse pick with negative
        # pairwise cosine can out-score rank-1's pure relevance)
        assert (g.mmr.abs() <= 1.0 + 1e-12).all()


def test_ivf_mmr_tracks_exact_pool_mmr(spark, sf_dir):
    """The shortlist-fed greedy should mostly agree with the exact-pool
    greedy: the 50-candidate ADC shortlist recovers most of the exact
    top-12 pool (the rerank stack measures 0.78-0.86 recall@5), and
    MMR picks from the pool top. Pin a conservative overlap floor so a
    silent shortlist regression (e.g. a probe bug collapsing cells)
    trips loudly rather than shipping as 'approximate anyway'."""
    exact = ann_mmr_rerank_topk(spark, sf_dir).toPandas()
    approx = ann_mmr_ivf_topk(spark, sf_dir).toPandas()
    overlap = 0
    for q in range(8):
        e = set(exact.loc[exact.q_id == q, "c_id"])
        a = set(approx.loc[approx.q_id == q, "c_id"])
        overlap += len(e & a)
    assert overlap >= 8 * _MMR_K // 2, overlap


def test_shortlist_decontam_contracts(spark, sf_dir):
    out = semantic_decontam_shortlist_stats(spark, sf_dir).toPandas()
    assert len(out) > 0
    # every injected scaled-copy leak is caught THROUGH the shortlist
    assert out.all_injected_caught.all()
    # a shortlist hit is a restriction of the exact scan: max over a
    # probed subset of the benchmark can never exceed the full max
    assert (out.n_contam_shortlist <= out.n_contam_exact).all()
    assert (out.shortlist_recall_ppm <= 1_000_000).all()
    assert (out.shortlist_recall_ppm >= 0).all()
    # the injected rows exist (the contract is non-vacuous)
    assert out.n_injected.sum() > 0


def test_mixture_reweight_transform_matches_doremi_query(spark, sf_dir):
    """mixture_reweight (VERDICT r14 ask #8) at the query's hard-coded
    config (3 rounds, target 700000 ppm, full step) must reproduce
    mixture_doremi_weights' weight_ppm exactly — same integer ppm
    algebra, now configurable."""
    import etl_ml_pipeline_spark.plugins  # noqa: F401 — registry bootstrap

    from etl_ml_pipeline_spark.queries.sampling_q import mixture_doremi_weights
    from etl_ml_pipeline_spark.queries.tables import t
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    docs = t(spark, sf_dir, "documents")
    tr = TRANSFORMS.get("mixture_reweight")(
        {"group_col": "source", "rounds": 3, "target_ppm": 700_000,
         "mode": "weights"}
    )
    got = {
        r["source"]: r["weight_ppm"] for r in tr(docs).collect()
    }
    want = {
        r["source"]: r["weight_ppm"]
        for r in mixture_doremi_weights(spark, sf_dir).collect()
    }
    assert got == want


def test_mixture_reweight_config_knobs(spark, sf_dir):
    import etl_ml_pipeline_spark.plugins  # noqa: F401 — registry bootstrap

    from etl_ml_pipeline_spark.queries.tables import t
    from etl_ml_pipeline_spark.registry import TRANSFORMS

    docs = t(spark, sf_dir, "documents")
    n_groups = docs.select("source").distinct().count()
    # rounds=0: no boosts -> exactly uniform ppm split
    flat = TRANSFORMS.get("mixture_reweight")(
        {"group_col": "source", "rounds": 0, "mode": "weights"}
    )(docs).collect()
    assert {r["weight_ppm"] for r in flat} == {1_000_000 // n_groups}
    # half step moves weights strictly less far from uniform than full
    full = TRANSFORMS.get("mixture_reweight")(
        {"group_col": "source", "rounds": 3, "mode": "weights"}
    )(docs).toPandas().set_index("source")
    half = TRANSFORMS.get("mixture_reweight")(
        {"group_col": "source", "rounds": 3, "step_ppm": 500_000,
         "mode": "weights"}
    )(docs).toPandas().set_index("source")
    uni = 1_000_000 // n_groups
    assert (
        (half.weight_ppm - uni).abs() <= (full.weight_ppm - uni).abs() + 1
    ).all()
    # annotate mode keeps every row and adds weight_ppm
    ann = TRANSFORMS.get("mixture_reweight")({"group_col": "source"})(docs)
    assert ann.count() == docs.count()
    assert "weight_ppm" in ann.columns
    # config errors are loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in input"):
        TRANSFORMS.get("mixture_reweight")({"group_col": "nope"})(docs)
    with _pytest.raises(ValueError, match="rounds"):
        TRANSFORMS.get("mixture_reweight")(
            {"group_col": "source", "rounds": -1}
        )(docs)


def _afp_fingerprints():
    """Pure-python replay of _audio_fp_kernel over the 120-doc model."""
    import numpy as np
    import pandas as pd

    from etl_ml_pipeline_spark.queries.similarity_q import (
        _AFP_DOCS,
        _audio_fp_kernel,
    )

    (out,) = list(
        _audio_fp_kernel(iter([pd.DataFrame({"doc_id": range(_AFP_DOCS)})]))
    )
    return dict(zip(out.doc_id, out.afp))


def test_audio_fingerprint_banded_gate_equals_brute_force(spark, sf_dir):
    """The banded Hamming gate must agree with brute-force all-pairs
    Hamming over the fingerprints (pigeonhole exactness, radius 2 < 8
    bands) — the tests/test_phash_index.py contract for the audio
    family (VERDICT r14 ask #6)."""
    from etl_ml_pipeline_spark.queries.similarity_q import (
        _AFP_RADIUS,
        dedup_audio_fingerprint,
    )

    fps = _afp_fingerprints()

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    brute = {}
    for i, fa in fps.items():
        nbs = [
            j for j, fb in fps.items()
            if j != i and ham(fa, fb) <= _AFP_RADIUS
        ]
        brute[i] = (len(nbs), min([i, *nbs]))
    got = {
        r["doc_id"]: (r["n_dup_neighbors"], r["canonical_id"])
        for r in dedup_audio_fingerprint(spark, sf_dir).collect()
    }
    assert got == brute
    # the model actually plants near-dups (non-vacuous): every class
    # has a v=0/v=1 pair within the radius
    assert sum(n for n, _ in brute.values()) > 0


def test_audio_fingerprint_variant_distances():
    """Silencing one frame flips at most the two bits it borders, so
    the planted variants sit at the designed Hamming distances."""
    fps = _afp_fingerprints()

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    for k in range(24):
        v0, v1, v2 = fps[k], fps[k + 24], fps[k + 48]
        assert ham(v0, v1) <= 2
        assert ham(v1, v2) <= 2
        assert ham(v0, v2) <= 4
        # copies are exact duplicates (distance 0)
        assert fps[k + 72] == v0 and fps[k + 96] == v1


def test_crawl_ingest_e2e_funnel(spark, sf_dir):
    """Funnel sanity for the crawl-ingest chain (VERDICT r14 ask #5):
    canonical pages never exceed fetches, verdicts split exactly, and
    the lifecycle columns tie out (appended = sum ingested)."""
    from etl_ml_pipeline_spark.queries.url_q import crawl_ingest_e2e

    out = crawl_ingest_e2e(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.n_pages <= out.n_fetched).all()
    assert (out.n_image_dup + out.n_ingested == out.n_pages).all()
    assert out.idx_appended.iloc[0] == out.n_ingested.sum()
    assert (out.idx_live == out.idx_base + out.idx_appended).all()
    # URL dedup actually collapsed variants somewhere
    assert (out.n_pages < out.n_fetched).any()
    # both gate branches fired: archived classes (< 16) are gated out,
    # new classes (>= 16) are ingested — by construction of the model
    assert out.n_image_dup.sum() > 0
    assert out.n_ingested.sum() > 0
