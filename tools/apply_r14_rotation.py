"""One-shot text rewrite executing tools/r14_rotation_plan.md — the first
FRESHNESS rotation (oldest-green-first re-verification; the never-checked
backlog is already 0).

Refuses to run until CORRECTNESS_r13.json exists and is fully green
including the 15 r13 first-timers (the do-NOT-pre-apply discipline from
rounds 9-13, enforced in code).  After applying, run:

    python -m pytest tests/test_registry_lint.py -q
    python -m pytest tests/test_oracle_parity.py -q
    SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle_parity.py -q

Mechanics identical to tools/apply_r13_rotation.py; mapping dry-validated
at r13 build time against the live registry (main() re-validates at
execution time: post-flip driver count, sibling targets driver=True,
every name resolves).
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: the 15 r13 promotions whose first external check gates this rotation
R13_FIRST_TIMERS = [
    "emb_bitext_margin", "emb_random_projection", "emb_cluster_diversity",
    "emb_outlier_centroid_dist", "doc_token_lift", "doc_phrase_search",
    "doc_split_assignment", "doc_zipf_fit", "doc_lexical_diversity",
    "ev_anomaly_zscore", "ev_anomaly_mad", "ev_scd2_state_durations",
    "ev_session_path_trigrams", "ev_burst_collapse", "cust_interpurchase_gaps",
]

# oldest-green-first (staleness.py ranking at r13 build time): everything
# last checked r2-r4 (14 entries) + the registration-order-first age-7
# entry (doc_text_stats) to fill the 15th slot.  msg_detail_encrypted is
# oracle=None (no AES in DuckDB), so its driver check is rows-only — the
# strongest gate available for it, and the freshness rule is applied
# without cherry-picking around it; its ciphertext stays pinned by the
# decrypt-verified twin regardless.
PROMOTE = [
    "emb_ann_ivf",                                   # last r2
    "window_order_running_total", "orderby_limit_top20_orders",  # r3...
    "msg_type_taxonomy", "msg_summary_first", "msg_monthly_rollup",
    "join_semi_big_spenders", "join_anti_quiet_customers",
    "ev_sliding_hourly_30m", "ev_pivot_user_type_counts",
    "doc_simhash", "agg_cube_orders",                # ...r3
    "msg_detail_encrypted", "emb_cosine_topk_arrow",  # r4
    "doc_text_stats",                                # r6, tie-break rule
]

# demoted name -> new sibling (driver=True post-flip); freshest multi-round
# veterans first (most consecutive greens), every family keeps an anchor
DEMOTE = {
    "sql_grouping_sets": "agg_cube_orders",          # 11 greens (r2-r12)
    "emb_ann_ivf_trained": "emb_ann_ivf",            # 9 greens, same IVF build
    "doc_dedup_clusters": "doc_dedup_keep_best",     # 8 greens; keep_best runs the full CC pipeline
    "q18_large_volume_customers": "orderby_limit_top20_orders",  # 6 greens, group-having top-k
    "mm_media_headers": "mm_pixel_stats",            # 6 greens; decode subsumes header parse
    "msg_detail_encrypted_verified": "msg_detail_encrypted",  # 4 greens, same encrypt pipeline
    "ev_ts_pattern_match": "ev_session_path_trigrams",  # 5 greens, sequence matching
    "doc_dup_graph_pagerank": "part_copurchase_pagerank",  # 4 greens, same PageRank code path
    "dq_constraint_suite": "supplier_delivery_scorecard",  # 4 greens, conditional-aggregate audit
    "msg_user_erasure": "msg_detail_encrypted",      # 4 greens, same detail-table machinery
    "agg_histogram_quantile_sketch": "ev_sliding_distinct_users",  # 4 greens, mergeable-sketch family
    "ev_scd2_asof_lookup": "ev_scd2_state_durations",  # 3 greens, same SCD2 build
    "window_rank_family": "window_order_running_total",  # 2 greens, window family
    "doc_graph_label_propagation": "doc_graph_clustering_coeff",  # 2 greens, graph suite
    "doc_ngram_topk": "doc_token_lift",              # 2 greens, token-frequency family
}

# existing driver=False entry -> new sibling (old anchor demoted above);
# entries in PROMOTE lose their sibling line instead of appearing here
REPOINT = {
    # sql_grouping_sets dependents (3 promote; 5 re-point)
    "ev_unpivot_roundtrip": "agg_cube_orders",
    "q1_pricing_summary": "agg_cube_orders",
    "agg_rollup_lineitem": "agg_cube_orders",
    "distinct_agg_lineitem": "agg_cube_orders",
    "q16_supplier_part_variety": "agg_cube_orders",
    # emb_ann_ivf_trained dependents (2 promote; 4 re-point)
    "emb_cosine_topk": "emb_cosine_topk_arrow",
    "emb_semantic_dedup": "emb_ann_ivf",
    "emb_ann_lsh": "emb_ann_ivf",
    "emb_top_similar_pairs": "emb_cosine_topk_arrow",
    # doc_dedup_clusters dependents (1 promotes; 5 re-point)
    "doc_exact_dedup": "doc_dedup_keep_best",
    "doc_near_dup_simhash": "doc_simhash",
    "doc_near_dup_minhash_lsh": "doc_simhash",
    "doc_near_dup_jaccard": "doc_simhash",
    "doc_minhash_estimate_certificate": "doc_simhash",
    # q18 dependents (1 promotes; 10 re-point to the surviving TPC-H anchor)
    "null_semantics_orders": "q21_waiting_supplier",
    "q14_promo_revenue": "q21_waiting_supplier",
    "sql_q3_shipping_priority": "q21_waiting_supplier",
    "topk_orders_per_customer": "orderby_limit_top20_orders",
    "q6_forecast_revenue": "q21_waiting_supplier",
    "q10_returned_items": "q21_waiting_supplier",
    "q12_ship_lag_priority": "q21_waiting_supplier",
    "q13_customer_distribution": "q21_waiting_supplier",
    "q15_top_supplier": "q21_waiting_supplier",
    "q19_disjunctive_revenue": "q21_waiting_supplier",
    # mm_media_headers dependents
    "mm_frame_sample": "mm_pixel_stats",
    "mm_media_features": "mm_pixel_stats",
    # msg_detail_encrypted_verified dependents (3 promote; 8 re-point)
    "msg_detail": "msg_detail_encrypted",
    "msg_crypto_roundtrip": "msg_detail_encrypted",
    "msg_summary_distinct": "msg_summary_first",
    "msg_stanza_xpath": "msg_detail_encrypted",
    "msg_dual_sink_consistency": "msg_summary_first",
    "msg_taxonomy_lookup_join": "msg_type_taxonomy",
    "msg_avro_roundtrip": "msg_detail_encrypted",
    "msg_taxonomy_all_codes": "msg_type_taxonomy",
    # ev_ts_pattern_match dependents
    "ev_json_props_typed": "ev_session_path_trigrams",
    "ev_user_retention_cohorts": "ev_cohort_revenue_curve",
    "ev_event_transitions": "ev_session_path_trigrams",
    "ev_hourly_gapfill": "ev_sliding_hourly_30m",
    # msg_user_erasure dependent
    "msg_retention": "msg_detail_encrypted",
    # agg_histogram_quantile_sketch dependents
    "ev_heavy_hitters_cms": "ev_sliding_distinct_users",
    "approx_quantiles_price": "ev_sliding_distinct_users",
    "agg_stats_moments": "agg_cube_orders",
    "agg_exact_percentiles": "ev_anomaly_mad",
    # ev_scd2_asof_lookup dependents
    "ev_range_interval_join": "ev_scd2_state_durations",
    "asof_last_order_before_event": "ev_scd2_state_durations",
    # window_rank_family dependents (1 promotes; 2 re-point)
    "window_trailing_90d_revenue": "window_order_running_total",
    "window_functions_extended": "window_order_running_total",
    # doc_graph_label_propagation dependent
    "doc_graph_bfs_hops": "doc_graph_clustering_coeff",
    # doc_ngram_topk dependents
    "doc_rolling_hash": "doc_phrase_search",
    "doc_tfidf_top_terms": "doc_token_lift",
    "doc_chunking": "doc_zipf_fit",
    "doc_lm_rarity": "doc_token_lift",
    "doc_bm25_topk": "doc_token_lift",
    "doc_repeated_passages": "doc_phrase_search",
    "doc_bpe_merge_candidates": "doc_bigram_pmi",
}

PROMOTE_COMMENT = (
    "    # r14 rotation: promoted for stale re-verification "
    "(tools/r14_rotation_plan.md).\n"
)
DEMOTE_COMMENT = (
    "    # r14 driver-slot rotation (tools/r14_rotation_plan.md): freshness\n"
    "    # cycle -- multi-round veteran sits out for a stale re-verification.\n"
)
REPOINT_COMMENT = "    # r14 sibling re-point: prior anchor demoted this rotation.\n"


def main() -> None:
    import rotation_lib as lib

    assert len(PROMOTE) == len(DEMOTE) == 15
    # --validate-only checks the mapping against the live registry without
    # the CORRECTNESS_r13 precondition (it writes nothing, so dry-running
    # it mid-r13 is safe and is how the mapping was validated at build time)
    lib.validate_mapping(PROMOTE, DEMOTE, REPOINT)
    if "--validate-only" in sys.argv:
        print("mapping valid against the live registry; no files written")
        return
    lib.check_correctness_green(13, R13_FIRST_TIMERS)
    lib.apply(PROMOTE, DEMOTE, REPOINT,
              PROMOTE_COMMENT, DEMOTE_COMMENT, REPOINT_COMMENT)


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "tools"))
    main()
