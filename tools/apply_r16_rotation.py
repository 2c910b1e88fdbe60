"""One-shot text rewrite executing tools/r16_rotation_plan.md — the third
freshness rotation, retiring the r6-cohort staleness debt at the 10-round
budget edge.

Refuses to run until CORRECTNESS_r15.json exists and is fully green
including the 15 r15 stale promotes AND the six r15 first-timers
(mm_jpeg_ac_stats, mm_jpeg_color_stats, ev_cusum_alarm_minute,
mm_jpeg_420_stats, mm_jpeg_partial_mcu_stats, mm_jpeg_progressive_stats).  After
applying, run:

    python -m pytest tests/test_registry_lint.py -q
    python -m pytest tests/test_oracle_parity.py -q
    SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle_parity.py -q

Mechanics identical to tools/apply_r15_rotation.py; mapping dry-validated
at r15 build time against the live registry (main() re-validates at
execution time).  RECOUNT dependents before executing if interim registry
edits land in r16.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: r15 surface entries whose green gates this rotation: the 15 stale
#: promotes plus the six first-round driver slots taken by the r15
#: registrations.
R15_PROMOTES = [
    "doc_lang_confusion", "doc_rolling_hash", "doc_exact_dedup",
    "doc_near_dup_minhash_lsh", "doc_near_dup_jaccard", "doc_tfidf_top_terms",
    "mm_frame_sample", "mm_media_features", "emb_top_similar_pairs",
    "ev_session_windows", "q1_pricing_summary", "approx_distinct_parts",
    "null_semantics_orders", "agg_stats_moments", "date_functions_orders",
    "mm_jpeg_ac_stats", "mm_jpeg_color_stats", "ev_cusum_alarm_minute",
    "mm_jpeg_420_stats", "mm_jpeg_partial_mcu_stats",
    "mm_jpeg_progressive_stats",
]

# oldest-green-first: the REMAINING 13 of the r6 cohort (age 10 at r16 --
# the budget edge; non-negotiable this round) plus the first 2 of the r7
# cohort in registration order.
PROMOTE = [
    "approx_quantiles_price", "str_functions_nation", "distinct_agg_lineitem",
    "q5_revenue_by_nation", "q14_promo_revenue", "window_trailing_90d_revenue",
    "topk_orders_per_customer", "set_ops_customer_activity",
    "scalar_subquery_above_avg_balance", "msg_taxonomy_lookup_join",
    "msg_dual_sink_consistency", "msg_detail", "asof_last_order_before_event",
    "doc_near_dup_simhash", "doc_stratified_sample",
]

# demoted name -> new sibling (driver=True post-flip).  Constraints honored
# (tools/r16_rotation_plan.md): the five stateful batch anchors and
# msg_detail_encrypted_verified are NEVER demoted; every family keeps >= 1
# driver anchor; freshest multi-round veterans (the r15 promotes, 6 greens
# each and just re-verified) go first.
DEMOTE = {
    "doc_lang_confusion": "doc_char_kl_gibberish",       # char-distribution scoring anchor
    "doc_rolling_hash": "doc_near_dup_simhash",          # fingerprint/near-dup anchor promotes
    "doc_exact_dedup": "doc_dedup_keep_best",            # dedup family anchor stays driver
    "doc_near_dup_jaccard": "doc_near_dup_simhash",      # near-dup anchor promotes
    "doc_near_dup_minhash_lsh": "doc_near_dup_simhash",  # near-dup anchor promotes
    "doc_tfidf_top_terms": "doc_zipf_fit",               # term-statistics anchor stays driver
    "mm_frame_sample": "mm_jpeg_ac_stats",               # decode family keeps both r15 JPEG gates
    "mm_media_features": "mm_jpeg_color_stats",          # decode family keeps both r15 JPEG gates
    "emb_top_similar_pairs": "emb_cosine_topk_arrow",    # cosine top-k anchor stays driver
    "ev_session_windows": "ev_max_concurrent_sessions",  # session-semantics anchor stays driver
    "q1_pricing_summary": "q5_revenue_by_nation",        # TPC-H anchor moves to the promoted q5
    "approx_distinct_parts": "approx_quantiles_price",   # sketch anchor moves to the promoted quantiles
    "null_semantics_orders": "scalar_subquery_above_avg_balance",  # SQL-semantics family
    "agg_stats_moments": "distinct_agg_lineitem",        # aggregate family anchor promotes
    "date_functions_orders": "asof_last_order_before_event",  # datetime family anchor promotes
}

# existing driver=False entry -> new sibling (old anchor demoted above);
# entries in PROMOTE lose their sibling line instead of appearing here
REPOINT = {
    # doc_near_dup_minhash_lsh dependents (simhash promotes; 2 re-point)
    "doc_simhash": "doc_near_dup_simhash",
    "doc_minhash_estimate_certificate": "doc_near_dup_simhash",
    # doc_tfidf_top_terms dependents
    "doc_bpe_merge_candidates": "doc_zipf_fit",
    "doc_bigram_pmi": "doc_zipf_fit",
    "doc_lexical_diversity": "doc_zipf_fit",
    # mm_frame_sample / mm_media_features dependents
    "mm_pixel_stats": "mm_jpeg_ac_stats",
    "mm_media_headers": "mm_jpeg_color_stats",
    # emb_top_similar_pairs dependents
    "emb_hard_negatives": "emb_cosine_topk_arrow",
    "emb_bitext_margin": "emb_cosine_topk_arrow",
    "emb_knn_classifier": "emb_cosine_topk_arrow",
    "emb_pca_power_iteration": "emb_cosine_topk_arrow",
    # date_functions_orders dependents (minute/hour bucketing family)
    "ev_tumbling_hourly": "ev_cusum_alarm_minute",
    "ev_acf_lags": "ev_cusum_alarm_minute",
    "ev_seasonality_profile": "ev_cusum_alarm_minute",
    # ev_session_windows dependents
    "ev_sliding_hourly_30m": "ev_max_concurrent_sessions",
    "ev_hourly_gapfill": "ev_max_concurrent_sessions",
    "ev_burst_collapse": "ev_max_concurrent_sessions",
    # q1_pricing_summary dependents (q5/q14/scalar_subquery/set_ops promote;
    # the remaining 18 re-point to the promoted q5)
    "sql_correlated_exists": "q5_revenue_by_nation",
    "sql_q3_shipping_priority": "q5_revenue_by_nation",
    "q2_min_cost_supplier": "q5_revenue_by_nation",
    "q4_order_priority": "q5_revenue_by_nation",
    "q6_forecast_revenue": "q5_revenue_by_nation",
    "q7_volume_shipping": "q5_revenue_by_nation",
    "q8_market_share": "q5_revenue_by_nation",
    "q9_product_profit": "q5_revenue_by_nation",
    "q10_returned_items": "q5_revenue_by_nation",
    "q11_important_values": "q5_revenue_by_nation",
    "q12_ship_lag_priority": "q5_revenue_by_nation",
    "q13_customer_distribution": "q5_revenue_by_nation",
    "q15_top_supplier": "q5_revenue_by_nation",
    "q17_small_quantity_revenue": "q5_revenue_by_nation",
    "q19_disjunctive_revenue": "q5_revenue_by_nation",
    "q20_excess_qty_suppliers": "q5_revenue_by_nation",
    "q21_waiting_supplier": "q5_revenue_by_nation",
    "q22_dormant_accounts": "q5_revenue_by_nation",
    # approx_distinct_parts dependents (quantiles promotes; 4 re-point)
    "ev_heavy_hitters_cms": "approx_quantiles_price",
    "ev_hll_distinct_users": "approx_quantiles_price",
    "ev_sliding_distinct_users": "approx_quantiles_price",
    "agg_histogram_quantile_sketch": "approx_quantiles_price",
}

PROMOTE_COMMENT = (
    "    # r16 rotation: promoted for stale re-verification "
    "(tools/r16_rotation_plan.md).\n"
)
DEMOTE_COMMENT = (
    "    # r16 driver-slot rotation (tools/r16_rotation_plan.md): freshness\n"
    "    # cycle -- multi-round veteran sits out for a stale re-verification.\n"
)
REPOINT_COMMENT = "    # r16 sibling re-point: prior anchor demoted this rotation.\n"


def main() -> None:
    import rotation_lib as lib

    assert len(PROMOTE) == len(DEMOTE) == 15
    # --validate-only checks the mapping against the live registry without
    # the CORRECTNESS_r15 precondition (it writes nothing, so dry-running
    # it mid-r15 is safe and is how the mapping was validated at build time)
    lib.validate_mapping(PROMOTE, DEMOTE, REPOINT)
    if "--validate-only" in sys.argv:
        print("mapping valid against the live registry; no files written")
        return
    lib.check_correctness_green(15, R15_PROMOTES)
    lib.apply(PROMOTE, DEMOTE, REPOINT,
              PROMOTE_COMMENT, DEMOTE_COMMENT, REPOINT_COMMENT)


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "tools"))
    main()
