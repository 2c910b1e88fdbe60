"""One-shot text rewrite executing tools/r15_rotation_plan.md — the second
freshness rotation (oldest-green-first re-verification under the 10-round
staleness budget).

Refuses to run until CORRECTNESS_r14.json exists and is fully green
including the 15 r14 stale promotes (the do-NOT-pre-apply discipline from
rounds 9-14, enforced in code).  After applying, run:

    python -m pytest tests/test_registry_lint.py -q
    python -m pytest tests/test_oracle_parity.py -q
    SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle_parity.py -q

Mechanics identical to tools/apply_r14_rotation.py; mapping dry-validated
at r14 build time against the live registry (main() re-validates at
execution time: post-flip driver count, sibling targets driver=True,
every name resolves).  RECOUNT dependents before executing if interim
registry edits land in r15.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: the 15 r14 stale promotes whose re-verification gates this rotation
R14_PROMOTES = [
    "emb_ann_ivf", "window_order_running_total", "orderby_limit_top20_orders",
    "msg_type_taxonomy", "msg_summary_first", "msg_monthly_rollup",
    "join_semi_big_spenders", "join_anti_quiet_customers",
    "ev_sliding_hourly_30m", "ev_pivot_user_type_counts",
    "doc_simhash", "agg_cube_orders", "msg_detail_encrypted",
    "emb_cosine_topk_arrow", "doc_text_stats",
]

# oldest-green-first (staleness.py ranking at r14 build time): the first
# 15 of the 28-entry r6 cohort in registration order (age 9 at r15; the
# remaining 13 go in r16 before they hit the budget edge).
PROMOTE = [
    "doc_lang_confusion", "doc_rolling_hash", "doc_exact_dedup",
    "doc_near_dup_minhash_lsh", "doc_near_dup_jaccard", "doc_tfidf_top_terms",
    "mm_frame_sample", "mm_media_features", "emb_top_similar_pairs",
    "ev_session_windows", "q1_pricing_summary", "approx_distinct_parts",
    "null_semantics_orders", "agg_stats_moments", "date_functions_orders",
]

# demoted name -> new sibling (driver=True post-flip).  Constraints honored
# (tools/r15_rotation_plan.md): the five stateful batch anchors and
# msg_detail_encrypted_verified (the AES family's only hash-checked gate)
# are NEVER demoted; every family keeps >= 1 driver anchor; freshest
# multi-round veterans go first.
DEMOTE = {
    "q21_waiting_supplier": "q1_pricing_summary",        # 7 greens; TPC-H anchor moves to the promoted q1
    "ev_sliding_distinct_users": "approx_distinct_parts",  # 3 greens; sketch anchor moves to the promoted HLL query
    "mm_pixel_stats": "mm_frame_sample",                 # 2 greens; decode family keeps two promoted anchors
    "ev_seasonality_profile": "date_functions_orders",   # 2 greens; hour/date-part bucketing anchor promotes
    "emb_knn_classifier": "emb_top_similar_pairs",       # 2 greens; top-k similarity anchor promotes
    "emb_ann_recall_curve": "emb_ann_ivf",               # 2 greens; ANN family anchored by the r14-refreshed IVF
    "doc_bigram_pmi": "doc_tfidf_top_terms",             # 2 greens; term-statistics anchor promotes
    "orders_abc_classification": "window_order_running_total",  # 2 greens; running-window family
    "ev_burst_collapse": "ev_session_windows",           # 2 greens; time-gap collapse ~ sessionization, anchor promotes
    "doc_lexical_diversity": "doc_tfidf_top_terms",      # 2 greens; term-frequency stats family
    "emb_bitext_margin": "emb_top_similar_pairs",        # 2 greens; cosine top-k margin family
    "emb_cluster_diversity": "emb_outlier_centroid_dist",  # 2 greens; centroid-math sibling stays driver
    "join_semi_big_spenders": "join_anti_quiet_customers",  # green r3+r14; anti/semi pair keeps one anchor
    "ev_pivot_user_type_counts": "agg_cube_orders",      # green r3+r14; wide/long multi-dim agg family
    "doc_simhash": "doc_near_dup_minhash_lsh",           # green r3+r14; near-dup anchor moves to the promoted LSH
}

# existing driver=False entry -> new sibling (old anchor demoted above);
# entries in PROMOTE lose their sibling line instead of appearing here
REPOINT = {
    # q21_waiting_supplier dependents (null_semantics_orders promotes; 21 re-point)
    "sql_correlated_exists": "q1_pricing_summary",
    "q5_revenue_by_nation": "q1_pricing_summary",
    "q14_promo_revenue": "q1_pricing_summary",
    "sql_q3_shipping_priority": "q1_pricing_summary",
    "scalar_subquery_above_avg_balance": "q1_pricing_summary",
    "set_ops_customer_activity": "q1_pricing_summary",
    "q2_min_cost_supplier": "q1_pricing_summary",
    "q4_order_priority": "q1_pricing_summary",
    "q6_forecast_revenue": "q1_pricing_summary",
    "q7_volume_shipping": "q1_pricing_summary",
    "q8_market_share": "q1_pricing_summary",
    "q9_product_profit": "q1_pricing_summary",
    "q10_returned_items": "q1_pricing_summary",
    "q11_important_values": "q1_pricing_summary",
    "q12_ship_lag_priority": "q1_pricing_summary",
    "q13_customer_distribution": "q1_pricing_summary",
    "q15_top_supplier": "q1_pricing_summary",
    "q17_small_quantity_revenue": "q1_pricing_summary",
    "q19_disjunctive_revenue": "q1_pricing_summary",
    "q20_excess_qty_suppliers": "q1_pricing_summary",
    "q22_dormant_accounts": "q1_pricing_summary",
    # ev_sliding_distinct_users dependents (approx_distinct_parts promotes; 4 re-point)
    "ev_heavy_hitters_cms": "approx_distinct_parts",
    "ev_hll_distinct_users": "approx_distinct_parts",
    "approx_quantiles_price": "approx_distinct_parts",
    "agg_histogram_quantile_sketch": "approx_distinct_parts",
    # mm_pixel_stats dependents (frame_sample + media_features promote; 1 re-points)
    "mm_media_headers": "mm_media_features",
    # ev_seasonality_profile dependents (date_functions_orders promotes; 2 re-point)
    "ev_tumbling_hourly": "date_functions_orders",
    "ev_acf_lags": "date_functions_orders",
    # emb_knn_classifier dependents
    "emb_hard_negatives": "emb_top_similar_pairs",
    "emb_pca_power_iteration": "emb_top_similar_pairs",
    # emb_ann_recall_curve dependent
    "emb_rank_fusion_rrf": "emb_ann_ivf",
    # doc_bigram_pmi dependent
    "doc_bpe_merge_candidates": "doc_tfidf_top_terms",
    # orders_abc_classification dependent
    "orders_skyline_pareto": "window_order_running_total",
    # doc_simhash dependents (minhash_lsh + jaccard promote; 2 re-point)
    "doc_near_dup_simhash": "doc_near_dup_minhash_lsh",
    "doc_minhash_estimate_certificate": "doc_near_dup_minhash_lsh",
}

PROMOTE_COMMENT = (
    "    # r15 rotation: promoted for stale re-verification "
    "(tools/r15_rotation_plan.md).\n"
)
DEMOTE_COMMENT = (
    "    # r15 driver-slot rotation (tools/r15_rotation_plan.md): freshness\n"
    "    # cycle -- multi-round veteran sits out for a stale re-verification.\n"
)
REPOINT_COMMENT = "    # r15 sibling re-point: prior anchor demoted this rotation.\n"


def main() -> None:
    import rotation_lib as lib

    assert len(PROMOTE) == len(DEMOTE) == 15
    # --validate-only checks the mapping against the live registry without
    # the CORRECTNESS_r14 precondition (it writes nothing, so dry-running
    # it mid-r14 is safe and is how the mapping was validated at build time)
    lib.validate_mapping(PROMOTE, DEMOTE, REPOINT)
    if "--validate-only" in sys.argv:
        print("mapping valid against the live registry; no files written")
        return
    lib.check_correctness_green(14, R14_PROMOTES)
    lib.apply(PROMOTE, DEMOTE, REPOINT,
              PROMOTE_COMMENT, DEMOTE_COMMENT, REPOINT_COMMENT)


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "tools"))
    main()
