"""One-shot text rewrite executing tools/r17_rotation_plan.md — the fourth
freshness rotation, retiring the r7-cohort staleness debt at the 10-round
budget edge.

Refuses to run until CORRECTNESS_r16.json exists and is fully green
including the 15 r16 stale promotes, the r16 interim promote
(emb_ann_recall_curve, the ANN recall certificate), and the four r16
first-round registrations (mm_png_filtered_stats, mm_jpeg_restart_stats,
mm_jpeg12_stats, doc_dsir_importance).  After applying, run:

    python -m pytest tests/test_registry_lint.py -q
    python -m pytest tests/test_oracle_parity.py -q
    SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle_parity.py -q

Mechanics identical to tools/apply_r16_rotation.py; mapping dry-validated
at r16 build time against the live registry (main() re-validates at
execution time).  RECOUNT dependents before executing if interim registry
edits land in r17.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: r16 surface entries whose green gates this rotation: the 15 stale
#: promotes, the interim ANN-certificate promote, and the four new
#: first-round registrations.
R16_PROMOTES = [
    "approx_quantiles_price", "str_functions_nation", "distinct_agg_lineitem",
    "q5_revenue_by_nation", "q14_promo_revenue", "window_trailing_90d_revenue",
    "topk_orders_per_customer", "set_ops_customer_activity",
    "scalar_subquery_above_avg_balance", "msg_taxonomy_lookup_join",
    "msg_dual_sink_consistency", "msg_detail", "asof_last_order_before_event",
    "doc_near_dup_simhash", "doc_stratified_sample",
    "emb_ann_recall_curve", "mm_png_filtered_stats", "mm_jpeg_restart_stats",
    "mm_jpeg12_stats", "doc_dsir_importance",
]

# oldest-green-first: the REMAINING 11 of the r7 cohort (age 10 at r17 --
# the budget edge; non-negotiable) plus the first 4 of the r8 cohort in
# registration order.
PROMOTE = [
    "doc_curation_funnel", "emb_cosine_topk", "doc_decontamination",
    "doc_sequence_packing", "ev_funnel_conversion", "ev_event_transitions",
    "ev_top_sessions_by_events", "ev_hourly_gapfill", "q12_ship_lag_priority",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "doc_minhash_estimate_certificate", "doc_gopher_quality_rules",
    "doc_sentiment_lexicon", "ev_unpivot_roundtrip",
]

# demoted name -> new sibling (driver=True post-flip).  Constraints honored
# (tools/r17_rotation_plan.md): the five stateful batch anchors and
# msg_detail_encrypted_verified are NEVER demoted; approx_quantiles_price
# (sole sketch-family anchor, 5 dependents, no sketch entry in this
# promote batch) and set_ops_customer_activity (join/set anchor carrying
# the two r16-interim join re-points) are KEPT; the two slots they would
# have filled go to emb_cosine_topk_arrow (its cosine-top-k anchor role
# transfers to the promoted emb_cosine_topk) and doc_dedup_keep_best
# (anchor role transfers to the promoted doc_curation_funnel).
DEMOTE = {
    "str_functions_nation": "cust_entity_resolution",
    "distinct_agg_lineitem": "agg_cube_orders",
    "q5_revenue_by_nation": "q15_top_supplier",
    "q14_promo_revenue": "q15_top_supplier",
    "window_trailing_90d_revenue": "window_order_running_total",
    "topk_orders_per_customer": "window_order_running_total",
    "scalar_subquery_above_avg_balance": "q15_top_supplier",
    "msg_taxonomy_lookup_join": "msg_type_taxonomy",
    "msg_dual_sink_consistency": "msg_summary_first",
    "msg_detail": "msg_detail_encrypted",
    "asof_last_order_before_event": "ev_hourly_gapfill",
    "doc_near_dup_simhash": "doc_minhash_estimate_certificate",
    "doc_stratified_sample": "doc_curation_funnel",
    "emb_cosine_topk_arrow": "emb_cosine_topk",
    "doc_dedup_keep_best": "doc_curation_funnel",
}

# existing driver=False entry -> new sibling (old anchor demoted above);
# entries in PROMOTE lose their sibling line instead of appearing here
REPOINT = {
    # distinct_agg_lineitem dependent
    "agg_stats_moments": "agg_cube_orders",
    # asof_last_order_before_event dependent (datetime family)
    "date_functions_orders": "ev_hourly_gapfill",
    # doc_dedup_keep_best dependents (anchor transfers to the funnel)
    "doc_dedup_clusters": "doc_curation_funnel",
    "doc_exact_dedup": "doc_curation_funnel",
    # doc_near_dup_simhash dependents (minhash certificate promotes)
    "doc_near_dup_jaccard": "doc_minhash_estimate_certificate",
    "doc_near_dup_minhash_lsh": "doc_minhash_estimate_certificate",
    "doc_rolling_hash": "doc_minhash_estimate_certificate",
    "doc_simhash": "doc_minhash_estimate_certificate",
    # emb_cosine_topk_arrow dependents (exact-cosine anchor promotes)
    "emb_bitext_margin": "emb_cosine_topk",
    "emb_cluster_diversity": "emb_cosine_topk",
    "emb_hard_negatives": "emb_cosine_topk",
    "emb_knn_classifier": "emb_cosine_topk",
    "emb_outlier_centroid_dist": "emb_cosine_topk",
    "emb_pca_power_iteration": "emb_cosine_topk",
    "emb_top_similar_pairs": "emb_cosine_topk",
    # scalar_subquery / q5 dependents (TPC-H cluster anchors on the
    # promoted q15; q12/q15/q17 promote and lose their sibling lines)
    "null_semantics_orders": "q15_top_supplier",
    "q10_returned_items": "q15_top_supplier",
    "q11_important_values": "q15_top_supplier",
    "q13_customer_distribution": "q15_top_supplier",
    "q19_disjunctive_revenue": "q15_top_supplier",
    "q1_pricing_summary": "q15_top_supplier",
    "q20_excess_qty_suppliers": "q15_top_supplier",
    "q21_waiting_supplier": "q15_top_supplier",
    "q22_dormant_accounts": "q15_top_supplier",
    "q2_min_cost_supplier": "q15_top_supplier",
    "q4_order_priority": "q15_top_supplier",
    "q6_forecast_revenue": "q15_top_supplier",
    "q7_volume_shipping": "q15_top_supplier",
    "q8_market_share": "q15_top_supplier",
    "q9_product_profit": "q15_top_supplier",
    "sql_correlated_exists": "q15_top_supplier",
    "sql_q3_shipping_priority": "q15_top_supplier",
}

PROMOTE_COMMENT = (
    "    # r17 rotation: promoted for stale re-verification "
    "(tools/r17_rotation_plan.md).\n"
)
DEMOTE_COMMENT = (
    "    # r17 driver-slot rotation (tools/r17_rotation_plan.md): freshness\n"
    "    # cycle -- multi-round veteran sits out for a stale re-verification.\n"
)
REPOINT_COMMENT = "    # r17 sibling re-point: prior anchor demoted this rotation.\n"


def main() -> None:
    import rotation_lib as lib

    assert len(PROMOTE) == len(DEMOTE) == 15
    lib.validate_mapping(PROMOTE, DEMOTE, REPOINT)
    if "--validate-only" in sys.argv:
        print("mapping valid against the live registry; no files written")
        return
    lib.check_correctness_green(16, R16_PROMOTES)
    lib.apply(PROMOTE, DEMOTE, REPOINT,
              PROMOTE_COMMENT, DEMOTE_COMMENT, REPOINT_COMMENT)


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "tools"))
    main()
