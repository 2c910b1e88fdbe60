"""One-shot text rewrite executing tools/r18_rotation_plan.md — the fifth
freshness rotation, retiring the r8-cohort staleness debt at the 10-round
budget edge.

Refuses to run until CORRECTNESS_r18's precondition file
(CORRECTNESS_r17.json) exists and is fully green including the 15 r17
stale promotes and the eight r17 first-round registrations
(mm_jpeg_color12_stats, mm_png_types_stats, mm_gif_anim_stats,
mm_jpeg_arith_stats, mm_jpeg_hier_stats, mm_jpeg_arith_prog_stats,
mm_jpeg_lossless_stats, mm_wav_codec_stats).  After applying, run:

    python -m pytest tests/test_registry_lint.py -q
    python -m pytest tests/test_oracle_parity.py -q
    SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle_parity.py -q

Mechanics shared via tools/rotation_lib.py; mapping dry-validated at r17
build time against the live registry (main() re-validates at execution
time).  RECOUNT dependents before executing if interim registry edits
land in r18.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: r17 surface entries whose green gates this rotation: the 15 stale
#: promotes and the eight new first-round registrations.
R17_PROMOTES = [
    "doc_curation_funnel", "emb_cosine_topk", "doc_decontamination",
    "doc_sequence_packing", "ev_funnel_conversion", "ev_event_transitions",
    "ev_top_sessions_by_events", "ev_hourly_gapfill", "q12_ship_lag_priority",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "doc_minhash_estimate_certificate", "doc_gopher_quality_rules",
    "doc_sentiment_lexicon", "ev_unpivot_roundtrip",
    "mm_jpeg_color12_stats", "mm_png_types_stats", "mm_gif_anim_stats",
    "mm_jpeg_arith_stats", "mm_jpeg_hier_stats", "mm_jpeg_arith_prog_stats",
    "mm_jpeg_lossless_stats", "mm_wav_codec_stats",
]

# oldest-green-first: the REMAINING 10 of the r8 cohort (age 10 at r18 --
# the budget edge; non-negotiable) plus the first 5 of the r9 cohort in
# registration order.
PROMOTE = [
    "q7_volume_shipping", "q4_order_priority", "q20_excess_qty_suppliers",
    "q16_supplier_part_variety", "q10_returned_items", "msg_stanza_xpath",
    "msg_retention", "msg_crypto_roundtrip", "ev_user_retention_cohorts",
    "agg_rollup_lineitem",
    "emb_ann_lsh", "doc_lm_rarity", "doc_decontamination_ngram",
    "ev_json_props_typed", "ev_tumbling_hourly",
]

# demoted name -> new sibling (driver=True post-flip).  Constraints
# honored (tools/r18_rotation_plan.md): the five stateful batch anchors
# and msg_detail_encrypted_verified are NEVER demoted; doc_curation_funnel
# (dedup-cluster anchor, 4 dependents), emb_cosine_topk (sole exact-cosine
# anchor, 8 dependents) and doc_minhash_estimate_certificate (sole
# near-dup anchor, 5 dependents) are KEPT -- their slots go to the
# multi-round-green r16 first-contacts mm_jpeg_restart_stats /
# mm_jpeg12_stats / doc_dsir_importance.  mm_png_filtered_stats stays as
# the sole driver-facing PNG decode anchor.
DEMOTE = {
    "doc_decontamination": "doc_decontamination_ngram",
    "doc_sequence_packing": "doc_curation_funnel",
    "doc_gopher_quality_rules": "doc_lm_rarity",
    "doc_sentiment_lexicon": "doc_lm_rarity",
    "doc_dsir_importance": "doc_curation_funnel",
    "ev_funnel_conversion": "ev_user_retention_cohorts",
    "ev_event_transitions": "ev_user_retention_cohorts",
    "ev_top_sessions_by_events": "ev_max_concurrent_sessions",
    "ev_hourly_gapfill": "ev_tumbling_hourly",
    "ev_unpivot_roundtrip": "ev_json_props_typed",
    "q12_ship_lag_priority": "q10_returned_items",
    "q15_top_supplier": "q10_returned_items",
    "q17_small_quantity_revenue": "q10_returned_items",
    "mm_jpeg_restart_stats": "mm_jpeg_ac_stats",
    "mm_jpeg12_stats": "mm_jpeg_color12_stats",
}

# existing driver=False entry -> new sibling (old anchor demoted above);
# entries in PROMOTE lose their sibling line instead of appearing here
REPOINT = {
    # mm_jpeg_restart_stats dependent (r17 interim sit-out edge; the AC
    # gate is the staying JPEG Huffman anchor)
    "mm_jpeg_progressive_stats": "mm_jpeg_ac_stats",
    # ev_hourly_gapfill dependents (hourly-window anchor promotes)
    "date_functions_orders": "ev_tumbling_hourly",
    "asof_last_order_before_event": "ev_tumbling_hourly",
    # q15_top_supplier dependents (TPC-H cluster anchors on the promoted
    # q10; q4/q7/q10/q20 promote and lose their sibling lines)
    "null_semantics_orders": "q10_returned_items",
    "q11_important_values": "q10_returned_items",
    "q13_customer_distribution": "q10_returned_items",
    "q19_disjunctive_revenue": "q10_returned_items",
    "q1_pricing_summary": "q10_returned_items",
    "q21_waiting_supplier": "q10_returned_items",
    "q22_dormant_accounts": "q10_returned_items",
    "q2_min_cost_supplier": "q10_returned_items",
    "q6_forecast_revenue": "q10_returned_items",
    "q8_market_share": "q10_returned_items",
    "q9_product_profit": "q10_returned_items",
    "sql_correlated_exists": "q10_returned_items",
    "sql_q3_shipping_priority": "q10_returned_items",
    "q5_revenue_by_nation": "q10_returned_items",
    "q14_promo_revenue": "q10_returned_items",
    "scalar_subquery_above_avg_balance": "q10_returned_items",
}

PROMOTE_COMMENT = (
    "    # r18 rotation: promoted for stale re-verification "
    "(tools/r18_rotation_plan.md).\n"
)
DEMOTE_COMMENT = (
    "    # r18 driver-slot rotation (tools/r18_rotation_plan.md): freshness\n"
    "    # cycle -- multi-round veteran sits out for a stale re-verification.\n"
)
REPOINT_COMMENT = "    # r18 sibling re-point: prior anchor demoted this rotation.\n"


def main() -> None:
    import rotation_lib as lib

    assert len(PROMOTE) == len(DEMOTE) == 15
    lib.validate_mapping(PROMOTE, DEMOTE, REPOINT)
    if "--validate-only" in sys.argv:
        print("mapping valid against the live registry; no files written")
        return
    lib.check_correctness_green(17, R17_PROMOTES)
    lib.apply(PROMOTE, DEMOTE, REPOINT,
              PROMOTE_COMMENT, DEMOTE_COMMENT, REPOINT_COMMENT)


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "tools"))
    main()
