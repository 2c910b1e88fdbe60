"""One-shot executor for the r11 driver-surface rotation (tools/r11_rotation_plan.md).

Promotes the 14 planned never-checked entries plus ``window_rank_family``
(needed as the window-family anchor once ``window_functions_extended`` is
demoted), demotes 15 multi-round-green veterans, and re-points every
dependent ``sibling=`` edge in the same pass.  Idempotence is NOT a goal:
run once, verify with tests/test_registry_lint.py, delete nothing.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "flink_kafka_consumer_cassandra_output_spark" / "plans"

PROMOTES = {
    # name -> one-line rationale appended as a comment
    "ev_debounce_exact": "sequential fold + recursive-CTE oracle, first driver check",
    "ev_cusum_changepoint": "integer-exact changepoint statistic, first driver check",
    "ev_sliding_distinct_users": "bucket-set range-window exact distinct, first driver check",
    "doc_ngram_topk": "corpus n-gram frequency table, first driver check",
    "doc_winsorized_stats": "discrete-percentile robust stats, first driver check",
    "ev_conversion_funnel": "ordered multi-step funnel, first driver check",
    "ev_ab_test_welch": "sufficient-statistics experiment readout, first driver check",
    "cust_rfm_segmentation": "quintile segmentation, first driver check",
    "part_itemsim_cf": "item-item cosine collaborative filter, first driver check",
    "doc_graph_label_propagation": "frequency-LPA community detection, first driver check",
    "doc_dedup_keep_best": "quality-ranked cluster representative, first driver check",
    "orders_skyline_pareto": "decomposed skyline, first driver check",
    "ev_growth_accounting": "DAU new/retained/resurrected/churned, first driver check",
    "ev_ols_trend": "closed-form OLS sufficient stats, first driver check",
    "window_rank_family": "all-5-rank-functions window anchor (replaces "
    "window_functions_extended as the family's driver anchor)",
}

DEMOTES = {
    # name -> new sibling (must be driver=True after this rotation)
    "msg_avro_roundtrip": "msg_detail_encrypted_verified",
    "emb_semantic_dedup": "emb_ann_ivf_trained",
    "doc_temperature_mixing": "doc_weighted_sample",
    "ev_range_interval_join": "ev_scd2_asof_lookup",
    "ev_hll_distinct_users": "ev_sliding_distinct_users",
    "ev_heavy_hitters_cms": "agg_histogram_quantile_sketch",
    "q13_customer_distribution": "q18_large_volume_customers",
    "doc_chunking": "doc_ngram_topk",
    "q19_disjunctive_revenue": "q18_large_volume_customers",
    "q9_product_profit": "q21_waiting_supplier",
    "msg_taxonomy_all_codes": "msg_detail_encrypted_verified",
    "doc_bm25_topk": "doc_ngram_topk",
    "q22_dormant_accounts": "q21_waiting_supplier",
    "window_functions_extended": "window_rank_family",
    "doc_repeated_passages": "doc_ngram_topk",
}

REPOINTS = {
    # dependent driver=False entry -> new sibling
    "doc_stratified_sample": "doc_weighted_sample",
    "doc_split_assignment": "doc_weighted_sample",
    "ev_funnel_conversion": "ev_conversion_funnel",
    "asof_last_order_before_event": "ev_scd2_asof_lookup",
    "approx_distinct_parts": "ev_sliding_distinct_users",
    "ev_session_windows": "ev_debounce_exact",
    "ev_top_sessions_by_events": "ev_debounce_exact",
    "null_semantics_orders": "q18_large_volume_customers",
    "cust_interpurchase_gaps": "cust_rfm_segmentation",
    "doc_rolling_hash": "doc_ngram_topk",
    "doc_tfidf_top_terms": "doc_ngram_topk",
    "doc_token_lift": "doc_ngram_topk",
    "q14_promo_revenue": "q18_large_volume_customers",
    "q6_forecast_revenue": "q18_large_volume_customers",
    "q12_ship_lag_priority": "q18_large_volume_customers",
    "q5_revenue_by_nation": "q21_waiting_supplier",
    "q7_volume_shipping": "q21_waiting_supplier",
    "q8_market_share": "q21_waiting_supplier",
    "msg_type_taxonomy": "msg_detail_encrypted_verified",
    "msg_stanza_xpath": "msg_detail_encrypted_verified",
    "msg_taxonomy_lookup_join": "msg_detail_encrypted_verified",
    "doc_lm_rarity": "doc_ngram_topk",
    "doc_sentiment_lexicon": "doc_corpus_report",
    "scalar_subquery_above_avg_balance": "q21_waiting_supplier",
    "set_ops_customer_activity": "q21_waiting_supplier",
    "q2_min_cost_supplier": "q21_waiting_supplier",
    "q11_important_values": "q21_waiting_supplier",
    "q17_small_quantity_revenue": "q21_waiting_supplier",
    "q20_excess_qty_suppliers": "q21_waiting_supplier",
    "ev_quota_flagging": "window_rank_family",
    "window_order_running_total": "window_rank_family",
    "window_trailing_90d_revenue": "window_rank_family",
    "doc_bigram_pmi": "doc_ngram_topk",
}


def find_block(lines: list[str], name: str) -> tuple[int, int]:
    """Return (start, end) line indices of the @register(...) call for name."""
    pat = f'    "{name}",'
    for i, ln in enumerate(lines):
        if ln.rstrip() == pat.rstrip() and i > 0 and "@register(" in lines[i - 1]:
            # walk to the closing ')' at column 0 -- the one immediately
            # followed by the decorated `def` (bare ')' lines also occur
            # inside triple-quoted oracle SQL, so the lookahead is required)
            j = i
            while j < len(lines):
                if lines[j].rstrip() == ")" and j + 1 < len(lines) and lines[
                    j + 1
                ].startswith("def "):
                    return i - 1, j
                j += 1
            raise SystemExit(f"closing paren for {name!r} not found")
    raise SystemExit(f"register block for {name!r} not found")


def main() -> None:
    files = {p.name: p.read_text().splitlines(keepends=True) for p in PKG.glob("*.py")}

    def locate(name: str) -> tuple[str, list[str], int, int]:
        for fn, lines in files.items():
            try:
                s, e = find_block(lines, name)
                return fn, lines, s, e
            except SystemExit:
                continue
        raise SystemExit(f"{name!r} not found in any plans module")

    for name, why in PROMOTES.items():
        fn, lines, s, e = locate(name)
        new = []
        removed = 0
        for k in range(s, e + 1):
            ln = lines[k]
            if re.match(r"^    driver=False,\s*$", ln):
                removed += 1
                continue
            if re.match(r'^    sibling="[\w]+",\s*$', ln):
                removed += 1
                new.append(f"    # r11 driver-slot rotation: promoted -- {why}.\n")
                continue
            new.append(ln)
        if removed != 2:
            raise SystemExit(f"{name}: expected to remove 2 lines, removed {removed}")
        lines[s : e + 1] = new
        print(f"promoted  {name} in {fn}")

    for name, sib in DEMOTES.items():
        fn, lines, s, e = locate(name)
        blk = "".join(lines[s : e + 1])
        if "driver=False" in blk:
            raise SystemExit(f"{name}: already driver=False")
        ins = [
            f"    # r11 driver-slot rotation: multi-round driver-green veteran demoted\n",
            f"    # to drain the never-checked backlog; family anchor stays driver-side.\n",
            f"    driver=False,\n",
            f'    sibling="{sib}",\n',
        ]
        lines[e:e] = ins
        print(f"demoted   {name} -> sibling {sib} in {fn}")

    for name, sib in REPOINTS.items():
        fn, lines, s, e = locate(name)
        hit = 0
        for k in range(s, e + 1):
            m = re.match(r'^(    sibling=")([\w]+)(",\s*)$', lines[k])
            if m:
                lines[k] = f'{m.group(1)}{sib}{m.group(3)}'
                hit += 1
        if hit != 1:
            raise SystemExit(f"{name}: expected 1 sibling line, found {hit}")
        print(f"repointed {name} -> {sib} in {fn}")

    for fn, lines in files.items():
        (PKG / fn).write_text("".join(lines))
    print("done")


if __name__ == "__main__":
    main()
