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

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PLANS = ROOT / "flink_kafka_consumer_cassandra_output_spark" / "plans"

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

DEMOTE_COMMENT = (
    "    # r14 driver-slot rotation (tools/r14_rotation_plan.md): freshness\n"
    "    # cycle -- multi-round veteran sits out for a stale re-verification.\n"
)
REPOINT_COMMENT = "    # r14 sibling re-point: prior anchor demoted this rotation.\n"


def check_precondition() -> None:
    path = ROOT / "CORRECTNESS_r13.json"
    if not path.exists():
        raise SystemExit(
            "PRECONDITION FAILED: CORRECTNESS_r13.json not present -- do NOT "
            "pre-apply the r14 rotation before the r13 surface is externally "
            "verified (rounds 9-13 discipline)."
        )
    data = json.loads(path.read_text())
    bad = {
        n: v for n, v in data.items()
        if not (isinstance(v, dict) and v.get("rows_match")
                and v.get("schema_match") is not False
                and (v.get("hash_match") or v.get("hash_match") is None)
                and not v.get("err"))
    }
    if bad:
        raise SystemExit(f"PRECONDITION FAILED: non-green r13 entries: {sorted(bad)}")
    missing = [n for n in R13_FIRST_TIMERS if n not in data]
    if missing:
        raise SystemExit(
            f"PRECONDITION FAILED: r13 first-timers absent from the sweep: {missing}"
        )


def validate_mapping() -> None:
    """Re-validate the mapping against the LIVE registry (names resolve,
    post-flip driver surface is exactly 50, every post-flip sibling edge
    points at a driver=True entry) before touching any file."""
    sys.path.insert(0, str(ROOT))
    from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

    specs = all_specs()
    for name in [*PROMOTE, *DEMOTE, *DEMOTE.values(), *REPOINT, *REPOINT.values()]:
        if name not in specs:
            raise SystemExit(f"VALIDATE FAILED: unknown query name {name!r}")
    for name in PROMOTE:
        if specs[name].driver:
            raise SystemExit(f"VALIDATE FAILED: promote target {name} already driver")
    for name in DEMOTE:
        if not specs[name].driver:
            raise SystemExit(f"VALIDATE FAILED: demote target {name} not driver")
    post_driver = {n for n, s in specs.items() if s.driver}
    post_driver -= set(DEMOTE)
    post_driver |= set(PROMOTE)
    if len(post_driver) != 50:
        raise SystemExit(f"VALIDATE FAILED: post-flip driver count {len(post_driver)}")
    for src, dst in {**DEMOTE, **REPOINT}.items():
        if dst not in post_driver:
            raise SystemExit(
                f"VALIDATE FAILED: sibling target {dst} (for {src}) not driver post-flip"
            )
    # every dependent of a demoted anchor must be promoted or re-pointed
    for n, s in specs.items():
        if not s.driver and s.sibling in DEMOTE:
            if n not in PROMOTE and n not in REPOINT:
                raise SystemExit(
                    f"VALIDATE FAILED: {n} still points at demoted {s.sibling}"
                )


def blocks(text: str):
    for m in re.finditer(r"^@register\(\n    \"([a-z0-9_]+)\",", text, re.M):
        close = re.compile(r"^\)\n(?=def |@)", re.M).search(text, m.end())
        yield m.start(), close.end(), m.group(1)


def rewrite(path: Path) -> bool:
    text = path.read_text()
    out, changed = text, False
    for start, end, name in sorted(blocks(text), key=lambda t: -t[0]):
        block = out[start:end]
        new = block
        if name in PROMOTE:
            lines, keep, buf = new.split("\n"), [], []
            for ln in lines:
                s = ln.strip()
                if s.startswith("#"):
                    buf.append(ln)
                    continue
                if re.match(r"driver=False\b", s) or re.match(r"sibling=", s):
                    buf = []
                    continue
                keep.extend(buf)
                buf = []
                keep.append(ln)
            keep.extend(buf)
            new = "\n".join(keep)
            assert new.endswith(")\n"), name
            new = (new[:-2]
                   + "    # r14 rotation: promoted for stale re-verification "
                   "(tools/r14_rotation_plan.md).\n)\n")
        elif name in DEMOTE:
            assert new.endswith(")\n"), name
            new = (new[:-2] + DEMOTE_COMMENT + "    driver=False,\n"
                   + f'    sibling="{DEMOTE[name]}",\n' + ")\n")
        elif name in REPOINT:
            new2 = re.sub(r'^(    sibling=)"[a-z0-9_]+",$',
                          REPOINT_COMMENT + rf'\1"{REPOINT[name]}",',
                          new, count=1, flags=re.M)
            if new2 == new:
                raise SystemExit(f"repoint failed for {name} in {path}")
            new = new2
        if new != block:
            out = out[:start] + new + out[end:]
            changed = True
    if changed:
        path.write_text(out)
    return changed


def main() -> None:
    check_precondition()
    assert len(PROMOTE) == len(DEMOTE) == 15
    validate_mapping()
    if "--validate-only" in sys.argv:
        print("mapping valid against the live registry; no files written")
        return
    hits = set()
    for path in sorted(PLANS.glob("*.py")):
        for _, _, name in blocks(path.read_text()):
            if name in PROMOTE or name in DEMOTE or name in REPOINT:
                hits.add(name)
        if rewrite(path):
            print("rewrote", path.name)
    want = set(PROMOTE) | set(DEMOTE) | set(REPOINT)
    missing = want - hits
    if missing:
        raise SystemExit(f"blocks not found: {sorted(missing)}")
    print("applied; now run registry lint + both parity sweeps before committing")


if __name__ == "__main__":
    main()
