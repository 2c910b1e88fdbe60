"""One-shot r10 rotation of the driver-facing surface.

Executes tools/r10_rotation_plan.md now that CORRECTNESS_r09.json confirmed
the r9 surface 50/50 hash-green: 14 never-driver-checked entries (all 10
round-9 additions' family anchors plus 4 r8/r9 leftovers incl. the end-to-end
entity-resolution pipeline) are promoted to ``driver=True``; 14 driver-green
veterans are demoted to local-only (``driver=False`` + sibling), and every
pre-existing local-only entry whose sibling gets demoted is re-pointed at a
still-driver twin in the same pass.

Deviations from the plan table, chosen at execution time (recorded in
COVERAGE.md): ``mm_media_headers`` stays driver — demoting it would leave
the multimodal family with NO driver anchor (its two dependents have no
other semantically-adjacent driver twin); ``msg_summary_distinct`` IS
demoted (9 consecutive driver-green rounds, the longest streak in the
registry; four msg anchors remain); the extra demotes are
``q2_min_cost_supplier`` / ``q11_important_values`` (scalar-subquery
threshold family keeps q22) and ``sql_correlated_exists`` (EXISTS family
keeps the harder q21 self-join plan driver-facing).

Purely textual: edits the @register decorator blocks in plans/*.py.
Run once from the repo root; idempotence is NOT guaranteed.
"""

from __future__ import annotations

import re
import sys

PLANS = "flink_kafka_consumer_cassandra_output_spark/plans"

PROMOTE = {
    "ev_cdc_apply_changelog",
    "ev_acf_lags",
    "basket_copurchase_lift",
    "cust_survivorship_golden",
    "doc_graph_bfs_hops",
    "cust_entity_resolution",
    "doc_graph_kcore",
    "doc_decontamination_bloom",
    "emb_hard_negatives",
    "emb_rank_fusion_rrf",
    "emb_int8_quantization",
    "doc_corpus_diff",
    "ev_scd2_asof_lookup",
    "ev_ewma_smoothing",
}

# demoted driver-green entry -> (new sibling, one-line rationale)
DEMOTE = {
    "q6_forecast_revenue": (
        "q19_disjunctive_revenue",
        "single-table filter+agg revenue family keeps q19",
    ),
    "q8_market_share": (
        "q9_product_profit",
        "multi-dim join-agg family keeps q9",
    ),
    "agg_exact_percentiles": (
        "agg_histogram_quantile_sketch",
        "quantile family keeps the sketch anchor (exact side pytest-pinned)",
    ),
    "ev_tumbling_hourly": (
        "ev_acf_lags",
        "hourly time-bucketed aggregation exercised by the densified ACF spine",
    ),
    "ev_json_props_typed": (
        "ev_ts_pattern_match",
        "events-table typed extraction green 8 consecutive rounds; from_json "
        "stays parity- and streaming-test-gated",
    ),
    "doc_lm_rarity": (
        "doc_bm25_topk",
        "token-frequency scoring family keeps BM25",
    ),
    "doc_decontamination_ngram": (
        "doc_decontamination_bloom",
        "decontamination family anchor moves to the promoted Bloom variant",
    ),
    "emb_ann_lsh": (
        "emb_ann_ivf_trained",
        "ANN family keeps IVF + PQ-ADC driver anchors",
    ),
    "msg_summary_distinct": (
        "msg_detail_encrypted_verified",
        "same decode->project->partition-key pipeline, detail side pinned "
        "row-for-row; 9 consecutive driver-green rounds",
    ),
    "sql_q3_shipping_priority": (
        "q18_large_volume_customers",
        "top-k-over-join-agg family keeps q18",
    ),
    "q2_min_cost_supplier": (
        "q22_dormant_accounts",
        "correlated scalar-subquery threshold family keeps q22",
    ),
    "q11_important_values": (
        "q22_dormant_accounts",
        "global scalar-subquery HAVING threshold family keeps q22",
    ),
    "cust_fuzzy_match_blocked": (
        "cust_entity_resolution",
        "the promoted end-to-end ER pipeline embeds the same blocked fuzzy "
        "matching stage",
    ),
    "sql_correlated_exists": (
        "q21_waiting_supplier",
        "EXISTS/NOT EXISTS family keeps the harder q21 self-join plan",
    ),
}

# pre-existing driver=False entry -> (new sibling, rationale);
# every one of these currently points at an entry DEMOTE removes.
REPOINT = {
    "q1_pricing_summary": (
        "sql_grouping_sets",
        "multi-aggregate groupBy over lineitem, driver-checked there",
    ),
    "q5_revenue_by_nation": (
        "q9_product_profit",
        "multi-dim join-agg family, driver-checked there",
    ),
    "q7_volume_shipping": (
        "q9_product_profit",
        "multi-dim join-agg family, driver-checked there",
    ),
    "agg_stats_moments": (
        "agg_histogram_quantile_sketch",
        "distribution-summary agg family, driver-checked there",
    ),
    "approx_quantiles_price": (
        "agg_histogram_quantile_sketch",
        "approximate-quantile family proper, driver-checked there",
    ),
    "ev_sliding_hourly_30m": (
        "ev_acf_lags",
        "hourly time-bucketed series family, driver-checked there",
    ),
    "ev_anomaly_zscore": (
        "ev_anomaly_zscore_online",
        "its own stream==batch twin, driver-checked since r9",
    ),
    "ev_pivot_user_type_counts": (
        "sql_grouping_sets",
        "wide/long multi-dim aggregation family, driver-checked there",
    ),
    "ev_unpivot_roundtrip": (
        "sql_grouping_sets",
        "wide/long multi-dim aggregation family, driver-checked there",
    ),
    "doc_curation_funnel": (
        "doc_corpus_report",
        "quality-metric composition family, driver-checked there",
    ),
    "doc_gopher_quality_rules": (
        "doc_corpus_report",
        "quality-metric family, driver-checked there",
    ),
    "doc_sentiment_lexicon": (
        "doc_bm25_topk",
        "lexicon/token scoring family, driver-checked there",
    ),
    "doc_lang_confusion": (
        "doc_decontamination_bloom",
        "n-gram tokenization machinery, driver-checked there",
    ),
    "doc_exact_dedup": (
        "doc_dedup_clusters",
        "dedup family proper, driver-checked there",
    ),
    "doc_decontamination": (
        "doc_decontamination_bloom",
        "decontamination family, driver-checked there",
    ),
    "doc_phrase_search": (
        "doc_decontamination_bloom",
        "n-gram matching family, driver-checked there",
    ),
    "emb_random_projection": (
        "emb_pq_adc",
        "embedding projection/compression family, driver-checked there",
    ),
    "msg_detail": (
        "msg_detail_encrypted_verified",
        "the decrypt-verified superset of the same projection",
    ),
    "msg_summary_first": (
        "msg_detail_encrypted_verified",
        "same decode->project pipeline, detail side pinned row-for-row",
    ),
    "msg_retention": (
        "msg_user_erasure",
        "partition-lifecycle deletion family, driver-checked there",
    ),
    "msg_dual_sink_consistency": (
        "msg_detail_encrypted_verified",
        "detail sink side pinned row-for-row there; dual-sink consistency "
        "also one-pass streaming-test-gated",
    ),
    "date_functions_orders": (
        "ev_acf_lags",
        "date_trunc/densification arithmetic is the datetime-function "
        "family's driver anchor this round",
    ),
    "orderby_limit_top20_orders": (
        "q18_large_volume_customers",
        "top-k with total-order tiebreak, driver-checked there",
    ),
    "q12_ship_lag_priority": (
        "q19_disjunctive_revenue",
        "CASE-bucketed conditional aggregation family, driver-checked there",
    ),
    "scalar_subquery_above_avg_balance": (
        "q22_dormant_accounts",
        "the same AVG-threshold scalar subquery, driver-checked there",
    ),
    "str_functions_nation": (
        "cust_entity_resolution",
        "string normalization family used by the ER blocking stage",
    ),
    "join_semi_big_spenders": (
        "q21_waiting_supplier",
        "semi/anti EXISTS family, driver-checked there",
    ),
    "join_anti_quiet_customers": (
        "q21_waiting_supplier",
        "semi/anti EXISTS family, driver-checked there",
    ),
}

FILES = [
    f"{PLANS}/northstar_queries.py",
    f"{PLANS}/curation_queries.py",
    f"{PLANS}/events_queries.py",
    f"{PLANS}/tpch_queries.py",
    f"{PLANS}/tpch_adapted_queries.py",
    f"{PLANS}/reference_queries.py",
]

NAME_RE = re.compile(r'^\s+"([a-z0-9_]+)",\s*$')


def blocks(lines: list[str]):
    """Yield (name, start, end) line spans of @register(...) decorators."""
    i = 0
    while i < len(lines):
        if lines[i].startswith("@register("):
            start = i
            name = None
            j = i + 1
            while j + 1 < len(lines) and not (
                lines[j] == ")" and lines[j + 1].startswith("def ")
            ):
                if name is None:
                    m = NAME_RE.match(lines[j])
                    if m:
                        name = m.group(1)
                j += 1
            yield name, start, j  # j is the ')' line
            i = j
        i += 1


def rewrite(path: str) -> int:
    with open(path) as f:
        lines = f.read().splitlines()
    changed = 0
    out: list[str] = []
    edits: dict[int, tuple[str, str, int]] = {}
    for name, s, e in blocks(lines):
        if name in PROMOTE:
            edits[s] = ("promote", name, e)
        elif name in DEMOTE:
            edits[s] = ("demote", name, e)
        elif name in REPOINT:
            edits[s] = ("repoint", name, e)
    i = 0
    while i < len(lines):
        if i in edits:
            kind, name, e = edits[i]
            block = lines[i : e + 1]
            if kind == "promote":
                # Drop driver=False / sibling= lines plus any rotation
                # comment adjacent to them (before OR after the sibling).
                newb = []
                skip_comments = False
                for idx, ln in enumerate(block):
                    stripped = ln.strip()
                    if re.match(r"driver=False,", stripped):
                        skip_comments = False
                        continue
                    if re.match(r'sibling="', stripped):
                        skip_comments = True
                        continue
                    if stripped.startswith("#"):
                        nxt = (
                            block[idx + 1].strip()
                            if idx + 1 < len(block)
                            else ""
                        )
                        if skip_comments or re.match(r'sibling="', nxt):
                            continue
                    skip_comments = False
                    newb.append(ln)
                block = newb
            elif kind == "demote":
                sib, why = DEMOTE[name]
                closing = block.pop()  # ')'
                block.append(f"    # r10 driver-slot rotation: {why}.")
                block.append("    driver=False,")
                block.append(f'    sibling="{sib}",')
                block.append(closing)
            else:  # repoint
                sib, why = REPOINT[name]
                newb = []
                for ln in block:
                    if re.match(r'sibling="', ln.strip()):
                        newb.append(f"    # r10 sibling re-point: {why}.")
                        newb.append(f'    sibling="{sib}",')
                    else:
                        newb.append(ln)
                assert len(newb) == len(block) + 1, (path, name)
                block = newb
            out.extend(block)
            changed += 1
            i = e + 1
        else:
            out.append(lines[i])
            i += 1
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    return changed


def main() -> None:
    total = 0
    for p in FILES:
        n = rewrite(p)
        print(f"{p}: {n} blocks rewritten")
        total += n
    want = len(PROMOTE) + len(DEMOTE) + len(REPOINT)
    if total != want:
        sys.exit(f"expected {want} rewrites, got {total}")


if __name__ == "__main__":
    main()
