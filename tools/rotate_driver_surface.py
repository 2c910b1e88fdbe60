"""One-shot r7 rotation of the driver-facing surface (VERDICT r6 item 1).

The 29 registry entries that had NEVER been driver-oracle-checked (they
entered the registry after the driver sweep cap was full) are promoted to
``driver=True``; 29 multi-round-green veterans are demoted to local-only
(``driver=False`` + sibling mapping).  The 21 veterans that stay are the
13 sibling targets of pre-existing local-only entries plus 8 operators
with no promoted twin (iterative CC, deterministic sampling, from_json,
Avro codec, TTL, XML parse, LSH ANN, curation funnel).

Purely textual: edits the @register decorator blocks in plans/*.py.
Run once from the repo root; idempotence is NOT guaranteed.
"""

from __future__ import annotations

import re
import sys

PLANS = "flink_kafka_consumer_cassandra_output_spark/plans"

PROMOTE = {
    "mm_media_headers",
    "doc_chunking",
    "doc_decontamination",
    "doc_sequence_packing",
    "ev_user_retention_cohorts",
    "ev_funnel_conversion",
    "ev_event_transitions",
    "ev_top_sessions_by_events",
    "ev_hourly_gapfill",
    "agg_exact_percentiles",
    "cust_fuzzy_match_blocked",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_values",
    "q12_ship_lag_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_qty_suppliers",
    "q21_waiting_supplier",
    "q22_dormant_accounts",
}

# demoted veteran -> (sibling, one-line rationale)
DEMOTE = {
    "doc_text_stats": (
        "doc_sequence_packing",
        "token counting/text features drive the packer the driver now checks",
    ),
    "doc_lang_confusion": (
        "doc_decontamination",
        "same n-gram machinery, driver-checked there",
    ),
    "doc_rolling_hash": (
        "doc_chunking",
        "sliding token-window op family, driver-checked there",
    ),
    "doc_exact_dedup": (
        "doc_decontamination",
        "hash-fingerprint equi-join dedup family, driver-checked there",
    ),
    "doc_near_dup_minhash_lsh": (
        "doc_near_dup_simhash",
        "banded-sketch near-dup family, driver-checked there",
    ),
    "doc_near_dup_jaccard": (
        "doc_dedup_clusters",
        "clusters COMPOSE this exact pair graph, so its hash is checked transitively",
    ),
    "doc_tfidf_top_terms": (
        "doc_chunking",
        "tokenize+explode+window family, driver-checked there",
    ),
    "mm_frame_sample": (
        "mm_media_headers",
        "Arrow-batched mapInPandas media plumbing, driver-checked there",
    ),
    "mm_media_features": (
        "mm_media_headers",
        "same media-parse operator, driver-checked there",
    ),
    "emb_top_similar_pairs": (
        "emb_cosine_topk",
        "bucketed cosine scoring, driver-checked there",
    ),
    "ev_session_windows": (
        "ev_top_sessions_by_events",
        "top-sessions COMPOSES this sessionization, checked transitively",
    ),
    "q1_pricing_summary": (
        "q6_forecast_revenue",
        "decimal-exact lineitem aggregate family, driver-checked there",
    ),
    "approx_distinct_parts": (
        "q16_supplier_part_variety",
        "distinct-part counting, driver-checked exactly there",
    ),
    "null_semantics_orders": (
        "q13_customer_distribution",
        "LEFT-OUTER null counting semantics, driver-checked there",
    ),
    "agg_stats_moments": (
        "agg_exact_percentiles",
        "order/dispersion statistics family, driver-checked there",
    ),
    "date_functions_orders": (
        "q12_ship_lag_priority",
        "date arithmetic + bucketing, driver-checked there",
    ),
    "approx_quantiles_price": (
        "agg_exact_percentiles",
        "percentile family: the exact sort-based form is driver-checked",
    ),
    "str_functions_nation": (
        "cust_fuzzy_match_blocked",
        "string-function family incl. edit distance, driver-checked there",
    ),
    "distinct_agg_lineitem": (
        "q16_supplier_part_variety",
        "multi-COUNT-DISTINCT, driver-checked there",
    ),
    "q5_revenue_by_nation": (
        "q7_volume_shipping",
        "multi-way broadcast revenue join family, driver-checked there",
    ),
    "q14_promo_revenue": (
        "q19_disjunctive_revenue",
        "part|x|lineitem conditional revenue, driver-checked there",
    ),
    "scalar_subquery_above_avg_balance": (
        "q11_important_values",
        "scalar-subquery HAVING threshold, driver-checked there",
    ),
    "topk_orders_per_customer": (
        "q18_large_volume_customers",
        "per-key top-k/threshold family, driver-checked there",
    ),
    "window_trailing_90d_revenue": (
        "doc_sequence_packing",
        "running-window cumsum family, driver-checked there (inverse of its old mapping)",
    ),
    "asof_last_order_before_event": (
        "ev_funnel_conversion",
        "funnel COMPOSES the as-of match, checked transitively",
    ),
    "set_ops_customer_activity": (
        "q22_dormant_accounts",
        "customer-activity set membership, driver-checked there",
    ),
    "msg_detail": (
        "msg_summary_distinct",
        "same pipeline prefix (O5/O6/O9), driver-checked there",
    ),
    "msg_dual_sink_consistency": (
        "msg_summary_distinct",
        "the summary sink IS one of its two sinks, driver-checked there",
    ),
    "msg_taxonomy_lookup_join": (
        "msg_taxonomy_all_codes",
        "same 18-code taxonomy, CASE form driver-checked there",
    ),
}

FILES = [
    f"{PLANS}/northstar_queries.py",
    f"{PLANS}/events_queries.py",
    f"{PLANS}/tpch_queries.py",
    f"{PLANS}/tpch_adapted_queries.py",
    f"{PLANS}/reference_queries.py",
]

NAME_RE = re.compile(r'^\s+"([a-z0-9_]+)",\s*$')


def blocks(lines: list[str]):
    """Yield (name, start, end) line spans of @register(...) decorators.

    A bare ")" line can occur INSIDE a multi-line oracle SQL string, so
    the decorator's closing paren is identified as the ")" line whose
    next line starts the decorated function ("def ")."""
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
    spans = list(blocks(lines))
    edits: dict[int, tuple[str, str, int]] = {}  # start -> (kind, name, end)
    for name, s, e in spans:
        if name in PROMOTE:
            edits[s] = ("promote", name, e)
        elif name in DEMOTE:
            edits[s] = ("demote", name, e)
    i = 0
    while i < len(lines):
        if i in edits:
            kind, name, e = edits[i]
            block = lines[i : e + 1]
            if kind == "promote":
                newb = []
                skip_comments = False
                for ln in block:
                    stripped = ln.strip()
                    if re.match(r"driver=False,", stripped):
                        skip_comments = False
                        continue
                    if re.match(r'sibling="', stripped):
                        skip_comments = True
                        continue
                    if skip_comments and stripped.startswith("#"):
                        continue
                    skip_comments = False
                    newb.append(ln)
                block = newb
            else:
                sib, why = DEMOTE[name]
                closing = block.pop()  # ')'
                block.append(f"    # r7 driver-slot rotation: {why}.")
                block.append("    driver=False,")
                block.append(f'    sibling="{sib}",')
                block.append(closing)
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
    want = len(PROMOTE) + len(DEMOTE)
    if total != want:
        sys.exit(f"expected {want} rewrites, got {total}")


if __name__ == "__main__":
    main()
