"""One-shot r9 rotation of the driver-facing surface (VERDICT r8 item 1).

Executes tools/r9_rotation_plan.md now that CORRECTNESS_r08.json confirmed
the r8 surface 50/50 hash-green: 14 never-driver-checked entries (the 10
round-8 additions' family anchors plus 4 round-7 leftovers) are promoted to
``driver=True``; 14 driver-green veterans are demoted to local-only
(``driver=False`` + sibling), and every pre-existing local-only entry whose
sibling gets demoted is re-pointed at a still-driver twin in the same pass.

Deviations from the plan table, chosen for better family fits (recorded in
COVERAGE.md): ``date_functions_orders`` and ``q12_ship_lag_priority`` (the
q4 dependents) re-point at ``sql_q3_shipping_priority`` — the date-filter +
priority-bucketing shape — rather than the EXISTS-family q21 the demoted q4
itself points at; ``approx_distinct_parts`` goes to the newly promoted
``ev_hll_distinct_users`` (the approximate-distinct family proper) instead
of the exact-distinct grouping-sets anchor; ``msg_detail_encrypted``'s new
sibling is the promoted ``msg_detail_encrypted_verified`` (the decrypt-
verified superset of the same projection).

Purely textual: edits the @register decorator blocks in plans/*.py.
Run once from the repo root; idempotence is NOT guaranteed.
"""

from __future__ import annotations

import re
import sys

PLANS = "flink_kafka_consumer_cassandra_output_spark/plans"

PROMOTE = {
    "dq_constraint_suite",
    "ev_scd2_user_state",
    "ev_zorder_layout",
    "doc_weighted_sample",
    "emb_pq_adc",
    "ev_hll_distinct_users",
    "agg_histogram_quantile_sketch",
    "doc_dup_graph_pagerank",
    "msg_detail_encrypted_verified",
    "msg_user_erasure",
    "emb_semantic_dedup",
    "ev_anomaly_zscore_online",
    "doc_pii_redaction",
    "doc_bpe_merge_candidates",
}

# demoted driver-green entry -> (new sibling, one-line rationale)
DEMOTE = {
    "msg_stanza_xpath": (
        "msg_taxonomy_all_codes",
        "stanza parse exercised transitively by the taxonomy CASE",
    ),
    "msg_retention": (
        "msg_summary_distinct",
        "retention also pytest-gated (tests/test_retention.py)",
    ),
    "msg_crypto_roundtrip": (
        "msg_detail_encrypted_verified",
        "the promoted gate decrypt-verifies the same surface + golden KATs",
    ),
    "ev_user_retention_cohorts": (
        "ev_ts_pattern_match",
        "per-user ordered-window family keeps two anchors",
    ),
    "ev_unpivot_roundtrip": (
        "ev_json_props_typed",
        "wide/long reshaping green r7+r8; the JSON anchor stays",
    ),
    "q4_order_priority": (
        "q21_waiting_supplier",
        "EXISTS family keeps q21 + sql_correlated_exists",
    ),
    "q10_returned_items": (
        "q18_large_volume_customers",
        "top-k family keeps q18 + sql_q3",
    ),
    "q16_supplier_part_variety": (
        "sql_grouping_sets",
        "count-distinct agg family, driver-checked there",
    ),
    "q7_volume_shipping": (
        "q8_market_share",
        "multi-dim join-agg family keeps q8/q9",
    ),
    "q20_excess_qty_suppliers": (
        "q22_dormant_accounts",
        "nested-subquery family keeps q22",
    ),
    "doc_gopher_quality_rules": (
        "doc_lm_rarity",
        "quality-filter family; both driver-green r8",
    ),
    "doc_sentiment_lexicon": (
        "doc_lm_rarity",
        "lexicon scoring exercised by the rarity machinery",
    ),
    "doc_minhash_estimate_certificate": (
        "doc_dedup_clusters",
        "certificate green r8; minhash anchored by the dedup chain",
    ),
    "agg_rollup_lineitem": (
        "sql_grouping_sets",
        "the grouping-sets superset covers rollup",
    ),
}

# pre-existing driver=False entry -> (new sibling, rationale);
# every one of these currently points at an entry DEMOTE removes.
REPOINT = {
    "msg_detail_encrypted": (
        "msg_detail_encrypted_verified",
        "the promoted decrypt-verified gate is the same projection, "
        "pinned row-for-row",
    ),
    "ev_pivot_user_type_counts": (
        "ev_json_props_typed",
        "wide/long reshaping family, driver-checked there",
    ),
    "date_functions_orders": (
        "sql_q3_shipping_priority",
        "date arithmetic + bucketing over orders, driver-checked there",
    ),
    "q12_ship_lag_priority": (
        "sql_q3_shipping_priority",
        "date-range + priority bucketing family, driver-checked there",
    ),
    "approx_distinct_parts": (
        "ev_hll_distinct_users",
        "approximate-distinct family proper, promoted this round",
    ),
    "distinct_agg_lineitem": (
        "sql_grouping_sets",
        "multi-COUNT-DISTINCT agg family, driver-checked there",
    ),
    "q5_revenue_by_nation": (
        "q8_market_share",
        "multi-dim join-agg family, driver-checked there",
    ),
    "q17_small_quantity_revenue": (
        "q22_dormant_accounts",
        "per-group scalar-subquery threshold family, driver-checked there",
    ),
    "doc_curation_funnel": (
        "doc_lm_rarity",
        "quality-filter composition; the scoring stage driver-checked there",
    ),
    "doc_near_dup_minhash_lsh": (
        "doc_dedup_clusters",
        "the verified-pair chain composing this op is driver-checked there",
    ),
    "msg_monthly_rollup": (
        "sql_grouping_sets",
        "rollup-hierarchy agg family, driver-checked there",
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
            elif kind == "demote":
                sib, why = DEMOTE[name]
                closing = block.pop()  # ')'
                block.append(f"    # r9 driver-slot rotation: {why}.")
                block.append("    driver=False,")
                block.append(f'    sibling="{sib}",')
                block.append(closing)
            else:  # repoint
                sib, why = REPOINT[name]
                newb = []
                for ln in block:
                    if re.match(r'sibling="', ln.strip()):
                        newb.append(f"    # r9 sibling re-point: {why}.")
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
