"""One-shot r8 rotation of the driver-facing surface (VERDICT r7 item 1).

Executes tools/r8_rotation_plan.md now that CORRECTNESS_r07.json confirmed
the r7 surface 50/50 hash-green: the 13 planned round-7 additions that have
never been driver-oracle-checked are promoted to ``driver=True``; 13
driver-green entries are demoted to local-only (``driver=False`` + sibling),
and every pre-existing local-only entry whose sibling gets demoted is
re-pointed at a still-driver twin in the same pass.

Deviations from the plan table, chosen for better family fits (noted in
COVERAGE.md): the 13th demotion is q17_small_quantity_revenue -> q20
(both per-group threshold-vs-scalar-subquery shapes; the table listed only
12 rows for 13 promotions); emb_cosine_topk's pure-embedding dependents
re-point at emb_ann_ivf_trained (its verify step computes exact cosine on
candidates) rather than doc_bm25_topk, which takes only the score-fusion
dependent emb_rank_fusion_rrf; window_trailing_90d_revenue returns to the
window family (window_functions_extended); doc_near_dup_minhash_lsh goes to
the promoted doc_minhash_estimate_certificate (same MinHash sketch).

Purely textual: edits the @register decorator blocks in plans/*.py.
Run once from the repo root; idempotence is NOT guaranteed.
"""

from __future__ import annotations

import re
import sys

PLANS = "flink_kafka_consumer_cassandra_output_spark/plans"

PROMOTE = {
    "doc_gopher_quality_rules",
    "doc_lm_rarity",
    "doc_bm25_topk",
    "doc_repeated_passages",
    "doc_decontamination_ngram",
    "doc_corpus_report",
    "doc_sentiment_lexicon",
    "doc_temperature_mixing",
    "ev_range_interval_join",
    "ev_heavy_hitters_cms",
    "ev_ts_pattern_match",
    "doc_dup_graph_triangles",
    "doc_minhash_estimate_certificate",
}

# demoted driver-green entry -> (new sibling, one-line rationale)
DEMOTE = {
    "doc_curation_funnel": (
        "doc_gopher_quality_rules",
        "the funnel's quality-filter stage is now driver-checked standalone",
    ),
    "doc_stratified_sample": (
        "doc_temperature_mixing",
        "per-source deterministic sampling family, driver-checked there",
    ),
    "doc_decontamination": (
        "doc_decontamination_ngram",
        "same benchmark-overlap op; the web-scale n-gram route is driver-checked",
    ),
    "doc_sequence_packing": (
        "doc_corpus_report",
        "token-accounting family over documents, driver-checked there",
    ),
    "ev_funnel_conversion": (
        "ev_range_interval_join",
        "time-window step matching IS a range join, driver-checked there",
    ),
    "ev_top_sessions_by_events": (
        "ev_heavy_hitters_cms",
        "per-key frequency ranking family, driver-checked there",
    ),
    "ev_hourly_gapfill": (
        "ev_ts_pattern_match",
        "ordered event-time sequence family, driver-checked there",
    ),
    "ev_event_transitions": (
        "ev_ts_pattern_match",
        "lag/lead transition detection generalized there, driver-checked",
    ),
    "q12_ship_lag_priority": (
        "q4_order_priority",
        "date-range + priority bucketing family, driver-checked there",
    ),
    "doc_near_dup_simhash": (
        "doc_dedup_clusters",
        "banded-sketch near-dup family; clusters compose the verified pairs",
    ),
    "q15_top_supplier": (
        "q18_large_volume_customers",
        "aggregate-threshold top-group family, driver-checked there",
    ),
    "emb_cosine_topk": (
        "emb_ann_ivf_trained",
        "IVF's verify step computes the same exact-cosine fold on candidates",
    ),
    "q17_small_quantity_revenue": (
        "q20_excess_qty_suppliers",
        "per-group scalar-subquery threshold family, driver-checked there",
    ),
}

# pre-existing driver=False entry -> (new sibling, rationale);
# every one of these currently points at an entry DEMOTE removes.
REPOINT = {
    "doc_split_assignment": (
        "doc_temperature_mixing",
        "deterministic hash-assignment family, driver-checked there",
    ),
    "doc_lang_confusion": (
        "doc_decontamination_ngram",
        "same n-gram shingle machinery, driver-checked there",
    ),
    "doc_exact_dedup": (
        "doc_decontamination_ngram",
        "hash-fingerprint equi-join family, driver-checked there",
    ),
    "doc_decontamination_bloom": (
        "doc_decontamination_ngram",
        "same contamination op; the exact join route is driver-checked",
    ),
    "doc_phrase_search": (
        "doc_decontamination_ngram",
        "positional n-gram match family, driver-checked there",
    ),
    "doc_pii_redaction": (
        "doc_decontamination_ngram",
        "pattern-scan-over-text family, driver-checked there",
    ),
    "doc_corpus_diff": (
        "doc_decontamination_ngram",
        "fingerprint anti-join family, driver-checked there",
    ),
    "doc_text_stats": (
        "doc_corpus_report",
        "token/length accounting, driver-checked there",
    ),
    "window_trailing_90d_revenue": (
        "window_functions_extended",
        "range-frame window family, driver-checked there",
    ),
    "asof_last_order_before_event": (
        "ev_range_interval_join",
        "as-of IS the interval-join special case, driver-checked there",
    ),
    "ev_session_windows": (
        "ev_heavy_hitters_cms",
        "per-user event grouping family, driver-checked there; "
        "sessionization itself driver-green r7",
    ),
    "date_functions_orders": (
        "q4_order_priority",
        "date arithmetic + bucketing, driver-checked there",
    ),
    "doc_simhash": (
        "doc_dedup_clusters",
        "sketch-based near-dup family; clusters compose verified pairs",
    ),
    "doc_near_dup_minhash_lsh": (
        "doc_minhash_estimate_certificate",
        "the SAME MinHash sketch, its estimates driver-certified there",
    ),
    "emb_cosine_topk_arrow": (
        "emb_ann_ivf_trained",
        "exact-cosine fold family (Arrow twin), driver-checked there",
    ),
    "emb_hard_negatives": (
        "emb_ann_ivf_trained",
        "cosine-ranked candidate family, driver-checked there",
    ),
    "emb_bitext_margin": (
        "emb_ann_ivf_trained",
        "cosine-scored pair family, driver-checked there",
    ),
    "emb_rank_fusion_rrf": (
        "doc_bm25_topk",
        "scored-top-k fusion input, BM25 side driver-checked there",
    ),
    "emb_top_similar_pairs": (
        "emb_ann_ivf_trained",
        "exact-cosine pair family, driver-checked there",
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
                block.append(f"    # r8 driver-slot rotation: {why}.")
                block.append("    driver=False,")
                block.append(f'    sibling="{sib}",')
                block.append(closing)
            else:  # repoint
                sib, why = REPOINT[name]
                newb = []
                for ln in block:
                    if re.match(r'sibling="', ln.strip()):
                        newb.append(f"    # r8 sibling re-point: {why}.")
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
