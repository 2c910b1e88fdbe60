"""One-shot text rewrite executing tools/r13_rotation_plan.md — the FINAL
backlog tranche (never-driver-checked count goes to 0).

Refuses to run until CORRECTNESS_r12.json exists and is fully green
including the 15 r12 first-timers (the do-NOT-pre-apply discipline from
rounds 9-12, enforced in code this time).  After applying, run:

    python -m pytest tests/test_registry_lint.py -q
    python -m pytest tests/test_oracle_parity.py -q
    SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle_parity.py -q

and recount sibling edges (ListAgents of `all_specs()`) before committing.
Mechanics identical to tools/apply_r12_rotation.py.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PLANS = ROOT / "flink_kafka_consumer_cassandra_output_spark" / "plans"

#: the 15 r12 promotions whose first external check gates this rotation
R12_FIRST_TIMERS = [
    "mm_pixel_stats", "emb_ann_recall_curve", "emb_pca_power_iteration",
    "emb_knn_classifier", "part_copurchase_pagerank",
    "doc_graph_clustering_coeff", "doc_bigram_pmi", "doc_k_anonymity",
    "ev_quota_flagging", "ev_cusum_alarm", "ev_seasonality_profile",
    "ev_cohort_revenue_curve", "ev_max_concurrent_sessions",
    "supplier_delivery_scorecard", "orders_abc_classification",
]

# the ENTIRE remaining backlog promotes — 0 never-checked after this
PROMOTE = [
    "emb_bitext_margin", "emb_random_projection", "emb_cluster_diversity",
    "emb_outlier_centroid_dist", "doc_token_lift", "doc_phrase_search",
    "doc_split_assignment", "doc_zipf_fit", "doc_lexical_diversity",
    "ev_anomaly_zscore", "ev_anomaly_mad", "ev_scd2_state_durations",
    "ev_session_path_trigrams", "ev_burst_collapse", "cust_interpurchase_gaps",
]

# demoted name -> new sibling (driver=True post-flip); per
# tools/r13_rotation_plan.md with every family keeping an anchor
DEMOTE = {
    "cust_rfm_segmentation": "cust_interpurchase_gaps",
    "doc_weighted_sample": "doc_split_assignment",
    "doc_corpus_report": "doc_zipf_fit",
    "doc_decontamination_bloom": "doc_phrase_search",
    "ev_ols_trend": "ev_anomaly_zscore",
    "ev_scd2_user_state": "ev_scd2_state_durations",
    "ev_conversion_funnel": "ev_session_path_trigrams",
    "ev_growth_accounting": "ev_cohort_revenue_curve",
    "ev_ab_test_welch": "ev_anomaly_zscore",
    "ev_cusum_changepoint": "ev_cusum_alarm",
    "orders_skyline_pareto": "orders_abc_classification",
    "doc_winsorized_stats": "doc_zipf_fit",
    "part_itemsim_cf": "part_copurchase_pagerank",
    "doc_graph_kcore": "doc_graph_clustering_coeff",
    "emb_pq_adc": "emb_random_projection",
}

# existing driver=False entry -> new sibling (old anchor demoted above)
REPOINT = {
    "doc_stratified_sample": "doc_split_assignment",
    "doc_temperature_mixing": "doc_split_assignment",
    "ev_zorder_layout": "doc_split_assignment",
    "doc_corpus_diff": "doc_zipf_fit",
    "doc_text_stats": "doc_zipf_fit",
    "doc_curation_funnel": "doc_zipf_fit",
    "doc_sequence_packing": "doc_zipf_fit",
    "doc_gopher_quality_rules": "doc_zipf_fit",
    "doc_sentiment_lexicon": "doc_zipf_fit",
    "doc_lang_confusion": "doc_phrase_search",
    "doc_decontamination": "doc_phrase_search",
    "doc_decontamination_ngram": "doc_phrase_search",
    "ev_acf_lags": "ev_seasonality_profile",
    "ev_cdc_apply_changelog": "ev_scd2_state_durations",
    "ev_funnel_conversion": "ev_session_path_trigrams",
    "emb_int8_quantization": "emb_random_projection",
}

DEMOTE_COMMENT = (
    "    # r13 driver-slot rotation (tools/r13_rotation_plan.md): multi-round\n"
    "    # driver-green veteran; slot freed for the final backlog tranche.\n"
)
REPOINT_COMMENT = "    # r13 sibling re-point: prior anchor demoted this rotation.\n"


def check_precondition() -> None:
    path = ROOT / "CORRECTNESS_r12.json"
    if not path.exists():
        raise SystemExit(
            "PRECONDITION FAILED: CORRECTNESS_r12.json not present -- do NOT "
            "pre-apply the r13 rotation before the r12 surface is externally "
            "verified (rounds 9-12 discipline)."
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
        raise SystemExit(f"PRECONDITION FAILED: non-green r12 entries: {sorted(bad)}")
    missing = [n for n in R12_FIRST_TIMERS if n not in data]
    if missing:
        raise SystemExit(
            f"PRECONDITION FAILED: r12 first-timers absent from the sweep: {missing}"
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
                   + "    # r13 rotation: promoted to the driver surface "
                   "(tools/r13_rotation_plan.md).\n)\n")
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
