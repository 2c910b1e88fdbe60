"""One-shot text rewrite executing tools/r12_rotation_plan.md.

Promotions: strip ``driver=False`` + ``sibling=`` kwargs (and their attached
rotation comments) from the named @register blocks.
Demotions: insert ``driver=False`` + ``sibling=`` before the block's closing
paren.  Re-points: rewrite the ``sibling="old"`` value in place.

Purely mechanical; correctness is enforced afterwards by
tests/test_registry_lint.py and the parity sweeps.  Safe to delete after the
rotation commit lands.
"""
from __future__ import annotations

import re
from pathlib import Path

PLANS = Path(__file__).resolve().parent.parent / "flink_kafka_consumer_cassandra_output_spark" / "plans"

PROMOTE = [
    "mm_pixel_stats", "emb_ann_recall_curve", "emb_pca_power_iteration",
    "emb_knn_classifier", "part_copurchase_pagerank",
    "doc_graph_clustering_coeff", "doc_bigram_pmi", "doc_k_anonymity",
    "ev_quota_flagging", "ev_cusum_alarm", "ev_seasonality_profile",
    "ev_cohort_revenue_curve", "ev_max_concurrent_sessions",
    "supplier_delivery_scorecard", "orders_abc_classification",
]

# demoted name -> new sibling (driver=True post-flip)
DEMOTE = {
    "doc_pii_redaction": "doc_k_anonymity",
    "doc_bpe_merge_candidates": "doc_ngram_topk",
    "doc_corpus_diff": "doc_corpus_report",
    "doc_dup_graph_triangles": "doc_graph_clustering_coeff",
    "doc_graph_bfs_hops": "doc_graph_label_propagation",
    "ev_acf_lags": "ev_ols_trend",
    "ev_ewma_smoothing": "ev_cusum_alarm",
    "ev_anomaly_zscore_online": "ev_cusum_alarm",
    "ev_zorder_layout": "doc_weighted_sample",
    "ev_cdc_apply_changelog": "ev_scd2_user_state",
    "basket_copurchase_lift": "part_copurchase_pagerank",
    "cust_survivorship_golden": "cust_entity_resolution",
    "emb_hard_negatives": "emb_knn_classifier",
    "emb_rank_fusion_rrf": "emb_ann_recall_curve",
    "emb_int8_quantization": "emb_pq_adc",
}

# existing driver=False entry -> new sibling (old anchor demoted above)
REPOINT = {
    "ev_tumbling_hourly": "ev_seasonality_profile",
    "ev_sliding_hourly_30m": "ev_seasonality_profile",
    "date_functions_orders": "ev_seasonality_profile",
    "ev_anomaly_zscore": "ev_cusum_alarm",
    "ev_anomaly_mad": "ev_cusum_alarm",
}

DEMOTE_COMMENT = "    # r12 driver-slot rotation (tools/r12_rotation_plan.md): multi-round\n    # driver-green veteran; slot freed for a never-checked promotion.\n"
REPOINT_COMMENT = "    # r12 sibling re-point: prior anchor demoted this rotation.\n"


def blocks(text: str):
    """Yield (start, end, name) for each @register block."""
    for m in re.finditer(r"^@register\(\n    \"([a-z0-9_]+)\",", text, re.M):
        name = m.group(1)
        # closing paren: first line that is exactly ")" followed by a def
        close = re.compile(r"^\)\n(?=def |@)", re.M)
        c = close.search(text, m.end())
        yield m.start(), c.end(), name


def rewrite(path: Path) -> bool:
    text = path.read_text()
    out, changed = text, False
    for start, end, name in sorted(blocks(text), key=lambda t: -t[0]):
        block = out[start:end]
        new = block
        if name in PROMOTE:
            # drop driver=False line + its comment lines, sibling line + comments
            lines = new.split("\n")
            keep, skip_comment_buf = [], []
            for ln in lines:
                stripped = ln.strip()
                if stripped.startswith("#"):
                    skip_comment_buf.append(ln)
                    continue
                if re.match(r"driver=False\b", stripped) or re.match(r"sibling=", stripped):
                    skip_comment_buf = []  # comments belonged to the dropped kwarg
                    continue
                keep.extend(skip_comment_buf)
                skip_comment_buf = []
                keep.append(ln)
            keep.extend(skip_comment_buf)
            new = "\n".join(keep)
            # annotate the promotion just before the block's closing paren
            # (the block ends with ")\n" by construction)
            assert new.endswith(")\n"), name
            new = (new[:-2]
                   + "    # r12 rotation: promoted to the driver surface "
                   "(tools/r12_rotation_plan.md).\n)\n")
        elif name in DEMOTE:
            sib = DEMOTE[name]
            insertion = (DEMOTE_COMMENT + "    driver=False,\n"
                         + f'    sibling="{sib}",\n')
            assert new.endswith(")\n"), name
            new = new[:-2] + insertion + ")\n"
        elif name in REPOINT:
            sib = REPOINT[name]
            new2 = re.sub(r'^(    sibling=)"[a-z0-9_]+",$',
                          REPOINT_COMMENT + rf'\1"{sib}",', new, count=1, flags=re.M)
            if new2 == new:
                raise SystemExit(f"repoint failed for {name} in {path}")
            new = new2
        if new != block:
            out = out[:start] + new + out[end:]
            changed = True
    if changed:
        path.write_text(out)
    return changed


def main():
    hits = set()
    for path in sorted(PLANS.glob("*.py")):
        text = path.read_text()
        for _, _, name in blocks(text):
            if name in PROMOTE or name in DEMOTE or name in REPOINT:
                hits.add(name)
        if rewrite(path):
            print("rewrote", path.name)
    want = set(PROMOTE) | set(DEMOTE) | set(REPOINT)
    missing = want - hits
    if missing:
        raise SystemExit(f"blocks not found: {sorted(missing)}")


if __name__ == "__main__":
    main()
