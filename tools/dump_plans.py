"""Regenerate PLANS.md: physical plans of representative queries at sf0.1.

Usage: python tools/dump_plans.py  (writes PLANS.md at the repo root)

The selection covers one query per plan family — scan+agg, broadcast join
chain, window, top-k, LSH candidate join, IVF, streaming-shaped session
windows — so a reviewer can audit pushdown / broadcast / shuffle shape
without rerunning the QUERIES themselves.

Caveat (r16 ADVICE): "without rerunning" is not quite "without running".
Literal-coefficient builders (doc_dsir_importance via
``materialize.collect_small``) and session-memoized stages
(doc_dedup_keep_best, emb_ann_recall_curve) execute REAL bounded Spark
jobs at DataFrame-construction time — that is exactly the plan being
audited (the folded literals / checkpoint scans ARE the physical plan),
so this tool deliberately does NOT set ``SPARK_GRAFT_SCHEMA_ONLY``:
schema-only mode would swap in lazy stand-in plans that never execute.
Expect the dump to take a few minutes of real work, not milliseconds.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402

QUERIES = [
    ("q1_pricing_summary", "scan -> decimal multi-aggregate (pushdown + pruning + partial agg)"),
    ("q5_revenue_by_nation", "five-way broadcast join chain with theta condition"),
    ("q14_promo_revenue", "fact |x| midsize-dim join (part), strategy left to Catalyst/AQE"),
    ("doc_near_dup_simhash", "simhash band join + hamming + exact Jaccard verify"),
    ("window_order_running_total", "window functions sharing one shuffle"),
    ("orderby_limit_top20_orders", "global top-k without a global sort"),
    ("doc_near_dup_minhash_lsh", "MinHash-LSH band join + exact Jaccard verify"),
    ("emb_ann_ivf", "IVF: broadcast codebook assign + probed-bucket search"),
    ("ev_session_windows", "session windows (gaps-and-islands state shape)"),
    ("doc_tfidf_top_terms", "explode -> two-level aggregate -> broadcast scalar -> per-doc top-k"),
    ("window_trailing_90d_revenue", "event-time RANGE frame (trailing 90 days)"),
    ("msg_detail_encrypted", "the reference pipeline: narrow codegen chain, zero shuffle"),
    ("sql_correlated_exists", "correlated EXISTS/NOT EXISTS decorrelated to semi + anti join"),
    ("doc_curation_funnel", "the composed curation funnel (quality -> dedup -> LSH near-dedup)"),
    ("doc_near_dup_jaccard", "prefix-filter set-similarity join (exact recall, token equi-join)"),
    ("q21_waiting_supplier", "EXISTS + NOT EXISTS chain as semi + anti join, shared probe projection"),
    ("q2_min_cost_supplier", "correlated min-subquery decorrelated to a window top-1 per key"),
    ("doc_chunking", "shuffle-free 1->N token-window fan-out inside the scan stage"),
    ("doc_decontamination", "broadcast needle set, one-pass substring scan (bounded BNL)"),
    ("ev_funnel_conversion", "one-scan windowed funnel: chained running mins, single user shuffle"),
    ("doc_gopher_quality_rules", "array-expression quality stats + one doc-keyed explode for the bigram mode"),
    ("doc_bm25_topk", "BM25: one corpus aggregate broadcast to the scan, fixed-order fold, per-query top-k"),
    ("ev_range_interval_join", "interval join decomposed to (user, hour-bucket) equi-join + residual range condition"),
    ("ev_heavy_hitters_cms", "count-min sketch: map-side-combinable build, broadcast probe join, min-over-rows"),
    ("doc_decontamination_ngram", "n-gram decontamination: shingle equi-join route (no broadcast, no substring scan)"),
    ("ev_ts_pattern_match", "time-series pattern match: bounded window frame collect, integer dot product, top-20"),
    ("emb_semantic_dedup", "SemDeDup: trained-codebook assign, broadcast within-bucket verify (repartitioned probe side)"),
    ("doc_pii_redaction", "PII redaction: pure per-row regex map, zero shuffle"),
    ("doc_phrase_search", "positional-index phrase query: broadcast phrase terms, postings equi-joins at pos+1/pos+2"),
    ("doc_decontamination_bloom", "Bloom route: broadcast left-semi probe chain, no corpus shuffle before the filter"),
    ("doc_token_lift", "association mining: within-doc pair self-join, two-level aggregate, broadcast scalar N"),
    ("ev_scd2_user_state", "changelog -> SCD2 gaps-and-islands: one user exchange for flag, numbering and lead"),
    ("dq_constraint_suite", "DQ constraints: one metrics scan + one referential anti-join"),
    ("ev_zorder_layout", "Z-order layout planner: interleaved-bit key, bucket stats, skip arithmetic"),
    ("doc_weighted_sample", "weighted systematic sampling: range-partitioned prefix sum, broadcast offsets"),
    ("emb_pq_adc", "PQ-ADC: broadcast distance tables over the compressed code table, shortlist re-rank"),
    ("ev_hll_distinct_users", "HLL: map-side register build, max-merge, one tiny aggregate"),
    ("agg_histogram_quantile_sketch", "mergeable histogram sketch: fixed-edge buckets + exact percentile check"),
    ("orders_skyline_pareto", "decomposed Pareto skyline: per-date max collapses the fact, bounded-table running max, one join back"),
    ("basket_copurchase_lift", "co-purchase mining: bounded per-order pair self-join, BIGINT lift, TakeOrderedAndProject top-100"),
    ("ev_max_concurrent_sessions", "interval sweep: day-clipped +1/-1 boundaries, per-day partitioned running sum"),
    ("ev_cdc_apply_changelog", "CDC apply: one user exchange serving row_number + count windows"),
    ("doc_graph_bfs_hops", "bounded BFS: frontier equi-join + visited anti-join per level (materialized rounds)"),
    ("ev_debounce_exact", "exact debounce: repartition-by-key + sortWithinPartitions + ONE mapInPandas partition fold"),
    ("ev_cusum_changepoint", "CUSUM: one event_type exchange serving running-sum, rank, total and argmax windows, all-BIGINT"),
    ("ev_sliding_distinct_users", "sliding exact distinct: per-hour collect_set, then a bucket-row range window merging 3 sets"),
    ("doc_bigram_pmi", "PMI collocations: two linear explodes, vocab equi-joins (no broadcast hint), ratio-ordered top-50, ln on 50 rows"),
    ("emb_cluster_diversity", "O(n) diversity identity: two-level bucketed sequential fold, no pair join anywhere"),
    ("doc_zipf_fit", "Zipf fit: word-count shuffle, TakeOrdered top-1000, bounded sorted-collect OLS folds"),
    ("mm_pixel_stats", "real BMP/PPM/WAV-PCM decode: narrow Arrow-batched mapInPandas, O(1)-width stats, zero shuffle"),
    ("mm_jpeg_restart_stats", "r16 restart-interval decode gate (baseline + progressive arms): same narrow no-shuffle shape"),
    ("mm_png_filtered_stats", "r16 all-five-PNG-filters decode gate: same narrow no-shuffle shape"),
    ("mm_jpeg_color12_stats", "r17 12-bit color SOF1 decode gate: same narrow no-shuffle shape"),
    ("mm_png_types_stats", "r17 PNG sample-layout gate (gray16/rgb16/palette arms): same narrow no-shuffle shape"),
    ("mm_gif_anim_stats", "r17 animated-GIF composition gate: same narrow no-shuffle shape"),
    ("mm_jpeg_arith_stats", "r17 arithmetic-coded SOF9 gate (QM coder): same narrow no-shuffle shape"),
    ("mm_jpeg_hier_stats", "r17 hierarchical pyramid gate (DHP/EXP/differential): same narrow no-shuffle shape"),
    ("mm_jpeg_arith_prog_stats", "r17 arithmetic progressive gate (nine-scan SOF10): same narrow no-shuffle shape"),
    ("mm_jpeg_lossless_stats", "r17 lossless predictive gate (all seven H.1 predictors): same narrow no-shuffle shape"),
    ("doc_dsir_importance", "r16 DSIR importance weights: bigram explode, map-side-combined histograms, literal-coefficient score chain"),
    ("doc_dedup_keep_best", "keep-best over the session-memoized CC label stage: checkpoint scan + one quality window"),
    ("orders_abc_classification", "ABC classification: distributed range prefix sum (operators/ordered.py), per-slice windows + broadcast offsets"),
    ("doc_lm_rarity", "LM rarity terciles: distributed range prefix rank over the doc score table (no global window)"),
    ("emb_ann_recall_curve", "recall certificate over the memoized codebook/assignment: three probed arms + exact arm union"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = local_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    specs = all_specs()
    out = io.StringIO()
    out.write(
        "# PLANS — physical plans of representative queries\n\n"
        f"Auto-generated by `tools/dump_plans.py` at `{sf_dir}`. One query per\n"
        "plan family; audit points: `PushedFilters`/`ReadSchema` on scans,\n"
        "`BroadcastHashJoin` vs `SortMergeJoin`, `Exchange` count, and\n"
        "`TakeOrderedAndProject` for top-k.\n"
    )
    for name, why in QUERIES:
        df = specs[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.write(f"\n## {name}\n\n_{why}_\n\n```\n{plan.rstrip()}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write(out.getvalue())
    print(f"wrote PLANS.md ({len(out.getvalue())} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
