"""Scaling probe: does the curation query family scale ~linearly?

Usage: python tools/scale_probe_curation.py [k ...]   (default: 1 2 4 8)

The sf0.1 documents fixture (5,000 docs) is replicated k times with
re-keyed doc_ids and UNCHANGED text, written to a temp dir, and each
curation builder runs against that dir exactly as registered (the probe
times the real `plans/curation_queries.py` code, not a reimplementation).

Unchanged text is the right replication model here because none of the
four operators builds document pairs:

- doc_gopher_quality_rules / doc_lm_rarity are per-document (rows must
  grow exactly k; lm_rarity's vocab stays fixed while its counts grow k);
- doc_bm25_topk has a FIXED query set (output rows constant at
  |queries| * top-k; the scan, df/tf work grows k);
- doc_repeated_passages aggregates by passage (output capped at top-20;
  per-passage doc lists grow k inside a map-side-combinable groupBy).

A superlinear blow-up in any of these is a plan bug (an accidental
re-scan, a non-combinable agg, a pair explosion) -- what this probe
exists to catch before a 100 TB run would.

Each k is measured with min-of-REPEATS noop-sink materializations after
one warm-up.  Results print as one markdown table; paste into SCALING.md
when regenerating it.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "2"))
ID_SPACE = 10_000_000

QUERIES = (
    "doc_gopher_quality_rules",
    "doc_lm_rarity",
    "doc_bm25_topk",
    "doc_repeated_passages",
    "doc_corpus_report",
    "doc_sentiment_lexicon",
    "doc_temperature_mixing",
    # late-round-7 additions, all sound under unchanged-text replication:
    # pii is per-row (rows grow k); phrase search's top-3 trigram query set
    # is scale-invariant (counts grow k, ranking unchanged) and matches
    # grow k; token lift's counts all scale k so lift -- a ratio -- is
    # invariant and output stays top-20; bpe pair counts grow k with a
    # fixed alphabet^2 key space; bloom's needle gram set is IDENTICAL
    # across replicas (distinct'd away -> constant filter) while
    # contaminated docs grow k.
    "doc_pii_redaction",
    "doc_phrase_search",
    "doc_token_lift",
    "doc_bpe_merge_candidates",
    "doc_decontamination_bloom",
    # round-10 additions, all sound under unchanged-text replication:
    # ngram/bigram-PMI counts grow k while their top-k rankings (count
    # ratios) are scale-invariant; winsorized stats / k-anonymity are
    # bounded-group aggregates whose group sizes grow k; zipf counts grow
    # k (slope invariant); lexical diversity has fixed vocab with k-grown
    # counts (entropy invariant).
    "doc_ngram_topk",
    "doc_winsorized_stats",
    "doc_bigram_pmi",
    "doc_k_anonymity",
    "doc_zipf_fit",
    "doc_lexical_diversity",
    # round-14 addition, sound under unchanged-text replication: char
    # counts (per-doc AND corpus) grow k, so every p_doc/p_corpus ratio --
    # hence every KL -- is invariant and the top-20 ranking is stable;
    # the distinct-int ln frame grows only with new count VALUES (k*c),
    # still bounded by doc-length-cap * k's value set, never by rows.
    "doc_char_kl_gibberish",
    # r17 addition, sound under unchanged-text replication: output rows
    # are one-per-doc (grow exactly k); bucket counts ct/cs all grow k so
    # the add-1-smoothed l_i coefficients drift only at the smoothing
    # term (timing-irrelevant); the model pass stays a 32-group map-side
    # -combined aggregate whatever k is.  This probe adjudicates the
    # in-source claim that its ~2.3 s sf0.1 cost is FIXED 64-wide-codegen
    # plan overhead, not data-linear work (VERDICT r16 "What's missing"
    # #3): if the claim holds, sec/k must FALL with k like the decode
    # gates'; if sec/k is flat, the cost is data-bound and the claim dies.
    "doc_dsir_importance",
)

# Optional subset, e.g. SPARK_GRAFT_PROBE_QUERIES=doc_ngram_topk
_SUBSET = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
if _SUBSET:
    _requested = tuple(q for q in _SUBSET.split(",") if q)
    _known = set(QUERIES) | {"doc_decontamination_ngram"}
    _unknown = sorted(set(_requested) - _known)
    if _unknown or not _requested:
        raise ValueError(
            "SPARK_GRAFT_PROBE_QUERIES names not in this probe's QUERIES: "
            f"{_unknown or '(empty)'}; known: {sorted(_known)}"
        )
    QUERIES = _requested

#: Queries probed against the TAGGED replication (every token suffixed with
#: its replica id, so vocab is disjoint across replicas).  Unchanged-text
#: replication is WRONG for decontamination: replicas of a needle's source
#: doc are genuine cross-replica contamination, so true-positive pairs --
#: and therefore output rows -- grow k^2 by construction.  That is the
#: operator reporting real duplicates, not an engine nonlinearity; probing
#: engine cost requires replica-disjoint vocab, under which matches stay
#: within-replica and must grow exactly k.
TAGGED_QUERIES = ("doc_decontamination_ngram",)
if _SUBSET:
    TAGGED_QUERIES = tuple(q for q in TAGGED_QUERIES if q in QUERIES)
    QUERIES = tuple(q for q in QUERIES if q not in TAGGED_QUERIES)


def write_replicated(spark, k: int, out_dir: str, tagged: bool = False) -> int:
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    reps = spark.range(k).select(F.col("id").alias("rep"))
    text = F.col("text")
    if tagged:
        # replica-disjoint vocab (see TAGGED_QUERIES): suffix every token
        # with the replica id, same scheme as tools/scale_probe.py
        text = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
            ),
        )
    out = (
        d.crossJoin(F.broadcast(reps))
        .select(
            (F.col("rep") * ID_SPACE + F.col("doc_id")).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return k


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = local_session(cores=os.cpu_count() or 8)
    specs = all_specs()
    base = tempfile.mkdtemp(prefix="curation_probe_")
    rows_hdr = "| k | docs | query | result rows | seconds | sec/k |"
    print(rows_hdr)
    print("|---|---|---|---|---|---|")
    try:
        for k in ks:
            kdir = os.path.join(base, f"k{k}")
            write_replicated(spark, k, kdir)
            tdir = os.path.join(base, f"k{k}_tagged")
            write_replicated(spark, k, tdir, tagged=True)
            n_docs = spark.read.parquet(os.path.join(kdir, "documents.parquet")).count()
            for name in QUERIES + TAGGED_QUERIES:
                qdir = tdir if name in TAGGED_QUERIES else kdir
                builder = specs[name].builder
                # warm-up (also captures the result-row count once)
                n_rows = builder(spark, qdir).count()
                best = None
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    builder(spark, qdir).write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                print(
                    f"| {k} | {n_docs} | {name.removeprefix('doc_')} "
                    f"| {n_rows} | {best:.2f} | {best / k:.2f} |"
                )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
