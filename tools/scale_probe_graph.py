"""Scaling probe for the dup-graph quartet (VERDICT r8 item 5).

Usage: python tools/scale_probe_graph.py [k ...]   (default: 1 2 4 8)
       python tools/scale_probe_graph.py star      (hub row-width probe)

The graph quartet -- triangles, 2-core, clustering coefficient, PageRank
-- is 4 of the 6 most expensive bench queries.  All four share one
prefix-filter -> exact-verify edge pipeline (probed linearly already in
SCALING.md table 1, `jaccard_prefix`); what this probe pins is the GRAPH
stage on top: per-edge wedge counting, iterative core peeling, and the
PageRank fold must all stay ~linear in edges.

Corpus probe (table 6): the sf0.1 documents fixture replicated k times
with per-replica token tagging (same corpus machinery as
tools/scale_probe.py: cross-replica Jaccard = 0, so the dup graph is k
disjoint copies of the fixture's -- edges grow ~k, never k^2).  The
probed code is the REGISTERED BUILDERS run unchanged on a probe sf_dir,
zero drift from what the driver/bench time.

Star probe (table 6-star): a synthetic hub-and-spoke graph (one vertex
with in-degree D) driven through the REAL `pagerank_from_pairs` fold.
This is the shape VERDICT r8 item 2 flagged: the single-level r8 fold
collected a hub's FULL in-contribution list into one row (O(D) width);
the two-level fold bounds every row by max(D/PR_BUCKETS, PR_BUCKETS).
The probe reports the exact level-1/level-2 collect widths (derived from
the same grouping keys the fold aggregates over) plus wall-clock, so a
regression back to an unbounded row is visible as a width number, not an
OOM on the real cluster.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.plans.northstar_queries import (  # noqa: E402
    PR_BUCKETS,
    pagerank_from_pairs,
)
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "2"))
ID_SPACE = 10_000_000

QUERIES = [
    "doc_dup_graph_triangles",
    "doc_graph_kcore",
    "doc_graph_clustering_coeff",
    "doc_dup_graph_pagerank",
    "doc_graph_bfs_hops",  # round 9: bounded traversal over the same edges
]


def build_probe_dir(spark: SparkSession, k: int) -> str:
    """Probe sf_dir whose documents.parquet is the fixture replicated k
    times, re-keyed and token-tagged (tools/scale_probe.py's corpus: the
    near-dup structure stays within each replica)."""
    out = f"/tmp/sfprobe_graph_k{k}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    reps = spark.range(k).select(F.col("id").alias("rep"))
    tagged = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
        ),
    )
    (
        d.crossJoin(F.broadcast(reps))
        .select(
            (F.col("rep") * ID_SPACE + F.col("doc_id")).alias("doc_id"),
            tagged.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    return out


def probe_corpus(ks: list[int]) -> None:
    spark = local_session()
    specs = all_specs()
    print("| k | query | result rows | seconds | sec/k |")
    print("|---|---|---|---|---|")
    for k in ks:
        probe_dir = build_probe_dir(spark, k)
        for name in QUERIES:
            builder = specs[name].builder
            builder(spark, probe_dir).count()  # warm-up: scan + edge cache
            best, rows = None, 0
            for _ in range(REPEATS):
                t0 = time.monotonic()
                rows = builder(spark, probe_dir).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            print(
                f"| {k} | {name} | {rows} | {best:.2f} | {best / k:.2f} |",
                flush=True,
            )
        shutil.rmtree(probe_dir, ignore_errors=True)
    spark.stop()


def star_pairs(spark: SparkSession, d: int) -> DataFrame:
    """Hub-and-spoke: undirected pairs (hub=0, spoke) for spokes 1..D.
    After the builder's symmetrization the hub has in-degree D."""
    return (
        spark.range(1, d + 1)
        .select(F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )


def probe_star(ds: list[int]) -> None:
    spark = local_session()
    print(
        "| D (hub in-deg) | max L1 width | max L2 width | bound "
        "max(D/B, B) | seconds |"
    )
    print("|---|---|---|---|---|")
    for d in ds:
        pairs = star_pairs(spark, d)
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        # The collect widths ARE the group sizes of the fold's two
        # grouping keys -- measured from the same expressions.
        l1 = (
            edges.groupBy("dst", F.pmod(F.col("src"), F.lit(PR_BUCKETS)))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        l2 = (
            edges.select("dst", F.pmod(F.col("src"), F.lit(PR_BUCKETS)).alias("b"))
            .distinct()
            .groupBy("dst")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        pagerank_from_pairs(pairs).count()  # warm-up
        best = None
        for _ in range(REPEATS):
            t0 = time.monotonic()
            pagerank_from_pairs(pairs).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        bound = max((d + PR_BUCKETS - 1) // PR_BUCKETS, PR_BUCKETS)
        assert l1 <= bound and l2 <= PR_BUCKETS, (l1, l2, bound)
        print(
            f"| {d} | {l1} | {l2} | {bound} | {best:.2f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "star":
        probe_star([10_000, 100_000, 1_000_000])
    else:
        probe_corpus([int(a) for a in args] or [1, 2, 4, 8])
