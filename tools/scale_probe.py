"""Scaling probe: do the dedup pipelines scale ~linearly in corpus size?

Usage: python tools/scale_probe.py [k ...]   (default: 1 2 4 8)

The sf0.1 documents fixture (5,000 docs) is replicated k times.  Each
replica re-keys doc_id into its own id space and prepends a replica tag
token to the text, so shingles differ across replicas and the planted
near-dup structure stays WITHIN each replica: the true-pair count must
grow ~k, and on fixed cores a pipeline whose candidate generation is a
proper equi-join (never all-pairs) should grow ~k in wall-clock too.  A
superlinear blow-up here is exactly the plan bug that kills a 100 TB
run, which is what this probe exists to catch.

Probed pipelines (the three near-dup/clustering paths):
  - minhash_lsh: MinHash signature -> LSH band equi-join -> exact verify
  - jaccard_prefix: global-frequency prefix filter -> token equi-join
    -> exact verify (100% recall path)
  - dedup_clusters: jaccard_prefix edges -> iterative min-label
    connected components

Each k is measured in its own flow with min-of-REPEATS timings after a
warm-up of the scan.  Results print as one markdown table; paste into
SCALING.md when regenerating it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.operators import similarity as SIM  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.functions import text as TX  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "2"))
ID_SPACE = 10_000_000


def replicated_docs(spark: SparkSession, k: int) -> DataFrame:
    """documents text replicated k times, each replica re-keyed and every
    TOKEN tagged with the replica id, so every shingle differs across
    replicas (cross-replica Jaccard = 0) and the true near-dup structure
    is exactly k disjoint copies of the fixture's: result rows must grow
    ~k, not k^2.  (A first version tagged only the text HEAD; replicas of
    the same doc then stayed Jaccard-similar and true pairs grew
    quadratically, which no pipeline can serve linearly.)"""
    d = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
    )
    reps = spark.range(k).select(F.col("id").alias("rep"))
    tagged = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("_"), F.col("rep").cast("string")),
        ),
    )
    return (
        d.crossJoin(F.broadcast(reps))
        .select(
            (F.col("rep") * ID_SPACE + F.col("doc_id")).alias("doc_id"),
            tagged.alias("text"),
        )
        # One file -> one scan partition; spread BEFORE the expensive
        # folds like tables.load does, then cut lineage so the probe
        # times the pipeline, not the replication.
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )


def shingled(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.array_distinct(TX.word_shingles(F.col("text"), 3)).alias("sh")
    ).localCheckpoint(eager=True)


def minhash_lsh(spark: SparkSession, docs: DataFrame) -> int:
    sh = shingled(docs)
    sigs = sh.withColumn("sig", SIM.minhash_signature(F.col("sh")))
    cand = SIM.lsh_candidate_pairs(sigs).repartition(
        spark.sparkContext.defaultParallelism
    )
    x = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(x, "id_a").join(y, "id_b")
        .filter(SIM.jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.5)
        .count()
    )


def jaccard_prefix(spark: SparkSession, docs: DataFrame) -> int:
    sh = shingled(docs)
    cand = SIM.prefix_filter_pairs(sh, threshold=0.5).repartition(
        spark.sparkContext.defaultParallelism
    )
    x = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(x, "id_a").join(y, "id_b")
        .filter(SIM.jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.5)
        .count()
    )


def dedup_clusters(spark: SparkSession, docs: DataFrame) -> int:
    sh = shingled(docs)
    cand = SIM.prefix_filter_pairs(sh, threshold=0.5).repartition(
        spark.sparkContext.defaultParallelism
    )
    x = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(x, "id_a").join(y, "id_b")
        .filter(SIM.jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.5)
        .select("id_a", "id_b")
    )
    nodes = docs.select(F.col("doc_id").alias("v"))
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    labels = SIM.connected_components(nodes, edges)
    return labels.filter(F.col("v") != F.col("lbl")).count()


def graph_kcore(spark: SparkSession, docs: DataFrame) -> int:
    """2-core of the verified pair graph (doc_graph_kcore's pipeline):
    candidate equi-join -> exact verify -> iterative degree peel.  True
    structure is k disjoint copies, so the core count must be exactly
    k x the fixture's and the peel depth must NOT grow with k (replicas
    peel in parallel within each round)."""
    sh = shingled(docs)
    cand = SIM.prefix_filter_pairs(sh, threshold=0.5).repartition(
        spark.sparkContext.defaultParallelism
    )
    x = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    y = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(x, "id_a").join(y, "id_b")
        .filter(SIM.jaccard(F.col("sh_a"), F.col("sh_b")) >= 0.5)
        .select("id_a", "id_b")
    )
    nodes = docs.select(F.col("doc_id").alias("v"))
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    core = SIM.kcore_membership(nodes, edges, k=2)
    return core.filter(F.col("in_kcore") == 1).count()


PIPELINES = {
    "minhash_lsh": minhash_lsh,
    "jaccard_prefix": jaccard_prefix,
    "dedup_clusters": dedup_clusters,
    "graph_kcore": graph_kcore,
}


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = local_session(cores=cpus)
    rows = []
    for k in ks:
        docs = replicated_docs(spark, k)
        n = docs.count()
        for name, fn in PIPELINES.items():
            best, out = None, None
            for _ in range(REPEATS):
                t0 = time.time()
                out = fn(spark, docs)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rows.append((k, n, name, out, best))
            print(
                f"k={k} docs={n} {name}: rows={out} {best:.2f}s",
                file=sys.stderr,
            )
        docs.unpersist()
    print("| k | docs | pipeline | result rows | seconds | sec/k |")
    print("|---|---|---|---|---|---|")
    base = {r[2]: r[4] for r in rows if r[0] == ks[0]}
    for k, n, name, out, best in rows:
        print(
            f"| {k} | {n} | {name} | {out} | {best:.2f} "
            f"| {best / k:.2f} |"
        )


if __name__ == "__main__":
    main()
