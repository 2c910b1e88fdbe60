"""Scaling probe for the distributed total-order prefix machinery
(operators/ordered.py, round 12): distributed form vs the single
global-window form it replaced.

Usage: python tools/scale_probe_ordered.py <k>   (one fresh JVM per k;
       run k = 1 2 4 8 as separate invocations -- SCALING.md explains
       why a single-session sweep self-contaminates)

The sf0.1 lineitem table (600k rows, 20k parts) is replicated k times
with l_partkey re-keyed into per-replica id spaces, so the part catalog
-- the frame the cumulative window runs over -- grows exactly k.  Two
forms of ``orders_abc_classification``'s cumulative-revenue-share pass
are timed on the REGISTERED builder's input:

  - dist:   the registered builder (range-partitioned prefix sum,
            per-slice windows + broadcast offsets)
  - global: the pre-r12 form (one unpartitioned window over the whole
            part catalog -- every row through ONE task)

Same for ``doc_lm_rarity``'s tercile ranks over a k-replicated documents
table.  The claim: dist's sec/k must fall or hold (fixed cores, ~linear
work spread over all of them) while global's per-k cost concentrates on
a single core as k grows -- the structural reason the rewrite exists.
Both forms produce bit-identical results (exact decimal / integer rank
arithmetic; asserted per run).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession, Window  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.sources.tables import TABLES  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.functions import numeric as N  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "3"))
ID_SPACE = 100_000_000


def build_probe_dir(spark: SparkSession, k: int) -> str:
    out = f"/tmp/sfprobe_ordered_k{k}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_partkey", F.col("rep") * ID_SPACE + F.col("l_partkey"))
        .drop("rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(os.path.join(out, "lineitem.parquet"))
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("rep") * ID_SPACE + F.col("doc_id"))
        .drop("rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(os.path.join(out, "documents.parquet"))
    )
    for name in TABLES:
        if name in ("lineitem", "documents"):
            continue
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return out


def abc_global(spark: SparkSession, sf_dir: str):
    """The pre-r12 global-window form, byte-for-byte semantics."""
    from flink_kafka_consumer_cassandra_output_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(N.DEC)).alias("rev")
    )
    order = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = p.select(
        "rev",
        F.sum("rev").over(order).alias("cum_rev"),
        F.sum("rev").over(Window.partitionBy()).alias("tot"),
    )
    share = F.col("cum_rev").cast("double") / F.col("tot").cast("double")
    c = r.select(
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
        "rev",
        "tot",
    )
    return c.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").cast("double").alias("class_revenue"),
        (F.sum("rev").cast("double") / F.max("tot").cast("double")).alias(
            "revenue_share"
        ),
    )


def lm_global(spark: SparkSession, sf_dir: str):
    from flink_kafka_consumer_cassandra_output_spark.sources.tables import load

    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    scores = (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("cnt").alias("sum_cnt"))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("sum_cnt").cast("double") / F.col("n_tokens").cast("double")).alias(
                "avg_tok_freq"
            ),
        )
    )
    ranked = scores.select(
        "doc_id", "n_tokens", "avg_tok_freq",
        F.row_number().over(Window.orderBy("avg_tok_freq", "doc_id")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    bucket = (
        F.when(F.col("r") * 3 <= F.col("n"), "tail")
        .when(F.col("r") * 3 <= F.col("n") * 2, "middle")
        .otherwise("head")
    )
    return ranked.select("doc_id", "n_tokens", "avg_tok_freq", bucket.alias("bucket"))


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    k = int(sys.argv[1])
    spark = local_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    probe_dir = build_probe_dir(spark, k)
    specs = all_specs()
    forms = [
        ("abc dist", lambda: specs["orders_abc_classification"].builder(spark, probe_dir)),
        ("abc global", lambda: abc_global(spark, probe_dir)),
        ("lm_rarity dist", lambda: specs["doc_lm_rarity"].builder(spark, probe_dir)),
        ("lm_rarity global", lambda: lm_global(spark, probe_dir)),
    ]
    print("| k | form | result rows | seconds | sec/k |")
    print("|---|---|---|---|---|")
    for name, build in forms:
        build().write.format("noop").mode("overwrite").save()  # codegen warm-up
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.monotonic()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        rows = build().count()
        print(f"| {k} | {name} | {rows} | {best:.2f} | {best / k:.2f} |")
    # bit-identical cross-check, dist vs global (sorted collect compare)
    a = sorted(map(tuple, specs["orders_abc_classification"].builder(spark, probe_dir).collect()))
    b = sorted(map(tuple, abc_global(spark, probe_dir).collect()))
    assert a == b, "abc dist != global"
    c = sorted(map(tuple, specs["doc_lm_rarity"].builder(spark, probe_dir).collect()))
    d = sorted(map(tuple, lm_global(spark, probe_dir).collect()))
    assert c == d, "lm_rarity dist != global"
    print(f"bit-identical at k={k}: abc OK, lm_rarity OK")
    shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
