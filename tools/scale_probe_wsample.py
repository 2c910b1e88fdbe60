"""Scaling probe: the weighted-sample distributed prefix sum vs the
per-stratum sequential window it replaces.

Usage: python tools/scale_probe_wsample.py [k ...]   (default: 1 2 4 8)

The sf0.1 documents fixture is replicated k times with re-keyed doc_ids,
unchanged text, and lang FORCED CONSTANT -- one giant stratum, the
worst case for any Window.partitionBy(stratum) plan (its cumsum becomes
a single task no matter how many cores exist).  Both forms compute the
IDENTICAL weighted systematic sample (asserted on counts + total draws
each run); the probe times:

- ``wsample_distributed``: the registered ``doc_weighted_sample`` builder
  (range repartition -> per-partition partials -> broadcast offsets ->
  within-partition cumsum; parallelism = partition count);
- ``wsample_seq_window``: the textbook form -- one
  ``SUM() OVER (PARTITION BY lang ORDER BY doc_id)`` window.

Expected shape: the sequential form's seconds grow ~linearly in k
(single-task cumsum), the distributed form's sec/k falls as cores absorb
the extra partitions.  Paste the table into SCALING.md when
regenerating.  Same min-of-REPEATS noop-sink protocol as the other
probes; one fresh JVM per invocation for clean JIT/cache state.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.plans.curation_queries import (  # noqa: E402
    WSAMPLE_K,
)
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "2"))
ID_SPACE = 10_000_000


def write_single_stratum(spark, k: int, out_dir: str) -> int:
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    reps = spark.range(k).select(F.col("id").alias("rep"))
    (
        d.crossJoin(F.broadcast(reps))
        .select(
            (F.col("rep") * ID_SPACE + F.col("doc_id")).alias("doc_id"),
            "text",
            F.lit("xx").alias("lang"),  # ONE stratum: the worst case
            "source",
            "n_chars",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )
    return k


def seq_window_form(spark, sf_dir: str):
    """The per-stratum sequential-window twin of doc_weighted_sample:
    same weights, same systematic grid, cumsum via one partitioned
    window -- correct, and serialized per stratum by construction."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    w = d.select(
        "lang",
        "doc_id",
        F.coalesce(
            F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(0)
        ).alias("weight"),
    )
    win = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("lang")
    k2 = 2 * WSAMPLE_K
    return (
        w.withColumn("cum", F.sum("weight").over(win))
        .withColumn("total", F.sum("weight").over(tot))
        .filter(F.col("total") > 0)
        .selectExpr(
            "lang",
            "doc_id",
            "weight",
            f"cast((({k2} * cum + total) div (2 * total))"
            f" - (({k2} * (cum - weight) + total) div (2 * total))"
            " as bigint) as n_copies",
        )
        .filter(F.col("n_copies") >= 1)
    )


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = local_session(cores=os.cpu_count() or 8)
    dist_builder = all_specs()["doc_weighted_sample"].builder
    base = tempfile.mkdtemp(prefix="wsample_probe_")
    print("| k | docs | form | result rows | total draws | seconds | sec/k |")
    print("|---|---|---|---|---|---|---|")
    try:
        for k in ks:
            kdir = os.path.join(base, f"k{k}")
            write_single_stratum(spark, k, kdir)
            n_docs = spark.read.parquet(
                os.path.join(kdir, "documents.parquet")
            ).count()
            outputs = {}
            for form, builder in (
                ("wsample_distributed", lambda s, d: dist_builder(s, d)),
                ("wsample_seq_window", seq_window_form),
            ):
                agg = (
                    builder(spark, kdir)
                    .agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.sum("n_copies").alias("draws"),
                    )
                    .first()
                )
                outputs[form] = (agg["rows"], agg["draws"])
                best = None
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    builder(spark, kdir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                print(
                    f"| {k} | {n_docs} | {form} | {agg['rows']} "
                    f"| {agg['draws']} | {best:.2f} | {best / k:.2f} |"
                )
            assert outputs["wsample_distributed"] == outputs["wsample_seq_window"], (
                f"forms diverged at k={k}: {outputs}"
            )
            assert outputs["wsample_distributed"][1] == WSAMPLE_K, (
                "single stratum must yield exactly WSAMPLE_K draws"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
