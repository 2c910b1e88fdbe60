"""Scaling probe for the TPC-H fact queries: ~linear in fact-table size?

Usage: python tools/scale_probe_tpch.py <k>     (one fresh JVM per k;
       run k = 1 2 4 8 as separate invocations -- see SCALING.md on why
       a single-session sweep self-contaminates)

The sf0.1 lineitem (600k rows) and orders (150k rows) are replicated k
times into a probe sf_dir, with l_orderkey / o_orderkey re-keyed into
per-replica id spaces so the orderkey join/group cardinalities grow
exactly k (dimensions stay fixed, as a probe of fact growth should --
TPC-H scales customers too, but the queries probed here do per-order /
per-lineitem work against broadcast-sized dims either way).  The PROBED
CODE IS THE REGISTERED BUILDERS run unchanged on the probe dir: zero
drift between what the probe times and what the driver/bench run.

Probed queries (one per fact-side plan family):
  - q1_pricing_summary:        pruned scan -> decimal multi-aggregate
  - q14_promo_revenue:         fact |x| midsize-dim join + conditional agg
  - q18_large_volume_customers: orderkey HAVING set -> broadcast joins -> top-k
  - q21_waiting_supplier:      semi + anti self-join chain on l_orderkey

Each query is materialized via the noop sink (bench.py semantics) and
timed min-of-REPEATS after one untimed warm-up.  Output: one markdown
table row per query; paste into SCALING.md when regenerating it.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "3"))
ID_SPACE = 100_000_000
QUERIES = (
    "q1_pricing_summary",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q21_waiting_supplier",
)
REPLICATED = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def build_probe_dir(spark: SparkSession, k: int) -> str:
    """A probe sf_dir: lineitem/orders replicated k times with re-keyed
    orderkeys; every other table copied as-is so ``tables.load`` -- and
    therefore every registered builder -- works unchanged on it."""
    out = f"/tmp/sfprobe_tpch_k{k}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    for name, key in REPLICATED.items():
        df = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
        (
            df.crossJoin(F.broadcast(reps))
            .withColumn(key, F.col("rep") * ID_SPACE + F.col(key))
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.parquet(os.path.join(out, f"{name}.parquet"))
        )
    for name in TABLES:
        if name in REPLICATED:
            continue
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return out


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    k = int(sys.argv[1])
    spark = local_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    probe_dir = build_probe_dir(spark, k)
    specs = all_specs()
    print(f"| k | lineitem rows | query | result rows | seconds | sec/k |")
    print("|---|---|---|---|---|---|")
    li_rows = spark.read.parquet(os.path.join(probe_dir, "lineitem.parquet")).count()
    for name in QUERIES:
        # per-query untimed warm-up: the first execution carries this plan's
        # whole-stage-codegen compilation, which would otherwise land in the
        # first timed repeat (and be the ONLY sample at REPEATS=1)
        specs[name].builder(spark, probe_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.monotonic()
            specs[name].builder(spark, probe_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        rows = specs[name].builder(spark, probe_dir).count()
        print(
            f"| {k} | {li_rows} | {name} | {rows} | {best:.2f} | {best / k:.2f} |"
        )
    shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
