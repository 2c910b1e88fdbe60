"""Scaling probe for basket_copurchase_lift (round 9).

Usage: python tools/scale_probe_basket.py [k ...]   (default: 1 2 4 8)

The co-purchase miner's scale claim is that pair generation is BOUNDED
per order (C(items,2) with <= 13 items on TPC-H shapes) and therefore
linear in orders, never quadratic in parts.  The probe replicates the
sf0.1 lineitem fixture k times with RE-KEYED orderkeys and partkeys
(rep * ID_SPACE + key): baskets stay within their replica, so the item
table, the pair table, and the support table all grow ~k and a probed
super-linear row means the plan regressed to a cross-part shape.

The probed code is the REGISTERED BUILDER run unchanged on a probe
sf_dir -- zero drift from what the driver/bench time.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "2"))
ID_SPACE = 100_000_000


def build_probe_dir(spark: SparkSession, k: int) -> str:
    out = f"/tmp/sfprobe_basket_k{k}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    reps = spark.range(k).select(F.col("id").alias("rep"))
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("rep") * ID_SPACE + F.col("l_orderkey"))
        .withColumn("l_partkey", F.col("rep") * ID_SPACE + F.col("l_partkey"))
        .drop("rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )
    return out


def main(ks: list[int]) -> None:
    spark = local_session()
    builder = all_specs()["basket_copurchase_lift"].builder
    print("| k | result rows | seconds | sec/k |")
    print("|---|---|---|---|")
    for k in ks:
        probe_dir = build_probe_dir(spark, k)
        builder(spark, probe_dir).count()  # warm-up
        best, rows = None, 0
        for _ in range(REPEATS):
            t0 = time.monotonic()
            rows = builder(spark, probe_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"| {k} | {rows} | {best:.2f} | {best / k:.2f} |", flush=True)
        shutil.rmtree(probe_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    main(ks)
