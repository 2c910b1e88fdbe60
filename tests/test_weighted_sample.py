"""doc_weighted_sample: systematic-sampling invariants beyond the oracle.

The parity gate proves Spark==DuckDB; these tests pin the SAMPLING
properties both engines must share:

- exactly K draws per nonempty stratum (sum of n_copies == WSAMPLE_K);
- a document's expected multiplicity is proportional to weight, and the
  deterministic systematic grid bounds it tightly: n_copies is within 1 of
  weight * K / total;
- the distributed prefix sum (range partitions + offsets) equals the naive
  per-stratum sequential cumsum row for row, so the scale form is not a
  different algorithm, just a different schedule.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.plans import registry as R
from flink_kafka_consumer_cassandra_output_spark.plans.curation_queries import (
    WSAMPLE_K,
)

from .conftest import SF_DIR


def _sample(spark):
    return R.all_specs()["doc_weighted_sample"].builder(spark, SF_DIR)


def test_exactly_k_draws_per_stratum(spark):
    per = (
        _sample(spark)
        .groupBy("lang")
        .agg(F.sum("n_copies").alias("draws"))
        .collect()
    )
    assert per, "fixture has at least one stratum"
    assert all(r["draws"] == WSAMPLE_K for r in per), per


def test_multiplicity_tracks_weight(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = (
        docs.select(
            "lang",
            F.coalesce(
                F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(0)
            ).alias("w"),
        )
        .groupBy("lang")
        .agg(F.sum("w").alias("total"))
    )
    joined = _sample(spark).join(totals, "lang").collect()
    for r in joined:
        expected = r["weight"] * WSAMPLE_K / r["total"]
        # systematic sampling: multiplicity is floor/ceil of the exact
        # proportional share -- never off by a full draw
        assert abs(r["n_copies"] - expected) <= 1.0, r


def test_distributed_prefix_sum_matches_sequential(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang",
        "doc_id",
        F.coalesce(
            F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(0)
        ).alias("weight"),
    )
    seq = docs.withColumn(
        "cum",
        F.sum("weight").over(
            Window.partitionBy("lang")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )

    nparts = 7  # deliberately not the session parallelism
    parts = docs.repartitionByRange(nparts, "lang", "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    psums = parts.groupBy("pid", "lang").agg(F.sum("weight").alias("psum"))
    wo = Window.partitionBy("lang").orderBy("pid")
    offsets = psums.withColumn(
        "offset",
        F.coalesce(
            F.sum("psum").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    dist = (
        parts.join(F.broadcast(offsets.select("pid", "lang", "offset")),
                   ["pid", "lang"])
        .withColumn(
            "cum",
            F.col("offset")
            + F.sum("weight").over(
                Window.partitionBy("pid", "lang")
                .orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("lang", "doc_id", "cum")
    )
    diff = (
        seq.select("lang", "doc_id", "cum")
        .join(dist.withColumnRenamed("cum", "cum2"), ["lang", "doc_id"])
        .filter(F.col("cum") != F.col("cum2"))
        .count()
    )
    assert diff == 0
