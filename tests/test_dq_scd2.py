"""dq_constraint_suite + ev_scd2_user_state: property gates beyond parity.

- The constraint suite must be NON-VACUOUS in both directions on the
  fixture: at least one satisfied and at least one violated constraint
  (a report that can only say "pass" tests nothing).
- A constraint injected to fail (duplicated keys) must flip uniqueness.
- SCD2 output must be a valid temporal dimension: per user, intervals are
  half-open, non-overlapping, chained (valid_to == next valid_from),
  exactly one open (is_current) row, adjacent intervals change state, and
  event counts conserve the changelog.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.plans import registry as R

from .conftest import SF_DIR


def test_dq_suite_nonvacuous_both_directions(spark):
    rows = {
        r["constraint_name"]: r
        for r in R.all_specs()["dq_constraint_suite"].builder(spark, SF_DIR).collect()
    }
    assert len(rows) == 6
    sats = {n: r["satisfied"] for n, r in rows.items()}
    assert any(sats.values()) and not all(sats.values()), sats
    # designed outcomes on a TPC-H-shaped fixture
    assert sats["uniqueness_o_orderkey"] is True
    assert sats["uniqueness_o_custkey"] is False  # orders:customer many:1
    assert sats["referential_o_custkey"] is True
    assert rows["completeness_o_custkey"]["metric"] == 1.0


def test_dq_uniqueness_detects_injected_duplicates(spark, tmp_path):
    """Corrupt a copy of the fixture (duplicate every orderkey once, point
    one custkey at a nonexistent customer) and the suite must flip
    uniqueness_o_orderkey AND referential_o_custkey to failed."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    bad = orders.limit(1).withColumn("o_custkey", F.lit(-999_999_999))
    orders.unionByName(orders).unionByName(bad).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.read.parquet(f"{SF_DIR}/customer.parquet").write.parquet(
        str(tmp_path / "customer.parquet")
    )
    rows = {
        r["constraint_name"]: r["satisfied"]
        for r in R.all_specs()["dq_constraint_suite"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert rows["uniqueness_o_orderkey"] is False
    assert rows["referential_o_custkey"] is False
    assert rows["completeness_o_custkey"] is True


def test_scd2_intervals_are_a_valid_temporal_dimension(spark):
    out = R.all_specs()["ev_scd2_user_state"].builder(spark, SF_DIR).cache()
    try:
        n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        assert out.agg(F.sum("n_events")).first()[0] == n_events

        per_user = out.groupBy("user_id").agg(
            F.sum(F.col("is_current").cast("int")).alias("open_rows"),
            F.count(F.lit(1)).alias("n"),
            F.max("version").alias("vmax"),
            F.min("version").alias("vmin"),
        )
        bad = per_user.filter(
            (F.col("open_rows") != 1)
            | (F.col("vmin") != 1)
            | (F.col("vmax") != F.col("n"))
        ).count()
        assert bad == 0, "one open row per user; versions dense from 1"

        # chaining: valid_to equals the next version's valid_from; adjacent
        # states differ (otherwise the island compression failed)
        nxt = out.select(
            "user_id",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
            F.col("state").alias("next_state"),
        )
        chained = out.join(nxt, ["user_id", "version"])
        assert chained.filter(F.col("valid_to") != F.col("next_from")).count() == 0
        assert chained.filter(F.col("state") == F.col("next_state")).count() == 0

        # non-degenerate on the fixture: some user has >1 version
        assert per_user.filter(F.col("n") > 1).count() > 0
    finally:
        out.unpersist()


def test_scd2_asof_lookup_is_a_function_per_probe(spark):
    """Non-overlap in action: each (probe_ts, user) resolves to AT MOST one
    state row, and a user appears under a probe iff their history started
    at or before it."""
    out = R.all_specs()["ev_scd2_asof_lookup"].builder(spark, SF_DIR).cache()
    try:
        dup = (
            out.groupBy("probe_ts", "user_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dup == 0, "a probe instant matched overlapping intervals"

        firsts = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .groupBy("user_id")
            .agg(F.min("ts").alias("first_ts"))
        )
        probes = out.select("probe_ts").distinct()
        expected = (
            probes.join(firsts, firsts["first_ts"] <= probes["probe_ts"])
            .count()
        )
        assert out.count() == expected, (
            "every user active by a probe must resolve exactly once"
        )
    finally:
        out.unpersist()


def test_entity_resolution_ground_truth(spark):
    """Known-truth check: every mangled probe resolves into exactly its
    source customer's cluster (canonical id = source custkey, size 2),
    every unprobed customer stays a singleton, and nothing else merges --
    the composite block key must prevent the Customer#..042/..043
    serial-name collapse that Levenshtein alone would cause."""
    from flink_kafka_consumer_cassandra_output_spark.plans.tpch_adapted_queries import (
        ER_MOD,
    )

    rows = {
        r["cluster_id"]: r
        for r in R.all_specs()["cust_entity_resolution"]
        .builder(spark, SF_DIR)
        .collect()
    }
    custkeys = [
        r["c_custkey"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    probed = {k for k in custkeys if k % ER_MOD == 0}
    assert probed, "fixture must spawn at least one probe"
    assert len(rows) == len(custkeys), "cluster count = customer count"
    for k in custkeys:
        expect = 2 if k in probed else 1
        assert rows[k]["n_records"] == expect, (k, rows[k])
        assert rows[k]["n_merged"] == expect - 1


def test_survivorship_golden_ground_truth(spark):
    """Known-truth check on the survivorship rules: for every probed
    customer whose cluster is exactly the clean {source, probe} pair, the
    golden record must pick each field by its own rule -- name from the
    min-id source, segment from the majority vote over non-null values
    (the probe's segment is LOST, so the vote returns the source's), and
    balance as the DECIMAL max (the probe's +0.05 drift).  The loose
    tolerance blocking can occasionally merge serial-name neighbours
    (|bal| within 0.10 at lev<=2 is possible by chance), so the gate
    requires the CLEAN pairs to dominate rather than be universal."""
    from flink_kafka_consumer_cassandra_output_spark.plans.tpch_adapted_queries import (
        SURV_DRIFT,
        SURV_MOD,
    )

    rows = {
        r["cluster_id"]: r
        for r in R.all_specs()["cust_survivorship_golden"]
        .builder(spark, SF_DIR)
        .collect()
    }
    cust = {
        r["c_custkey"]: r
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    probed = sorted(k for k in cust if k % SURV_MOD == 0)
    assert probed, "fixture must spawn at least one probe"
    clean = 0
    for k in probed:
        row = rows.get(k)
        if row is None or row["n_records"] != 2:
            continue  # polluted by an accidental tolerance merge
        src = cust[k]
        assert row["golden_name"] == src["c_name"], (k, row)
        assert row["golden_segment"] == src["c_mktsegment"], (k, row)
        drifted = round(src["c_acctbal"] + float(SURV_DRIFT), 2)
        assert row["golden_acctbal"] == drifted, (k, row)
        clean += 1
    assert clean >= 0.8 * len(probed), (clean, len(probed))
