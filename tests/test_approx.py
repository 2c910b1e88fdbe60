"""Error bounds for the sketch-based approximate paths (HLL distinct and
quantile sketch), pinned against exact answers -- the quality gate the
rows-only oracle entries cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs
from flink_kafka_consumer_cassandra_output_spark.sources import tables

from .oracle import duck_connection


def test_approx_distinct_within_error_bound(spark, sf_dir):
    approx = {
        r.l_returnflag: r.approx_parts
        for r in all_specs()["approx_distinct_parts"].builder(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in tables.load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, n in exact.items():
        rel_err = abs(approx[flag] - n) / n
        assert rel_err < 0.10, f"{flag}: approx {approx[flag]} vs exact {n} ({rel_err:.1%})"


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """percentile_approx with accuracy=10000 guarantees rank error <= 1/10000;
    the VALUE check here uses the exact quantiles one rank-percent either
    side as brackets -- a bound that holds for any sketch meeting its rank
    guarantee, not a tuned tolerance."""
    approx = {
        r.o_orderstatus: [r.price_p25, r.price_p50, r.price_p75, r.price_p90]
        for r in all_specs()["approx_quantiles_price"].builder(spark, sf_dir).collect()
    }
    ps = [0.25, 0.5, 0.75, 0.9]
    con = duck_connection(sf_dir)
    try:
        rows = con.execute(f"""
            SELECT o_orderstatus,
                   {", ".join(
                       f"quantile_cont(o_totalprice, {max(p - 0.01, 0.0)}) AS lo{i},"
                       f" quantile_cont(o_totalprice, {min(p + 0.01, 1.0)}) AS hi{i}"
                       for i, p in enumerate(ps))}
            FROM orders GROUP BY o_orderstatus
        """).fetchall()
    finally:
        con.close()
    assert {r[0] for r in rows} == set(approx)
    for row in rows:
        status, brackets = row[0], row[1:]
        for i in range(len(ps)):
            lo, hi = brackets[2 * i], brackets[2 * i + 1]
            v = approx[status][i]
            assert lo <= v <= hi, (
                f"{status} p{ps[i]}: approx {v} outside exact bracket [{lo}, {hi}]"
            )
