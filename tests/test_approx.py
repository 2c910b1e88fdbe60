"""Error bounds for the sketch-based approximate paths (HLL distinct and
quantile sketch), pinned against exact answers -- the quality gate the
rows-only oracle entries cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs
from flink_kafka_consumer_cassandra_output_spark.sources import tables

from .oracle import duck_connection


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """Raw sketch values pinned <10% of exact (the registered query now
    emits the boolean bound certificate instead of the sketch value)."""
    approx = {
        r.l_returnflag: r.approx_parts
        for r in tables.load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
        .collect()
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


def test_distinct_bound_certificate_is_falsifiable(spark, sf_dir):
    """The driver-checked entry asserts TRUE within_bound; that only means
    something if a broken sketch flips it.  Feed the certificate an
    'approx' of 2x the exact count: every boolean must come back False,
    while the registered (honest) query's booleans are all True."""
    from flink_kafka_consumer_cassandra_output_spark.plans.tpch_queries import (
        distinct_bound_certificate,
    )

    base = tables.load(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    broken = base.withColumn("approx_parts", F.col("exact_parts") * 2)
    rows = distinct_bound_certificate(broken).collect()
    assert rows, "certificate produced no rows"
    assert all(r.within_bound is False for r in rows)

    honest = all_specs()["approx_distinct_parts"].builder(spark, sf_dir).collect()
    assert honest and all(r.within_bound is True for r in honest)


def _raw_quantiles(spark, sf_dir):
    """The raw sketch values (the registered query now emits the boolean
    rank certificate instead; the values themselves are pinned here)."""
    from flink_kafka_consumer_cassandra_output_spark.plans.tpch_queries import (
        _QUANTILE_ACCURACY,
        _QUANTILES,
    )

    return tables.load(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.percentile_approx(
            "o_totalprice", list(_QUANTILES), _QUANTILE_ACCURACY
        ).alias("q")
    )


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    """percentile_approx with accuracy=10000 guarantees rank error <= 1/10000;
    the VALUE check here uses the exact quantiles one rank-percent either
    side as brackets -- a bound that holds for any sketch meeting its rank
    guarantee, not a tuned tolerance."""
    approx = {
        r.o_orderstatus: list(r.q) for r in _raw_quantiles(spark, sf_dir).collect()
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


def test_quantile_rank_certificate_is_falsifiable(spark, sf_dir):
    """The driver-checked entry asserts TRUE booleans; that only means
    something if a broken sketch flips them.  Feed the certificate a
    'sketch' whose p25 slot holds the maximum price: every _ok column for
    that slot must come back False while the honest slots stay True."""
    from flink_kafka_consumer_cassandra_output_spark.plans.tpch_queries import (
        quantile_rank_certificate,
    )

    o = tables.load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    bad = o.groupBy("o_orderstatus").agg(
        F.array(
            F.max("o_totalprice"),  # p25 slot: grossly wrong
            F.percentile_approx("o_totalprice", 0.5, 10000),
            F.percentile_approx("o_totalprice", 0.75, 10000),
            F.percentile_approx("o_totalprice", 0.9, 10000),
        ).alias("q"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    rows = quantile_rank_certificate(o, bad).collect()
    assert rows, "certificate produced no rows"
    for r in rows:
        assert r.p25_ok is False, f"{r.o_orderstatus}: broken p25 passed"
        assert r.p50_ok and r.p75_ok and r.p90_ok, (
            f"{r.o_orderstatus}: honest slots failed"
        )


def test_hll_estimate_quality_and_register_bound(spark, sf_dir):
    """ev_hll_distinct_users: |rel_err| within 3 standard errors of the
    m=64 HLL (1.04/sqrt(64) ~ 13%; ceiling 0.40), and every register
    value respects the structural bound 0 <= m <= HLL_W_BITS + 1."""
    from pyspark.sql import functions as F

    from flink_kafka_consumer_cassandra_output_spark.functions import sketch as SK
    from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

    out = all_specs()["ev_hll_distinct_users"].builder(spark, sf_dir).collect()
    assert out
    for r in out:
        assert abs(r["rel_err"]) <= 0.40, r
        assert 0 <= r["v_zero"] <= SK.HLL_M

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bad = (
        ev.select(SK.hll_rho(F.col("user_id")).alias("rho"))
        .filter((F.col("rho") < 1) | (F.col("rho") > SK.HLL_W_BITS + 1))
        .count()
    )
    assert bad == 0


def test_histogram_quantile_error_within_one_bucket(spark, sf_dir):
    """agg_histogram_quantile_sketch's contract: for every target
    percentile, 0 <= est_upper - exact_value <= width (the exact rank-r
    value lies in the covering bucket, whose upper edge is the estimate),
    and the certificate rank matches the integer definition
    (q*n+99) div 100."""
    from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

    rows = (
        all_specs()["agg_histogram_quantile_sketch"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert {r["q_pct"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert 0.0 <= r["err"] <= r["width"], r
        assert r["rank"] == (r["q_pct"] * r["n"] + 99) // 100, r
