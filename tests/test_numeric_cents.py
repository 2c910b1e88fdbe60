"""Pin the r17 cents-split aggregation bit-identical to the decimal form.

The optimization round rewrote numeric.dsum/davg/drevenue (and the hot
inline decimal-sum sites) from ``sum(DECIMAL(18,2))`` to the split long
cents sum documented in functions/numeric.py.  Two invariants make that a
pure execution-plan change:

1. per-row: ``floor(x * 100 + 0.5)`` == ``CAST(CAST(x AS DECIMAL(18,2))
   * 100 AS BIGINT)`` for every value of every fixture money column
   (scale-clean doubles, same generator at every SF);
2. per-aggregate: the reassembled double equals the decimal-sum double
   bit-for-bit on real grouped data, including rollup/cube null groups,
   all-NULL groups and negative values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.functions import numeric as N
from flink_kafka_consumer_cassandra_output_spark.sources import tables

MONEY_COLUMNS = {
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
    "events": ("value",),
}


def test_cents_extraction_matches_decimal_per_row(spark, sf_dir):
    for table, cols in MONEY_COLUMNS.items():
        df = tables.load(spark, sf_dir, table)
        checks = [
            (
                N.cents(c).eqNullSafe((N.dec2(c) * 100).cast("long")).cast("int")
            ).alias(c)
            for c in cols
        ]
        row = df.select(*checks).agg(
            *[F.min(F.col(c)).alias(c) for c in cols]
        ).collect()[0]
        bad = [c for c in cols if row[c] == 0]
        assert not bad, f"{table}: cents extraction diverges on {bad}"


def _old_dsum(col, alias):
    return F.sum(N.dec2(col)).cast("double").alias(alias)


def _old_davg(col, alias):
    return (F.sum(N.dec2(col)).cast("double") / F.count(F.lit(1))).alias(alias)


def _old_drevenue(alias):
    return F.sum(N.revenue_col()).cast("double").alias(alias)


def _assert_frames_bitequal(a, b, key):
    ra = {tuple(r[k] for k in key): r for r in a.collect()}
    rb = {tuple(r[k] for k in key): r for r in b.collect()}
    assert set(ra) == set(rb)
    for k, row_a in ra.items():
        row_b = rb[k]
        for f in row_a.asDict():
            assert row_a[f] == row_b[f] or (
                row_a[f] is None and row_b[f] is None
            ), f"group {k} field {f}: {row_a[f]!r} != {row_b[f]!r}"


def test_grouped_sums_bitequal(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    key = ["l_returnflag", "l_linestatus"]
    new = li.groupBy(*key).agg(
        N.dsum("l_quantity", "sum_qty"),
        N.dsum("l_extendedprice", "sum_price"),
        N.davg("l_extendedprice", "avg_price"),
        N.drevenue("revenue"),
    )
    old = li.groupBy(*key).agg(
        _old_dsum("l_quantity", "sum_qty"),
        _old_dsum("l_extendedprice", "sum_price"),
        _old_davg("l_extendedprice", "avg_price"),
        _old_drevenue("revenue"),
    )
    _assert_frames_bitequal(new, old, key)


def test_rollup_null_groups_bitequal(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    key = ["l_returnflag", "l_linestatus"]
    new = li.rollup(*key).agg(N.dsum("l_quantity", "s"))
    old = li.rollup(*key).agg(_old_dsum("l_quantity", "s"))
    _assert_frames_bitequal(new, old, key)


def test_negative_and_null_values_bitequal(spark):
    rows = [
        ("a", -999.99),
        ("a", 0.01),
        ("a", None),
        ("b", None),
        ("b", None),
        ("c", -0.07),
        ("c", 4999999999.99),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    new = df.groupBy("k").agg(N.dsum("v", "s"), N.davg("v", "a"))
    old = df.groupBy("k").agg(_old_dsum("v", "s"), _old_davg("v", "a"))
    _assert_frames_bitequal(new, old, ["k"])


def test_charge_scale6_bitequal(spark, sf_dir):
    li = tables.load(spark, sf_dir, "lineitem")
    dec8 = "decimal(8,2)"
    charge_dec = (
        N.dec2("l_extendedprice")
        * (F.lit(1).cast(dec8) - F.col("l_discount").cast(dec8))
        * (F.lit(1).cast(dec8) + F.col("l_tax").cast(dec8))
    )
    charge_cents6 = N.revenue_cents4() * (F.lit(100) + N.cents("l_tax"))
    new = li.groupBy("l_returnflag").agg(
        N.csum_double(charge_cents6, 6, "sum_charge")
    )
    old = li.groupBy("l_returnflag").agg(
        F.sum(charge_dec).cast("double").alias("sum_charge")
    )
    _assert_frames_bitequal(new, old, ["l_returnflag"])


def test_csum3_product_sums_bitequal(spark, sf_dir):
    """r18: the 3-long split sum for PRODUCTS of cents (power sums of
    agg_stats_moments) must reassemble bit-identically to the decimal
    product sums it replaced, on real grouped data -- including the
    price^2 values whose v >> 20 component motivated the third limb."""
    li = tables.load(spark, sf_dir, "lineitem")
    qx, px = N.dec2("l_quantity"), N.dec2("l_extendedprice")
    cq, cp = N.cents("l_quantity"), N.cents("l_extendedprice")
    new = li.groupBy("l_returnflag").agg(
        N.csum3_double(cq * cq, 4, "sxx"),
        N.csum3_double(cp * cp, 4, "syy"),
        N.csum3_double(cq * cp, 4, "sxy"),
    )
    old = li.groupBy("l_returnflag").agg(
        F.sum(qx * qx).cast("double").alias("sxx"),
        F.sum(px * px).cast("double").alias("syy"),
        F.sum(qx * px).cast("double").alias("sxy"),
    )
    _assert_frames_bitequal(new, old, ["l_returnflag"])


def test_csum3_negative_and_null_values_bitequal(spark):
    rows = [
        ("a", -999.99), ("a", 0.01), ("a", None),
        ("b", None), ("b", None),
        ("c", -0.07), ("c", 4999999.99), ("c", -4999999.99),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    c = N.cents("v")
    new = df.groupBy("k").agg(N.csum3_double(c * c, 4, "svv"),
                              N.csum3_double(c * F.lit(-1), 2, "sneg"))
    d = N.dec2("v")
    old = df.groupBy("k").agg(
        F.sum(d * d).cast("double").alias("svv"),
        F.sum(d * F.lit(-1).cast("decimal(18,2)")).cast("double").alias("sneg"),
    )
    _assert_frames_bitequal(new, old, ["k"])


def test_csum_double_rejects_inexact_scale():
    with pytest.raises(ValueError):
        N.csum_double(F.lit(1), 7, "x")
    with pytest.raises(ValueError):
        N.csum3_double(F.lit(1), 7, "x")
