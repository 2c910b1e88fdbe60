"""Degenerate orders/customer hardening: the TPC-H-table twin of the
events/corpus/embeddings sweeps.

The round-8/round-9 operators that consume orders/customer/lineitem must
BUILD and EXECUTE over adversarial rows the pristine fixture never
produces: NULL
o_custkey (completeness target), NULL o_totalprice (bucket arithmetic),
NULL o_orderstatus (compliance CASE), duplicate o_orderkey (uniqueness),
a dangling custkey (referential violation), an ALL-EQUAL price corpus
variant (zero histogram range -- 0/0 -> NaN -> BIGINT cast aborts under
ANSI without the GREATEST guard; this sweep found exactly that crash),
NULL c_name / NULL c_custkey / duplicate custkeys on the dimension side.

The claim is totality plus a few semantic spot checks (the DQ suite must
FLAG the corruption, not crash on it).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

_NAMES = [
    "dq_constraint_suite",
    "agg_histogram_quantile_sketch",
    "cust_entity_resolution",
    # round 9
    "cust_survivorship_golden",
    "orders_skyline_pareto",
    "basket_copurchase_lift",
    # round 10
    "cust_rfm_segmentation",
    "part_itemsim_cf",
    "cust_interpurchase_gaps",
    "supplier_delivery_scorecard",
    "orders_abc_classification",
    "part_copurchase_pagerank",
]

_O_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

_C_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

import datetime as dt

_D = dt.datetime(2024, 1, 1)

_ORDERS = [
    (1, 10, "O", 100.0, _D, "1-URGENT"),
    (2, 11, "F", 200.0, _D, "2-HIGH"),
    (3, 12, "P", 300.0, _D, "3-MEDIUM"),
    (4, None, "O", 400.0, _D, "4-NOT SPECIFIED"),  # NULL custkey
    (5, 10, None, 500.0, _D, "5-LOW"),             # NULL status
    (6, 11, "X", 600.0, _D, "1-URGENT"),           # non-compliant status
    (7, 12, "O", None, _D, "2-HIGH"),              # NULL price
    (2, 11, "F", 200.0, _D, "2-HIGH"),             # duplicate orderkey
    (8, 999, "O", 700.0, _D, "3-MEDIUM"),          # dangling custkey
    (9, None, None, None, None, None),             # all-null row
]

_CUSTOMERS = [
    (10, "Customer#000000010", 1, 50.0, "BUILDING"),
    (11, "Customer#000000011", 2, 60.0, "MACHINERY"),
    (12, "Customer#000000012", 3, 70.0, "AUTOMOBILE"),
    (13, None, 4, 80.0, "HOUSEHOLD"),              # NULL name
    (None, "Customer#nullkey", 5, 90.0, "FURNITURE"),  # NULL custkey
    (10, "Customer#000000010", 1, 50.0, "BUILDING"),   # duplicate custkey
]

_L_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

_LINEITEMS = [
    # order 1: a healthy 3-item basket (pairs exist)
    (1, 100, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),
    (1, 101, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),
    (1, 102, 1, 3, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),
    # order 2: the SAME pair again (meets min-support 2)
    (2, 100, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),
    (2, 101, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),
    # order 3: single-item basket (no pairs)
    (3, 100, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),
    # degenerate rows
    (4, None, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),   # NULL partkey
    (None, 100, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _D), # NULL orderkey
    (5, 100, 1, 1, None, None, None, None, None, None, None),  # all-null tail
    (1, 100, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _D),    # exact duplicate line
]


@pytest.fixture(scope="module")
def degenerate_tpch_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("degenerate_tpch_sf")
    spark.createDataFrame(_ORDERS, _O_SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "orders.parquet")
    )
    spark.createDataFrame(_CUSTOMERS, _C_SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "customer.parquet")
    )
    spark.createDataFrame(_LINEITEMS, _L_SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "lineitem.parquet")
    )
    return str(out)


@pytest.fixture(scope="module")
def flat_price_dir(spark, tmp_path_factory):
    """Every o_totalprice identical: histogram range is ZERO."""
    out = tmp_path_factory.mktemp("degenerate_tpch_flat")
    rows = [(i, 10, "O", 42.0, _D, "1-URGENT") for i in range(1, 8)]
    spark.createDataFrame(rows, _O_SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "orders.parquet")
    )
    spark.createDataFrame(_CUSTOMERS, _C_SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "customer.parquet")
    )
    return str(out)


@pytest.mark.parametrize("name", _NAMES)
def test_builder_total_on_degenerate_tpch(spark, degenerate_tpch_dir, name):
    rows = all_specs()[name].builder(spark, degenerate_tpch_dir).collect()
    assert rows is not None


def test_dq_suite_flags_the_corruption(spark, degenerate_tpch_dir):
    rows = {
        r["constraint_name"]: r["satisfied"]
        for r in all_specs()["dq_constraint_suite"]
        .builder(spark, degenerate_tpch_dir)
        .collect()
    }
    assert rows["completeness_o_custkey"] is False  # NULL custkeys present
    assert rows["uniqueness_o_orderkey"] is False   # duplicated key
    assert rows["referential_o_custkey"] is False   # dangling custkey
    assert rows["compliance_o_orderstatus"] is False  # 'X' + NULL status


def test_histogram_survives_zero_range(spark, flat_price_dir):
    """All-equal prices: every row lands in bucket 0, every percentile's
    exact value is the constant, err == 0.  Without the GREATEST range
    guard this was a NaN -> BIGINT ANSI cast abort."""
    rows = (
        all_specs()["agg_histogram_quantile_sketch"]
        .builder(spark, flat_price_dir)
        .collect()
    )
    assert {r["q_pct"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert r["bucket"] == 0
        assert r["exact_value"] == 42.0


def test_basket_pairs_survive_degeneracy(spark, degenerate_tpch_dir):
    """Semantic spot check: the (100, 101) pair appears in 2 baskets and
    must survive min-support; NULL order/part keys and the duplicate line
    must never fabricate a pair (items are DISTINCT (order, part) and
    NULL keys fail the equi-join)."""
    rows = (
        all_specs()["basket_copurchase_lift"]
        .builder(spark, degenerate_tpch_dir)
        .collect()
    )
    pairs = {(r["part_a"], r["part_b"]): r["supp_ab"] for r in rows}
    assert pairs.get((100, 101)) == 2, pairs
    assert all(a is not None and b is not None for a, b in pairs)


def test_skyline_on_degenerate_orders(spark, degenerate_tpch_dir):
    """Semantic spot check: every order shares one date, so the skyline
    is exactly the max-price order(s) of that date; NULL prices and the
    NULL-date row must not surface."""
    rows = (
        all_specs()["orders_skyline_pareto"]
        .builder(spark, degenerate_tpch_dir)
        .collect()
    )
    assert {r["o_orderkey"] for r in rows} == {8}, rows  # 700.0 is the max
