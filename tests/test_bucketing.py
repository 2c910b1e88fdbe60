"""Bucketed (pre-partitioned) joins: writing both sides bucketed on the join
key lets Spark plan a SortMergeJoin with NO Exchange on either side — the
co-located join strategy for repeatedly-joined 100 TB fact tables.

The plan assertion is the point: same join, same results, shuffle removed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.sources import tables


@pytest.fixture(scope="module")
def bucketed_warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = tables.load(spark, sf_dir, "orders")
    lineitem = tables.load(spark, sf_dir, "lineitem")
    # external tables at explicit paths: warehouse.dir is a static conf
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", str(wh / "orders_b")).mode("overwrite").saveAsTable("orders_b"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", str(wh / "lineitem_b")).mode("overwrite").saveAsTable("lineitem_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_warehouse):
    j = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # disable broadcast + AQE coalescing noise so the plan shape is pure
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle either side"
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        n_bucketed = j.count()
        n_plain = (
            tables.load(spark, sf_dir, "lineitem")
            .join(
                tables.load(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n_bucketed == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
