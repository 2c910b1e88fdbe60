"""Skew salting: the salted two-phase aggregate must equal the plain
groupBy exactly — including on a deliberately skewed input (one hot key
carrying ~90% of rows, the realistic hot-user shape for the reference's
message stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.operators import message_pipeline as mp
from flink_kafka_consumer_cassandra_output_spark.operators import skew


def test_salted_count_equals_plain_on_fixture(spark, sf_dir):
    msgs = mp.messages_from_events(spark, sf_dir).select("username", "jid")
    plain = {(r.username, r.jid): r.n for r in
             msgs.groupBy("username", "jid").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {(r.username, r.jid): r.n for r in
              skew.salted_group_count(msgs, ["username", "jid"]).collect()}
    assert salted == plain


def test_salted_count_on_hot_key(spark):
    # 9000 rows for one hot user, 10 each for 100 cold users
    hot = spark.range(9000).select(F.lit("hot_user").alias("k"), F.col("id"))
    cold = spark.range(1000).select(
        F.concat(F.lit("user"), (F.col("id") % 100).cast("string")).alias("k"), F.col("id")
    )
    df = hot.unionByName(cold)
    got = {r.k: r.n for r in skew.salted_group_count(df, ["k"], n_salts=8).collect()}
    assert got["hot_user"] == 9000
    assert sum(got.values()) == 10000
    assert len(got) == 101
