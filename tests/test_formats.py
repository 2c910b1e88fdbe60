"""File-format scan coverage (SURVEY.md section 2 absent-category row
"file-format scans (CSV/Parquet/ORC/JSON)"): the same events data written
to and read back from each format must reproduce the parquet source
exactly — schema declared on read (no inference in the engine's path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.sources import tables
from flink_kafka_consumer_cassandra_output_spark.streaming.pipeline import EVENTS_STREAM_SCHEMA


def _canon(df):
    return {tuple(r) for r in df.select(
        "event_id", "user_id", "event_type", "value", "props",
        F.unix_micros("ts").alias("ts_us"),
    ).collect()}


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = tables.load(spark, sf_dir, "events")
    path = str(tmp_path / fmt)
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        # preserve microseconds + quote the JSON props column safely
        writer = writer.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
        writer.csv(path)
        got = (
            spark.read.schema(EVENTS_STREAM_SCHEMA)
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .csv(path)
        )
    elif fmt == "json":
        writer.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(path)
        got = (
            spark.read.schema(EVENTS_STREAM_SCHEMA)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .json(path)
        )
    else:
        writer.orc(path)
        got = spark.read.schema(EVENTS_STREAM_SCHEMA).orc(path)
    assert _canon(got) == _canon(src), f"{fmt} round-trip diverged"
