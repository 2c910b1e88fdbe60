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


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on read: a batch written later with an EXTRA column
    merges with older batches (mergeSchema=true), old rows surfacing NULL
    for the new column — the append-only data-lake pattern the reference's
    fixed Avro schema cannot express (SURVEY.md section 1.4)."""
    old = spark.sql("SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS t(id, payload)")
    new = spark.sql(
        "SELECT * FROM (VALUES (3, 'c', 'extra3')) AS t(id, payload, annotation)"
    )
    path = str(tmp_path / "evolving")
    old.write.parquet(path + "/batch=0")
    new.write.parquet(path + "/batch=1")
    got = spark.read.option("mergeSchema", True).parquet(path)
    assert set(got.columns) == {"id", "payload", "annotation", "batch"}
    rows = {(r.id, r.payload, r.annotation) for r in got.collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", "extra3")}


def test_json_corrupt_records_quarantined_not_fatal(spark, tmp_path):
    """Malformed input rows must neither kill the scan (reference behavior:
    decode error -> task failure, AvroDeserializationSchema.java:47-49) nor
    vanish silently: PERMISSIVE mode quarantines them in _corrupt_record
    while valid rows parse."""
    from pyspark.sql import types as T

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "v": "also ok"}\n'
        '{"id": "not-a-number", "v": 3}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    got = spark.read.schema(schema).option("mode", "PERMISSIVE").json(str(p))
    rows = got.collect()
    good = {(r.id, r.v) for r in rows if r._corrupt_record is None}
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == {(1, "ok"), (2, "also ok")}
    assert len(bad) == 2  # quarantined, inspectable, non-fatal

    # FAILFAST is the reference-faithful mode: the scan refuses the file
    import pytest as _pytest

    with _pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        spark.read.schema(schema).option("mode", "FAILFAST").json(str(p)).collect()
