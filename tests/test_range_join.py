"""Boundary semantics of the bucketed interval join (ev_range_interval_join).

The oracle-parity sweep checks the builder against DuckDB's naive theta
join on fixture data, but fixture timestamps virtually never land ON a
bucket or window edge.  This corpus pins the edges by hand:

- a click at exactly err_ts            -> inside (>= is inclusive)
- a click at exactly err_ts + 2h       -> inside (<= is inclusive)
- a click 1 microsecond past the end   -> outside
- a click 1 microsecond before err_ts  -> outside
- an error starting exactly on an hour boundary (its window covers
  exactly 3 bucket rows, first == date_trunc(err_ts))
- a same-bucket click from ANOTHER user -> outside (equi key)
- an error with no clicks at all       -> one row with n_clicks_2h = 0
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_T0 = dt.datetime(2024, 3, 1, 10, 0, 0)  # exactly on the hour
_US = dt.timedelta(microseconds=1)
_H2 = dt.timedelta(hours=2)

_ROWS = [
    # errors
    (100, _T0, 1, "error", 0.0, "{}"),                      # window [10:00, 12:00]
    (101, _T0 + dt.timedelta(minutes=30), 2, "error", 0.0, "{}"),  # user 2, no clicks
    # clicks for user 1
    (200, _T0, 1, "click", 0.0, "{}"),                      # == err_ts      -> IN
    (201, _T0 + _H2, 1, "click", 0.0, "{}"),                # == err_end     -> IN
    (202, _T0 + _H2 + _US, 1, "click", 0.0, "{}"),          # 1us past end   -> OUT
    (203, _T0 - _US, 1, "click", 0.0, "{}"),                # 1us before     -> OUT
    (204, _T0 + dt.timedelta(minutes=90), 1, "click", 0.0, "{}"),  # middle  -> IN
    # same bucket, wrong user
    (205, _T0 + dt.timedelta(minutes=5), 3, "click", 0.0, "{}"),   # user 3  -> OUT
]


@pytest.fixture(scope="module")
def boundary_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("range_join_sf")
    spark.createDataFrame(_ROWS, _SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "events.parquet")
    )
    return str(out)


def test_range_join_boundary_semantics(spark, boundary_dir):
    got = {
        r.err_event_id: (r.n_clicks_2h, r.first_click_ts)
        for r in all_specs()["ev_range_interval_join"]
        .builder(spark, boundary_dir)
        .collect()
    }
    assert set(got) == {100, 101}, "every error emits exactly one row"
    n, first = got[100]
    assert n == 3, f"user 1: clicks 200/201/204 in-window, got {n}"
    assert first == _T0, "first qualifying click is the err_ts-coincident one"
    assert got[101] == (0, None), "zero-match error keeps its row with count 0"
