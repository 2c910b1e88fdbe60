"""Null/degenerate-event hardening: the events twin of
tests/test_degenerate_corpus.py.

Every events-consuming builder in the registry must BUILD and EXECUTE
(collect without raising) over a corpus of adversarial rows the pristine
fixture never produces: NULL ts (windows/sessions/as-of arithmetic), NULL
user_id (grouping/partition keys), NULL event_type (funnel/filter
predicates), NULL value (aggregates/gap-fill), malformed and NULL props
JSON (from_json), duplicate event_ids, an epoch-0 and a far-future
timestamp (window arithmetic extremes), and a user with a single event
(window frames of length 1).  The claim is totality, not values --
cross-engine values on degenerate inputs are pinned per-operator where
they matter (e.g. tests/test_range_join.py boundary semantics).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(i, minutes, user, etype, value=1.0, props='{"k": 1}'):
    return (i, _T0 + dt.timedelta(minutes=minutes), user, etype, value, props)


_ROWS = [
    # a healthy little core so joins/windows/funnels have real work
    _ev(1, 0, 1, "view"),
    _ev(2, 5, 1, "click"),
    _ev(3, 10, 1, "purchase"),
    _ev(4, 0, 2, "error"),
    _ev(5, 30, 2, "click"),
    _ev(6, 90, 2, "view"),
    # degenerate rows
    (7, None, 1, "view", 1.0, "{}"),                      # NULL ts
    _ev(8, 15, None, "click"),                            # NULL user
    (9, _T0, 3, None, 1.0, "{}"),                         # NULL type
    (10, _T0, 3, "view", None, "{}"),                     # NULL value
    (11, _T0, 3, "click", 1.0, None),                     # NULL props
    (12, _T0, 3, "view", 1.0, "not json {{{"),            # malformed props
    (13, _T0, 3, "view", 1.0, '{"k": "not-a-long"}'),     # type-mismatched props
    _ev(2, 5, 1, "click"),                                # duplicate event_id
    (14, dt.datetime(1970, 1, 1), 4, "view", 0.0, "{}"),  # epoch 0
    (15, dt.datetime(2099, 12, 31, 23, 59), 4, "view", 9.9, "{}"),  # far future
    _ev(16, 0, 5, "error"),                               # 1-event user
    (17, None, None, None, None, None),                   # all-null row
]

_PREFIX = "ev_"

_NAMES = sorted(n for n in all_specs() if n.startswith(_PREFIX))


@pytest.fixture(scope="module")
def degenerate_events_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("degenerate_events_sf")
    spark.createDataFrame(_ROWS, _SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "events.parquet")
    )
    return str(out)


def test_sweep_covers_the_events_surface():
    assert len(_NAMES) >= 14, _NAMES


@pytest.mark.parametrize("name", _NAMES)
def test_builder_total_on_degenerate_events(spark, degenerate_events_dir, name):
    df = all_specs()[name].builder(spark, degenerate_events_dir)
    rows = df.collect()  # must EXECUTE, not just build the plan
    assert rows is not None
