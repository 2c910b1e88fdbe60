"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps NO keyed state in the engine (SURVEY.md section 2
"stateful ops" row: the only state-like behavior is the Cassandra upsert);
this module provides the escape hatch the brief requires for operators that
built-ins can't express: arbitrary per-key state updated per micro-batch
with Arrow-batched Python, spill-safe and checkpointed by the state store.

Example operator: per-user running event counters (count + decimal-free
value sum + last-seen event time), emitted in ``update`` mode every batch.
Used as the template: swap the pandas body for any per-key logic (rate
limiting, anomaly flags, CDC merge) and the state schema accordingly.

Scale: one shuffle on the grouping key per batch; state lives in the
executor state store (RocksDB on a real cluster), sized by |keys|, not by
row volume.  The Python crossing is Arrow-batched per key-group, not
per row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output: one row per key per batch in which the key appeared.
RUNNING_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

#: State: (count, value sum in integer cents, last event time micros).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_running_counts(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # integer cents: order-insensitive exact sum (2dp-clean doubles)
        cents += int(round(pdf["value"].mul(100).round().sum())) if len(pdf) else 0
        if len(pdf):
            # normalize to us regardless of the Arrow->pandas datetime unit
            us = pdf["ts"].astype("datetime64[us]").astype("int64")
            last_us = max(last_us, int(us.max()))
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value_cents": [cents],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_counts(ev: DataFrame) -> DataFrame:
    """Per-user running (count, exact value sum, last seen) over the event
    stream; emits the updated totals for every user present in each batch."""
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_running_counts,
        RUNNING_COUNT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
