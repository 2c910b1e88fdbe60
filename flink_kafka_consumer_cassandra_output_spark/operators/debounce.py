"""Exact debounce: keep an event iff it arrives > gap after the LAST KEPT
event of its key -- the sequential semantics a lag()-window cannot express.

With events at t=0s, 40s, 80s and a 60s gap, a lag-based filter keeps only
t=0 (both gaps are 40s), but true debounce keeps t=0 AND t=80 (80 is 80s
after the last *kept* event).  The keep decision depends on the running
fold, so this is one of the brief's genuine ``applyInPandas`` cases: no
composition of built-in window functions computes it (the island head of
``ev_burst_collapse`` is the lag-based approximation, registered separately
so the difference is measurable).

The reference engine has no debounce (its pipeline is stateless per event,
BackupMessageConsumer.java:36-39); this is the ingest-dedup shape every
at-least-once pipeline needs in front of an idempotent sink.

Scale: one shuffle on the grouping key; each (user_id, event_type) group is
scanned sequentially in Arrow-batched pandas with O(1) state.  The
sequential scan is inherent to the semantics -- the streaming deployment
(streaming/stateful.py:debounced_events) carries the same O(1) last-kept
state per key in the state store and never re-reads history, which is the
100 TB answer; the batch form assumes a single key's history fits one task
(bound it by pre-slicing to the retention window if a key can exceed that).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Kept events only, identified fully (enough to reconstruct the decision).
DEBOUNCE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)

GAP_US = 60_000_000  # 60s, integer microseconds (no interval semantics)


def _debounce_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    keep = []
    last = None
    for i, t in enumerate(us):
        if last is None or t - last > GAP_US:
            keep.append(i)
            last = int(t)
    return pdf.iloc[keep][["user_id", "event_type", "ts", "event_id"]]


def debounce_exact(ev: DataFrame) -> DataFrame:
    """Kept events under exact 60s debounce per (user_id, event_type).

    Deterministic: groups are sorted on the total (ts, event_id) key with a
    stable sort before the fold, so the kept set is a pure function of the
    input regardless of partitioning.
    """
    return ev.select("user_id", "event_type", "ts", "event_id").groupBy(
        "user_id", "event_type"
    ).applyInPandas(_debounce_group, DEBOUNCE_SCHEMA)
