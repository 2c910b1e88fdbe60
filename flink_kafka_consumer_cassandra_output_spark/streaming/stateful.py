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

from ..operators import debounce as _batch_debounce

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


# --------------------------------------------------------------------------
# Online anomaly detection (the streaming half of ev_anomaly_zscore_online)
# --------------------------------------------------------------------------

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("hour_ts", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)

#: State: exact integer prefix statistics over CLOSED hours -- the same
#: (count, sum, sum of squares) the batch query's expanding window carries,
#: so stream and batch agree bit-for-bit, floats included.
_ANOM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("ssq", T.LongType()),
    ]
)


def _update_running_anomaly(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    n, s, ssq = state.get if state.exists else (0, 0, 0)
    parts = [pdf[["ts"]] for pdf in pdfs]
    out = {c.name: [] for c in ANOMALY_SCHEMA.fields}
    if parts:
        ts = pd.concat(parts)["ts"].astype("datetime64[us]")
        counts = ts.dt.floor("h").value_counts().sort_index()
        for hr, c in counts.items():
            c = int(c)
            # Every closed hour is EMITTED (the monitoring consumer gets the
            # observed count even while the baseline is warming up); zscore
            # is null until >=3 prior hours with positive variance.  The
            # complete emission stream therefore reconstructs the full
            # (user, hour, count) table, which is what lets the twin test
            # certify this operator against the driver-checked
            # ev_anomaly_zscore batch query, not just the oracle-checked
            # online form (r12 VERDICT task 5).
            zscore = None
            if n >= 3:
                # expression tree mirrored from ev_anomaly_zscore_online:
                # double div, E[x^2]-mean^2, clamp, IEEE sqrt -- exact parity
                mean = s / n
                std = math.sqrt(max(ssq / n - mean * mean, 0.0))
                if std > 0.0:
                    zscore = (float(c) - mean) / std
            out["user_id"].append(key[0])
            out["hour_ts"].append(hr)
            out["n_events"].append(c)
            out["n_prior"].append(n)
            out["zscore"].append(zscore)
            n += 1
            s += c
            ssq += c * c
    state.update((n, s, ssq))
    yield pd.DataFrame(out)


def running_anomaly_scores(ev: DataFrame) -> DataFrame:
    """Per-user ONLINE hourly z-scores over the event stream: each closed
    hour is scored against the integer prefix statistics of the hours
    before it, then folded in.  PRECONDITION: micro-batches must be
    hour-aligned per user (no (user, hour) split across batches) -- in a
    real deployment the upstream is a watermarked hourly window aggregate
    that emits each bucket exactly once; the tests construct hour-aligned
    chunks to model that.  EVERY closed hour is emitted; ``zscore`` is
    null while the user's baseline is warming up (<3 prior hours or zero
    variance).  The scored subset equals the batch expanding-window query
    ev_anomaly_zscore_online row-for-row (integer state, mirrored float
    tree), and the full emission set reconstructs the hourly table the
    driver-checked ev_anomaly_zscore aggregates -- both pinned in
    tests/test_stateful.py."""
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_running_anomaly,
        ANOMALY_SCHEMA,
        _ANOM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Exact debounce (the streaming half of ev_debounce_exact)
# --------------------------------------------------------------------------

# Output schema and gap constant are IMPORTED from the batch operator, not
# redeclared: the stream==batch guarantee depends on both sides sharing one
# definition, and a one-sided edit would only surface if the fixture
# happened to exercise the changed boundary (r10 ADVICE).
DEBOUNCE_OUT_SCHEMA = _batch_debounce.DEBOUNCE_SCHEMA

#: State: epoch-us of the last KEPT event for this key.  O(1) per key --
#: this is why debounce deploys as a stream at 100 TB: the batch form
#: re-scans history, the stream never does.
_DEBOUNCE_STATE_SCHEMA = T.StructType([T.StructField("last_us", T.LongType())])

_DEBOUNCE_GAP_US = _batch_debounce.GAP_US


def make_debounce_update(gap_us: int):
    """Update fn factory (the CUSUM factory pattern): ``gap_us`` is the
    debounce window; the default twin uses the batch operator's GAP_US and
    the adversarial twin tests pin stream==batch at the fixture's median
    inter-event gap, where >- vs >=-boundary bugs actually fire."""

    def _update_debounce(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (last_us,) = state.get if state.exists else (None,)
        out = {c.name: [] for c in DEBOUNCE_OUT_SCHEMA.fields}
        parts = [pdf for pdf in pdfs]
        if parts:
            pdf = pd.concat(parts).sort_values(["ts", "event_id"], kind="mergesort")
            us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            for i, t in enumerate(us):
                if last_us is None or int(t) - last_us > gap_us:
                    last_us = int(t)
                    out["user_id"].append(key[0])
                    out["event_type"].append(key[1])
                    out["ts"].append(pdf["ts"].iloc[i])
                    out["event_id"].append(pdf["event_id"].iloc[i])
        if last_us is not None:
            state.update((last_us,))
        yield pd.DataFrame(out)

    return _update_debounce


def debounced_events(
    ev: DataFrame, gap_us: int = _DEBOUNCE_GAP_US
) -> DataFrame:
    """Kept events under exact 60s debounce per (user_id, event_type), the
    streaming twin of operators/debounce.py:debounce_exact.  PRECONDITION
    (same as running_anomaly_scores): micro-batches arrive in event-time
    order per key -- in a real deployment the upstream is watermark-sorted;
    the tests construct time-ordered chunks to model that.  Under that
    precondition stream==batch kept sets are identical row-for-row
    (pinned in tests/test_stateful.py)."""
    return ev.groupBy("user_id", "event_type").applyInPandasWithState(
        make_debounce_update(gap_us),
        DEBOUNCE_OUT_SCHEMA,
        _DEBOUNCE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# One-sided CUSUM alarm monitor (the streaming half of ev_cusum_alarm)
# --------------------------------------------------------------------------

CUSUM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("s", T.LongType()),
    ]
)

#: State: the scaled CUSUM statistic S (O(1) -- the whole point of
#: deploying Page's test as a stream instead of re-scanning history).
_CUSUM_STATE_SCHEMA = T.StructType([T.StructField("s", T.LongType())])


def make_cusum_alarm_update(ref: dict[str, tuple[int, int]]):
    """Update fn factory: ``ref`` maps event_type -> (n, tot), the FROZEN
    reference parameters (computed from history, exactly how a deployed
    CUSUM is configured).  d_i = 2n*cents_i - 3*tot mirrors the batch
    query's scaled integers bit-for-bit; emits rows where S > 10*tot."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (s,) = state.get if state.exists else (0,)
        n, tot = ref[key[0]]
        parts = [pdf for pdf in pdfs]
        frames = []
        if parts:
            pdf = pd.concat(parts)
            pdf = pdf[pdf["value"].notna()].sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            # Vectorized reflected-walk fold (r14 VERDICT task 3 / Table 12
            # k=32: the per-event Python loop made the hot event_type key
            # fold k x rows SERIALLY).  Page's recursion has the exact
            # closed form the batch twin already uses:
            #   S_i = Q_i - min(-S_0, min_{k<=i} Q_k),  Q = cumsum(d)
            # so the whole fold is one cumsum + one minimum.accumulate in
            # int64 numpy.  Chunked so the raw prefix Q never drifts
            # anywhere near int64 range (the CLAMPED S shares the batch
            # twin's documented overflow envelope; the unclamped Q adds at
            # most chunk_len * |d|_max on top of the carried S).
            vals = pdf["value"].to_numpy(dtype=np.float64)
            cents = np.round(vals * 100.0).astype(np.int64)  # == int(round(v*100))
            d = 2 * n * cents - 3 * tot
            thr = 10 * tot
            for lo in range(0, len(d), 1 << 20):
                dc = d[lo : lo + (1 << 20)]
                q = np.cumsum(dc)
                m = np.minimum(np.minimum.accumulate(q), -s)
                sv = q - m
                mask = sv > thr
                if mask.any():
                    sl = pdf.iloc[lo : lo + (1 << 20)]
                    frames.append(pd.DataFrame({
                        "event_type": key[0],
                        "ts": sl["ts"].to_numpy()[mask],
                        "event_id": sl["event_id"].to_numpy()[mask].astype(np.int64),
                        "s": sv[mask],
                    }))
                s = int(sv[-1]) if len(sv) else s
        state.update((s,))
        if frames:
            yield pd.concat(frames, ignore_index=True)
        else:
            yield pd.DataFrame({c.name: [] for c in CUSUM_OUT_SCHEMA.fields})

    return _update


def cusum_alarm_monitor(ev: DataFrame, ref: dict[str, tuple[int, int]]) -> DataFrame:
    """Streaming Page's-test monitor keyed by event_type with frozen
    (n, tot) reference parameters.  PRECONDITION (as running_anomaly_scores
    / debounced_events): micro-batches arrive in event-time order per key.
    Under that precondition the emitted alarm rows equal the batch
    window-identity form row-for-row (tests/test_stateful.py)."""
    return ev.groupBy("event_type").applyInPandasWithState(
        make_cusum_alarm_update(ref),
        CUSUM_OUT_SCHEMA,
        _CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Minute-granularity CUSUM monitor (the streaming half of
# ev_cusum_alarm_minute -- the SCALING.md Table 12 hot-key mitigation)
# --------------------------------------------------------------------------

CUSUM_MINUTE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("minute_ts", T.TimestampType()),
        T.StructField("s", T.LongType()),
    ]
)

#: State: the scaled statistic S plus the last folded minute (epoch ns) --
#: the monotonicity guard that makes the closed-minutes input contract
#: ENFORCED rather than documented.
_CUSUM_MINUTE_STATE_SCHEMA = T.StructType(
    [T.StructField("s", T.LongType()), T.StructField("last_ns", T.LongType())]
)


def make_cusum_minute_update(ref: dict[str, tuple[int, int]]):
    """Update fn factory over CLOSED per-(event_type, minute) partials
    ``(minute_ts, sc, c)``: Page's recursion folds once per minute with
    ``d = 2n*sc - 3*tot*c`` (the sum of the per-event d_i over the
    minute), via the same vectorized reflected-walk identity as the
    per-event monitor.  Emits (event_type, minute_ts, s) where
    S > 10*tot.  Raises if a minute arrives at or before the last folded
    one (a re-emitted or out-of-order window: upstream stage-1 must be an
    append-mode watermarked aggregation)."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (s, last_ns) = state.get if state.exists else (0, None)
        n, tot = ref[key[0]]
        parts = [pdf for pdf in pdfs]
        frames = []
        if parts:
            pdf = pd.concat(parts).sort_values("minute_ts", kind="mergesort")
            ns = pdf["minute_ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
            if len(ns):
                if last_ns is not None and int(ns[0]) <= last_ns:
                    raise ValueError(
                        f"cusum_minute[{key[0]}]: minute "
                        f"{pdf['minute_ts'].iloc[0]} at or before the last "
                        "folded minute -- stage 1 re-emitted or reordered a "
                        "window (append-mode watermarked agg required)"
                    )
                if (np.diff(ns) <= 0).any():
                    raise ValueError(
                        f"cusum_minute[{key[0]}]: duplicate minute within a "
                        "batch -- stage 1 emitted a window twice"
                    )
                d = (
                    2 * n * pdf["sc"].to_numpy(dtype=np.int64)
                    - 3 * tot * pdf["c"].to_numpy(dtype=np.int64)
                )
                q = np.cumsum(d)
                m = np.minimum(np.minimum.accumulate(q), -s)
                sv = q - m
                mask = sv > 10 * tot
                if mask.any():
                    frames.append(pd.DataFrame({
                        "event_type": key[0],
                        "minute_ts": pdf["minute_ts"].to_numpy()[mask],
                        "s": sv[mask],
                    }))
                s = int(sv[-1])
                last_ns = int(ns[-1])
        state.update((s, last_ns))
        if frames:
            yield pd.concat(frames, ignore_index=True)
        else:
            yield pd.DataFrame(
                {c.name: [] for c in CUSUM_MINUTE_OUT_SCHEMA.fields}
            )

    return _update


def cusum_minute_alarm_monitor(
    minutes: DataFrame, ref: dict[str, tuple[int, int]]
) -> DataFrame:
    """Stage 2 of the two-stage minute-CUSUM pipeline: a per-event_type
    stateful fold over CLOSED minute partials.  The hot-key bound of the
    per-event monitor (SCALING.md Table 12 k=32: a bounded key vocabulary
    means each key's task folds and TRANSFERS k x the rows) does not apply
    here -- per key, at most one row per minute reaches this operator
    regardless of event volume, because stage 1 (a JVM windowed
    aggregation with map-side combine) collapsed the rows before the
    key shuffle."""
    return minutes.groupBy("event_type").applyInPandasWithState(
        make_cusum_minute_update(ref),
        CUSUM_MINUTE_OUT_SCHEMA,
        _CUSUM_MINUTE_STATE_SCHEMA,
        # "append": alarm rows are final on emission (never updated), and
        # the stage-2 parquet sink requires append output mode
        "append",
        GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Hourly quota enforcement (the streaming half of ev_quota_flagging)
# --------------------------------------------------------------------------

QUOTA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("allowed", T.BooleanType()),
    ]
)

#: State: (current hour bucket in epoch-us, events seen in it).  O(1) per
#: USER -- the hour key lives in the value, so state never grows with
#: time, only with the user population (vs keying state by (user, hour),
#: which leaks an entry per hour forever).
_QUOTA_STATE_SCHEMA = T.StructType(
    [T.StructField("hour_us", T.LongType()), T.StructField("n", T.LongType())]
)

_QUOTA_PER_HOUR = 1
#: Hour bucketing is EPOCH-INTEGER (us // _HOUR_US), i.e. UTC hours.  The
#: batch gate this twin is pinned against buckets with
#: date_trunc('hour', ts) in the SESSION timezone; the two conventions
#: agree because session.py pins spark.sql.session.timeZone=UTC (any
#: whole-hour offset would also agree; a :30/:45-offset zone would NOT).
#: tests/test_stateful.py asserts the UTC pin next to the twin so the
#: dependency is executable, not prose (r10 ADVICE).
_HOUR_US = 3_600_000_000


def make_quota_update(quota_per_hour: int):
    """Update fn factory: ``quota_per_hour`` defaults to 1 in the
    registered twin (exercising the throttle branch at every fixture
    scale); the adversarial twin test pins stream==batch at the fixture's
    MAX per-(user, hour) count, where every decision is an allow."""

    def _update_quota(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hour_us, n = state.get if state.exists else (-1, 0)
        out = {c.name: [] for c in QUOTA_OUT_SCHEMA.fields}
        parts = [pdf for pdf in pdfs]
        if parts:
            pdf = pd.concat(parts).sort_values(["ts", "event_id"], kind="mergesort")
            us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            for i in range(len(pdf)):
                h = (int(us[i]) // _HOUR_US) * _HOUR_US
                if h != hour_us:
                    hour_us, n = h, 0
                n += 1
                out["user_id"].append(key[0])
                out["ts"].append(pdf["ts"].iloc[i])
                out["event_id"].append(int(pdf["event_id"].iloc[i]))
                out["allowed"].append(n <= quota_per_hour)
        state.update((hour_us, n))
        yield pd.DataFrame(out)

    return _update_quota


def quota_enforced_events(
    ev: DataFrame, quota_per_hour: int = _QUOTA_PER_HOUR
) -> DataFrame:
    """Per-event allow/throttle decisions under the 1-per-(user, hour)
    quota, the ONLINE form of the batch audit ev_quota_flagging.
    PRECONDITION (as the other stateful twins): micro-batches arrive in
    event-time order per key.  Under that precondition the decision per
    event equals the batch row_number gate exactly
    (tests/test_stateful.py)."""
    return ev.groupBy("user_id").applyInPandasWithState(
        make_quota_update(quota_per_hour),
        QUOTA_OUT_SCHEMA,
        _QUOTA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
