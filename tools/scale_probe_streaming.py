"""Scaling probe for the five applyInPandasWithState streaming operators
(streaming/stateful.py): wall-clock to drain a k-replicated event stream.

Usage: python tools/scale_probe_streaming.py <k>   (one fresh JVM per k;
       run k = 1 2 4 8 as separate invocations — SCALING.md explains why
       a single-session sweep self-contaminates)

The sf0.1 events table (100k rows) is replicated k times with user_id and
event_id re-keyed into per-replica id spaces (timestamps unchanged), so
the KEY population grows k× for the user-keyed operators (counter, quota,
anomaly, debounce on (user, event_type)) while the event_type-keyed CUSUM
monitor keeps its ~bounded key set and each key gets k× heavier — the
honest hot-key bound, reported separately.  The stream arrives as 4
event-time-ordered parquet chunks (maxFilesPerTrigger=1 → 4 micro-batches,
state carried between them), drained with availableNow into a noop
foreachBatch sink; wall is min-of-REPEATS full drains, each from a fresh
checkpoint.

The scale claim: per-key state is O(1) and batches shuffle on the key, so
user-keyed drain cost is ~linear in rows with the constant stream-startup
overhead amortizing as k grows (sec/k falling).  On a real cluster the
same plan spreads keys across executors; nothing here holds state
proportional to history.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.streaming import pipeline as sp  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.streaming import stateful as st  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "2"))
N_CHUNKS = 4
ID_SPACE = 100_000_000


def build_chunks(k: int, out: str) -> int:
    """k-replicated, event-time-ordered, HOUR-ALIGNED chunk files (the
    anomaly scorer's documented precondition; harmless for the others)."""
    con = duckdb.connect()
    try:
        tbl = con.execute(
            f"SELECT * FROM '{SF_DIR}/events.parquet' ORDER BY ts, event_id"
        ).arrow()
    finally:
        con.close()
    reps = []
    for rep in range(k):
        t = tbl
        if rep:
            t = t.set_column(
                t.schema.get_field_index("user_id"), "user_id",
                pc.add(t.column("user_id"), rep * ID_SPACE))
            t = t.set_column(
                t.schema.get_field_index("event_id"), "event_id",
                pc.add(t.column("event_id"), rep * ID_SPACE))
        reps.append(t)
    big = pa.concat_tables(reps).sort_by([("ts", "ascending"), ("event_id", "ascending")])
    # hour-aligned split
    hours = pc.floor_temporal(big.column("ts"), unit="hour")
    uniq = pc.unique(hours)
    per = (len(uniq) + N_CHUNKS - 1) // N_CHUNKS
    os.makedirs(out, exist_ok=True)
    base = time.time()
    for i in range(N_CHUNKS):
        sel = uniq.slice(i * per, per)
        mask = pc.is_in(hours, value_set=sel)
        path = f"{out}/chunk{i}.parquet"
        pq.write_table(big.filter(mask), path)
        os.utime(path, (base + i, base + i))
    return big.num_rows


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    k = int(sys.argv[1])
    spark = local_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    root = f"/tmp/sfprobe_stream_k{k}"
    shutil.rmtree(root, ignore_errors=True)
    in_dir = f"{root}/in"
    n_rows = build_chunks(k, in_dir)

    # frozen CUSUM reference parameters from the batch helper (frozen-param
    # deployment is the operator's documented mode)
    from flink_kafka_consumer_cassandra_output_spark.plans.events_queries import (
        cusum_alarm_rows,
    )

    ref = {
        r.event_type: (r.n, r.tot)
        for r in cusum_alarm_rows(spark, SF_DIR)
        .select("event_type", "n", "tot").distinct().collect()
    }

    OPS = [
        ("counter (user)", lambda ev: st.running_user_counts(ev)),
        ("quota (user)", lambda ev: st.quota_enforced_events(ev)),
        ("debounce (user,type)", lambda ev: st.debounced_events(ev)),
        ("anomaly (user)", lambda ev: st.running_anomaly_scores(ev)),
        ("cusum (type; hot-key bound)", lambda ev: st.cusum_alarm_monitor(ev, ref)),
    ]

    only = os.environ.get("SPARK_GRAFT_PROBE_OPS")
    if only:
        keep = {o.strip() for o in only.split(",")}
        OPS = [(n, b) for n, b in OPS if n.split()[0] in keep]

    def noop_batch(df, _bid):
        df.write.format("noop").mode("overwrite").save()

    print(f"| k | operator | rows | seconds | sec/k |")
    print("|---|---|---|---|---|")

    # Two-stage minute-CUSUM pipeline (the Table 12 hot-key mitigation):
    # timed as the full stage1+stage2 drain.  Needs a flush sentinel past
    # the last real minute (value NULL, dropped after the chunks).
    if not only or "cusum-minute" in {o.strip() for o in only.split(",")}:
        con = duckdb.connect()
        try:
            sentinel = con.execute(
                "SELECT CAST(-1 AS BIGINT) AS event_id, "
                "       max(ts) + INTERVAL 2 MINUTE AS ts, "
                "       CAST(-1 AS BIGINT) AS user_id, "
                "       'sentinel' AS event_type, "
                "       CAST(NULL AS DOUBLE) AS value, "
                "       CAST(NULL AS VARCHAR) AS props "
                f"FROM '{SF_DIR}/events.parquet'"
            ).arrow()
        finally:
            con.close()
        path = f"{in_dir}/chunk_sentinel.parquet"
        pq.write_table(sentinel, path)
        mt = max(os.path.getmtime(f"{in_dir}/{f}") for f in os.listdir(in_dir))
        os.utime(path, (mt + 1, mt + 1))
        best = float("inf")
        best_split = (0.0, 0.0)
        for rep in range(REPEATS):
            work = f"{root}/mwork_{rep}"
            t0 = time.monotonic()
            q1 = sp.run_cusum_minute_stage1(spark, in_dir, f"{work}/stage", f"{work}/cp1")
            q1.awaitTermination()
            t1 = time.monotonic()
            q2 = sp.run_cusum_minute_stage2(
                spark, f"{work}/stage", f"{work}/out", f"{work}/cp2", ref
            )
            q2.awaitTermination()
            t2 = time.monotonic()
            if t2 - t0 < best:
                best = t2 - t0
                best_split = (t1 - t0, t2 - t1)
        print(
            f"| {k} | cusum-minute (two-stage pre-agg) | {n_rows} "
            f"| {best:.2f} | {best / k:.2f} |"
            f"  <!-- stage1 {best_split[0]:.2f}s, stage2 {best_split[1]:.2f}s -->"
        )
        os.remove(path)

    for name, build in OPS:
        best = float("inf")
        for rep in range(REPEATS):
            cp = f"{root}/cp_{name.split()[0]}_{rep}"
            ev = sp.stream_events(spark, in_dir, max_files_per_trigger=1)
            t0 = time.monotonic()
            q = (
                build(ev)
                .writeStream.foreachBatch(noop_batch)
                .outputMode("update")
                .option("checkpointLocation", cp)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            best = min(best, time.monotonic() - t0)
        print(f"| {k} | {name} | {n_rows} | {best:.2f} | {best / k:.2f} |")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
