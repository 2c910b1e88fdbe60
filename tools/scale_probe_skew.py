"""Skewed-replica scaling probe (VERDICT r6 item 2).

Usage: python tools/scale_probe_skew.py <k> [uniform|hot]
       (one fresh JVM per (k, mode); run each as a separate invocation --
       SCALING.md explains why a single-session sweep self-contaminates)

The three existing SCALING.md probes replicate data UNIFORMLY, so they
cannot see a straggler task.  This probe replicates the sf0.1 events and
documents fixtures k x exactly like scale_probe_events/scale_probe.py,
then (mode=hot) additionally REMAPS half of every replica onto one hot
key so a single key owns ~50% of all rows at every k:

- events: every even event_id's user_id becomes replica-local user 0
  -> one user holds ~50% of the 100k x k events (the reference domain's
  realistic hot key: one chatty username).
- documents: a hot token is appended to ~50% of every replica's docs
  (doc_id % 2 = 0), stressing the near-dup prefix join's token-frequency
  skew.

Probed (the REGISTERED builders + the salted-agg operator, unchanged):
  - ev_session_windows:   per-user session state -- the hot user's events
    all land in ONE task's sort (inherent to per-key sessionization; the
    probe quantifies the straggler).
  - ev_top_sessions_by_events: same shuffle + global top-k.
  - doc_near_dup_jaccard: PPJoin prefix join under token skew -- rarest-
    first prefix selection should IGNORE the hot token entirely (it is
    the most frequent, so it never enters any prefix): expected ~uniform
    wall-clock, the designed skew resistance.
  - salted_group_count(events, user_id): the two-phase salted aggregate
    vs the plain groupBy count on the same hot data -- the operator
    whose whole purpose is this distribution.

Acceptance (SCALING.md table 4): hot wall-clock within ~1.5x of the
uniform run at equal k, or a finding + fix where it is not.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.operators.skew import salted_group_count  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.sources import tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "3"))
ID_SPACE = 100_000_000
HOT_TOKEN = " zzhottok" * 3  # appended to 50% of docs in hot mode


def build_probe_dir(spark: SparkSession, k: int, hot: bool) -> str:
    out = f"/tmp/sfprobe_skew_k{k}_{'hot' if hot else 'uni'}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("user_id", F.col("rep") * ID_SPACE + F.col("user_id"))
        .withColumn("event_id", F.col("rep") * ID_SPACE + F.col("event_id"))
    )
    if hot:
        ev = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % 2 == 0, F.lit(0).cast("long")).otherwise(
                F.col("user_id")
            ),
        )
    (
        ev.drop("rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(os.path.join(out, "events.parquet"))
    )
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    d = d.crossJoin(F.broadcast(reps)).withColumn(
        "doc_id", F.col("rep") * ID_SPACE + F.col("doc_id")
    )
    if hot:
        d = d.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(HOT_TOKEN))
            ).otherwise(F.col("text")),
        )
    (
        d.drop("rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(os.path.join(out, "documents.parquet"))
    )
    for name in tables.TABLES:
        if name in ("events", "documents"):
            continue
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return out


def main() -> None:
    if len(sys.argv) != 3 or sys.argv[2] not in ("uniform", "hot"):
        raise SystemExit(__doc__)
    k, hot = int(sys.argv[1]), sys.argv[2] == "hot"
    spark = local_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    probe_dir = build_probe_dir(spark, k, hot)
    specs = all_specs()
    mode = "hot" if hot else "uniform"

    def runners():
        for name in ("ev_session_windows", "ev_top_sessions_by_events",
                     "doc_near_dup_jaccard"):
            yield name, (lambda n=name: specs[n].builder(spark, probe_dir))
        ev = tables.load(spark, probe_dir, "events")
        yield "salted_group_count_user", lambda: salted_group_count(ev, ["user_id"])
        yield "plain_group_count_user", lambda: (
            ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        )

    print("| k | mode | query | result rows | seconds | sec/k |")
    print("|---|---|---|---|---|---|")
    for name, mk in runners():
        mk().write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.monotonic()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        rows = mk().count()
        print(f"| {k} | {mode} | {name} | {rows} | {best:.2f} | {best / k:.2f} |")
    shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
