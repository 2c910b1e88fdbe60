"""Per-query cost breakdown for the r17 optimization round.

For each query: builder wall time (Python plan construction + any eager
bounded jobs), then N noop-sink runs timed separately (run1 includes
codegen compile + AQE planning cold; run2/3 approximate the steady state
min-of-N the bench reports).  Output: one JSON line per query on stdout.

Usage: python tools/profile_r17.py [name ...]   (default: all)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_consumer_cassandra_output_spark.materialize import (  # noqa: E402
    SESSION_MEMO_BUILD_SECONDS,
)
from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = local_session()
    specs = all_specs()
    names = sys.argv[1:] or sorted(specs)
    # warm-up (JVM/codegen/parquet footers), same as bench.py
    try:
        specs["q6_forecast_revenue"].builder(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass
    for name in names:
        rec = {"q": name}
        m0 = sum(SESSION_MEMO_BUILD_SECONDS.values())
        t0 = time.perf_counter()
        try:
            df = specs[name].builder(spark, sf_dir)
        except Exception as e:
            rec["err"] = f"build: {type(e).__name__}: {e}"[:160]
            print(json.dumps(rec), flush=True)
            continue
        rec["build_s"] = round(time.perf_counter() - t0
                               - (sum(SESSION_MEMO_BUILD_SECONDS.values()) - m0), 3)
        runs = []
        for i in range(3):
            t0 = time.perf_counter()
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:
                rec["err"] = f"run{i}: {type(e).__name__}: {e}"[:160]
                break
            runs.append(round(time.perf_counter() - t0, 3))
        rec["runs"] = runs
        # a rebuilt frame per repeat is what bench.py times; note the delta
        t0 = time.perf_counter()
        try:
            specs[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rec["rebuild_run_s"] = round(time.perf_counter() - t0, 3)
        except Exception:
            pass
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
