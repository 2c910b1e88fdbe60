"""Dump .explain("formatted") for registered queries to plans/r18/.

Usage:
    python tools/explain_r18.py before [name ...]   # default: all queries
    python tools/explain_r18.py after  name [...]

Writes plans/r18/<query>_<tag>.txt — the optimization-round evidence files
(the judge checks plan claims in OPTIMIZATION_r18.md against these).
Builders that eagerly run bounded jobs (collect_small / session_memo) run
them for real: the folded literals ARE the plan under audit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r18")
    os.makedirs(out_dir, exist_ok=True)
    spark = local_session()
    specs = all_specs()
    if not names:
        names = sorted(specs)
    for name in names:
        try:
            df = specs[name].builder(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # record the failure instead of dying mid-sweep
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
