"""Driver-check staleness audit: rounds since each registry entry last held
a driver slot and passed the external DuckDB gate.

Usage: python tools/staleness.py [CURRENT_ROUND]

With the never-driver-checked backlog at 0 (r13), driver slots rotate for
FRESHNESS: oldest-green-first re-verification, because a green from six
rounds ago predates several refactors of the machinery under it (e.g. the
weighted-sample rewrite in r12 changed code that r6-green sampling queries
share).  This tool ranks every entry by rounds-since-last-check and prints
the ranked list plus the histogram the rotation plan and COVERAGE.md cite.

Entries currently ON the driver surface count as checked in CURRENT_ROUND
(they face the oracle when the round's sweep lands).  The staleness budget
(tools/r14_rotation_plan.md): no entry older than STALENESS_BUDGET rounds
at the end of a round; promote oldest-first until the budget holds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from tools.rotation_lib import entry_is_green  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: max rounds an entry may go without facing the external oracle
STALENESS_BUDGET = 10


def last_checked(current_round: int) -> dict[str, int]:
    """Entry name -> round of its most recent driver check (current driver
    entries count as ``current_round``)."""
    specs = all_specs()
    last: dict[str, int] = {}
    for r in range(1, current_round + 1):
        path = os.path.join(ROOT, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):
            continue
        for name, v in json.load(open(path)).items():
            # only a GREEN sweep row counts as a check (ADVICE r13: a
            # red/errored entry must not evade re-promotion for a budget)
            if name in specs and entry_is_green(v):
                last[name] = r
    for name, spec in specs.items():
        if spec.driver:
            last[name] = current_round
    return last


def main() -> None:
    current = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    specs = all_specs()
    last = last_checked(current)
    never = sorted(n for n in specs if n not in last)
    ranked = sorted(
        ((current - r, n, r) for n, r in last.items()), reverse=True
    )
    hist: dict[int, int] = {}
    for age, _, _ in ranked:
        hist[age] = hist.get(age, 0) + 1
    print(f"registry {len(specs)}; never driver-checked: {len(never)}")
    if never:
        print("  " + " ".join(never))
    print("staleness histogram (rounds since last check):",
          dict(sorted(hist.items())))
    over = [(a, n, r) for a, n, r in ranked if a > STALENESS_BUDGET]
    print(f"over budget (> {STALENESS_BUDGET} rounds): {len(over)}")
    print(f"\noldest-first (top 40 of {len(ranked)}):")
    for age, name, r in ranked[:40]:
        flag = " <-- OVER BUDGET" if age > STALENESS_BUDGET else ""
        print(f"  {age:3d}  {name}  (last r{r}){flag}")


if __name__ == "__main__":
    main()
