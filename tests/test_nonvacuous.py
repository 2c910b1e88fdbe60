"""Non-vacuity gate: every registered query must return rows on fixture data.

Motivation (round 7): q11's fixed 0.5%-of-total threshold and q22's
no-orders-at-all dormancy predicate each returned ZERO rows at the
driver's sf0.01 -- so their driver hash checks were passing on empty
results, verifying nothing.  The strict-contiguity first cut of
ev_ts_pattern_match had the same defect at every SF.  A query whose gate
compares empty to empty is not a gate; this test makes that class of
regression impossible to reintroduce silently.

Runs at sf0.001 to stay cheap.  Three selective multi-join TPC-H shapes
are legitimately empty at 50-customer scale and carry an explicit
allowlist entry; each was hand-verified non-empty at sf0.01 (the scale
the driver checks) in the round-7 audit.
"""

from __future__ import annotations

import pytest

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

SF_DIR = "/root/testdata/sf0.001"

#: Queries allowed to be empty at sf0.001 ONLY -- all verified non-empty at
#: sf0.01.  A new entry here needs the same hand-verification.
EMPTY_AT_TINY_SF = {
    "q7_volume_shipping",        # 2-nation x 2-year join: no qualifying rows at 50 customers
    "q20_excess_qty_suppliers",  # half-year excess-quantity cut: empty below sf0.01
    "q21_waiting_supplier",      # multi-order EXISTS/NOT-EXISTS chain: needs order volume
}

_NAMES = sorted(n for n in all_specs() if n not in EMPTY_AT_TINY_SF)


@pytest.mark.parametrize("name", _NAMES)
def test_query_returns_rows(spark, name):
    n = all_specs()[name].builder(spark, SF_DIR).count()
    assert n > 0, (
        f"{name}: zero rows at {SF_DIR} -- its oracle gate is vacuous "
        "(empty==empty proves nothing); loosen a threshold or derive it "
        "from the data as q11/q22 do"
    )
