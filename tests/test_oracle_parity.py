"""The main correctness gate mirror: every registered query vs its DuckDB
oracle at sf0.001 (fast) -- the driver runs the same comparison at sf0.01.

Run the full sf0.01 sweep locally with:
    SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py
"""

from __future__ import annotations

import os

import pytest

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

from .oracle import run_and_compare

PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")

_NAMES = sorted(all_specs())


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, name):
    run_and_compare(spark, name, PARITY_SF_DIR)


def test_registry_nonempty():
    assert len(_NAMES) >= 1
