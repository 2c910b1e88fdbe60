from __future__ import annotations

import os
import sys
import time

import pytest

# Pin the process (and therefore JVM-default) timezone before any
# SparkSession starts: test_loader_survives_unset_timezone_conf asserts the
# unset-conf path resolves to a UTC-equivalent zone and normalizes SILENTLY,
# which is only host-independent if the JVM default zone is pinned (r12
# ADVICE -- on a non-UTC host the legitimate override warning would fail
# the silent-path assertion).
os.environ["TZ"] = "UTC"
time.tzset()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = local_session(cores=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
