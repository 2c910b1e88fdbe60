"""SPARK_GRAFT_STAGING_DIR: the cluster-mode materialization backend
(parquet staging tables instead of localCheckpoint) must produce
RESULT-IDENTICAL frames -- the documented equivalence is executable, not
prose.  Exercised on the two pipelines that materialize the most
(prefix-filter join inside, funnel with two staged intermediates)."""

from __future__ import annotations

import os

import pytest

from flink_kafka_consumer_cassandra_output_spark.materialize import STAGING_ENV
from flink_kafka_consumer_cassandra_output_spark.plans import all_specs


@pytest.mark.parametrize("name", ["doc_near_dup_jaccard", "doc_curation_funnel"])
def test_staging_tables_match_local_checkpoint(spark, sf_dir, tmp_path, name):
    spec = all_specs()[name]
    local = {tuple(r) for r in spec.builder(spark, sf_dir).collect()}
    os.environ[STAGING_ENV] = str(tmp_path / "staging")
    try:
        staged = {tuple(r) for r in spec.builder(spark, sf_dir).collect()}
    finally:
        os.environ.pop(STAGING_ENV, None)
    assert staged == local
    # the staging dir was actually used (at least one stage table written)
    stages = list((tmp_path / "staging").iterdir())
    assert stages, "staging mode did not write any stage table"
