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


@pytest.mark.parametrize(
    "name",
    [
        "doc_near_dup_jaccard",
        "doc_curation_funnel",
        # the ITERATIVE pipeline: every connected-components round now
        # routes through materialize(), so cluster staging mode covers
        # the one loop that would otherwise keep hardcoded localCheckpoint
        "doc_dedup_clusters",
    ],
)
def test_staging_tables_match_local_checkpoint(spark, sf_dir, tmp_path, name):
    spec = all_specs()[name]
    local = {tuple(r) for r in spec.builder(spark, sf_dir).collect()}
    os.environ[STAGING_ENV] = str(tmp_path / "staging")
    try:
        staged = {tuple(r) for r in spec.builder(spark, sf_dir).collect()}
    finally:
        os.environ.pop(STAGING_ENV, None)
    assert staged == local
    # the staging dir was actually used, and every stage table landed
    # under the application-id subdir -- the reclamation contract
    # (cleanup_staging / an app-id janitor) depends on the scoping
    app_dirs = list((tmp_path / "staging").iterdir())
    assert app_dirs, "staging mode did not write any stage table"
    assert [d.name for d in app_dirs] == [spark.sparkContext.applicationId]
    assert list(app_dirs[0].iterdir()), "app dir holds no stage tables"


def test_cleanup_staging_removes_only_this_apps_dir(spark, sf_dir, tmp_path):
    from flink_kafka_consumer_cassandra_output_spark.materialize import (
        cleanup_staging,
    )

    os.environ[STAGING_ENV] = str(tmp_path / "staging")
    try:
        all_specs()["doc_near_dup_jaccard"].builder(spark, sf_dir).collect()
        other = tmp_path / "staging" / "application_someone_else"
        other.mkdir()
        (other / "stage-keep").mkdir()
        cleanup_staging(spark)
        left = {d.name for d in (tmp_path / "staging").iterdir()}
        assert left == {"application_someone_else"}, left
    finally:
        os.environ.pop(STAGING_ENV, None)
