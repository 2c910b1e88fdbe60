"""Physical-plan invariants, enforced — not just dumped into PLANS.md.

The 100 TB claims the operator docstrings make are properties of the PLAN,
so they are gated here: no unintended cartesian product anywhere in the
registry, broadcast join strategy where dimension sizes demand it, top-k
without a global sort, and filter pushdown reaching the parquet scan.
Plans are built (never executed), so the whole sweep is cheap.
"""

from __future__ import annotations

import pytest

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

from .conftest import SF_DIR  # honors SPARK_GRAFT_TEST_SF_DIR like the suite


def _plan(spark, name: str) -> str:
    df = all_specs()[name].builder(spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_no_cartesian_product_anywhere(spark, name):
    """CartesianProductExec is the never-acceptable plan node: every
    similarity/codebook pairing in the repo is either an equi-join or a
    bounded BroadcastNestedLoopJoin (small side broadcast), and a true
    cartesian product of two large sides would be a scale bug wherever it
    appeared."""
    assert "CartesianProduct" not in _plan(spark, name), (
        f"{name}: plan contains a CartesianProduct"
    )


def test_q5_broadcasts_every_dimension(spark):
    plan = _plan(spark, "q5_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 4, "dimension joins must be BHJ"
    assert "SortMergeJoin" not in plan, "no dimension should shuffle-sort-merge"


def test_global_topk_avoids_global_sort(spark):
    plan = _plan(spark, "orderby_limit_top20_orders")
    assert "TakeOrderedAndProject" in plan, (
        "global ORDER BY + LIMIT must plan as TakeOrderedAndProject "
        "(per-partition top-k + merge), not a full sort"
    )


def test_filter_pushdown_reaches_parquet_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, (
        "the shipdate predicate must reach the parquet scan"
    )


def test_column_pruning_reaches_parquet_scan(spark):
    """q14 needs 4 of lineitem's 11 columns; the scan schema must show the
    pruning (reading all columns for a narrow aggregate is the classic
    silent 100 TB regression)."""
    plan = _plan(spark, "q14_promo_revenue")
    start = plan.index("ReadSchema")
    read_schema = plan[start : plan.index("\n", start)]
    for col in ("l_partkey", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read_schema
    for col in ("l_comment", "l_orderkey", "l_suppkey", "l_returnflag"):
        assert col not in read_schema, f"unpruned column {col} in lineitem scan"


def test_reference_pipeline_is_single_stage_narrow(spark):
    """The reference's hand-fused operator chain (SURVEY.md section 4.1)
    must stay shuffle-free in the engine too: no hash/range exchange in
    the encrypted detail projection.  (The loader's round-robin spread of
    the single-file fixture IS an exchange node but not a logical shuffle
    -- it disappears at real scale where scan partitions exceed cores.)"""
    plan = _plan(spark, "msg_detail_encrypted")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_detail_encrypt_runs_aes_once_per_row(spark):
    """The O9 null-drop must not double the cipher work: exactly one
    aesEncrypt call in the plan (filtering on the ciphertext instead of
    the plaintext re-evaluates the encrypt expression under pushdown)."""
    plan = _plan(spark, "msg_detail_encrypted")
    assert plan.count("aesEncrypt") == 1, (
        f"expected 1 aesEncrypt in plan, found {plan.count('aesEncrypt')}"
    )
