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


def test_q5_broadcasts_fixed_dimensions(spark):
    """Only region (5 rows) and nation (25 rows) carry broadcast hints --
    customer/supplier grow with SF, so their strategy is left to AQE/stats
    (r8 policy: a hint overrides size checks and would OOM the driver at
    100 TB).  At test scale the statistics still pick BHJ for every dim,
    which is exactly the point: same plan now, safe plan at scale."""
    plan = _plan(spark, "q5_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2, "region/nation joins must be BHJ"


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


# --------------------------------------------------------------------------
# TPC-H adapted batch (plans/tpch_adapted_queries.py): each test pins the
# plan property the query's docstring claims survives a 100x scale-up.
# --------------------------------------------------------------------------

def test_q6_all_three_predicates_push_to_scan(spark):
    """Q6 is the scan-dominated query: its cost at 100 TB IS the pruned
    scan, so shipdate AND discount AND quantity must all reach parquet."""
    plan = _plan(spark, "q6_forecast_revenue")
    start = plan.index("PushedFilters")
    pushed = plan[start : plan.index("\n", start)]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate not pushed: {pushed}"


def test_q18_having_set_broadcasts_onward(spark):
    """The >200-unit order set is HAVING-bounded (tiny at any scale) so it
    keeps its hint; customer is SF-proportional and hint-free (r8 policy),
    though stats still pick BHJ for it at test scale.  The top-20 must
    avoid a global sort."""
    plan = _plan(spark, "q18_large_volume_customers")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "TakeOrderedAndProject" in plan


def test_q10_topk_avoids_global_sort(spark):
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan


def test_q21_exists_chain_is_one_semi_one_anti(spark):
    """The EXISTS/NOT-EXISTS pair must plan as joins (no correlated
    re-execution): exactly one LeftSemi and one LeftAnti over lineitem."""
    plan = _plan(spark, "q21_waiting_supplier")
    assert "LeftSemi" in plan, "EXISTS must become a left-semi join"
    assert "LeftAnti" in plan, "NOT EXISTS must become a left-anti join"


def test_q13_outer_join_survives_condition_filter(spark):
    """The priority filter lives IN the join condition; if it slid into a
    WHERE the join would degrade to inner and silently drop the zero-order
    bucket Q13 exists to count."""
    plan = _plan(spark, "q13_customer_distribution")
    assert "LeftOuter" in plan


def test_q19_disjunction_keeps_the_equi_join(spark):
    """The OR-of-bands must not defeat the p_partkey equi-join: a nested-
    loop join here is the classic Q19 planner failure."""
    plan = _plan(spark, "q19_disjunctive_revenue")
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_q17_window_decorrelation_scans_lineitem_once(spark):
    """The correlated AVG is decorrelated into a window over the SAME
    brand-pruned rows -- a second lineitem scan would mean the subquery
    re-executed as a self-join."""
    plan = _plan(spark, "q17_small_quantity_revenue")
    assert plan.count("lineitem.parquet") == 1, (
        "correlated-avg decorrelation must not rescan lineitem"
    )


def test_q21_smj_regime_executed_plan(spark):
    """Pin the EXECUTED sort-merge-regime plan for q21 (the AQE strategy
    flip SCALING.md's TPC-H probe documented at k>=4), by disabling
    broadcast instead of replicating data: the semi/anti chain must run
    as SortMergeJoin LeftSemi + LeftAnti with NO correlated re-execution
    and no cartesian product.  Also pins the honest r7 finding: column
    pruning makes the semi's build side narrower than the anti's, so the
    two probe exchanges are NOT collapsed by ReuseExchange (each shuffles
    its own pruned projection) -- if a future Spark starts reusing here,
    this assert fails and the SCALING.md narrative should be upgraded.
    Runs at the oracle scale (sf0.01): the sf0.001 result is empty and
    AQE collapses empty relations to a degenerate plan.
    """
    from .conftest import SF_DIR_ORACLE

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = all_specs()["q21_waiting_supplier"].builder(spark, SF_DIR_ORACLE)
        rows = df.collect()  # finalize the adaptive plan
        assert rows, "q21 must be non-empty at sf0.01 for a real final plan"
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin LeftSemi" in final, "EXISTS probe must be SMJ semi"
        assert "SortMergeJoin LeftAnti" in final, "NOT EXISTS probe must be SMJ anti"
        assert "CartesianProduct" not in final
        assert "AQEShuffleRead" in final, "the adaptive plan must have executed"
        assert "ReusedExchange" not in final, (
            "probe-side exchanges were reused: the r7 pruning finding no "
            "longer holds -- update the q21 docstring and SCALING.md to "
            "claim the (better) shared-exchange plan"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_range_join_is_equi_not_bnlj(spark):
    """ev_range_interval_join's whole point is decomposing the time-range
    theta join into a (user, hour-bucket) EQUI join with the range as the
    join's residual condition.  If Catalyst ever failed to extract the
    equi keys, the plan would degrade to a BroadcastNestedLoopJoin (or,
    without a broadcastable side, a cartesian) -- the exact scale bug the
    bucketing exists to prevent."""
    plan = _plan(spark, "ev_range_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan, (
        "range join lost its equi keys (BNLJ = per-row scan of the build side)"
    )
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), (
        "expected an equi-join (BHJ at fixture scale, SMJ at real scale)"
    )
    assert "event_type,error" in plan and "event_type,click" in plan, (
        "both event_type filters must push to the parquet scans"
    )


def test_cms_probe_join_broadcasts_the_sketch(spark):
    """The CMS sketch is <= D*W rows by construction; the estimate probe
    must broadcast it, never shuffle the candidate side against it."""
    plan = _plan(spark, "ev_heavy_hitters_cms")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "probing a 128-row sketch must not shuffle-sort-merge"
    )


def test_repeated_passages_topk_avoids_global_sort(spark):
    plan = _plan(spark, "doc_repeated_passages")
    assert "TakeOrderedAndProject" in plan, (
        "global top-20 must be per-partition top-k + merge, not a full sort"
    )


def test_bm25_is_one_pass_over_documents(spark):
    """The committed BM25 computes every query's score from ONE scan +
    ONE corpus aggregate (stack pivot).  The first cut unioned a branch
    per query and re-scanned documents each time (observed 6 scans for 3
    queries); this pins the fix."""
    import re

    plan = _plan(spark, "doc_bm25_topk")
    # count the numbered detail entries -- the formatted plan prints every
    # node once in the tree and once in the detail section
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE))
    assert n_scans <= 2, f"BM25 re-scans documents per query branch: {n_scans} scans"


def test_pii_redaction_is_shuffle_free(spark):
    """PII masking is a pure per-row map (regex count + replace + md5);
    any exchange in this plan would mean the 100 TB compliance pass
    suddenly shuffles the whole corpus.  (The loader's round-robin spread
    of the single-file fixture is exempt, as in the reference-pipeline
    gate.)"""
    plan = _plan(spark, "doc_pii_redaction")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_semdedup_verify_is_broadcast_equi_join(spark):
    """The SemDeDup within-bucket verify must stay a broadcast EQUI join
    on the bucket key with the id/cosine conditions as residuals: losing
    the equi key would degrade to a nested-loop scan of the corpus per
    probe row -- all-pairs, the exact thing the clustering exists to
    avoid."""
    plan = _plan(spark, "emb_semantic_dedup")
    assert "BroadcastHashJoin" in plan, "bucket join must broadcast the build side"
    assert "BroadcastNestedLoopJoin" not in plan, (
        "verify lost its bucket equi key (BNLJ = all-pairs per partition)"
    )


# --------------------------------------------------------------------------
# r8 broadcast-hint policy: a hard `F.broadcast` hint overrides Spark's
# size checks, so a hint on an SF-proportional base table is a driver OOM
# at 100 TB no matter what the test-scale plan looks like.  This gate
# walks EVERY registered query's analyzed logical plan (like the
# cartesian-product gate) and rejects any broadcast hint whose subtree
# reaches a parquet relation of an SF-proportional table without passing
# a cardinality-bounding node (Filter / Aggregate / Join / limit / ...).
# region and nation are fixed-cardinality (5 / 25 rows) and stay hintable.
# --------------------------------------------------------------------------

#: first column of each SF-proportional parquet table (grows ~linearly in
#: SF: customer/supplier/part/orders/lineitem plus the synthetic corpora).
_SF_TABLE_MARKERS = (
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "l_orderkey",
    "doc_id", "event_id",
)

#: logical nodes that bound (or can bound) the cardinality of what flows
#: out of a relation before it is broadcast.
_BOUNDING_NODES = (
    "Filter", "Aggregate", "Join", "Deduplicate", "Distinct",
    "GlobalLimit", "LocalLimit", "Window", "Intersect", "Except", "Generate",
)


def _indent_of(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _unbounded_broadcast_hints(analyzed: str) -> list[str]:
    lines = analyzed.splitlines()
    bad: list[str] = []
    for idx, line in enumerate(lines):
        if "ResolvedHint" not in line or "broadcast" not in line.lower():
            continue
        depth = _indent_of(line)
        bounded = False
        for sub in lines[idx + 1 :]:
            d = _indent_of(sub)
            if d <= depth:
                break  # left the hint's subtree
            node = sub[d:].split(" ", 1)[0].split("[", 1)[0]
            if node in _BOUNDING_NODES:
                bounded = True
                break
            if node == "Relation":
                cols = sub[d:]
                if not bounded and any(m in cols for m in _SF_TABLE_MARKERS):
                    bad.append(cols[:120])
                break
            # Project / SubqueryAlias / alias nodes: keep walking down
    return bad


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_no_broadcast_hint_on_unbounded_sf_table(spark, name):
    df = all_specs()[name].builder(spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    bad = _unbounded_broadcast_hints(analyzed)
    assert not bad, (
        f"{name}: F.broadcast hint targets an unfiltered SF-proportional "
        f"table (driver OOM at 100 TB): {bad}"
    )


def test_broadcast_hint_gate_is_nonvacuous(spark):
    """The gate must actually flag the r7 anti-pattern it was written for
    (hint on an unfiltered / merely projected SF-proportional table) and
    must NOT flag the sanctioned shapes (filtered subset, fixed-size
    nation)."""
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")

    def hints(df):
        return _unbounded_broadcast_hints(
            df._jdf.queryExecution().analyzed().toString()
        )

    bare = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert hints(bare), "unfiltered customer hint must be flagged"
    proj = orders.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"), "c_name")),
        "o_custkey",
    )
    assert hints(proj), "a Project must not launder an unbounded hint"
    filt = orders.join(
        F.broadcast(cust.filter(F.col("c_acctbal") > 9000)),
        orders.o_custkey == cust.c_custkey,
    )
    assert not hints(filt), "filtered subset is sanctioned"
    dim = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    assert not hints(dim), "fixed-cardinality nation is sanctioned"


def test_dq_suite_metrics_is_two_scans_no_extra(spark):
    """dq_constraint_suite's docstring claims ONE metrics aggregate plus
    ONE anti-join probe: exactly two scans of orders (and one of
    customer) no matter how many constraints the suite declares; the
    1-row x 1-row combine must be a broadcast nested-loop over scalars,
    never a CartesianProduct (gated globally) or a shuffle join."""
    plan = _plan(spark, "dq_constraint_suite")
    assert plan.count("orders.parquet") == 2, "constraint count leaked into scan count"
    assert plan.count("customer.parquet") == 1
    assert "BroadcastNestedLoopJoin" in plan


def test_weighted_sample_offsets_ride_a_broadcast(spark):
    """doc_weighted_sample's distributed prefix sum joins the tiny
    per-(partition, stratum) offsets frame back via broadcast -- a
    SortMergeJoin there would shuffle the corpus a second time for a
    frame of (nparts x strata) rows."""
    plan = _plan(spark, "doc_weighted_sample")
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") == 0, "offsets join must not SMJ"


def test_zorder_layout_single_aggregation_shuffle(spark):
    """ev_zorder_layout: the 4-value min/max stats frame rides a
    broadcast; the only exchange in the plan is the zbucket aggregation
    (plus the stats aggregate's own single-partition gather) -- the scan
    is never re-shuffled on anything else."""
    plan = _plan(spark, "ev_zorder_layout")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") == 0


def test_pq_adc_code_join_broadcasts_small_sides(spark):
    """emb_pq_adc: codebooks and per-query distance tables are the small
    sides everywhere -- every join in the plan must be broadcast-backed
    (the code table is the only corpus-sized frame and is never
    shuffled for a join)."""
    plan = _plan(spark, "emb_pq_adc")
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("SortMergeJoin") == 0


def test_hll_build_shuffles_registers_not_users(spark):
    """ev_hll_distinct_users: the register build aggregates on
    (event_type, reg) with map-side partials -- 64 cells per type cross
    the wire, not user ids.  The exact count-distinct column rides the
    SAME pass via Spark's Expand, so the plan may not contain more than
    the three scans the query is (registers + types + exact)."""
    plan = _plan(spark, "ev_hll_distinct_users")
    assert plan.count("events.parquet") <= 3
    assert "HashAggregate" in plan


def test_scd2_windows_share_one_user_shuffle(spark):
    """ev_scd2_user_state: both stacked windows (lag-change flag, running
    version sum) declare the same (user_id)(ts, event_id) partitioning
    and ordering, so Catalyst plans ONE exchange + ONE sort for the
    pair; a second sort on the same keys would mean the windows
    diverged."""
    plan = _plan(spark, "ev_scd2_user_state")
    assert plan.count("events.parquet") == 1
    # exactly ONE hash exchange (user_id): the stacked windows share it,
    # the islands aggregate keys on a superset, and the chaining window
    # re-sorts WITHOUT re-exchanging.  (formatted output names each node
    # twice -- tree + detail -- so one physical exchange counts 2.)
    assert plan.count("hashpartitioning(user_id") == 1
    assert plan.count("Exchange") <= 4  # loader round-robin + user_id hash


@pytest.mark.parametrize(
    # EVERY registered query whose builder calls range_ordered_parts (r12
    # VERDICT task 6) -- grep the helper's call sites when adding consumers
    "name",
    ["orders_abc_classification", "doc_lm_rarity", "doc_weighted_sample"],
)
def test_prefix_sum_queries_never_single_partition_the_data(spark, name):
    """r12: the cumulative pass runs as the distributed range prefix sum
    (operators/ordered.py).  Plan signature: the big side arrives through
    the pinned-pid checkpoint (Scan ExistingRDD, no parquet scan survives
    into the final plan), the heavy window partitions by pid, and the ONLY
    single-partition exchange is the constant-size offsets table (nparts
    rows).  A revert to the global-window form would show a SinglePartition
    exchange fed by the full frame and no pid partitioning."""
    plan = _plan(spark, name)
    assert "Scan ExistingRDD" in plan, "pinned-pid checkpoint missing"
    assert plan.count("hashpartitioning(pid") >= 1, "per-slice window lost pid partitioning"
    assert plan.count("SinglePartition") <= 1, (
        "more than the constant-size offsets exchange runs single-partition"
    )
