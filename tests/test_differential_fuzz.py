"""Differential fuzzing: machine-generated filter/group/aggregate plans run
on BOTH engines (Spark DataFrame API vs DuckDB SQL) and compared exactly.

The registry's oracle pairs are hand-written points in plan space; this
harness tests a NEIGHBORHOOD around them: hypothesis draws a random predicate
tree (numeric / string / timestamp comparisons, AND/OR composition), a random
grouping set, and a random aggregate set -- all restricted to the repo's
cross-engine determinism conventions (decimal-exact sums from
functions/numeric.py, integer counts, order-insensitive min/max) -- builds
the same logical plan twice (once as Columns, once as SQL), and requires
row-count + dtype + exact-value equality via the same ``compare_frames``
the oracle-parity gate uses.

What this catches that the curated pairs cannot: dialect drift in predicate
semantics (timestamp literal coercion, <> vs !=, AND/OR precedence),
aggregate NULL semantics on empty groups and empty inputs, and dtype
degradation paths (count on empty frames, decimal sum of no rows) -- for
ARBITRARY combinations, not just the ones a human thought to write.

``derandomize=True``: the example stream is stable run-to-run so the suite
stays deterministic for the driver gate; crank SPARK_GRAFT_FUZZ_EXAMPLES
(default 40) for a deeper exploratory run.
"""

from __future__ import annotations

import operator
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.functions import numeric as N
from flink_kafka_consumer_cassandra_output_spark.sources import tables

from .oracle import compare_frames, duck_connection

SF_DIR = "/root/testdata/sf0.001"
N_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "40"))

# --------------------------------------------------------------------------
# Grammar
# --------------------------------------------------------------------------

#: Value domains straddle the fixture's actual ranges (l_orderkey <= 1499,
#: quantity 1..50, shipdate 1995..2001) so predicates land everywhere from
#: empty to all-rows selectivity.
_NUM_COLS = {
    "l_orderkey": st.integers(0, 1600),
    "l_linenumber": st.integers(0, 8),
    "l_quantity": st.integers(1, 50),
}
_STR_COLS = {
    "l_returnflag": st.sampled_from(["A", "N", "R"]),
    "l_linestatus": st.sampled_from(["F", "O"]),
}
_OPS = ["<", "<=", "=", ">=", ">", "<>"]
_OP_FN = {
    "<": operator.lt,
    "<=": operator.le,
    "=": operator.eq,
    ">=": operator.ge,
    ">": operator.gt,
    "<>": operator.ne,
}

_GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

#: name -> (Spark aggregate Column, DuckDB aggregate SQL).  Every entry
#: follows the determinism conventions: counts are BIGINT both sides,
#: sums go through DECIMAL(18,2) (order-insensitive exact), min/max are
#: order-insensitive by definition.
#: Spark Columns are built lazily (closures) -- constructing them at import
#: time needs an active SparkContext, which test collection does not have.
_AGGS = {
    "n_rows": (
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "CAST(COUNT(*) AS BIGINT) AS n_rows",
    ),
    "sum_qty": (
        lambda: N.dsum("l_quantity", "sum_qty"),
        f"{N.dsum_expr('l_quantity')} AS sum_qty",
    ),
    "sum_price": (
        lambda: N.dsum("l_extendedprice", "sum_price"),
        f"{N.dsum_expr('l_extendedprice')} AS sum_price",
    ),
    "min_price": (
        lambda: F.min("l_extendedprice").alias("min_price"),
        "MIN(l_extendedprice) AS min_price",
    ),
    "max_key": (
        lambda: F.max("l_orderkey").alias("max_key"),
        "CAST(MAX(l_orderkey) AS BIGINT) AS max_key",
    ),
    "n_supp": (
        lambda: F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp",
    ),
}


@st.composite
def _predicate(draw):
    """One comparison: (col, op, value, kind)."""
    kind = draw(st.sampled_from(["num", "num", "str", "date"]))
    op = draw(st.sampled_from(_OPS))
    if kind == "num":
        col = draw(st.sampled_from(sorted(_NUM_COLS)))
        return (col, op, draw(_NUM_COLS[col]), "num")
    if kind == "str":
        col = draw(st.sampled_from(sorted(_STR_COLS)))
        return (col, op, draw(_STR_COLS[col]), "str")
    y, m, d = (
        draw(st.integers(1994, 2002)),
        draw(st.integers(1, 12)),
        draw(st.integers(1, 28)),
    )
    return ("l_shipdate", op, f"{y:04d}-{m:02d}-{d:02d}", "date")


@st.composite
def _plan(draw):
    """(predicates, connective, group_cols, agg_names)."""
    preds = draw(st.lists(_predicate(), min_size=1, max_size=3))
    conn = draw(st.sampled_from(["AND", "OR"]))
    groups = draw(
        st.lists(st.sampled_from(_GROUP_COLS), max_size=2, unique=True)
    )
    aggs = draw(
        st.lists(st.sampled_from(sorted(_AGGS)), min_size=1, max_size=4, unique=True)
    )
    return preds, conn, groups, aggs


def _pred_spark(p):
    col, op, val, kind = p
    lhs = F.col(col)
    rhs = F.to_timestamp(F.lit(val)) if kind == "date" else F.lit(val)
    return _OP_FN[op](lhs, rhs)


def _pred_sql(p):
    col, op, val, kind = p
    if kind == "num":
        return f"{col} {op} {val}"
    if kind == "str":
        return f"{col} {op} '{val}'"
    return f"{col} {op} TIMESTAMP '{val}'"


def _run_both(spark, con, plan):
    preds, conn, groups, agg_names = plan

    cond = _pred_spark(preds[0])
    for p in preds[1:]:
        cond = (cond & _pred_spark(p)) if conn == "AND" else (cond | _pred_spark(p))
    df = tables.load(spark, SF_DIR, "lineitem").filter(cond)
    agg_cols = [_AGGS[a][0]() for a in agg_names]
    sdf = (df.groupBy(*groups).agg(*agg_cols) if groups else df.agg(*agg_cols)).toPandas()

    where = f" {conn} ".join(_pred_sql(p) for p in preds)
    select = ", ".join(
        [*groups, *(_AGGS[a][1] for a in agg_names)]
    )
    sql = f"SELECT {select} FROM lineitem WHERE {where}"
    if groups:
        sql += f" GROUP BY {', '.join(groups)}"
    odf = con.execute(sql).fetchdf()

    label = f"fuzz[{where} | by {groups} | {agg_names}]"
    compare_frames(sdf, odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_plan())
def test_random_plan_cross_engine_equivalence(spark, plan):
    con = duck_connection(SF_DIR)
    try:
        _run_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Join-shape grammar: lineitem |x| orders with predicates on both sides
# --------------------------------------------------------------------------

_O_PREDS = {
    "o_orderstatus": st.sampled_from(["P", "O", "F"]),
    "o_orderpriority": st.sampled_from(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    ),
}
_JOIN_TYPES = ["inner", "left_semi", "left_anti"]
_JOIN_SQL = {
    "inner": "JOIN",
    "left_semi": "SEMI JOIN",
    "left_anti": "ANTI JOIN",
}


@st.composite
def _join_plan(draw):
    lpred = draw(_predicate())
    ocol = draw(st.sampled_from(sorted(_O_PREDS)))
    oval = draw(_O_PREDS[ocol])
    jt = draw(st.sampled_from(_JOIN_TYPES))
    groups = draw(st.lists(st.sampled_from(_GROUP_COLS), max_size=1, unique=True))
    aggs = draw(
        st.lists(st.sampled_from(sorted(_AGGS)), min_size=1, max_size=3, unique=True)
    )
    return lpred, (ocol, oval), jt, groups, aggs


def _run_join_both(spark, con, plan):
    lpred, (ocol, oval), jt, groups, agg_names = plan

    li = tables.load(spark, SF_DIR, "lineitem").filter(_pred_spark(lpred))
    orders = tables.load(spark, SF_DIR, "orders").filter(F.col(ocol) == oval)
    j = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"], jt
    )
    agg_cols = [_AGGS[a][0]() for a in agg_names]
    sdf = (j.groupBy(*groups).agg(*agg_cols) if groups else j.agg(*agg_cols)).toPandas()

    select = ", ".join([*groups, *(_AGGS[a][1] for a in agg_names)])
    sql = (
        f"SELECT {select} FROM (SELECT * FROM lineitem WHERE {_pred_sql(lpred)}) l "
        f"{_JOIN_SQL[jt]} (SELECT * FROM orders WHERE {ocol} = '{oval}') o "
        f"ON l.l_orderkey = o.o_orderkey"
    )
    if groups:
        sql += f" GROUP BY {', '.join(groups)}"
    odf = con.execute(sql).fetchdf()

    label = f"fuzzjoin[{_pred_sql(lpred)} | {jt} {ocol}={oval} | by {groups} | {agg_names}]"
    compare_frames(sdf, odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_join_plan())
def test_random_join_plan_cross_engine_equivalence(spark, plan):
    """Same differential harness, join shapes: inner/semi/anti against a
    filtered orders side -- the dialect corners this guards are join-type
    semantics (semi/anti row multiplicity), filter-through-join pushdown,
    and aggregate NULL behavior on empty join results."""
    con = duck_connection(SF_DIR)
    try:
        _run_join_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Window-function grammar: ranks and running integer sums over a total order
# --------------------------------------------------------------------------

#: Window order key (l_orderkey, l_linenumber) is UNIQUE in lineitem, so
#: every rank and frame is total-ordered and cross-engine deterministic --
#: the same tiebreak discipline every registered top-k query follows.
_WIN_PARTS = ["l_returnflag", "l_linestatus", "l_suppkey"]
_WIN_FUNCS = {
    "rn": (
        lambda w: F.row_number().over(w),
        "ROW_NUMBER() OVER w AS rn",
    ),
    "rk": (
        lambda w: F.rank().over(w),
        "RANK() OVER w AS rk",
    ),
    "run_qty": (
        lambda w: F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w.rowsBetween(-9223372036854775808, 0))
        .cast("double")
        .alias("run_qty"),
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER "
        "(w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty",
    ),
    "lag_key": (
        lambda w: F.lag("l_orderkey", 1).over(w),
        "LAG(l_orderkey, 1) OVER w AS lag_key",
    ),
}


@st.composite
def _window_plan(draw):
    pred = draw(_predicate())
    part = draw(st.sampled_from(_WIN_PARTS))
    funcs = draw(
        st.lists(st.sampled_from(sorted(_WIN_FUNCS)), min_size=1, max_size=3,
                 unique=True)
    )
    topn = draw(st.integers(1, 5))
    return pred, part, funcs, topn


def _run_window_both(spark, con, plan):
    pred, part, func_names, topn = plan

    from pyspark.sql import Window

    li = tables.load(spark, SF_DIR, "lineitem").filter(_pred_spark(pred))
    # the fixture has ~1.1k duplicate (orderkey, linenumber) pairs (it is
    # TPC-H-ISH, not TPC-H): l_extendedprice completes a verified-unique
    # total order -- without it, positional window functions over the tie
    # are genuinely nondeterministic (the 200-example frame-family fuzz
    # run caught exactly that on a running MIN)
    w = Window.partitionBy(part).orderBy(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    cols = [
        (
            _WIN_FUNCS[n][0](w).alias(n)
            if n != "run_qty"
            else _WIN_FUNCS[n][0](w)
        )
        for n in func_names
    ]
    # keep per-partition top-n by the same total order so the output is
    # bounded and the rank paths are genuinely exercised
    sdf = (
        li.select(
            "l_orderkey", "l_linenumber", "l_extendedprice", part, *cols
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= topn)
        .drop("_rn", "l_extendedprice")
        .toPandas()
    )

    func_sql = ", ".join(_WIN_FUNCS[n][1] for n in func_names)
    sql = f"""
SELECT * FROM (
  SELECT l_orderkey, l_linenumber, {part}, {func_sql},
         ROW_NUMBER() OVER w AS _rn
  FROM lineitem WHERE {_pred_sql(pred)}
  WINDOW w AS (PARTITION BY {part}
               ORDER BY l_orderkey, l_linenumber, l_extendedprice)
) WHERE _rn <= {topn}
"""
    odf = con.execute(sql).fetchdf().drop(columns=["_rn"])

    label = f"fuzzwin[{_pred_sql(pred)} | by {part} | {func_names} | top{topn}]"
    compare_frames(sdf, odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_window_plan())
def test_random_window_plan_cross_engine_equivalence(spark, plan):
    """Window-family differential coverage: rank/row_number/lag/running
    decimal sums over a unique total order, per-partition top-n on top --
    guards frame semantics, rank tie behavior (none possible, by the
    unique-key discipline), LAG null fill, and decimal window sums."""
    con = duck_connection(SF_DIR)
    try:
        _run_window_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Set-operation grammar: UNION [ALL] / INTERSECT / EXCEPT over projections
# --------------------------------------------------------------------------

_SET_OPS = {
    "union_all": ("unionAll", "UNION ALL"),
    "union": ("union_distinct", "UNION"),
    "intersect": ("intersect", "INTERSECT"),
    "except": ("exceptAll_distinct", "EXCEPT"),
}
_SET_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]


@st.composite
def _set_plan(draw):
    pred_a = draw(_predicate())
    pred_b = draw(_predicate())
    op = draw(st.sampled_from(sorted(_SET_OPS)))
    cols = draw(
        st.lists(st.sampled_from(_SET_COLS), min_size=1, max_size=2, unique=True)
    )
    return pred_a, pred_b, op, cols


def _run_set_both(spark, con, plan):
    pred_a, pred_b, op, cols = plan

    li = tables.load(spark, SF_DIR, "lineitem")
    a = li.filter(_pred_spark(pred_a)).select(*cols)
    b = li.filter(_pred_spark(pred_b)).select(*cols)
    if op == "union_all":
        out = a.unionAll(b)
    elif op == "union":
        out = a.union(b).distinct()
    elif op == "intersect":
        out = a.intersect(b)
    else:
        # EXCEPT (distinct semantics) == Spark exceptAll on distinct inputs
        out = a.distinct().exceptAll(b.distinct())
    # aggregate to counted form so UNION ALL multiplicities are checked
    # without multi-set canonicalization headaches
    sdf = out.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).toPandas()

    col_sql = ", ".join(cols)
    sql = f"""
SELECT {col_sql}, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT {col_sql} FROM lineitem WHERE {_pred_sql(pred_a)}
  {_SET_OPS[op][1]}
  SELECT {col_sql} FROM lineitem WHERE {_pred_sql(pred_b)}
) GROUP BY {col_sql}
"""
    odf = con.execute(sql).fetchdf()

    label = f"fuzzset[{_pred_sql(pred_a)} {op} {_pred_sql(pred_b)} | {cols}]"
    compare_frames(sdf, odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_set_plan())
def test_random_set_op_cross_engine_equivalence(spark, plan):
    """Set-operation differential coverage: UNION ALL multiplicities,
    UNION/INTERSECT/EXCEPT distinct semantics -- the corner where SQL
    bag-vs-set behavior and Spark's unionAll/intersect/exceptAll naming
    famously diverge."""
    con = duck_connection(SF_DIR)
    try:
        _run_set_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Aggregation-function grammar (VERDICT r7 item 9): the remaining family
# with cross-engine float semantics worth fuzzing.  Random grouping
# EXPRESSIONS (not just columns), a wider aggregate menu -- exact-division
# averages, conditional counts/sums, timestamp min/max, multi-column and
# expression count-distinct -- and an optional HAVING, all under the repo's
# determinism conventions (decimal-exact sums, one double division at the
# end, BIGINT counts).
# --------------------------------------------------------------------------

#: name -> (spark group expr factory, sql group expr with alias, sql name)
_GRP_EXPRS = {
    "l_returnflag": (
        lambda: F.col("l_returnflag"),
        "l_returnflag",
        "l_returnflag",
    ),
    "grp_year": (
        lambda: F.year("l_shipdate").cast("long").alias("grp_year"),
        "CAST(year(l_shipdate) AS BIGINT) AS grp_year",
        "grp_year",
    ),
    "grp_qmod": (
        lambda: (F.col("l_quantity").cast("long") % 5).alias("grp_qmod"),
        "CAST(l_quantity AS BIGINT) % 5 AS grp_qmod",
        "grp_qmod",
    ),
}

_AGG2 = {
    "n_rows": (
        lambda: F.count(F.lit(1)).alias("n_rows"),
        "CAST(COUNT(*) AS BIGINT) AS n_rows",
    ),
    "avg_qty": (
        # exact decimal sum, ONE double division at the end: deterministic
        lambda: (F.sum(N.dec2("l_quantity")).cast("double") / F.count(F.lit(1)))
        .alias("avg_qty"),
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) "
        "AS avg_qty",
    ),
    "sum_price": (
        lambda: N.dsum("l_extendedprice", "sum_price"),
        f"{N.dsum_expr('l_extendedprice')} AS sum_price",
    ),
    "cnt_flag_a": (
        lambda: F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("cnt_flag_a"),
        "CAST(COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT) "
        "AS cnt_flag_a",
    ),
    "sum_if_price": (
        lambda: F.sum(
            F.when(F.col("l_quantity") > 25, N.dec2("l_extendedprice"))
        ).cast("double").alias("sum_if_price"),
        "CAST(SUM(CASE WHEN l_quantity > 25 "
        "THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) "
        "AS sum_if_price",
    ),
    "min_ship": (
        lambda: F.min("l_shipdate").alias("min_ship"),
        "MIN(l_shipdate) AS min_ship",
    ),
    "max_ship": (
        lambda: F.max("l_shipdate").alias("max_ship"),
        "MAX(l_shipdate) AS max_ship",
    ),
    "n_months": (
        lambda: F.count_distinct(
            F.date_format("l_shipdate", "yyyyMM")
        ).alias("n_months"),
        "CAST(COUNT(DISTINCT strftime(l_shipdate, '%Y%m')) AS BIGINT) "
        "AS n_months",
    ),
    "n_supp_part": (
        lambda: F.count_distinct(
            F.col("l_suppkey"), F.col("l_partkey")
        ).alias("n_supp_part"),
        "CAST(COUNT(DISTINCT (l_suppkey, l_partkey)) AS BIGINT) "
        "AS n_supp_part",
    ),
}


@st.composite
def _agg_plan(draw):
    preds = draw(st.lists(_predicate(), min_size=1, max_size=2))
    conn = draw(st.sampled_from(["AND", "OR"]))
    groups = draw(
        st.lists(st.sampled_from(sorted(_GRP_EXPRS)), max_size=2, unique=True)
    )
    aggs = draw(
        st.lists(st.sampled_from(sorted(_AGG2)), min_size=1, max_size=4,
                 unique=True)
    )
    having = draw(st.integers(0, 3)) if groups else 0  # 0 = no HAVING
    return preds, conn, groups, aggs, having


def _run_agg_both(spark, con, plan):
    preds, conn, groups, agg_names, having = plan

    cond = _pred_spark(preds[0])
    for p in preds[1:]:
        cond = (cond & _pred_spark(p)) if conn == "AND" else (cond | _pred_spark(p))
    df = tables.load(spark, SF_DIR, "lineitem").filter(cond)
    gexprs = [_GRP_EXPRS[g][0]() for g in groups]
    # HAVING needs the row count; carry it internally and drop if not drawn
    agg_cols = [_AGG2[a][0]() for a in agg_names]
    internal_cnt = "n_rows" not in agg_names and having > 0
    if internal_cnt:
        agg_cols.append(F.count(F.lit(1)).alias("_hcnt"))
    sdf = df.groupBy(*gexprs).agg(*agg_cols) if groups else df.agg(*agg_cols)
    if having > 0:
        sdf = sdf.filter(
            (F.col("_hcnt") if internal_cnt else F.col("n_rows")) > having
        )
    if internal_cnt:
        sdf = sdf.drop("_hcnt")
    spdf = sdf.toPandas()

    where = f" {conn} ".join(_pred_sql(p) for p in preds)
    gsel = [_GRP_EXPRS[g][1] for g in groups]
    gnames = [_GRP_EXPRS[g][2] for g in groups]
    select = ", ".join([*gsel, *(_AGG2[a][1] for a in agg_names)])
    sql = f"SELECT {select} FROM lineitem WHERE {where}"
    if groups:
        sql += f" GROUP BY {', '.join(gnames)}"
    if having > 0:
        sql += f" HAVING COUNT(*) > {having}"
    odf = con.execute(sql).fetchdf()

    label = f"fuzzagg[{where} | by {groups} | {agg_names} | having>{having}]"
    compare_frames(spdf, odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_agg_plan())
def test_random_aggregate_family_cross_engine_equivalence(spark, plan):
    """Aggregation-family differential coverage: grouping EXPRESSIONS,
    exact-division averages, conditional counts and decimal sums,
    timestamp min/max, expression and multi-column count-distinct, and
    HAVING -- the float-semantics corners (partial-agg ordering, NULL
    groups from CASE aggregates, empty-group elimination) the curated
    oracle pairs sample only pointwise."""
    con = duck_connection(SF_DIR)
    try:
        _run_agg_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Family 6: string-function pipelines (round 8)
# --------------------------------------------------------------------------

#: Composable unary string transforms: name -> (Column fn, SQL template).
#: Restricted to dialect-safe ground: positive substr indices, ASCII
#: fixture text (no locale-sensitive case edges), explicit pad chars.
_STR_FNS = {
    "lower": (lambda c: F.lower(c), "lower({x})"),
    "upper": (lambda c: F.upper(c), "upper({x})"),
    "reverse": (lambda c: F.reverse(c), "reverse({x})"),
    "trim": (lambda c: F.trim(c), "trim({x})"),
    "substr_2_9": (lambda c: F.substring(c, 2, 9), "substr({x}, 2, 9)"),
    "lpad_22": (lambda c: F.lpad(c, 22, "*"), "lpad({x}, 22, '*')"),
    "rpad_22": (lambda c: F.rpad(c, 22, "."), "rpad({x}, 22, '.')"),
    "replace_0_Z": (
        lambda c: F.replace(c, F.lit("0"), F.lit("Z")),
        "replace({x}, '0', 'Z')",
    ),
    "concat_tag": (lambda c: F.concat(c, F.lit("#q")), "({x} || '#q')"),
    "repeat_2": (lambda c: F.repeat(c, 2), "repeat({x}, 2)"),
}

#: Final row filters over the transformed string.
_STR_PREDS = {
    "contains_0": (
        lambda c: c.contains("0"), "contains({s}, '0')"),
    "starts_C": (
        lambda c: c.startswith("C"), "starts_with({s}, 'C')"),
    "like_er": (lambda c: c.like("%er%"), "{s} LIKE '%er%'"),
    "len_gt_12": (lambda c: F.length(c) > 12, "length({s}) > 12"),
    "always": (lambda c: F.lit(True), "TRUE"),
}

_LEV_PROBE = "Customer#000000042"


@st.composite
def _str_plan(draw):
    chain = draw(
        st.lists(st.sampled_from(sorted(_STR_FNS)), min_size=1, max_size=3)
    )
    pred = draw(st.sampled_from(sorted(_STR_PREDS)))
    return chain, pred


def _run_str_both(spark, con, plan):
    chain, pred = plan

    col = F.col("c_name")
    sql_x = "c_name"
    for fn in chain:
        sp, tmpl = _STR_FNS[fn]
        col = sp(col)
        sql_x = tmpl.format(x=sql_x)
    sdf = (
        tables.load(spark, SF_DIR, "customer")
        .select(
            "c_custkey",
            col.alias("s"),
            F.length(col).cast("long").alias("slen"),
            F.levenshtein(col, F.lit(_LEV_PROBE)).cast("long").alias("lev"),
            F.instr(col, "er").cast("long").alias("pos_er"),
        )
        .filter(_STR_PREDS[pred][0](F.col("s")))
    )
    spdf = sdf.toPandas()

    where = _STR_PREDS[pred][1].format(s="s")
    sql = f"""
SELECT * FROM (
  SELECT c_custkey, {sql_x} AS s,
         CAST(length({sql_x}) AS BIGINT) AS slen,
         CAST(levenshtein({sql_x}, '{_LEV_PROBE}') AS BIGINT) AS lev,
         CAST(strpos({sql_x}, 'er') AS BIGINT) AS pos_er
  FROM customer
) WHERE {where}"""
    odf = con.execute(sql).fetchdf()

    compare_frames(spdf, odf, f"fuzzstr[{'->'.join(chain)} | {pred}]")


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_str_plan())
def test_random_string_pipeline_cross_engine_equivalence(spark, plan):
    """String-function differential coverage: random 1-3 deep compositions
    of lower/upper/reverse/trim/substr/pad/replace/concat/repeat, checked
    through length, Levenshtein distance, substring position (Spark instr
    vs DuckDB strpos -- both 1-based, 0 on miss), and a drawn row filter
    (contains/starts_with/LIKE/length).  The dialect corners a curated
    pair samples pointwise -- pad semantics at exact width, replace on
    absent needles, LIKE after reversal -- get swept combinatorially."""
    con = duck_connection(SF_DIR)
    try:
        _run_str_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Window FRAME grammar (VERDICT r8 item 7): randomized frame bounds x order
# keys x ties.  The earlier window family pins rank/lag over ONE fixed
# frame (UNBOUNDED..CURRENT) and a unique total order; this family sweeps
# the remaining frame space under the repo's determinism conventions:
#   - ROWS frames need a UNIQUE total order (frame membership is
#     positional), so they ride (l_orderkey, l_linenumber,
#     l_extendedprice) -- the pair alone is NOT unique on this
#     TPC-H-ish fixture (~1.1k duplicate pairs with differing prices);
#   - RANGE frames and pure rank functions are VALUE-determined, so they
#     deliberately order by a low-cardinality key (l_quantity cast BIGINT)
#     to exercise TIES -- the case the unique-key family cannot reach;
#   - row_number/ntile/lag under ties are excluded (row-order dependent,
#     not cross-engine deterministic by construction).
# --------------------------------------------------------------------------

_FRAME_BOUND = st.one_of(st.integers(0, 4), st.just("unbounded"))

#: ROWS-frame functions over a frame-bounded window w (unique order).
_ROWS_FUNCS = {
    "f_sum_qty": (
        lambda w: F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w).cast("double").alias("f_sum_qty"),
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) "
        "AS f_sum_qty",
    ),
    "f_min_price": (
        lambda w: F.min("l_extendedprice").over(w).alias("f_min_price"),
        "MIN(l_extendedprice) OVER w AS f_min_price",
    ),
    "f_max_key": (
        lambda w: F.max("l_orderkey").over(w).alias("f_max_key"),
        "CAST(MAX(l_orderkey) OVER w AS BIGINT) AS f_max_key",
    ),
    "f_cnt": (
        lambda w: F.count(F.lit(1)).over(w).alias("f_cnt"),
        "CAST(COUNT(*) OVER w AS BIGINT) AS f_cnt",
    ),
    "f_first_key": (
        lambda w: F.first("l_orderkey").over(w).alias("f_first_key"),
        "CAST(FIRST_VALUE(l_orderkey) OVER w AS BIGINT) AS f_first_key",
    ),
}

#: RANGE-frame functions (value-determined membership, safe under ties).
_RANGE_FUNCS = {
    "r_sum_price": (
        lambda w: F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .over(w).cast("double").alias("r_sum_price"),
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) "
        "AS r_sum_price",
    ),
    "r_cnt": (
        lambda w: F.count(F.lit(1)).over(w).alias("r_cnt"),
        "CAST(COUNT(*) OVER w AS BIGINT) AS r_cnt",
    ),
    "r_min_key": (
        lambda w: F.min("l_orderkey").over(w).alias("r_min_key"),
        "CAST(MIN(l_orderkey) OVER w AS BIGINT) AS r_min_key",
    ),
}

#: Rank functions that depend only on the ORDER KEY VALUE, so ties are
#: deterministic: rank/dense_rank are rank-of-value; percent_rank and
#: cume_dist are one exact-integer division each (identical IEEE op).
_TIES_FUNCS = {
    "t_rank": (
        lambda w: F.rank().over(w).alias("t_rank"),
        "CAST(RANK() OVER w AS BIGINT) AS t_rank",
    ),
    "t_dense": (
        lambda w: F.dense_rank().over(w).alias("t_dense"),
        "CAST(DENSE_RANK() OVER w AS BIGINT) AS t_dense",
    ),
    "t_prank": (
        lambda w: F.percent_rank().over(w).alias("t_prank"),
        "PERCENT_RANK() OVER w AS t_prank",
    ),
    "t_cume": (
        lambda w: F.cume_dist().over(w).alias("t_cume"),
        "CUME_DIST() OVER w AS t_cume",
    ),
}


@st.composite
def _frame_plan(draw):
    pred = draw(_predicate())
    part = draw(st.sampled_from(_WIN_PARTS))
    mode = draw(st.sampled_from(["rows", "range", "ties"]))
    if mode == "rows":
        p, f = draw(_FRAME_BOUND), draw(_FRAME_BOUND)
        funcs = draw(st.lists(st.sampled_from(sorted(_ROWS_FUNCS)),
                              min_size=1, max_size=3, unique=True))
        return pred, part, mode, p, f, funcs
    if mode == "range":
        p, f = draw(st.integers(0, 10)), draw(st.integers(0, 10))
        funcs = draw(st.lists(st.sampled_from(sorted(_RANGE_FUNCS)),
                              min_size=1, max_size=2, unique=True))
        return pred, part, mode, p, f, funcs
    funcs = draw(st.lists(st.sampled_from(sorted(_TIES_FUNCS)),
                          min_size=1, max_size=4, unique=True))
    return pred, part, mode, None, None, funcs


def _sql_bound(v, side: str) -> str:
    if v == "unbounded":
        return f"UNBOUNDED {side}"
    if v == 0:
        return "CURRENT ROW"
    return f"{v} {side}"


def _spark_bounds(p, f):
    from pyspark.sql import Window

    lo = Window.unboundedPreceding if p == "unbounded" else -p
    hi = Window.unboundedFollowing if f == "unbounded" else f
    return lo, hi


def _run_frame_both(spark, con, plan):
    pred, part, mode, p, f, func_names = plan

    from pyspark.sql import Window

    li = tables.load(spark, SF_DIR, "lineitem").filter(_pred_spark(pred))

    if mode == "rows":
        lo, hi = _spark_bounds(p, f)
        # (orderkey, linenumber) alone is NOT unique on this fixture --
        # l_extendedprice completes the verified-unique order (see the
        # window family above; found by this family's 200-example run)
        w = (
            Window.partitionBy(part)
            .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
            .rowsBetween(lo, hi)
        )
        cols = [_ROWS_FUNCS[n][0](w) for n in func_names]
        func_sql = ", ".join(_ROWS_FUNCS[n][1] for n in func_names)
        wdef = (
            f"PARTITION BY {part} "
            f"ORDER BY l_orderkey, l_linenumber, l_extendedprice "
            f"ROWS BETWEEN {_sql_bound(p, 'PRECEDING')} "
            f"AND {_sql_bound(f, 'FOLLOWING')}"
        )
    elif mode == "range":
        w = (
            Window.partitionBy(part)
            .orderBy(F.col("l_quantity").cast("bigint"))
            .rangeBetween(-p, f)
        )
        cols = [_RANGE_FUNCS[n][0](w) for n in func_names]
        func_sql = ", ".join(_RANGE_FUNCS[n][1] for n in func_names)
        wdef = (
            f"PARTITION BY {part} ORDER BY CAST(l_quantity AS BIGINT) "
            f"RANGE BETWEEN {p} PRECEDING AND {f} FOLLOWING"
        )
    else:  # ties: pure rank functions over a low-cardinality order key
        w = Window.partitionBy(part).orderBy(F.col("l_quantity").cast("bigint"))
        cols = [_TIES_FUNCS[n][0](w) for n in func_names]
        func_sql = ", ".join(_TIES_FUNCS[n][1] for n in func_names)
        wdef = f"PARTITION BY {part} ORDER BY CAST(l_quantity AS BIGINT)"

    sdf = li.select("l_orderkey", "l_linenumber", part, *cols).toPandas()
    sql = f"""
SELECT l_orderkey, l_linenumber, {part}, {func_sql}
FROM lineitem WHERE {_pred_sql(pred)}
WINDOW w AS ({wdef})
"""
    odf = con.execute(sql).fetchdf()
    label = (
        f"fuzzframe[{_pred_sql(pred)} | by {part} | {mode} "
        f"{p}..{f} | {func_names}]"
    )
    compare_frames(sdf, odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_frame_plan())
def test_random_window_frame_cross_engine_equivalence(spark, plan):
    """Frame-bound window differential coverage: random ROWS frames
    (0..4/unbounded preceding x following) over a unique order, random
    RANGE frames and tie-sensitive rank functions over a deliberately
    low-cardinality order key -- guards frame-membership arithmetic at
    the bounds, value-vs-position frame semantics under duplicate keys,
    FIRST_VALUE within shifted frames, and the percent_rank/cume_dist
    division conventions."""
    con = duck_connection(SF_DIR)
    try:
        _run_frame_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Sessionization grammar (round 9): randomized inactivity-gap thresholds x
# event predicates x session-level aggregation shapes.  The curated
# session queries pin ONE threshold (30 minutes); this family sweeps the
# threshold space -- where the boundary arithmetic (strict > on exact
# microsecond gaps) and the islands numbering must agree between engines
# for EVERY cut point, including degenerate ones (1-minute gaps splinter
# nearly every event into its own session; 1440 minutes merges most of a
# user's history into one).
# --------------------------------------------------------------------------

_GAP_MINUTES = [1, 5, 17, 30, 90, 240, 1440]
_EV_TYPES = ["click", "view", "purchase", "signup", "error"]


@st.composite
def _session_plan(draw):
    gap = draw(st.sampled_from(_GAP_MINUTES))
    types = draw(
        st.lists(st.sampled_from(_EV_TYPES), min_size=1, max_size=5,
                 unique=True)
    )
    lo = draw(st.integers(0, 120))
    hi = draw(st.integers(lo, 170))
    mode = draw(st.sampled_from(["per_user", "size_hist", "durations"]))
    return gap, sorted(types), lo, hi, mode


def _run_session_both(spark, con, plan):
    gap, types, lo, hi, mode = plan

    from pyspark.sql import Window

    micros = gap * 60 * 1_000_000
    ev = (
        tables.load(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin(types))
        .filter(F.col("user_id").between(lo, hi))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.withColumn(
        "ns", F.when(g.isNull() | (g > micros), 1).otherwise(0)
    )
    sid = F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = (
        flagged.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "dur_us"
            ),
        )
    )
    if mode == "per_user":
        sdf = sessions.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_sess_events"),
            F.sum("n_events").alias("total_events"),
        )
        final = """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_sess_events,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM sessions GROUP BY user_id"""
    elif mode == "size_hist":
        sdf = sessions.groupBy("n_events").agg(
            F.count(F.lit(1)).alias("n_sessions")
        )
        final = """SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM sessions GROUP BY n_events"""
    else:
        sdf = sessions.groupBy("user_id").agg(
            F.sum("dur_us").alias("total_dur_us"),
            F.max("dur_us").alias("max_dur_us"),
        )
        final = """SELECT user_id, CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
       CAST(MAX(dur_us) AS BIGINT) AS max_dur_us
FROM sessions GROUP BY user_id"""

    in_list = ", ".join(f"'{t}'" for t in types)
    sql = f"""
WITH base AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type IN ({in_list}) AND user_id BETWEEN {lo} AND {hi}
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {micros}
              THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), sessions AS (
  SELECT user_id, sid,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM numbered GROUP BY user_id, sid
)
{final}
"""
    odf = con.execute(sql).fetchdf()
    label = f"fuzzsession[gap={gap}m | {types} | {lo}..{hi} | {mode}]"
    compare_frames(sdf.toPandas(), odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_session_plan())
def test_random_sessionization_cross_engine_equivalence(spark, plan):
    """Sessionization differential coverage: the gaps-and-islands pipeline
    (strict-> microsecond gap flag, running-sum numbering, per-session
    aggregation) must agree between engines for EVERY threshold cut,
    predicate slice, and session-level aggregation shape -- guards the
    boundary arithmetic the single 30-minute curated queries pin at one
    point of the space."""
    con = duck_connection(SF_DIR)
    try:
        _run_session_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# AS-OF join grammar (round 9): the composed Spark as-of (equi-join +
# range predicate + per-key argmax) vs DuckDB's NATIVE ASOF JOIN -- two
# genuinely independent derivations of point-in-time semantics, swept
# over direction (backward/forward), tolerance windows, event sampling,
# and build-side predicates.  Only the matched DATE is projected: ASOF
# picks an arbitrary row among equal-date ties, so payload columns are
# not cross-engine-deterministic but the matched date itself is.
# --------------------------------------------------------------------------

_ASOF_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


@st.composite
def _asof_plan(draw):
    mod = draw(st.sampled_from([20, 50, 100]))
    off = draw(st.integers(0, 9))
    backward = draw(st.booleans())
    left = draw(st.booleans())
    tol_days = draw(st.sampled_from([None, 3, 10, 30]))
    prios = draw(
        st.lists(st.sampled_from(_ASOF_PRIORITIES), min_size=1, max_size=5,
                 unique=True)
    )
    return mod, off, backward, left, tol_days, sorted(prios)


def _run_asof_both(spark, con, plan):
    mod, off, backward, left, tol_days, prios = plan

    ev = tables.load(spark, SF_DIR, "events").filter(
        F.col("event_id") % mod == off
    ).select("event_id", "user_id", "ts")
    o = tables.load(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority").isin(prios)
    ).select("o_custkey", "o_orderdate")
    if backward:
        cond = F.col("o_orderdate") <= F.col("ts")
        pick = F.max("o_orderdate").alias("matched_date")
    else:
        cond = F.col("o_orderdate") >= F.col("ts")
        pick = F.min("o_orderdate").alias("matched_date")
    how = "left" if left else "inner"
    j = ev.join(o, (F.col("o_custkey") == F.col("user_id")) & cond, how)
    sdf = j.groupBy("event_id", "user_id", "ts").agg(pick)
    if tol_days is not None:
        gap = (
            F.unix_micros("ts") - F.unix_micros("matched_date")
            if backward
            else F.unix_micros("matched_date") - F.unix_micros("ts")
        )
        in_tol = gap <= tol_days * 86_400_000_000
        if left:
            # LEFT semantics: out-of-tolerance matches become NULL, the
            # event row itself is kept
            sdf = sdf.withColumn(
                "matched_date",
                F.when(in_tol, F.col("matched_date")),
            )
        else:
            sdf = sdf.filter(in_tol)

    op = ">=" if backward else "<="
    join_kw = "ASOF LEFT JOIN" if left else "ASOF JOIN"
    in_list = ", ".join(f"'{p}'" for p in prios)
    lhs = (
        "epoch_us(e.ts) - epoch_us(o.o_orderdate)"
        if backward
        else "epoch_us(o.o_orderdate) - epoch_us(e.ts)"
    )
    if tol_days is None:
        proj = "o.o_orderdate AS matched_date"
        tol_sql = ""
    elif left:
        proj = (
            f"CASE WHEN {lhs} <= {tol_days} * 86400000000 "
            "THEN o.o_orderdate END AS matched_date"
        )
        tol_sql = ""
    else:
        proj = "o.o_orderdate AS matched_date"
        tol_sql = f"WHERE {lhs} <= {tol_days} * 86400000000"
    sql = f"""
WITH e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
  WHERE event_id % {mod} = {off}
), o AS (
  SELECT o_custkey, o_orderdate FROM orders
  WHERE o_orderpriority IN ({in_list})
)
SELECT e.event_id, e.user_id, e.ts, {proj}
FROM e {join_kw} o
  ON e.user_id = o.o_custkey AND e.ts {op} o.o_orderdate
{tol_sql}
"""
    odf = con.execute(sql).fetchdf()
    label = (
        f"fuzzasof[mod={mod}+{off} | {'back' if backward else 'fwd'} | "
        f"{'left' if left else 'inner'} | tol={tol_days}d | {prios}]"
    )
    compare_frames(sdf.toPandas(), odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_asof_plan())
def test_random_asof_join_cross_engine_equivalence(spark, plan):
    """As-of family differential coverage against an INDEPENDENT engine
    implementation: Spark's composed equi-join + range + argmax vs
    DuckDB's native ASOF JOIN operator, across both directions,
    tolerance windows, sampling offsets, and build-side predicates --
    if the composition's boundary semantics (<= vs <, tie dates,
    inner-match behavior) drifted from true point-in-time lookup
    semantics, the specialized operator would disagree."""
    con = duck_connection(SF_DIR)
    try:
        _run_asof_both(spark, con, plan)
    finally:
        con.close()


# --------------------------------------------------------------------------
# Rank-selected discrete percentile / winsorization grammar (round 10):
# the integer-exact order-statistic pattern doc_winsorized_stats and
# cust_interpurchase_gaps pin at single points, swept across grouping
# keys, percentile levels, value columns, sampling slices, and the
# winsorized-mean composition.
# --------------------------------------------------------------------------


@st.composite
def _pct_plan(draw):
    group = draw(
        st.sampled_from([None, "l_returnflag", "l_linestatus", "l_linenumber"])
    )
    p_lo = draw(st.sampled_from([1, 5, 10, 25]))
    mod = draw(st.sampled_from([1, 3, 7]))
    off = draw(st.integers(0, 2))
    use_price = draw(st.booleans())
    winsorize = draw(st.booleans())
    return group, p_lo, mod, off, use_price, winsorize


def _run_pct_both(spark, con, plan):
    from pyspark.sql import Window

    group, p_lo, mod, off, use_price, winsorize = plan
    p_hi = 100 - p_lo

    li = tables.load(spark, SF_DIR, "lineitem").filter(
        F.col("l_orderkey") % mod == off
    )
    if use_price:
        val = (F.col("l_extendedprice").cast(N.DEC) * 100).cast("long")
        val_sql = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    else:
        val = F.col("l_quantity").cast("long")
        val_sql = "CAST(l_quantity AS BIGINT)"
    gcols = [group] if group else []
    base = li.select(*gcols, val.alias("v"))

    part = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    r = base.select(
        *gcols, "v",
        F.row_number().over(part.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    klo = F.expr(f"({p_lo} * n + 99) div 100")
    khi = F.expr(f"({p_hi} * n + 99) div 100")
    b = r.groupBy(*gcols).agg(
        F.max("n").alias("n_rows"),
        F.min(F.when(F.col("rn") == klo, F.col("v"))).alias("lo_v"),
        F.min(F.when(F.col("rn") == khi, F.col("v"))).alias("hi_v"),
    )
    if winsorize:
        joined = base.join(b, gcols) if gcols else base.crossJoin(F.broadcast(b))
        clipped = F.least(F.greatest(F.col("v"), F.col("lo_v")), F.col("hi_v"))
        sdf = joined.groupBy(*gcols).agg(
            F.max("n_rows").alias("n_rows"),
            F.max("lo_v").alias("lo_v"),
            F.max("hi_v").alias("hi_v"),
            (F.sum(clipped).cast("double") / F.max("n_rows")).alias("wins_mean"),
        )
    else:
        sdf = b

    gsel = f"{group}, " if group else ""
    gby = f"GROUP BY {group}" if group else ""
    partition = f"PARTITION BY {group}" if group else ""
    over_n = f"OVER ({partition})" if group else "OVER ()"
    sql_b = f"""
WITH base AS (
  SELECT {gsel}{val_sql} AS v
  FROM lineitem WHERE l_orderkey % {mod} = {off}
), r AS (
  SELECT *,
         ROW_NUMBER() OVER ({partition + (' ' if partition else '')}ORDER BY v) AS rn,
         COUNT(*) {over_n} AS n
  FROM base
), b AS (
  SELECT {gsel}CAST(MAX(n) AS BIGINT) AS n_rows,
         MIN(CASE WHEN rn = ({p_lo} * n + 99) // 100 THEN v END) AS lo_v,
         MIN(CASE WHEN rn = ({p_hi} * n + 99) // 100 THEN v END) AS hi_v
  FROM r {gby}
)
"""
    if winsorize:
        jcond = f"USING ({group})" if group else "ON TRUE"
        gsel_b = f"b.{group}, " if group else ""
        gby_w = f"GROUP BY b.{group}" if group else ""
        sql = sql_b + f"""
SELECT {gsel_b}
       CAST(MAX(b.n_rows) AS BIGINT) AS n_rows,
       MAX(b.lo_v) AS lo_v,
       MAX(b.hi_v) AS hi_v,
       CAST(SUM(LEAST(GREATEST(base.v, b.lo_v), b.hi_v)) AS DOUBLE)
         / MAX(b.n_rows) AS wins_mean
FROM base JOIN b {jcond}
{gby_w}
"""
    else:
        sql = sql_b + "SELECT * FROM b"
    odf = con.execute(sql).fetchdf()
    label = (
        f"fuzzpct[{group} | p={p_lo}/{p_hi} | mod={mod}+{off} | "
        f"{'price' if use_price else 'qty'} | wins={winsorize}]"
    )
    compare_frames(sdf.toPandas(), odf, label)


@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_pct_plan())
def test_random_percentile_cross_engine_equivalence(spark, plan):
    """Discrete-percentile family differential coverage: rank-selected
    order statistics ((p*n+99) div 100 in pure integer arithmetic) and
    the winsorized-mean composition must agree between engines across
    grouping keys, percentile levels, both value domains (integer
    quantity, exact price cents), and sampling slices -- including the
    empty-input and tiny-group edges where rank formulas clamp to 1."""
    con = duck_connection(SF_DIR)
    try:
        _run_pct_both(spark, con, plan)
    finally:
        con.close()
