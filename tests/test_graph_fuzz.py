"""Differential fuzzing for the ITERATIVE graph operators (r10 VERDICT
item 8): random small graphs driven through the REAL Spark loops --
connected components, k-core peeling, multi-source BFS, synchronous LPA --
and compared exactly against independent pure-Python references.

The iterative family is the least fuzz-covered in the repo (the SQL-dialect
fuzzer in test_differential_fuzz.py cannot reach loops) and now holds
driver slots.  The references are deliberately DIFFERENT algorithms where
one exists: union-find vs the operator's min-label propagation with
pointer jumping (CC), queue BFS vs level-synchronous frontier expansion --
so an agreement is two algorithms meeting at the spec, not one
implementation checked against itself.  k-core and LPA have one canonical
algorithm; their references are independent re-implementations of the
documented spec (operators/similarity.py docstrings), including the
mode/min-label tie-break and the isolated-vertex rule.

Graphs are drawn per the operators' documented caller contract: one row
per undirected edge, no self-loops, no multi-edges (degree counting is
multiplicity-sensitive by design; registered callers always feed deduped
pairs).  ``derandomize=True`` keeps the suite deterministic for the driver
gate; crank SPARK_GRAFT_GRAPH_FUZZ_EXAMPLES for a deeper run.
"""

from __future__ import annotations

import os
from collections import Counter, deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.operators.similarity import (
    bfs_hops,
    connected_components,
    kcore_membership,
    label_propagation,
)

#: Iterative operators run several Spark jobs per call (materialize per
#: round), so this family uses a smaller default example budget than the
#: SQL-dialect fuzzer's 40.
N_EXAMPLES = int(os.environ.get("SPARK_GRAFT_GRAPH_FUZZ_EXAMPLES", "8"))

_NODE_SCHEMA = T.StructType([T.StructField("v", T.LongType())])
_EDGE_SCHEMA = T.StructType(
    [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
)

_SETTINGS = dict(
    max_examples=N_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _graph(draw):
    """(n, edges): vertices 0..n-1, a<b unique undirected edges.  Shapes
    this reaches that the fixtures don't: isolated vertices, pure chains
    (pointer-jumping's adversary), odd cycles (LPA oscillators), multiple
    components of different sizes."""
    n = draw(st.integers(1, 12))
    all_pairs = [(a, b) for a in range(n) for b in range(a + 1, n)]
    edges = draw(
        st.lists(st.sampled_from(all_pairs), max_size=18, unique=True)
        if all_pairs
        else st.just([])
    )
    return n, edges


def _dfs(spark, n, edges):
    nodes = spark.createDataFrame([(v,) for v in range(n)], _NODE_SCHEMA)
    edf = spark.createDataFrame([(a, b) for a, b in edges], _EDGE_SCHEMA)
    return nodes, edf


def _adj(n, edges):
    adj = {v: [] for v in range(n)}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    return adj


# --------------------------------------------------------------------------
# Connected components: union-find reference
# --------------------------------------------------------------------------


def _cc_reference(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n)}


@settings(**_SETTINGS)
@given(_graph())
def test_connected_components_matches_union_find(spark, g):
    n, edges = g
    nodes, edf = _dfs(spark, n, edges)
    got = {r.v: r.lbl for r in connected_components(nodes, edf).collect()}
    assert got == _cc_reference(n, edges)


# --------------------------------------------------------------------------
# k-core: iterative peeling reference
# --------------------------------------------------------------------------


def _kcore_reference(n, edges, k):
    deg0 = Counter()
    for a, b in edges:
        deg0[a] += 1
        deg0[b] += 1
    alive = set(range(n))
    adj = _adj(n, edges)
    while True:
        doomed = {
            v for v in alive if sum(1 for u in adj[v] if u in alive) < k
        }
        if not doomed:
            break
        alive -= doomed
    return {v: (deg0.get(v, 0), 1 if v in alive else 0) for v in range(n)}


@settings(**_SETTINGS)
@given(_graph(), st.integers(1, 4))
def test_kcore_matches_peeling(spark, g, k):
    n, edges = g
    nodes, edf = _dfs(spark, n, edges)
    got = {
        r.v: (r.degree, r.in_kcore)
        for r in kcore_membership(nodes, edf, k=k).collect()
    }
    assert got == _kcore_reference(n, edges, k)


# --------------------------------------------------------------------------
# Multi-source BFS: queue reference
# --------------------------------------------------------------------------


def _bfs_reference(n, edges, seeds, max_hops):
    adj = _adj(n, edges)
    hop = {v: -1 for v in range(n)}
    q = deque()
    for s in sorted(set(seeds)):
        hop[s] = 0
        q.append(s)
    while q:
        v = q.popleft()
        if hop[v] >= max_hops:
            continue
        for u in adj[v]:
            if hop[u] == -1:
                hop[u] = hop[v] + 1
                q.append(u)
    return hop


@settings(**_SETTINGS)
@given(_graph(), st.data())
def test_bfs_hops_matches_queue_bfs(spark, g, data):
    n, edges = g
    # seeds drawn WITH duplicates on purpose: the operator documents that
    # it dedups them (the r9 ADVICE regression)
    seeds = data.draw(
        st.lists(st.integers(0, n - 1), min_size=1, max_size=3)
    )
    max_hops = data.draw(st.integers(1, 4))
    nodes, edf = _dfs(spark, n, edges)
    sdf = spark.createDataFrame([(s,) for s in seeds], _NODE_SCHEMA)
    got = {
        r.v: r.hop
        for r in bfs_hops(nodes, edf, sdf, max_hops=max_hops).collect()
    }
    assert got == _bfs_reference(n, edges, seeds, max_hops)


# --------------------------------------------------------------------------
# Synchronous frequency LPA: spec re-implementation
# --------------------------------------------------------------------------


def _lpa_reference(n, edges, rounds):
    adj = _adj(n, edges)
    lbl = {v: v for v in range(n)}
    for _ in range(rounds):
        nxt = {}
        for v in range(n):
            if not adj[v]:
                nxt[v] = lbl[v]  # isolated vertices keep their own label
                continue
            freq = Counter(lbl[u] for u in adj[v])
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lbl = nxt
    return lbl


@settings(**_SETTINGS)
@given(_graph(), st.integers(1, 4))
def test_label_propagation_matches_sync_reference(spark, g, rounds):
    n, edges = g
    nodes, edf = _dfs(spark, n, edges)
    got = {
        r.v: r.lbl
        for r in label_propagation(nodes, edf, rounds=rounds).collect()
    }
    assert got == _lpa_reference(n, edges, rounds)


# --------------------------------------------------------------------------
# PageRank: dense power-iteration reference (r11 VERDICT item 7)
# --------------------------------------------------------------------------

from flink_kafka_consumer_cassandra_output_spark.plans.northstar_queries import (  # noqa: E402
    PR_D,
    PR_ITERS,
    clustering_coeff_from_pairs,
    pagerank_from_pairs,
)

_PAIR_SCHEMA = T.StructType(
    [T.StructField("id_a", T.LongType()), T.StructField("id_b", T.LongType())]
)


def _pagerank_reference(edges):
    """Straight dense power iteration with the operator's fixed semantics:
    vertex set = edge endpoints only (the operator derives verts from the
    edge list), undirected edges walked both ways, no dangling handling
    (every vertex has degree >= 1 by construction), PR_ITERS fixed rounds.
    A DIFFERENT algorithm shape from the operator's bucketed two-level
    fold: naive per-vertex neighbor sums in arbitrary order."""
    verts = sorted({v for e in edges for v in e})
    if not verts:
        return {}
    adj = {v: [] for v in verts}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    n = len(verts)
    deg = {v: len(adj[v]) for v in verts}
    r = {v: 1.0 / n for v in verts}
    for _ in range(PR_ITERS):
        r = {
            v: (1.0 - PR_D) / n + PR_D * sum(r[u] / deg[u] for u in adj[v])
            for v in verts
        }
    return {v: (deg[v], r[v]) for v in verts}


@settings(**_SETTINGS)
@given(_graph())
def test_pagerank_matches_power_iteration(spark, g):
    n, edges = g
    pdf = spark.createDataFrame([(a, b) for a, b in edges], _PAIR_SCHEMA)
    got = {
        r.v: (r.deg, r.pagerank) for r in pagerank_from_pairs(pdf).collect()
    }
    want = _pagerank_reference(edges)
    assert set(got) == set(want)
    for v, (d, rank) in want.items():
        gd, grank = got[v]
        assert gd == d
        # the operator's bucketed deterministic fold and the reference's
        # naive sum differ only in float summation order: algorithmic
        # agreement is the claim here (bit-parity vs the unrolled SQL
        # oracle is the driver gate's job)
        assert abs(grank - rank) <= 1e-12 + 1e-9 * abs(rank), (v, grank, rank)


# --------------------------------------------------------------------------
# Local clustering coefficient: brute-force triangle/wedge reference
# --------------------------------------------------------------------------


def _clustering_reference(n, edges):
    eset = {frozenset(e) for e in edges}
    adj = _adj(n, edges)
    out = {}
    for v in range(n):
        nbrs = sorted(adj[v])
        d = len(nbrs)
        ntri = sum(
            1
            for i in range(d)
            for j in range(i + 1, d)
            if frozenset((nbrs[i], nbrs[j])) in eset
        )
        coeff = (2 * ntri) / (d * (d - 1)) if d >= 2 else 0.0
        out[v] = (d, ntri, coeff)
    return out


@settings(**_SETTINGS)
@given(_graph())
def test_clustering_coeff_matches_brute_force(spark, g):
    """Exact comparison: degree/n_tri are integers and the coefficient is a
    single IEEE division of exact integers on both sides."""
    n, edges = g
    nodes = spark.createDataFrame([(v,) for v in range(n)], _NODE_SCHEMA)
    pdf = spark.createDataFrame([(a, b) for a, b in edges], _PAIR_SCHEMA)
    got = {
        r.v: (r.degree, r.n_tri, r.clustering_coeff)
        for r in clustering_coeff_from_pairs(nodes, pdf).collect()
    }
    assert got == _clustering_reference(n, edges)
