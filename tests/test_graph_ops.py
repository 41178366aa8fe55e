"""Pins for the join-based PageRank core (functions/graph.pagerank):
the math against a plain-Python power iteration on hand-built graphs,
plus the graded query's output contract."""

from __future__ import annotations

import pytest

from sentiment_analysis_vector_search_spark.functions.graph import (
    DAMPING,
    TELEPORT,
    pagerank,
)
from sentiment_analysis_vector_search_spark.operators.graph_ops import (
    q_nation_pagerank,
)


def _py_pagerank(nodes, edges, iters):
    """edges: {(src, dst): w} out-normalized."""
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for (s, d), w in edges.items():
            contrib[d] += w * r[s]
        r = {v: TELEPORT / n + DAMPING * contrib[v] for v in nodes}
    return r


def _run(spark, nodes, edges, iters=3):
    ndf = spark.createDataFrame([(v,) for v in nodes], "node string")
    edf = spark.createDataFrame(
        [(s, d, w) for (s, d), w in edges.items()], "src string, dst string, w double"
    )
    return {r["node"]: r["r"] for r in pagerank(ndf, edf, iters=iters).collect()}


def test_pagerank_matches_python_reference_on_cycle_with_authority(spark):
    nodes = ["a", "b", "c", "d"]
    # a and b both point at c; c points at d; d back at a
    edges = {("a", "c"): 1.0, ("b", "c"): 1.0, ("c", "d"): 1.0, ("d", "a"): 1.0}
    got = _run(spark, nodes, edges)
    ref = _py_pagerank(nodes, edges, 3)
    for v in nodes:
        assert got[v] == pytest.approx(ref[v], abs=1e-8)
    # b has no in-edges: teleport-only, strictly the minimum
    assert got["b"] == min(got.values())
    assert got["b"] == pytest.approx(TELEPORT / 4, abs=1e-12)


def test_pagerank_dangling_node_gets_teleport_only(spark):
    nodes = ["a", "b", "z"]  # z has no out-edges AND no in-edges
    edges = {("a", "b"): 1.0, ("b", "a"): 1.0}
    got = _run(spark, nodes, edges, iters=2)
    assert got["z"] == pytest.approx(TELEPORT / 3, abs=1e-12)
    # documented teleport-only policy: total mass dips below 1 when
    # dangling mass is dropped, never above
    assert sum(got.values()) <= 1.0 + 1e-9


def test_pagerank_split_weights_halve_contribution(spark):
    nodes = ["s", "x", "y"]
    edges = {("s", "x"): 0.5, ("s", "y"): 0.5, ("x", "s"): 1.0, ("y", "s"): 1.0}
    got = _run(spark, nodes, edges)
    assert got["x"] == pytest.approx(got["y"], abs=1e-12)


def test_q_nation_pagerank_contract(spark, sf_dir):
    rows = q_nation_pagerank(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r["rk"] for r in rows) == list(range(1, n + 1))
    assert all(r["pagerank"] > 0 for r in rows)
    assert sum(r["pagerank"] for r in rows) <= 1.0 + 1e-9
    # rk ordering is by rank desc
    by_rk = sorted(rows, key=lambda r: r["rk"])
    prs = [r["pagerank"] for r in by_rk]
    assert prs == sorted(prs, reverse=True)


# ---------------------------------------------------------------------------
# q_nation_trade_triangles
# ---------------------------------------------------------------------------

def test_triangles_parity(spark, sf_dir):
    from tests.parity import assert_parity

    assert_parity(spark, "q_nation_trade_triangles", sf_dir)


def test_triangles_exactly_once_and_ordered(spark, sf_dir):
    """Each triangle appears exactly once with key_a < key_b < key_c, and
    the enumerated set equals a python brute force over the same
    thresholded edge list."""
    from itertools import combinations

    import pandas as pd

    from sentiment_analysis_vector_search_spark.operators.graph_ops import (
        _TRI_FACTOR,
        q_nation_trade_triangles,
    )

    rows = q_nation_trade_triangles(spark, sf_dir).collect()
    keys = [(r["key_a"], r["key_b"], r["key_c"]) for r in rows]
    assert len(keys) == len(set(keys))  # exactly once
    for a, b, c in keys:
        assert a < b < c

    # brute force from pandas
    import os

    li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))[
        ["l_suppkey", "l_orderkey"]
    ]
    sup = pd.read_parquet(os.path.join(sf_dir, "supplier.parquet"))[
        ["s_suppkey", "s_nationkey"]
    ]
    orders = pd.read_parquet(os.path.join(sf_dir, "orders.parquet"))[
        ["o_orderkey", "o_custkey"]
    ]
    cust = pd.read_parquet(os.path.join(sf_dir, "customer.parquet"))[
        ["c_custkey", "c_nationkey"]
    ]
    j = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    j = j[j.s_nationkey != j.c_nationkey]
    lo = j[["s_nationkey", "c_nationkey"]].min(axis=1)
    hi = j[["s_nationkey", "c_nationkey"]].max(axis=1)
    counts = pd.DataFrame({"lo": lo, "hi": hi}).groupby(["lo", "hi"]).size()
    edges = set(counts[counts >= _TRI_FACTOR * counts.mean()].index)
    nodes = sorted({x for e in edges for x in e})
    want = {
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    }
    assert set(keys) == want
