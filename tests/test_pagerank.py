"""PageRank record authority: identical-arithmetic pure-Python power-
iteration parity (randomized), hub-beats-leaf ordering, duplicate/reversed
edge invariance, probability conservation, guards."""

from __future__ import annotations

import random

import pytest

from hexspark.ops.graph import pagerank

_DDL = "conv_id_a string, conv_id_b string"


def _py_pagerank(edges, damping=0.85, n_iter=10):
    und = set()
    for x, y in edges:
        if x != y:
            und.add((min(x, y), max(x, y)))
    adj: dict[str, list[str]] = {}
    for x, y in und:
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    nodes = sorted(adj)
    n = len(nodes)
    if n == 0:
        return {}
    base = (1.0 - damping) / n
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        flow = {v: 0.0 for v in nodes}
        for v in nodes:
            share = r[v] / len(adj[v])
            for w in adj[v]:
                flow[w] += share
        r = {v: base + damping * flow[v] for v in nodes}
    return r


def _spark_pr(spark, edges, **kw):
    df = pagerank(spark.createDataFrame(edges, _DDL), **kw)
    return {row["node"]: row["rank"] for row in df.collect()}


def test_hub_outranks_leaves_and_python_parity(spark):
    edges = [("hub", f"leaf{i}") for i in range(6)] + [("leaf0", "leaf1")]
    got = _spark_pr(spark, edges)
    exp = _py_pagerank(edges)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], rel=1e-9)
    assert got["hub"] == max(got.values())
    assert got["leaf5"] == min(got.values())


def test_randomized_python_parity(spark):
    rng = random.Random(31)
    nodes = [f"n{i}" for i in range(18)]
    edges = []
    for _ in range(40):
        x, y = rng.sample(nodes, 2)
        edges.append((x, y))
        if rng.random() < 0.3:
            edges.append((y, x))  # reversed duplicate must not double-count
        if rng.random() < 0.2:
            edges.append((x, y))  # exact duplicate must not double-count
    got = _spark_pr(spark, edges, n_iter=8)
    exp = _py_pagerank(edges, n_iter=8)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], rel=1e-9), v


def test_probability_conserved_on_connected_graph(spark):
    # undirected connected graph, no dangling mass → ranks sum to 1
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    got = _spark_pr(spark, edges)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-12)


def test_guards_and_empty(spark):
    df_edges = [("a", "b")]
    with pytest.raises(ValueError, match="damping"):
        _spark_pr(spark, df_edges, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        _spark_pr(spark, df_edges, n_iter=0)
    assert _spark_pr(spark, [("x", "x")]) == {}  # self-loops dropped → empty


def test_authority_canonicals_pick_the_hub(spark):
    from hexspark.pipeline.canonicalize import authority_canonicals

    # cluster c1: hub h with 4 chained near-copies; cluster c2: symmetric
    # pair (tie -> min id); cluster c3: singleton (no edges, rank 0)
    edges = [("h", "d1"), ("h", "d2"), ("h", "d3"), ("d3", "d4"),
             ("p1", "p2")]
    clusters = [("h", "c1"), ("d1", "c1"), ("d2", "c1"), ("d3", "c1"),
                ("d4", "c1"), ("p1", "c2"), ("p2", "c2"), ("s", "c3")]
    out = authority_canonicals(
        spark.createDataFrame(clusters, "conv_id string, cluster_id string"),
        spark.createDataFrame(edges, _DDL),
    )
    got = {r["cluster_id"]: (r["canonical_id"], r["n_members"]) for r in out.collect()}
    assert got["c1"] == ("h", 5)      # authority beats min-id ("d1")
    assert got["c2"] == ("p1", 2)     # symmetric tie -> ascending id
    assert got["c3"] == ("s", 1)      # edgeless singleton, rank 0
    assert {r["cluster_id"]: r["rank"] for r in out.collect()}["c3"] == 0.0
