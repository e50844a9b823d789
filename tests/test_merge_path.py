"""merge_path (ops/graph.py): the distributed BFS must return a SHORTEST
valid chain of match edges with deterministic min-parent tie-breaks,
[] for unreachable / same-node queries, and respect the hop bound."""

from __future__ import annotations

import itertools
from collections import deque

import numpy as np

from hexspark.ops.graph import merge_path


def _bfs_dist(edges, src, dst):
    adj: dict[str, set[str]] = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    seen = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        for m in adj.get(n, ()):
            if m not in seen:
                seen[m] = seen[n] + 1
                q.append(m)
    return seen.get(dst)


def _df(spark, edges):
    return spark.createDataFrame(edges, "id_a string, id_b string")


def _check_valid(path, edges, src, dst):
    es = {tuple(sorted(e)) for e in edges}
    assert path[0][0] == src and path[-1][1] == dst
    for (x1, y1), (x2, y2) in zip(path, path[1:]):
        assert y1 == x2
    for hop in path:
        assert tuple(sorted(hop)) in es
    nodes = [path[0][0]] + [h[1] for h in path]
    assert len(nodes) == len(set(nodes))  # simple path


def test_chain_path(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    path = merge_path(_df(spark, edges), "a", "d")
    assert path == [("a", "b"), ("b", "c"), ("c", "d")]


def test_shortest_beats_longer_route(spark):
    edges = [("a", "b"), ("b", "d"), ("a", "x"), ("x", "y"), ("y", "d")]
    path = merge_path(_df(spark, edges), "a", "d")
    assert len(path) == 2
    _check_valid(path, edges, "a", "d")


def test_deterministic_min_parent(spark):
    """Two equal-length routes a-m1-d / a-m2-d: the lexicographically
    smaller middle node wins, every run."""
    edges = [("a", "m2"), ("m2", "d"), ("a", "m1"), ("m1", "d")]
    for _ in range(2):
        assert merge_path(_df(spark, edges), "a", "d") == [("a", "m1"), ("m1", "d")]


def test_unreachable_self_and_hop_bound(spark):
    edges = [("a", "b"), ("c", "d")]
    assert merge_path(_df(spark, edges), "a", "d") == []
    assert merge_path(_df(spark, edges), "a", "a") == []
    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    assert merge_path(_df(spark, chain), "n0", "n6", max_hops=3) == []
    assert len(merge_path(_df(spark, chain), "n0", "n6", max_hops=6)) == 6


def test_randomized_lengths_match_reference_bfs(spark):
    rng = np.random.default_rng(7)
    names = [f"v{i}" for i in range(25)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(25), 2)
        if rng.random() < 0.09
    ]
    df = _df(spark, edges)
    for s, t in (("v0", "v9"), ("v3", "v17"), ("v5", "v24")):
        want = _bfs_dist(edges, s, t)
        path = merge_path(df, s, t)
        if want is None:
            assert path == []
        else:
            assert len(path) == want
            _check_valid(path, edges, s, t)
