"""Articulation points (ops/graph.articulation_points): the per-component
iterative Tarjan must equal a brute-force remove-and-count oracle on any
graph — including the split_into counts — and respect the component cap."""

from __future__ import annotations

import itertools
from collections import deque

import numpy as np
import pytest

from hexspark.ops.graph import articulation_points


def _n_components(nodes, edges):
    adj: dict[str, set[str]] = {n: set() for n in nodes}
    for x, y in edges:
        if x in adj and y in adj:
            adj[x].add(y)
            adj[y].add(x)
    seen: set[str] = set()
    n = 0
    for s in nodes:
        if s in seen:
            continue
        n += 1
        q = deque([s])
        seen.add(s)
        while q:
            c = q.popleft()
            for m in adj[c]:
                if m not in seen:
                    seen.add(m)
                    q.append(m)
    return n


def _oracle(edges):
    """Brute force: for every node in a component, remove it and count the
    parts its component falls into; articulation iff parts > 1."""
    nodes = sorted({x for e in edges for x in e})
    # split into components first
    comp_of: dict[str, str] = {}
    for s in nodes:
        if s in comp_of:
            continue
        members = {s}
        q = deque([s])
        while q:
            c = q.popleft()
            for x, y in edges:
                for m, o in ((x, y), (y, x)):
                    if m == c and o not in members:
                        members.add(o)
                        q.append(o)
        cid = min(members)
        for m in members:
            comp_of[m] = cid
    out = {}
    for n in nodes:
        cid = comp_of[n]
        comp_nodes = [m for m in nodes if comp_of[m] == cid and m != n]
        if not comp_nodes:
            continue
        parts = _n_components(
            comp_nodes, [e for e in edges if n not in e]
        )
        if parts > 1:
            out[n] = (cid, parts)
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    points, skipped = articulation_points(df, **kw)
    return (
        {r.node: (r.component, r.split_into) for r in points.collect()},
        {r.component: r.n_members for r in skipped.collect()},
    )


def test_hand_cases(spark):
    # chain a-b-c: b is the cut (2 parts); triangle: none; hub: center
    # splits into its spoke count
    chain = [("a", "b"), ("b", "c")]
    got, _ = _run(spark, chain)
    assert got == {"b": ("a", 2)}
    tri = [("x", "y"), ("y", "z"), ("x", "z")]
    got, _ = _run(spark, tri)
    assert got == {}
    hub = [("h", s) for s in ("s1", "s2", "s3")]
    got, _ = _run(spark, hub)
    assert got == {"h": ("h", 3)}


def test_two_cliques_one_bridge_node(spark):
    """Two triangles sharing one vertex m: m is the unique articulation
    point and removing it leaves 2 parts."""
    edges = [("a1", "a2"), ("a1", "m"), ("a2", "m"),
             ("b1", "b2"), ("b1", "m"), ("b2", "m")]
    got, _ = _run(spark, edges)
    assert got == {"m": ("a1", 2)}


@pytest.mark.parametrize("seed", [3, 28])
def test_randomized_vs_bruteforce(spark, seed):
    rng = np.random.default_rng(seed)
    names = [f"n{i:02d}" for i in range(28)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(28), 2)
        if rng.random() < 0.08
    ]
    got, skipped = _run(spark, edges)
    assert skipped == {}
    assert got == _oracle(edges)


def test_component_cap(spark):
    big = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(10)]  # 11-node chain
    small = [("x", "y"), ("y", "z")]
    got, skipped = _run(spark, big + small, max_component=5)
    assert skipped == {"c00": 11}
    assert got == {"y": ("x", 2)}
