"""Unseeded LPA communities: synchronous-replay pure-Python parity
(randomized), the defining dense-groups-split-sparse-cut fixture,
self-vote oscillation damping, convergence contract, guards."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from hexspark.ops.graph import lpa_communities

_DDL = "conv_id_a string, conv_id_b string"


def _py_lpa(edges, max_iter=10):
    und = set()
    for x, y in edges:
        if x != y:
            und.add((min(x, y), max(x, y)))
    adj: dict[str, list[str]] = {}
    for x, y in und:
        adj.setdefault(x, []).append(y)
        adj.setdefault(y, []).append(x)
    labels = {v: v for v in adj}
    rounds, converged = 0, False
    for _ in range(max_iter):
        rounds += 1
        new = {}
        for v in adj:
            votes = Counter(labels[w] for w in adj[v])
            votes[labels[v]] += 1  # self-vote
            # deterministic: max count, then MIN label
            top = max(votes.values())
            new[v] = min(l for l, c in votes.items() if c == top)
        if new == labels:
            converged = True
            labels = new
            break
        labels = new
    return labels, rounds, converged


def _spark_lpa(spark, edges, **kw):
    df, rounds, conv = lpa_communities(spark.createDataFrame(edges, _DDL), **kw)
    return {r["node"]: r["label"] for r in df.collect()}, rounds, conv


def test_two_cliques_one_bridge_split(spark):
    # two 4-cliques joined by a single bridge edge: CC glues them, LPA
    # keeps two communities — the defining over-merge split
    k1 = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    k2 = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"), ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
    edges = k1 + k2 + [("a4", "b1")]
    got, rounds, conv = _spark_lpa(spark, edges)
    exp, erounds, econv = _py_lpa(edges)
    assert got == exp and (rounds, conv) == (erounds, econv)
    assert conv
    comms = {}
    for v, l in got.items():
        comms.setdefault(l, set()).add(v)
    groups = sorted(comms.values(), key=len, reverse=True)[:2]
    assert {"a1", "a2", "a3", "a4"} in groups and {"b1", "b2", "b3", "b4"} in groups


def test_randomized_sync_replay_parity(spark):
    rng = random.Random(17)
    nodes = [f"n{i:02d}" for i in range(16)]
    edges = []
    for _ in range(30):
        x, y = rng.sample(nodes, 2)
        edges.append((x, y))
        if rng.random() < 0.25:
            edges.append((y, x))  # reversed dup
    got, rounds, conv = _spark_lpa(spark, edges, max_iter=6)
    exp, erounds, econv = _py_lpa(edges, max_iter=6)
    assert got == exp
    assert (rounds, conv) == (erounds, econv)


def test_self_vote_damps_two_node_oscillation(spark):
    # pure sync LPA oscillates forever on a single edge (bipartite);
    # the self-vote makes both adopt the min label and converge
    got, rounds, conv = _spark_lpa(spark, [("x", "y")])
    assert got == {"x": "x", "y": "x"} and conv


def test_guards(spark):
    with pytest.raises(ValueError, match="max_iter"):
        _spark_lpa(spark, [("a", "b")], max_iter=0)
