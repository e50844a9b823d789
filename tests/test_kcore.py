"""k-core decomposition (ops/graph.k_core): the distributed peeling must
equal a pure-Python reference peel on any graph, peel cascades (removing a
node can drag neighbors under k), and handle degenerate inputs."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from hexspark.ops.graph import k_core


def _oracle(edges, k):
    adj: dict[str, set[str]] = {}
    for x, y in edges:
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    nodes = set(adj)
    kept = {
        tuple(sorted(e)) for e in edges
        if e[0] != e[1] and e[0] in nodes and e[1] in nodes
    }
    return nodes, kept


def _df(spark, edges):
    return spark.createDataFrame(edges, "id_a string, id_b string")


def _run(spark, edges, k):
    nodes, core_edges, rounds = k_core(_df(spark, edges), k)
    return (
        {r.node for r in nodes.collect()},
        {(r.u, r.v) for r in core_edges.collect()},
        rounds,
    )


def test_triangle_with_tail(spark):
    """Triangle a-b-c plus a 2-path tail: the 2-core is exactly the
    triangle, and peeling the tail CASCADES (t1 first, then t0)."""
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "t0"), ("t0", "t1")]
    nodes, core_edges, rounds = _run(spark, edges, 2)
    assert nodes == {"a", "b", "c"}
    assert core_edges == {("a", "b"), ("a", "c"), ("b", "c")}
    assert rounds == 2  # the cascade needs two peels


@pytest.mark.parametrize("seed,k", [(4, 2), (12, 3)])
def test_randomized_vs_reference_peel(spark, seed, k):
    rng = np.random.default_rng(seed)
    names = [f"n{i}" for i in range(40)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(40), 2)
        if rng.random() < 0.09
    ]
    nodes, core_edges, _ = _run(spark, edges, k)
    want_nodes, want_edges = _oracle(edges, k)
    assert nodes == want_nodes
    assert core_edges == want_edges


def test_whole_graph_survives_when_already_core(spark):
    clique = list(itertools.combinations([f"c{i}" for i in range(5)], 2))
    nodes, core_edges, rounds = _run(spark, clique, 3)
    assert len(nodes) == 5 and len(core_edges) == 10
    assert rounds == 0


def test_everything_peels_and_validation(spark):
    chain = [(f"x{i}", f"x{i+1}") for i in range(5)]
    nodes, core_edges, _ = _run(spark, chain, 2)
    assert nodes == set() and core_edges == set()
    with pytest.raises(ValueError, match="k must be"):
        k_core(_df(spark, chain), 0)
