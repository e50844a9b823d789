"""Parallel KwikCluster (pipeline/clustering.pivot_components): the
distributed rounds must reproduce the SEQUENTIAL greedy exactly — same md5
priorities, same clusters, pivot ids and all — on any graph. That equality
is the whole correctness story (the 3-approximation of Ailon et al. is a
property of the sequential algorithm), so the oracle here is a pure-Python
replay of sequential KwikCluster.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest

from hexspark.pipeline.clustering import (
    connected_components,
    pivot_components,
)


def _pri(n: str, salt: str = "") -> str:
    return hashlib.md5((salt + n).encode()).hexdigest() + n


def _sequential_kwikcluster(edges, salt: str = "") -> dict[str, str]:
    """Ailon-Charikar-Newman greedy: visit nodes in priority order; an
    unclustered node becomes a pivot and claims its unclustered
    neighbors."""
    nodes: set[str] = set()
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        nodes.update((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[str, str] = {}
    for n in sorted(nodes, key=lambda x: _pri(x, salt)):
        if n in out:
            continue
        out[n] = n
        for m in adj.get(n, ()):
            if m not in out:
                out[m] = n
    return out


def _run(spark, edges, salt: str = ""):
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "conv_id_a string, conv_id_b string"
    )
    clusters, rounds = pivot_components(df, salt=salt)
    return {r["conv_id"]: r["cluster_id"] for r in clusters.collect()}, rounds


@pytest.mark.parametrize("seed", [0, 7, 19])
def test_pivot_matches_sequential_kwikcluster(spark, seed):
    rng = np.random.default_rng(seed)
    n = 60
    names = [f"c{i:03d}" for i in range(n)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(n), 2)
        if rng.random() < 0.06
    ]
    got, rounds = _run(spark, edges, salt=f"s{seed}")
    want = _sequential_kwikcluster(edges, salt=f"s{seed}")
    assert got == want
    assert rounds <= 40


def test_pivot_waits_for_its_min_neighbor(spark):
    """The configuration where the naive 'join the pivot that knocked you
    out' rule diverges from the sequential greedy: priorities x<w<q<p<u
    with edges x-w, q-w, q-u, p-u. Round 1 pivots are {x, p} and p knocks
    u out — but u's true owner is q, which only becomes a pivot in round 2
    (sequential processes q before p... before u). Deferring assignment to
    the post-MIS phase hands u to q; eager assignment would give u to p."""
    labels = [f"n{i}" for i in range(5)]
    x, w, q, p, u = sorted(labels, key=_pri)
    edges = [(x, w), (q, w), (q, u), (p, u)]
    got, _ = _run(spark, edges)
    assert got == {x: x, w: x, q: q, u: q, p: p}
    # and that is what the sequential greedy says too
    assert got == _sequential_kwikcluster(edges)


def test_pivot_bounds_bridge_damage(spark):
    """Two 4-cliques glued by one false bridge edge: transitive closure
    returns ONE 8-node cluster; every pivot cluster sits inside one node's
    closed match-neighborhood, whose maximum size here is 5 — the glued
    entity can never survive whole."""
    a = [f"a{i}" for i in range(4)]
    b = [f"b{i}" for i in range(4)]
    edges = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [(a[0], b[0])]
    )
    got, _ = _run(spark, edges)
    sizes: dict[str, int] = {}
    for cid in got.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    assert max(sizes.values()) <= 5
    cc_df = connected_components(
        _spark_edges(spark, edges)
    )[0]
    assert cc_df.select("cluster_id").distinct().count() == 1


def _spark_edges(spark, edges):
    return spark.createDataFrame(
        [(x, y) for x, y in edges], "conv_id_a string, conv_id_b string"
    )


def test_pivot_invariant_to_duplicate_and_reversed_edges(spark):
    rng = np.random.default_rng(3)
    names = [f"d{i}" for i in range(30)]
    base = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(30), 2)
        if rng.random() < 0.1
    ]
    noisy = base + [(b, a) for a, b in base[::2]] + base[:5] + [(n, n) for n in names[:3]]
    got_base, _ = _run(spark, base)
    got_noisy, _ = _run(spark, noisy)
    assert got_base == got_noisy


def test_pivot_is_a_partition_with_member_pivots(spark):
    """Any salt: every node appears exactly once, and each cluster's id is
    itself a member of that cluster (the pivot/center)."""
    rng = np.random.default_rng(5)
    names = [f"p{i}" for i in range(40)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(40), 2)
        if rng.random() < 0.08
    ]
    for salt in ("", "alt"):
        df = _spark_edges(spark, edges)
        clusters, _ = pivot_components(df, salt=salt)
        rows = clusters.collect()
        members = [r["conv_id"] for r in rows]
        assert sorted(members) == sorted(set(members))  # exactly once
        assigned = {r["conv_id"]: r["cluster_id"] for r in rows}
        in_edges = {n for e in edges for n in e}
        assert set(members) == in_edges
        for cid in set(assigned.values()):
            assert assigned[cid] == cid  # pivot belongs to its own cluster


def test_pivot_empty_edges(spark):
    got, rounds = _run(spark, [])
    assert got == {}
    assert rounds == 0
