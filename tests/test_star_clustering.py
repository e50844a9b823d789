"""Star clustering (pipeline/clustering.star_components): the distributed
rounds must reproduce the SEQUENTIAL degree-greedy exactly — visit nodes by
descending degree (ties by id); an uncovered node becomes a star center and
covers its neighbors; satellites join their highest-degree adjacent center.
The oracle is a pure-Python replay of that greedy, as for pivot."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from hexspark.pipeline.clustering import (
    connected_components,
    pivot_components,
    star_components,
)


def _sequential_star(edges) -> dict[str, str]:
    nodes: set[str] = set()
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        nodes.update((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(adj.get(n, ())) for n in nodes}
    order = sorted(nodes, key=lambda n: (-deg[n], n))
    centers: set[str] = set()
    covered: set[str] = set()
    for n in order:
        if n in covered:
            continue
        centers.add(n)
        covered.add(n)
        covered.update(adj.get(n, ()))
    out: dict[str, str] = {}
    for n in nodes:
        if n in centers:
            out[n] = n
        else:
            out[n] = min(
                (c for c in adj[n] if c in centers),
                key=lambda c: (-deg[c], c),
            )
    return out


def _run(spark, edges):
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "conv_id_a string, conv_id_b string"
    )
    clusters, rounds = star_components(df)
    return {r["conv_id"]: r["cluster_id"] for r in clusters.collect()}, rounds


@pytest.mark.parametrize("seed", [0, 11, 23])
def test_star_matches_sequential_greedy(spark, seed):
    rng = np.random.default_rng(seed)
    n = 60
    names = [f"c{i:03d}" for i in range(n)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(n), 2)
        if rng.random() < 0.06
    ]
    got, rounds = _run(spark, edges)
    assert got == _sequential_star(edges)
    assert rounds <= 40


def test_star_centers_are_hubs(spark):
    """A hub with 5 spokes plus a 2-path hanging off one spoke: the hub has
    the max degree so it is the first center; every spoke is covered by it
    and joins the hub's star."""
    hub = "h"
    spokes = [f"s{i}" for i in range(5)]
    edges = [(hub, s) for s in spokes] + [("s0", "t0"), ("t0", "t1")]
    got, _ = _run(spark, edges)
    for s in spokes:
        assert got[s] == hub
    assert got[hub] == hub
    # t0 is covered by s0? no — s0 is NOT a center (covered by the hub);
    # t0 becomes a center after the hub round and claims t1
    assert got["t0"] == "t0"
    assert got["t1"] == "t0"


def test_star_bounds_bridge_damage_like_pivot(spark):
    """Two 4-cliques glued by one false bridge: transitive closure returns
    ONE 8-node cluster; star clusters sit inside a closed neighborhood
    (max size 5 here), so the glued entity cannot survive whole."""
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
    # sequential replay: a0 (deg 4) centers first and claims the bridge
    # endpoint b0 along with its clique; b0 (also deg 4) is covered so b1
    # centers the remaining b's. One node leaks across the bridge — the
    # damage a single false edge can do is bounded at one record, never a
    # whole glued entity
    assert got == {
        **{n: a[0] for n in a},
        "b0": a[0],
        **{n: "b1" for n in b[1:]},
    }
    df = spark.createDataFrame(edges, "conv_id_a string, conv_id_b string")
    assert connected_components(df)[0].select("cluster_id").distinct().count() == 1


def test_star_invariant_to_duplicate_and_reversed_edges(spark):
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


def test_star_is_a_partition_with_member_centers(spark):
    rng = np.random.default_rng(5)
    names = [f"p{i}" for i in range(40)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(40), 2)
        if rng.random() < 0.08
    ]
    got, _ = _run(spark, edges)
    in_edges = {n for e in edges for n in e}
    assert set(got) == in_edges
    for cid in set(got.values()):
        assert got[cid] == cid  # center belongs to its own cluster


def test_star_empty_edges(spark):
    got, rounds = _run(spark, [])
    assert got == {}
    assert rounds == 0


def test_refactor_kept_pivot_semantics(spark):
    """The shared MIS engine must not have changed pivot's answers: spot
    re-pin one random graph against the sequential KwikCluster replay."""
    from tests.test_pivot_clustering import _sequential_kwikcluster

    rng = np.random.default_rng(41)
    names = [f"r{i}" for i in range(50)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(50), 2)
        if rng.random() < 0.07
    ]
    df = spark.createDataFrame(edges, "conv_id_a string, conv_id_b string")
    clusters, _ = pivot_components(df, salt="re")
    got = {r["conv_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == _sequential_kwikcluster(edges, salt="re")
