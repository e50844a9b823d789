"""Multi-threshold (dendrogram-slice) clustering: per-slice parity with a
union-find oracle, monotone refinement across thresholds, singleton
totality, and input-scan economy (one checkpoint of the loosest slice)."""

from __future__ import annotations

import random

import pytest

from hexspark.pipeline.clustering import threshold_components


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


def _random_scored_edges(seed, n_nodes, n_edges, max_dist):
    rng = random.Random(seed)
    out = []
    for _ in range(n_edges):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            out.append((a, b, rng.randint(0, max_dist)))
    return out


@pytest.mark.parametrize("seed", [5, 23])
def test_slices_match_union_find(spark, seed):
    n = 80
    edges = _random_scored_edges(seed, n, 150, 60)
    df = spark.createDataFrame(edges, "conv_id_a long, conv_id_b long, dist long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "conv_id long")
    ts = [15, 35, 60]
    got = threshold_components(df, ts, all_nodes=nodes).collect()
    by_t = {}
    for r in got:
        by_t.setdefault(r.threshold, {})[r.conv_id] = r.cluster_id
    for t in ts:
        want = _uf_components(n, [(a, b) for a, b, d in edges if d <= t])
        assert by_t[t] == want, f"threshold {t}"
        assert len(by_t[t]) == n  # total partition at every slice


def test_refinement_is_monotone(spark):
    edges = _random_scored_edges(99, 60, 120, 50)
    df = spark.createDataFrame(edges, "conv_id_a long, conv_id_b long, dist long")
    nodes = spark.createDataFrame([(i,) for i in range(60)], "conv_id long")
    got = threshold_components(df, [10, 30, 50], all_nodes=nodes).collect()
    by_t = {}
    for r in got:
        by_t.setdefault(r.threshold, {})[r.conv_id] = r.cluster_id
    # tighter slices refine looser ones: same tight cluster -> same loose cluster
    for tight, loose in [(10, 30), (30, 50)]:
        for a in by_t[tight]:
            for b in by_t[tight]:
                if by_t[tight][a] == by_t[tight][b]:
                    assert by_t[loose][a] == by_t[loose][b]


def test_rejects_empty_thresholds(spark):
    df = spark.createDataFrame([], "conv_id_a long, conv_id_b long, dist long")
    with pytest.raises(ValueError):
        threshold_components(df, [])
