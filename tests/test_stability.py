"""Bootstrap edge stability: exact parity with a union-find replay of the
deterministic replicate masks, the bridge-vs-triangle confidence gap on the
glued-entities fixture, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.stability import edge_stability, replicate_kept

# two well-corroborated triangles glued by one bad bridge edge
EDGES = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _masks(spark, edges, n_samples, keep_frac, seed):
    """Replay replicate membership through the SAME public predicate."""
    df = spark.createDataFrame(edges, "conv_id_a long, conv_id_b long")
    out = {}
    for s in range(n_samples):
        kept = df.where(
            replicate_kept(F.col("conv_id_a"), F.col("conv_id_b"), s, seed, keep_frac)
        ).collect()
        out[s] = {(r.conv_id_a, r.conv_id_b) for r in kept}
    return out


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return find


def test_stability_matches_union_find_replay(spark):
    n, frac, seed = 8, 0.7, 7
    df = spark.createDataFrame(EDGES, "conv_id_a long, conv_id_b long")
    got = {
        (r.conv_id_a, r.conv_id_b): r.n_cocluster
        for r in edge_stability(df, n_samples=n, keep_frac=frac, seed=seed).collect()
    }
    masks = _masks(spark, EDGES, n, frac, seed)
    want = {}
    for a, b in EDGES:
        count = 0
        for s in range(n):
            find = _uf(masks[s])
            if masks[s] and find(a) == find(b):
                count += 1
        want[(a, b)] = count
    assert got == want


def test_bridge_is_less_stable_than_clique_edges(spark):
    # two 4-cliques glued by one bridge: a clique edge reconnects through
    # any of several surviving 2-paths, the bridge ONLY when itself
    # sampled — so its co-cluster count concentrates near keep_frac while
    # clique edges concentrate near 1.0
    import itertools

    cliq = [tuple(e) for e in itertools.combinations(range(4), 2)]
    cliq += [tuple(e) for e in itertools.combinations(range(4, 8), 2)]
    edges = cliq + [(3, 4)]
    df = spark.createDataFrame(edges, "conv_id_a long, conv_id_b long")
    got = {
        (r.conv_id_a, r.conv_id_b): r.n_cocluster
        for r in edge_stability(df, n_samples=12, keep_frac=0.7, seed=3).collect()
    }
    assert got[(3, 4)] < min(got[e] for e in cliq)
    assert got[(3, 4)] <= 12 * 0.85  # ~keep_frac of replicates at most


def test_full_keep_is_always_coclustered(spark):
    df = spark.createDataFrame(EDGES, "conv_id_a long, conv_id_b long")
    got = edge_stability(df, n_samples=3, keep_frac=1.0, seed=1).collect()
    assert all(r.n_cocluster == 3 for r in got)
    assert len(got) == len(EDGES)


def test_guards(spark):
    df = spark.createDataFrame(EDGES, "conv_id_a long, conv_id_b long")
    with pytest.raises(ValueError):
        edge_stability(df, n_samples=0)
    with pytest.raises(ValueError):
        edge_stability(df, keep_frac=0.0)
