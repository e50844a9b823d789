"""Component-local average-linkage HAC (pipeline/hac.py): the
applyInPandas groups must equal a pure-Python Lance-Williams replay with
the same deterministic tie-breaks, split chained components single-linkage
glues, respect the component cap, and refine the closure partition."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from hexspark.pipeline.hac import hac_components


def _oracle(edges, threshold, missing=None):
    """Pure-Python replay of _hac_component over EVERY component, same
    arithmetic and first-occurrence (row-major) argmin tie-break."""
    if missing is None:
        missing = 2.0 * threshold
    # components via union-find
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[str, list[tuple[str, str, float]]] = {}
    for a, b, d in edges:
        comps.setdefault(find(a), []).append((a, b, d))
    out: dict[str, str] = {}
    for comp_edges in comps.values():
        nodes = sorted({x for e in comp_edges for x in e[:2]})
        n = len(nodes)
        idx = {v: i for i, v in enumerate(nodes)}
        D = [[float(missing)] * n for _ in range(n)]
        for a, b, d in comp_edges:
            i, j = idx[a], idx[b]
            if d < D[i][j]:
                D[i][j] = D[j][i] = float(d)
        active = [True] * n
        size = [1] * n
        members = [[i] for i in range(n)]
        while sum(active) > 1:
            best, bi, bj = None, -1, -1
            for i in range(n):
                if not active[i]:
                    continue
                for j in range(i + 1, n):
                    if active[j] and (best is None or D[i][j] < best):
                        best, bi, bj = D[i][j], i, j
            if best is None or best > threshold:
                break
            ni, nj = size[bi], size[bj]
            for k in range(n):
                D[bi][k] = D[k][bi] = (ni * D[bi][k] + nj * D[bj][k]) / (ni + nj)
            size[bi] = ni + nj
            members[bi].extend(members[bj])
            active[bj] = False
        for i in range(n):
            if active[i]:
                rep = nodes[min(members[i])]
                for m in members[i]:
                    out[nodes[m]] = rep
    return out


def _run(spark, edges, threshold, **kw):
    df = spark.createDataFrame(
        edges, "conv_id_a string, conv_id_b string, dist double"
    )
    res = hac_components(df, threshold, **kw)
    rows = res.collect()
    return {r.conv_id: r.cluster_id for r in rows}, {
        r.conv_id: r.exact for r in rows
    }


def test_average_linkage_splits_a_chain(spark):
    """Chain a-b-c with good adjacent distances but missing a-c: single
    linkage (CC) keeps one cluster; average linkage prices the merge of
    {a,b} with {c} at mean(dist(b,c), missing(a,c)) and refuses."""
    edges = [("a", "b", 10.0), ("b", "c", 10.0)]
    got, exact = _run(spark, edges, threshold=20.0, missing_dist=80.0)
    # merge {a,b} first (10 <= 20); then d({a,b},{c}) = (10+80)/2 = 45 > 20
    assert got == {"a": "a", "b": "a", "c": "c"}
    assert all(exact.values())
    # with a forgiving missing_dist the chain folds back together
    got2, _ = _run(spark, edges, threshold=20.0, missing_dist=25.0)
    assert got2 == {"a": "a", "b": "a", "c": "a"}


@pytest.mark.parametrize("seed,threshold", [(6, 30.0), (15, 45.0)])
def test_randomized_vs_pure_python_replay(spark, seed, threshold):
    rng = np.random.default_rng(seed)
    names = [f"n{i:02d}" for i in range(30)]
    edges = [
        (names[i], names[j], float(rng.integers(5, 100)))
        for i, j in itertools.combinations(range(30), 2)
        if rng.random() < 0.12
    ]
    got, exact = _run(spark, edges, threshold)
    assert got == _oracle(edges, threshold)
    assert all(exact.values())


def test_refines_the_closure_partition(spark):
    rng = np.random.default_rng(8)
    names = [f"m{i:02d}" for i in range(24)]
    edges = [
        (names[i], names[j], float(rng.integers(5, 60)))
        for i, j in itertools.combinations(range(24), 2)
        if rng.random() < 0.15
    ]
    got, _ = _run(spark, edges, threshold=25.0)
    comp = _oracle(edges, threshold=float("inf"), missing=float("1e12"))
    # HAC clusters never span two closure components
    for a in got:
        for b in got:
            if got[a] == got[b]:
                assert comp[a] == comp[b]


def test_component_cap_falls_back_inexact(spark):
    clique = [
        (f"c{i}", f"c{j}", 5.0) for i, j in itertools.combinations(range(8), 2)
    ] + [("x1", "x2", 5.0)]
    got, exact = _run(spark, clique, threshold=10.0, max_component=4)
    assert not exact["c0"] and len({got[f"c{i}"] for i in range(8)}) == 1
    assert exact["x1"] and got["x1"] == got["x2"] == "x1"


def test_missing_dist_validation(spark):
    df_edges = [("a", "b", 1.0)]
    with pytest.raises(ValueError, match="missing_dist"):
        _run(spark, df_edges, threshold=10.0, missing_dist=5.0)
