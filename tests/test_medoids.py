"""Cluster medoids: brute-force parity on randomized clusters, singleton
and tie handling, and the mega-cluster cap fallback."""

from __future__ import annotations

import random

from hexspark.pipeline.canonicalize import cluster_medoids


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_medoids(rows):
    by_c = {}
    for rid, cid, txt in rows:
        by_c.setdefault(cid, []).append((rid, txt))
    out = {}
    for cid, members in by_c.items():
        best = None
        for rid, txt in members:
            total = sum(_lev(txt, t2) for r2, t2 in members if r2 != rid)
            key = (total, rid)
            if best is None or key < best[0]:
                best = (key, rid, txt, total)
        out[cid] = (best[1], best[2], best[3], len(members))
    return out


def _run(spark, rows, cap=256):
    clusters = spark.createDataFrame(
        [(rid, cid) for rid, cid, _ in rows], "rid long, cluster_id long"
    )
    records = spark.createDataFrame(
        [(rid, txt) for rid, _, txt in rows], "rid long, txt string"
    )
    return cluster_medoids(clusters, records, "rid", "txt", max_cluster_size=cap)


def test_medoids_match_brute_force(spark):
    rng = random.Random(31)
    rows = []
    rid = 0
    for cid in range(12):
        for _ in range(rng.randint(1, 7)):
            rows.append((rid, cid, "".join(rng.choice("abcde") for _ in range(rng.randint(0, 15)))))
            rid += 1
    got = {
        r.cluster_id: (r.medoid_id, r.medoid_text, r.total_dist, r.n_members)
        for r in _run(spark, rows).collect()
    }
    assert got == _brute_medoids(rows)
    assert all(r.exact for r in _run(spark, rows).collect())


def test_tie_breaks_by_min_id(spark):
    rows = [(5, 0, "xx"), (3, 0, "yy"), (9, 0, "xy")]
    # xx: 2+1=3, yy: 2+1=3, xy: 1+1=2 -> medoid 9; then force a tie:
    got = {r.cluster_id: r.medoid_id for r in _run(spark, rows).collect()}
    assert got[0] == 9
    rows = [(5, 1, "ab"), (3, 1, "cd")]  # symmetric pair: both total 2
    got = _run(spark, rows).collect()
    assert got[0].medoid_id == 3


def test_mega_cluster_falls_back_to_min_id(spark):
    rows = [(i, 0, f"t{i}") for i in range(10)] + [(100, 1, "solo")]
    out = {r.cluster_id: r for r in _run(spark, rows, cap=5).collect()}
    assert out[0].medoid_id == 0 and out[0].exact is False and out[0].total_dist is None
    assert out[0].n_members == 10
    assert out[1].medoid_id == 100 and out[1].exact is True and out[1].total_dist == 0
