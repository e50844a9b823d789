"""Group linkage: mutual-best member assignment stays inside each group
pair, the Jaccard-normalized score is exact on hand cases, identical groups
score 1.0, and a randomized pure-Python replica agrees."""

from __future__ import annotations

import random
from collections import defaultdict

from hexspark.pipeline.matching import group_linkage


def _py_group_linkage(sims, sizes_a, sizes_b):
    by_pair = defaultdict(list)
    for ga, gb, ma, mb, s in sims:
        by_pair[(ga, gb)].append((ma, mb, s))
    out = {}
    for (ga, gb), rows in by_pair.items():
        best_a, best_b = {}, {}
        for ma, mb, s in rows:
            if ma not in best_a or (s, -mb) > (best_a[ma][1], -best_a[ma][0]):
                best_a[ma] = (mb, s)
            if mb not in best_b or (s, -ma) > (best_b[mb][1], -best_b[mb][0]):
                best_b[mb] = (ma, s)
        matched = [
            (ma, mb, s)
            for ma, mb, s in rows
            if best_a[ma][0] == mb and best_b[mb][0] == ma
        ]
        n, ss = len(matched), sum(s for _, _, s in matched)
        denom = sizes_a[ga] + sizes_b[gb] - n
        out[(ga, gb)] = (n, round(ss, 9), round(ss / denom, 9))
    return out


def _run(spark, sims, sizes_a, sizes_b, min_score=0.0):
    df = spark.createDataFrame(
        sims, "group_a long, group_b long, member_a long, member_b long, sim double"
    )
    sa = spark.createDataFrame(list(sizes_a.items()), "group_a long, n_a long")
    sb = spark.createDataFrame(list(sizes_b.items()), "group_b long, n_b long")
    return {
        (r.group_a, r.group_b): (r.n_matched, round(r.sim_sum, 9), round(r.score, 9))
        for r in group_linkage(df, sa, sb, min_score=min_score).collect()
    }


def test_identical_groups_score_one(spark):
    sims = [(1, 10, 0, 100, 1.0), (1, 10, 1, 101, 1.0), (1, 10, 2, 102, 1.0)]
    got = _run(spark, sims, {1: 3}, {10: 3})
    assert got == {(1, 10): (3, 1.0 * 3, 1.0)}


def test_contested_member_and_dilution(spark):
    # member 0 is best for BOTH right members; only the mutual pair stays
    sims = [
        (1, 10, 0, 100, 0.9),
        (1, 10, 0, 101, 0.8),
        (1, 10, 1, 101, 0.5),
    ]
    # mutual: (0,100,0.9); (0,101) loses on left side; (1,101): 101's best
    # is 0 -> not mutual. n_matched=1, denom = 2 + 2 - 1 = 3
    got = _run(spark, sims, {1: 2}, {10: 2})
    assert got == {(1, 10): (1, 0.9, round(0.9 / 3, 9))}


def test_assignment_never_leaks_across_group_pairs(spark):
    sims = [
        (1, 10, 0, 100, 0.9),
        (2, 10, 0, 100, 0.4),  # same member ids, different group pair
    ]
    got = _run(spark, sims, {1: 1, 2: 1}, {10: 1})
    assert got[(1, 10)] == (1, 0.9, 0.9)
    assert got[(2, 10)] == (1, 0.4, 0.4)


def test_min_score_filters(spark):
    sims = [(1, 10, 0, 100, 0.2)]
    assert _run(spark, sims, {1: 2}, {10: 2}, min_score=0.5) == {}


def test_randomized_parity_with_python_replica(spark):
    rng = random.Random(61)
    sizes_a = {g: rng.randint(1, 5) for g in range(6)}
    sizes_b = {g: rng.randint(1, 5) for g in range(10, 16)}
    sims = []
    for ga in sizes_a:
        for gb in sizes_b:
            if rng.random() < 0.5:
                continue
            for ma in range(sizes_a[ga]):
                for mb in range(sizes_b[gb]):
                    if rng.random() < 0.6:
                        sims.append(
                            (ga, gb, ma, mb, round(rng.random(), 3))
                        )
    want = _py_group_linkage(sims, sizes_a, sizes_b)
    assert _run(spark, sims, sizes_a, sizes_b) == want
