"""Blocking-scheme learner: greedy picks the pass curve a hand-audit
predicts, redundant passes are never selected, the budget binds, and the
combo-count pricing matches the true deduped union cost on randomized
multi-pass streams."""

from __future__ import annotations

import random

import pytest

from hexspark.pipeline.blocking import union_candidates
from hexspark.pipeline.schemes import select_blocking_scheme


def _union(spark, passes):
    dfs = {
        name: spark.createDataFrame(pairs, "conv_id_a long, conv_id_b long")
        for name, pairs in passes.items()
    }
    return union_candidates(dfs)


def _labels(spark, positives, negatives=()):
    rows = [(a, b, True) for a, b in positives] + [(a, b, False) for a, b in negatives]
    return spark.createDataFrame(rows, "conv_id_a long, conv_id_b long, is_match boolean")


def test_greedy_prefers_high_recall_then_cheap(spark):
    # passA covers positives {1,2} with 4 pairs; passB covers {1} with 1
    # pair; passC covers {3} with 2 pairs and lots of junk overlap with A
    passes = {
        "A": [(1, 2), (3, 4), (10, 11), (12, 13)],   # covers pos (1,2),(3,4)
        "B": [(1, 2)],                                # covers pos (1,2) only
        "C": [(5, 6), (10, 11), (14, 15)],            # covers pos (5,6)
    }
    labels = _labels(spark, [(1, 2), (3, 4), (5, 6)], [(10, 11), (12, 13)])
    u = _union(spark, passes)
    out = select_blocking_scheme(labels, u, pair_budget=100)
    assert out["selected"] == ["A", "C"]          # B adds nothing after A
    assert out["n_covered"] == 3 and out["n_true_matches"] == 3
    # deduped union cost: A(4) + C's two new pairs (5,6),(14,15) = 6
    assert out["n_candidates"] == 6
    assert out["steps"][0]["pass"] == "A" and out["steps"][0]["marginal_covered"] == 2


def test_budget_binds_and_falls_back_to_cheapest_cover(spark):
    passes = {
        "big": [(1, 2), (3, 4)] + [(100 + i, 200 + i) for i in range(20)],
        "small": [(1, 2)],
    }
    labels = _labels(spark, [(1, 2), (3, 4)])
    u = _union(spark, passes)
    out = select_blocking_scheme(labels, u, pair_budget=5)
    # big (22 pairs) exceeds the budget; small fits and covers one positive
    assert out["selected"] == ["small"]
    assert out["n_candidates"] == 1 and out["n_covered"] == 1
    out = select_blocking_scheme(labels, u, pair_budget=0)
    assert out["selected"] == [] and out["n_candidates"] == 0


def test_union_pricing_matches_true_dedup_on_random_streams(spark):
    rng = random.Random(41)
    passes = {
        name: list({(rng.randrange(30), 100 + rng.randrange(30)) for _ in range(25)})
        for name in ["p0", "p1", "p2", "p3"]
    }
    positives = [(a, b) for a, b in passes["p1"][:5]]
    labels = _labels(spark, positives)
    u = _union(spark, passes)
    out = select_blocking_scheme(labels, u, pair_budget=10**6)
    sel = out["selected"]
    true_union = set()
    for p in sel:
        true_union.update(passes[p])
    assert out["n_candidates"] == len(true_union)
    covered = {pair for p in sel for pair in passes[p]} & set(positives)
    assert out["n_covered"] == len(covered)


def test_rejects_negative_budget(spark):
    u = _union(spark, {"a": [(1, 2)]})
    labels = _labels(spark, [(1, 2)])
    with pytest.raises(ValueError):
        select_blocking_scheme(labels, u, pair_budget=-1)
