"""Seeded label propagation (pipeline/labelprop.py): the synchronous
frozen-frontier rounds must equal a pure-Python replay — majority vote
among labeled neighbors, min-label ties, seeds frozen — leave unreachable
records unlabeled, and refuse conflicting seeds."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from hexspark.pipeline.labelprop import propagate_labels


def _oracle(edges, seeds):
    adj: dict[str, set[str]] = {}
    for x, y in edges:
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    labels = dict(seeds)
    hops = {n: 0 for n in labels}
    rounds = 0
    while True:
        new = {}
        for n in adj:
            if n in labels:
                continue
            votes: dict[str, int] = {}
            for m in adj[n]:
                if m in labels:
                    votes[labels[m]] = votes.get(labels[m], 0) + 1
            if votes:
                new[n] = min(votes, key=lambda l: (-votes[l], l))
        if not new:
            break
        rounds += 1
        for n, l in new.items():
            labels[n] = l
            hops[n] = rounds
    return labels, hops, rounds


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "conv_id_a string, conv_id_b string")
    s = spark.createDataFrame(seeds, "conv_id string, label string")
    out, rounds = propagate_labels(e, s, **kw)
    rows = out.collect()
    return (
        {r.conv_id: r.label for r in rows},
        {r.conv_id: r.hops for r in rows},
        rounds,
    )


def test_layered_propagation_and_majority_tie(spark):
    """u has one L1 neighbor and one L2 neighbor (tie -> L1, the smaller
    label); w is two hops from its nearest seed and freezes in round 2."""
    edges = [("s1", "u"), ("s2", "u"), ("u", "w")]
    seeds = [("s1", "L1"), ("s2", "L2")]
    labels, hops, rounds = _run(spark, edges, seeds)
    assert labels == {"s1": "L1", "s2": "L2", "u": "L1", "w": "L1"}
    assert hops == {"s1": 0, "s2": 0, "u": 1, "w": 2}
    assert rounds == 2


def test_majority_beats_min_label(spark):
    edges = [("a1", "u"), ("a2", "u"), ("b1", "u")]
    seeds = [("a1", "Z"), ("a2", "Z"), ("b1", "A")]
    labels, _, _ = _run(spark, edges, seeds)
    assert labels["u"] == "Z"  # 2 votes beat the smaller label


def test_unreachable_stays_unlabeled(spark):
    edges = [("s", "u"), ("x", "y")]
    labels, _, _ = _run(spark, edges, [("s", "L")])
    assert labels == {"s": "L", "u": "L"}  # x, y absent


def test_seeds_are_frozen(spark):
    """A seed surrounded by differently-labeled neighbors keeps its own
    label."""
    edges = [("s1", "s2"), ("s1", "s3")]
    seeds = [("s1", "MINE"), ("s2", "OTHER"), ("s3", "OTHER")]
    labels, hops, _ = _run(spark, edges, seeds)
    assert labels["s1"] == "MINE" and hops["s1"] == 0


def test_conflicting_seeds_raise(spark):
    with pytest.raises(ValueError, match="conflicting"):
        _run(spark, [("a", "b")], [("a", "L1"), ("a", "L2")])


@pytest.mark.parametrize("seed", [5, 18])
def test_randomized_vs_replay(spark, seed):
    rng = np.random.default_rng(seed)
    names = [f"n{i:02d}" for i in range(40)]
    edges = [
        (names[i], names[j])
        for i, j in itertools.combinations(range(40), 2)
        if rng.random() < 0.07
    ]
    seed_rows = [
        (names[i], f"E{i % 4}") for i in range(40) if rng.random() < 0.2
    ]
    if not seed_rows:
        seed_rows = [(names[0], "E0")]
    labels, hops, rounds = _run(spark, edges, seed_rows)
    want_labels, want_hops, want_rounds = _oracle(edges, seed_rows)
    # oracle's labels include seeds not in any edge; spark side carries
    # all seeds too (hops 0) — compare directly
    assert labels == want_labels
    assert hops == want_hops
    assert rounds == want_rounds
