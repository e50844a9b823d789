"""Iterative match-merge ER (pipeline/matchmerge.py): the distributed
rounds must equal a pure-Python round-synchronous replay — including the
defining Swoosh behaviour, a merge unlocking a match neither constituent
had — and terminate at the fixpoint."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.matchmerge import match_merge_er


def _toks(text: str) -> frozenset[str]:
    return frozenset(t for t in re.split("[^a-z0-9]+", text.lower()) if t)


def _jacc(a: frozenset, b: frozenset) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def _oracle(rows, threshold):
    """Round-synchronous replay: match all entities, union components,
    repeat until no edge."""
    ents = {rid: (frozenset([rid]), _toks(text)) for rid, text in rows}
    rounds = 0
    while True:
        ids = sorted(ents)
        edges = [
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if ents[a][1] and ents[b][1]
            and _jacc(ents[a][1], ents[b][1]) >= threshold
        ]
        if not edges:
            break
        rounds += 1
        parent = {i: i for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups: dict[str, list[str]] = {}
        for i in ids:
            groups.setdefault(find(i), []).append(i)
        ents = {
            min(g): (
                frozenset().union(*(ents[m][0] for m in g)),
                frozenset().union(*(ents[m][1] for m in g)),
            )
            for root, g in groups.items()
            for g in [g]
        }
    assign = {m: e for e, (ms, _) in ents.items() for m in ms}
    return assign, rounds


def _df(spark, rows):
    return spark.createDataFrame(rows, "rec_id string, name string")


def _run(spark, rows, threshold):
    asg, ents, rounds = match_merge_er(
        _df(spark, rows), "rec_id", F.col("name"), threshold
    )
    return (
        {r.rec_id: r.entity_id for r in asg.collect()},
        {r.entity_id: (r.n_members, tuple(r.tokens)) for r in ents.collect()},
        rounds,
    )


def test_merge_unlocks_a_match(spark):
    """A={a,b,c} matches B={b,c,d} at Jaccard 0.5; C={a,b,d,e} matches
    NEITHER alone (0.4 each) but matches the merged {a,b,c,d} at 0.6 —
    the defining Swoosh case, needing exactly two rounds."""
    rows = [("r1", "a b c"), ("r2", "b c d"), ("r3", "a b d e")]
    assign, ents, rounds = _run(spark, rows, 0.5)
    assert rounds == 2
    assert assign == {"r1": "r1", "r2": "r1", "r3": "r1"}
    assert ents["r1"] == (3, ("a", "b", "c", "d", "e"))
    # sanity: one-shot (round-1 only) clustering would NOT glue r3
    oracle_assign, oracle_rounds = _oracle(rows, 0.5)
    assert oracle_assign == assign and oracle_rounds == 2


def test_fixpoint_no_matches(spark):
    rows = [("r1", "aa bb"), ("r2", "cc dd"), ("r3", "")]
    assign, ents, rounds = _run(spark, rows, 0.5)
    assert rounds == 0
    assert assign == {"r1": "r1", "r2": "r2", "r3": "r3"}
    assert ents["r3"] == (1, ())


@pytest.mark.parametrize("seed,threshold", [(3, 0.45), (21, 0.62)])
def test_randomized_vs_round_synchronous_replay(spark, seed, threshold):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        (
            f"r{i:03d}",
            " ".join(rng.choice(vocab, size=rng.integers(3, 8), replace=False)),
        )
        for i in range(50)
    ]
    assign, _, rounds = _run(spark, rows, threshold)
    want_assign, want_rounds = _oracle(rows, threshold)
    assert assign == want_assign
    assert rounds == want_rounds


def test_every_record_assigned_exactly_once(spark):
    rows = [("r1", "a b c"), ("r2", "b c d"), ("r3", "a b d e"), ("r4", "")]
    asg, _, _ = match_merge_er(_df(spark, rows), "rec_id", F.col("name"), 0.5)
    collected = [r.rec_id for r in asg.collect()]
    assert sorted(collected) == sorted(set(collected)) == [
        "r1", "r2", "r3", "r4"
    ]
