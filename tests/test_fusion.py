"""Truth discovery: trust-weighted voting flips a round-0 tie toward the
sources corroborated elsewhere; ballot stuffing collapses; deterministic
tie-break; randomized parity against a pure-Python replica."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest

from hexspark.pipeline.fusion import truth_discovery


def _py_truth(claims, rounds=2):
    """Pure-Python replica of the integer voting rounds."""
    c = sorted(set(claims))
    support = Counter((e, a, v) for (e, a, v, s) in c)
    trust = Counter(s for (_, _, _, s) in c)
    for _ in range(rounds - 1):
        trust = defaultdict(int)
        for e, a, v, s in c:
            trust[s] += support[(e, a, v)]
        nxt = defaultdict(int)
        for e, a, v, s in c:
            nxt[(e, a, v)] += trust[s]
        support = nxt
    best = {}
    for (e, a, v), n in support.items():
        cur = best.get((e, a))
        if cur is None or n > cur[1] or (n == cur[1] and v < cur[0]):
            best[(e, a)] = (v, n)
    return {(e, a, v, n) for (e, a), (v, n) in best.items()}


def _run(spark, claims, rounds=2):
    df = spark.createDataFrame(claims, "entity long, attr string, value string, source string")
    resolved, trust = truth_discovery(df, "entity", "attr", "value", "source", rounds=rounds)
    return (
        {(r.entity, r.attr, r.value, r.votes) for r in resolved.collect()},
        {(r.source, r.trust) for r in trust.collect()},
    )


def test_trust_flips_a_tied_vote(spark):
    claims = [(0, "x", "A", "s1"), (0, "x", "A", "s2"),
              (0, "x", "B", "s3"), (0, "x", "B", "s4")]
    for e in range(1, 6):
        v = f"v{e}"
        claims += [(e, "x", v, "s1"), (e, "x", v, "s2"), (e, "x", v, "s5"),
                   (e, "x", f"w{e}", "s3"), (e, "x", f"u{e}", "s4")]
    resolved, trust = _run(spark, claims, rounds=2)
    win = {(e, a): v for (e, a, v, n) in resolved}
    # round 0 is a 2-2 tie on entity 0; s1/s2 earn trust from the 5
    # corroborated entities and break it toward A
    assert win[(0, "x")] == "A"
    t = dict(trust)
    assert t["s1"] == t["s2"] == 2 + 5 * 3
    assert t["s3"] == t["s4"] == 2 + 5 * 1
    assert resolved == _py_truth(claims)


def test_plain_majority_at_one_round_and_min_value_ties(spark):
    claims = [(1, "y", "B", "s1"), (1, "y", "A", "s2")]  # 1-1 tie -> min value
    resolved, _ = _run(spark, claims, rounds=1)
    assert resolved == {(1, "y", "A", 1)}


def test_duplicate_claims_collapse(spark):
    claims = [(2, "z", "A", "s1")] * 5 + [(2, "z", "B", "s2"), (2, "z", "B", "s3")]
    resolved, _ = _run(spark, claims, rounds=1)
    assert resolved == {(2, "z", "B", 2)}


def test_rejects_bad_rounds(spark):
    df = spark.createDataFrame([(1, "a", "v", "s")], "entity long, attr string, value string, source string")
    with pytest.raises(ValueError):
        truth_discovery(df, "entity", "attr", "value", "source", rounds=0)


@pytest.mark.parametrize("seed", [3, 17])
def test_randomized_parity_with_python_replica(spark, seed):
    rng = random.Random(seed)
    claims = []
    for _ in range(300):
        claims.append((
            rng.randrange(12),
            rng.choice(["x", "y"]),
            rng.choice(["A", "B", "C", "D"]),
            f"s{rng.randrange(8)}",
        ))
    resolved, _ = _run(spark, claims, rounds=2)
    assert resolved == _py_truth(claims)
