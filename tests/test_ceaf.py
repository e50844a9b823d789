"""CEAF (pipeline/ceaf.py): the per-component bitmask-DP alignment must
equal a brute-force best-permutation oracle for both phi3 (CEAF-m) and
phi4 (CEAF-e), score perfect clusterings at 1.0, and flag the greedy
fallback when a component exceeds the DP cap."""

from __future__ import annotations

import itertools
import random

import pytest

from hexspark.pipeline.ceaf import ceaf_df


def _phi(assign, truth, kind):
    """Brute-force optimal one-to-one alignment over ALL cluster/entity
    pairings (small inputs only)."""
    ids = sorted(set(assign) & set(truth))
    cs = sorted({assign[i] for i in ids})
    es = sorted({truth[i] for i in ids})
    cell = {}
    for i in ids:
        cell[(assign[i], truth[i])] = cell.get((assign[i], truth[i]), 0) + 1
    c_size = {c: sum(v for (cc, _), v in cell.items() if cc == c) for c in cs}
    e_size = {e: sum(v for (_, ee), v in cell.items() if ee == e) for e in es}

    def w(c, e):
        o = cell.get((c, e), 0)
        if kind == "m":
            return o
        return 2.0 * o / (c_size[c] + e_size[e]) if o else 0.0

    small, big = (cs, es) if len(cs) <= len(es) else (es, cs)
    best = 0.0
    for perm in itertools.permutations(big, len(small)):
        tot = sum(
            w(s, b) if len(cs) <= len(es) else w(b, s)
            for s, b in zip(small, perm)
        )
        best = max(best, tot)
    return best


def _dfs(spark, assign, truth):
    c = spark.createDataFrame(
        [(k, v) for k, v in assign.items()], "conv_id string, cluster_id string"
    )
    t = spark.createDataFrame(
        [(k, v) for k, v in truth.items()], "conv_id string, entity_id string"
    )
    return c, t


def test_perfect_clustering(spark):
    assign = {"a": "1", "b": "1", "c": "2", "d": "3"}
    truth = {"a": "x", "b": "x", "c": "y", "d": "z"}
    row = ceaf_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["ceaf_m"] == 1.0 and row["ceaf_e_f1"] == 1.0
    assert row["phi_m"] == 4 and row["all_exact"]


def test_luo_style_hand_case(spark):
    """Key {a,b,c},{d,e} vs response {a,b},{c,d},{e}: the optimal phi3
    alignment pairs {a,b}<->{abc} (2) and {c,d}<->{de} (1) -> Phi=3,
    CEAF-m = 3/5; the alignment CONSTRAINT forbids also crediting {e}."""
    truth = {"a": "K1", "b": "K1", "c": "K1", "d": "K2", "e": "K2"}
    assign = {"a": "R1", "b": "R1", "c": "R2", "d": "R2", "e": "R3"}
    row = ceaf_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["phi_m"] == 3
    assert row["ceaf_m"] == pytest.approx(3 / 5)
    want_e = _phi(assign, truth, "e")
    pe, re_ = want_e / 3, want_e / 2
    assert row["ceaf_e_precision"] == pytest.approx(pe, abs=1e-6)
    assert row["ceaf_e_recall"] == pytest.approx(re_, abs=1e-6)
    assert row["ceaf_e_f1"] == pytest.approx(2 * pe * re_ / (pe + re_), abs=1e-6)


def test_split_farming_is_not_credited(spark):
    """One true entity split into 3 clusters: CEAF-m credits only the
    biggest fragment (B-cubed would partially credit all three)."""
    truth = {x: "k" for x in "abcde"}
    assign = {"a": "1", "b": "1", "c": "1", "d": "2", "e": "3"}
    row = ceaf_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["phi_m"] == 3
    assert row["ceaf_m"] == pytest.approx(3 / 5)


def test_randomized_vs_bruteforce(spark):
    rng = random.Random(31)
    for trial in range(4):
        ids = [f"r{i}" for i in range(14)]
        assign = {r: f"c{rng.randrange(4)}" for r in ids}
        truth = {r: f"e{rng.randrange(4)}" for r in ids}
        row = ceaf_df(*_dfs(spark, assign, truth)).collect()[0]
        assert row["phi_m"] == _phi(assign, truth, "m"), trial
        n = len(ids)
        assert row["ceaf_m"] == pytest.approx(
            _phi(assign, truth, "m") / n, abs=1e-6
        )
        want_e = _phi(assign, truth, "e")
        assert row["ceaf_e_precision"] == pytest.approx(
            want_e / len(set(assign.values())), abs=1e-6
        )
        assert row["all_exact"]


def test_cap_falls_back_greedy_flagged(spark):
    """max_side=1 forces the greedy path on a 2x2 component; greedy picks
    the single best cell (2) and blocks the rest of its row/column, then
    takes the best remaining disjoint cell (1)."""
    truth = {"a": "x", "b": "x", "c": "y", "d": "y", "e": "y"}
    assign = {"a": "1", "b": "1", "c": "1", "d": "2", "e": "2"}
    exact = ceaf_df(*_dfs(spark, assign, truth)).collect()[0]
    capped = ceaf_df(*_dfs(spark, assign, truth), max_side=1).collect()[0]
    assert exact["all_exact"] and not capped["all_exact"]
    assert capped["phi_m"] <= exact["phi_m"]


def test_components_fold_independently(spark):
    """Two disjoint contingency components: the total Phi is the sum of
    the per-component optima (decomposition soundness)."""
    truth = {"a": "x", "b": "x", "p": "q", "r": "q"}
    assign = {"a": "1", "b": "1", "p": "7", "r": "8"}
    row = ceaf_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["phi_m"] == _phi(
        {"a": "1", "b": "1"}, {"a": "x", "b": "x"}, "m"
    ) + _phi({"p": "7", "r": "8"}, {"p": "q", "r": "q"}, "m")
