"""BLANC (evaluate.blanc_df): the contingency-cell derivation must equal a
literal enumerate-every-pair oracle — coref F1 and non-coref F1 averaged —
including the degenerate-side conventions."""

from __future__ import annotations

import itertools
import random

import pytest

from hexspark.pipeline.evaluate import blanc_df


def _blanc_oracle(assign: dict[str, str], truth: dict[str, str]):
    ids = sorted(set(assign) & set(truth))
    pairs = list(itertools.combinations(ids, 2))
    lr = {p for p in pairs if assign[p[0]] == assign[p[1]]}
    lk = {p for p in pairs if truth[p[0]] == truth[p[1]]}
    tp = len(lr & lk)
    tn = len(set(pairs) - lr - lk)

    def f1(num, den_p, den_r):
        p = num / den_p if den_p else None
        r = num / den_r if den_r else None
        if p is not None and r is not None:
            return 2 * p * r / (p + r) if p + r else 0.0
        return 0.0 if den_p or den_r else None

    fc = f1(tp, len(lr), len(lk))
    fn = f1(tn, len(pairs) - len(lr), len(pairs) - len(lk))
    if fc is not None and fn is not None:
        return fc, fn, (fc + fn) / 2
    if fc is not None:
        return fc, fn, fc
    if fn is not None:
        return fc, fn, fn
    return fc, fn, 1.0


def _dfs(spark, assign, truth):
    c = spark.createDataFrame(
        [(k, v) for k, v in assign.items()], "conv_id string, cluster_id string"
    )
    t = spark.createDataFrame(
        [(k, v) for k, v in truth.items()], "conv_id string, entity_id string"
    )
    return c, t


def test_blanc_perfect(spark):
    assign = {"a": "1", "b": "1", "c": "2", "d": "3"}
    truth = {"a": "x", "b": "x", "c": "y", "d": "z"}
    row = blanc_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["blanc_fc"] == 1.0 and row["blanc_fn"] == 1.0
    assert row["blanc"] == 1.0


def test_blanc_hand_case(spark):
    # entity {a,b,c} split into {a,b} and {c}; d a true singleton
    assign = {"a": "1", "b": "1", "c": "2", "d": "3"}
    truth = {"a": "x", "b": "x", "c": "x", "d": "z"}
    fc, fn, bl = _blanc_oracle(assign, truth)
    row = blanc_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["blanc_fc"] == pytest.approx(fc, abs=1e-6)
    assert row["blanc_fn"] == pytest.approx(fn, abs=1e-6)
    assert row["blanc"] == pytest.approx(bl, abs=1e-6)


def test_blanc_degenerate_sides(spark):
    # truth all singletons, system glued: coref side scores 0, non-coref
    # side is the meaningful one
    glued = {f"r{i}": "g" for i in range(4)}
    distinct = {f"r{i}": f"v{i}" for i in range(4)}
    fc, fn, bl = _blanc_oracle(glued, distinct)
    row = blanc_df(*_dfs(spark, glued, distinct)).collect()[0]
    assert row["blanc_fc"] == 0.0 == fc
    assert row["blanc_fn"] == pytest.approx(fn, abs=1e-6)
    assert row["blanc"] == pytest.approx(bl, abs=1e-6)
    # both all-singletons: no link mass on either side of the coref half;
    # the non-coref half is perfect -> BLANC = 1.0
    row = blanc_df(*_dfs(spark, distinct, dict(distinct))).collect()[0]
    assert row["blanc_fc"] is None
    assert row["blanc_fn"] == 1.0
    assert row["blanc"] == 1.0
    # single record: no pairs at all on either side -> trivially 1.0
    row = blanc_df(*_dfs(spark, {"a": "1"}, {"a": "x"})).collect()[0]
    assert row["blanc"] == 1.0


def test_blanc_randomized_vs_oracle(spark):
    rng = random.Random(23)
    for trial in range(4):
        ids = [f"r{i}" for i in range(35)]
        assign = {r: f"c{rng.randrange(7)}" for r in ids}
        truth = {r: f"e{rng.randrange(5)}" for r in ids}
        fc, fn, bl = _blanc_oracle(assign, truth)
        row = blanc_df(*_dfs(spark, assign, truth)).collect()[0]
        assert row["blanc_fc"] == pytest.approx(fc, abs=1e-6)
        assert row["blanc_fn"] == pytest.approx(fn, abs=1e-6)
        assert row["blanc"] == pytest.approx(bl, abs=1e-6)
