"""MUC link-based coreference score (evaluate.muc_df): the contingency-cell
reformulation must equal the literal Vilain et al. definition computed by a
pure-Python oracle, reproduce the canonical MUC-6 worked examples, and stay
integer-exact in its emitted numerators/denominators."""

from __future__ import annotations

import random

import pytest

from hexspark.pipeline.evaluate import muc_df


def _muc_oracle(assign: dict[str, str], truth: dict[str, str]):
    """Literal definition: recall = sum over true entities k of
    (|k| - #response-partitions-of-k) / (|k| - 1); precision swaps roles."""
    ids = sorted(set(assign) & set(truth))

    def side(key: dict[str, str], resp: dict[str, str]):
        groups: dict[str, list[str]] = {}
        for r in ids:
            groups.setdefault(key[r], []).append(r)
        num = den = 0
        for members in groups.values():
            partitions = {resp[m] for m in members}
            num += len(members) - len(partitions)
            den += len(members) - 1
        return num, den

    rn, rd = side(truth, assign)
    pn, pd = side(assign, truth)
    rec = rn / rd if rd else 1.0
    pre = pn / pd if pd else 1.0
    f1 = 2 * pre * rec / (pre + rec) if pre + rec else 0.0
    return pre, rec, f1


def _dfs(spark, assign, truth):
    c = spark.createDataFrame(
        [(k, v) for k, v in assign.items()], "conv_id string, cluster_id string"
    )
    t = spark.createDataFrame(
        [(k, v) for k, v in truth.items()], "conv_id string, entity_id string"
    )
    return c, t


def test_muc_vilain_worked_example(spark):
    """MUC-6 classic: key entity {A,B,C,D} split by the response into
    {A,B} and {C,D} -> recall 2/3; every response link is correct ->
    precision 1."""
    truth = {x: "k" for x in "ABCD"}
    assign = {"A": "1", "B": "1", "C": "2", "D": "2"}
    row = muc_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["muc_recall_num"] == 2 and row["muc_recall_den"] == 3
    assert row["muc_precision_num"] == 2 and row["muc_precision_den"] == 2
    assert row["muc_recall"] == pytest.approx(2 / 3)
    assert row["muc_precision"] == pytest.approx(1.0)
    assert row["muc_f1"] == pytest.approx(0.8)


def test_muc_is_blind_to_singletons(spark):
    """Adding correctly-isolated singletons changes neither side — the
    documented MUC quirk (a reason to report B-cubed alongside it)."""
    truth = {x: "k" for x in "ABCD"}
    assign = {"A": "1", "B": "1", "C": "2", "D": "2"}
    base = muc_df(*_dfs(spark, assign, truth)).collect()[0]
    truth2 = {**truth, **{f"s{i}": f"e{i}" for i in range(5)}}
    assign2 = {**assign, **{f"s{i}": f"c{i}" for i in range(5)}}
    plus = muc_df(*_dfs(spark, assign2, truth2)).collect()[0]
    for col in ("muc_recall_num", "muc_recall_den", "muc_precision_num",
                "muc_precision_den"):
        assert plus[col] == base[col]
    assert plus["n_records"] == base["n_records"] + 5


def test_muc_perfect_and_degenerate(spark):
    # perfect clustering
    assign = {"a": "1", "b": "1", "c": "2"}
    truth = {"a": "x", "b": "x", "c": "y"}
    row = muc_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["muc_f1"] == pytest.approx(1.0)
    # all singletons on both sides: 0/0 -> defined as 1.0
    single = {f"r{i}": f"v{i}" for i in range(4)}
    row = muc_df(*_dfs(spark, single, dict(single))).collect()[0]
    assert row["muc_precision"] == 1.0 and row["muc_recall"] == 1.0
    # everything glued vs all-distinct truth: recall 1 (nothing to link),
    # precision 0 (every link wrong)
    glued = {f"r{i}": "g" for i in range(4)}
    distinct = {f"r{i}": f"v{i}" for i in range(4)}
    row = muc_df(*_dfs(spark, glued, distinct)).collect()[0]
    assert row["muc_precision"] == 0.0
    assert row["muc_recall"] == 1.0
    assert row["muc_f1"] == 0.0


def test_muc_randomized_vs_oracle(spark):
    rng = random.Random(17)
    for trial in range(4):
        ids = [f"r{i}" for i in range(40)]
        assign = {r: f"c{rng.randrange(8)}" for r in ids}
        truth = {r: f"e{rng.randrange(6)}" for r in ids}
        pre, rec, f1 = _muc_oracle(assign, truth)
        row = muc_df(*_dfs(spark, assign, truth)).collect()[0]
        assert row["muc_precision"] == pytest.approx(pre)
        assert row["muc_recall"] == pytest.approx(rec)
        assert row["muc_f1"] == pytest.approx(f1)


def test_muc_inner_join_universe(spark):
    """Records missing from either side are excluded, as for bcubed_df."""
    assign = {"a": "1", "b": "1", "c": "1", "zz": "9"}
    truth = {"a": "x", "b": "x", "c": "x", "qq": "y"}
    row = muc_df(*_dfs(spark, assign, truth)).collect()[0]
    assert row["n_records"] == 3
    assert row["muc_f1"] == pytest.approx(1.0)
