"""Fellegi-Sunter probabilistic scoring (pipeline/fs): match weights,
three-way classification, and EM parameter estimation."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.fs import FieldParams, classify, estimate_mu, match_weight

_PARAMS = {
    "agr_name": FieldParams(m=0.95, u=0.05),
    "agr_city": FieldParams(m=0.80, u=0.20),
    "agr_year": FieldParams(m=0.90, u=0.30),
}


def _w(agree: dict[str, bool | None]) -> float:
    total = 0.0
    for c, fp in _PARAMS.items():
        g = agree[c]
        if g is None:
            continue
        total += math.log2(fp.m / fp.u) if g else math.log2((1 - fp.m) / (1 - fp.u))
    return total


@pytest.fixture(scope="module")
def pair_df(spark):
    rows = [
        (1, True, True, True),
        (2, True, False, True),
        (3, False, False, False),
        (4, True, None, False),
        (5, None, None, None),
    ]
    return spark.createDataFrame(
        rows, "pair_id long, agr_name boolean, agr_city boolean, agr_year boolean"
    )


def test_match_weight_values(spark, pair_df):
    got = {
        r["pair_id"]: r["fs_weight"]
        for r in match_weight(pair_df, _PARAMS).collect()
    }
    rows = pair_df.collect()
    for r in rows:
        want = _w({c: r[c] for c in _PARAMS})
        assert got[r["pair_id"]] == pytest.approx(want), r["pair_id"]
    # all-null pair scores exactly 0
    assert got[5] == pytest.approx(0.0)


def test_match_weight_plan_is_projection(spark, pair_df):
    plan = (
        match_weight(pair_df, _PARAMS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection, no shuffle
    assert "BatchEvalPython" not in plan


def test_classify_three_way(spark, pair_df):
    out = classify(pair_df, _PARAMS, upper=4.0, lower=-4.0)
    got = {r["pair_id"]: r["fs_decision"] for r in out.collect()}
    assert got[1] == "match"        # all agree: strongly positive
    assert got[3] == "non_match"    # all disagree: strongly negative
    assert got[5] == "possible"     # all null: weight 0, review band


def test_param_validation(spark, pair_df):
    with pytest.raises(ValueError):
        match_weight(pair_df, {"agr_name": FieldParams(m=1.0, u=0.1)})
    with pytest.raises(ValueError):
        classify(pair_df, _PARAMS, upper=-1.0, lower=1.0)


def test_em_recovers_planted_parameters(spark):
    """Pairs drawn from a known two-class FS model: EM must recover m, u,
    and the prevalence p within a loose tolerance (EM converges to the
    data-generating parameters given enough pairs + separation)."""
    rng = random.Random(0xF5)
    true_m = {"a": 0.92, "b": 0.85, "c": 0.75}
    true_u = {"a": 0.08, "b": 0.15, "c": 0.30}
    true_p = 0.25
    rows = []
    for i in range(8000):
        is_match = rng.random() < true_p
        src = true_m if is_match else true_u
        rows.append(
            (i, rng.random() < src["a"], rng.random() < src["b"], rng.random() < src["c"])
        )
    df = spark.createDataFrame(
        rows, "pair_id long, a boolean, b boolean, c boolean"
    )
    params, p = estimate_mu(df, ["a", "b", "c"])
    assert p == pytest.approx(true_p, abs=0.05)
    for f in ("a", "b", "c"):
        assert params[f].m == pytest.approx(true_m[f], abs=0.07), f
        assert params[f].u == pytest.approx(true_u[f], abs=0.07), f


def test_em_handles_nulls(spark):
    rng = random.Random(0xE)
    rows = []
    for i in range(2000):
        is_match = rng.random() < 0.3
        a = rng.random() < (0.9 if is_match else 0.1)
        b = None if rng.random() < 0.3 else rng.random() < (0.9 if is_match else 0.1)
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "pair_id long, a boolean, b boolean")
    params, p = estimate_mu(df, ["a", "b"])
    assert 0.1 < p < 0.5
    assert params["b"].m > 0.7 and params["b"].u < 0.3


def test_em_then_classify_end_to_end(spark):
    """The production loop: estimate parameters from unlabeled pairs, then
    classify with them — planted matches land in 'match', planted
    non-matches in 'non_match'."""
    rng = random.Random(0x7)
    rows = []
    for i in range(4000):
        is_match = i % 4 == 0
        rows.append(
            (
                i,
                is_match,
                rng.random() < (0.95 if is_match else 0.05),
                rng.random() < (0.9 if is_match else 0.1),
                rng.random() < (0.85 if is_match else 0.2),
            )
        )
    df = spark.createDataFrame(
        rows, "pair_id long, truth boolean, a boolean, b boolean, c boolean"
    )
    params, _ = estimate_mu(df, ["a", "b", "c"])
    out = classify(df, params, upper=2.0, lower=-2.0)
    agg = (
        out.groupBy("truth", "fs_decision").count().collect()
    )
    tally = {(r["truth"], r["fs_decision"]): r["count"] for r in agg}
    n_match_right = tally.get((True, "match"), 0)
    n_match_all = sum(v for (t, _), v in tally.items() if t)
    n_non_wrong = tally.get((False, "match"), 0)
    n_non_all = sum(v for (t, _), v in tally.items() if not t)
    assert n_match_right / n_match_all > 0.8
    assert n_non_wrong / n_non_all < 0.05
