"""Temporal linkage: identical-arithmetic decay parity, the defining
close-pair-survives / far-coincidence-rejected behavior, sign
preservation for negative evidence, NTZ + instant timestamps, guards,
and the pure-projection plan."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.temporal_er import decay_weights, temporal_match_edges

_T0 = dt.datetime(2024, 1, 1)
_DDL = (
    "id_a string, id_b string, weight double, ts_a timestamp_ntz, ts_b timestamp_ntz"
)


def _p(a, b, w, days_a, days_b):
    return (a, b, w, _T0 + dt.timedelta(days=days_a), _T0 + dt.timedelta(days=days_b))


_PAIRS = [
    _p("x1", "x2", 8.0, 0, 3),       # strong, close → survives
    _p("y1", "y2", 8.0, 0, 270),     # equally strong, 3 half-lives apart → 1.0
    _p("z1", "z2", -6.0, 0, 90),     # negative evidence halves toward neutral
    _p("w1", "w2", 4.0, 10, 10),     # zero gap keeps full evidence
]


def test_decay_matches_python_and_preserves_sign(spark):
    df = decay_weights(spark.createDataFrame(_PAIRS, _DDL), half_life_days=90.0)
    got = {r["id_a"]: (r["gap_days"], r["decayed_weight"]) for r in df.collect()}
    for a, b, w, ta, tb in _PAIRS:
        gap = abs((tb - ta).total_seconds()) / 86400.0
        exp = w * 2.0 ** (-gap / 90.0)
        assert got[a][0] == pytest.approx(gap, rel=1e-12)
        assert got[a][1] == pytest.approx(exp, rel=1e-12)
    assert got["z1"][1] == pytest.approx(-3.0)  # sign preserved, magnitude halved
    assert got["w1"][1] == 4.0


def test_defining_behavior_far_coincidence_rejected(spark):
    # same raw similarity, same FIXED threshold: the close pair matches,
    # the far-apart coincidence does not — the Li et al. agreement decay
    edges = temporal_match_edges(
        spark.createDataFrame(_PAIRS, _DDL), threshold=3.0, half_life_days=90.0
    )
    kept = {r["id_a"] for r in edges.collect()}
    assert "x1" in kept and "y1" not in kept
    assert "w1" in kept and "z1" not in kept
    # columns ride along for review queues
    assert {"gap_days", "decayed_weight"} <= set(edges.columns)


def test_instant_timestamps_also_supported(spark):
    rows = [("a", "b", 6.0, _T0, _T0 + dt.timedelta(days=90))]
    df = decay_weights(
        spark.createDataFrame(
            rows, "id_a string, id_b string, weight double, ts_a timestamp, ts_b timestamp"
        ),
        half_life_days=90.0,
    )
    assert df.first()["decayed_weight"] == pytest.approx(3.0)


def test_guard_and_plan(spark):
    df = spark.createDataFrame(_PAIRS, _DDL)
    with pytest.raises(ValueError, match="half_life_days"):
        decay_weights(df, half_life_days=0.0)
    plan = (
        decay_weights(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan  # pure projection


def test_sub_half_life_monotone(spark):
    # decayed weight is strictly decreasing in the gap for positive
    # evidence — ordering of candidate pairs by recency is preserved
    rows = [_p(f"m{i}", "n", 5.0, 0, i * 30) for i in range(6)]
    df = decay_weights(spark.createDataFrame(rows, _DDL))
    got = [r["decayed_weight"] for r in df.orderBy("gap_days").collect()]
    assert all(got[i] > got[i + 1] for i in range(len(got) - 1))
    assert got[0] == 5.0 and got[3] == pytest.approx(5.0 * 0.5)
