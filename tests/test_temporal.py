"""Temporal operators: as-of join and interval (bucketed range) join.

Each test checks the Spark operator against a brute-force python oracle on
the same rows, plus the plan-shape claims the module docstring makes (one
keyed exchange, no broadcast-nested-loop / cartesian fallback).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hexspark.ops.temporal import asof_join, interval_join

_T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=minutes)


def _us(t: dt.datetime) -> int:
    return int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: at most one row per (key, ts) — the as-of contract
    rows = [
        ("A", _ts(0), 1.0),
        ("A", _ts(10), 2.0),
        ("A", _ts(30), 3.0),
        ("B", _ts(5), 10.0),
        ("B", _ts(50), 20.0),
        # key C has no quotes at all
    ]
    return spark.createDataFrame(rows, "sym string, qts timestamp_ntz, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", _ts(0), 1),    # equal ts → inclusive match (px=1.0)
        ("A", _ts(9), 2),    # before 2nd quote → px=1.0
        ("A", _ts(10), 3),   # equal ts → px=2.0
        ("A", _ts(29), 4),   # px=2.0
        ("A", _ts(100), 5),  # px=3.0
        ("B", _ts(4), 6),    # before any B quote → null
        ("B", _ts(60), 7),   # px=20.0
        ("C", _ts(1), 8),    # key with no right rows → null
    ]
    return spark.createDataFrame(rows, "sym string, tts timestamp_ntz, trade_id int")


def test_asof_backward_inclusive(spark, quotes, trades):
    out = asof_join(trades, quotes, key="sym", left_ts="tts", right_ts="qts",
                    value_cols=["px"])
    got = {r["trade_id"]: (r["px"], r["matched_ts_us"]) for r in out.collect()}
    assert len(got) == 8  # one output row per left row
    assert got[1] == (1.0, _us(_ts(0)))
    assert got[2] == (1.0, _us(_ts(0)))
    assert got[3] == (2.0, _us(_ts(10)))
    assert got[4] == (2.0, _us(_ts(10)))
    assert got[5] == (3.0, _us(_ts(30)))
    assert got[6] == (None, None)
    assert got[7] == (20.0, _us(_ts(50)))
    assert got[8] == (None, None)


def test_asof_tolerance(spark, quotes, trades):
    # 15-minute tolerance: matches older than 15 min are nulled out
    out = asof_join(trades, quotes, key="sym", left_ts="tts", right_ts="qts",
                    value_cols=["px"], tolerance_us=15 * 60 * 1_000_000)
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got[1] == 1.0          # gap 0
    assert got[4] is None         # gap 19 min > 15
    assert got[5] is None         # gap 70 min
    assert got[7] == 20.0         # gap 10 min
    assert got[6] is None and got[8] is None


def test_asof_left_columns_pass_through(spark, quotes, trades):
    out = asof_join(trades, quotes, key="sym", left_ts="tts", right_ts="qts",
                    value_cols=["px"])
    assert out.columns == ["sym", "tts", "trade_id", "px", "matched_ts_us"]
    assert out.count() == trades.count()


def test_asof_value_col_clash_raises(spark, quotes, trades):
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades.withColumn("px", F.lit(0.0)), quotes,
                  key="sym", left_ts="tts", right_ts="qts", value_cols=["px"])


def test_asof_plan_single_exchange_no_join(spark, quotes, trades):
    out = asof_join(trades, quotes, key="sym", left_ts="tts", right_ts="qts",
                    value_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window formulation: no join operator of any kind in the plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def _brute_interval(ivs, pts):
    out = set()
    for k_i, iv_id, s, e in ivs:
        for k_p, pt_id, t in pts:
            if k_i == k_p and s <= t < e:
                out.add((iv_id, pt_id))
    return out


@pytest.mark.parametrize("bucket_us", [60_000_000, 3_600_000_000, 7_200_000_000])
def test_interval_join_matches_brute_force(spark, bucket_us):
    # intervals of varying span, some crossing many buckets, some empty
    ivs = [
        ("A", 1, _ts(0), _ts(90)),      # long: crosses buckets
        ("A", 2, _ts(30), _ts(31)),     # short
        ("A", 3, _ts(50), _ts(50)),     # empty (half-open) → matches nothing
        ("B", 4, _ts(10), _ts(500)),    # very long
        ("C", 5, _ts(0), _ts(10)),      # key with no points
    ]
    pts = [
        ("A", 101, _ts(0)),     # boundary: start inclusive
        ("A", 102, _ts(90)),    # boundary: end exclusive → no match with iv 1
        ("A", 103, _ts(30)),
        ("A", 104, _ts(65)),
        ("B", 105, _ts(499)),
        ("B", 106, _ts(500)),   # end exclusive
        ("D", 107, _ts(5)),
    ]
    iv_df = spark.createDataFrame(
        [(k, i, s, e) for k, i, s, e in ivs],
        "k string, iv_id int, s timestamp_ntz, e timestamp_ntz",
    )
    pt_df = spark.createDataFrame(
        [(k, i, t) for k, i, t in pts],
        "k string, pt_id int, t timestamp_ntz",
    )
    out = interval_join(pt_df, iv_df, key="k", point_ts="t",
                        start_ts="s", end_ts="e", bucket_us=bucket_us)
    got = {(r["iv_id"], r["pt_id"]) for r in out.collect()}
    assert got == _brute_interval(ivs, pts)


def test_interval_join_no_duplicate_pairs(spark):
    # one interval spanning 100 buckets with one point inside: emitted once
    iv_df = spark.createDataFrame(
        [("A", 1, _ts(0), _ts(100))], "k string, iv_id int, s timestamp_ntz, e timestamp_ntz"
    )
    pt_df = spark.createDataFrame(
        [("A", 2, _ts(42))], "k string, pt_id int, t timestamp_ntz"
    )
    out = interval_join(pt_df, iv_df, key="k", point_ts="t", start_ts="s",
                        end_ts="e", bucket_us=60_000_000)
    assert out.count() == 1


def test_interval_join_plan_is_equi_join(spark):
    iv_df = spark.createDataFrame(
        [("A", 1, _ts(0), _ts(100))], "k string, iv_id int, s timestamp_ntz, e timestamp_ntz"
    )
    pt_df = spark.createDataFrame(
        [("A", 2, _ts(42))], "k string, pt_id int, t timestamp_ntz"
    )
    out = interval_join(pt_df, iv_df, key="k", point_ts="t", start_ts="s",
                        end_ts="e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the physical join must be hash/merge on (key, bucket) — never a
    # broadcast-nested-loop or cartesian theta join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_column_clash_raises(spark):
    iv_df = spark.createDataFrame(
        [("A", 1, _ts(0), _ts(1))], "k string, x int, s timestamp_ntz, e timestamp_ntz"
    )
    pt_df = spark.createDataFrame(
        [("A", 2, _ts(0))], "k string, x int, t timestamp_ntz"
    )
    with pytest.raises(ValueError, match="clash"):
        interval_join(pt_df, iv_df, key="k", point_ts="t", start_ts="s", end_ts="e")
