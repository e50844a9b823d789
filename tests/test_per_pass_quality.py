"""Per-pass blocking quality: exact counts on a hand fixture, union-row
consistency with the single-scheme metric, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import blocking, evaluate

# True matches: (1,2), (3,4), (5,6).  Pass A finds (1,2),(3,4) plus junk
# (1,3); pass B finds (3,4),(5,6) plus junk (2,4),(1,3) — (3,4) and the
# junk (1,3) are shared, so the union must count them once.
PASS_A = [("1", "2"), ("3", "4"), ("1", "3")]
PASS_B = [("3", "4"), ("5", "6"), ("2", "4"), ("1", "3")]
LABELS = [("1", "2", True), ("3", "4", True), ("5", "6", True), ("1", "3", False)]


@pytest.fixture(scope="module")
def quality(spark):
    pa = spark.createDataFrame(PASS_A, "conv_id_a string, conv_id_b string")
    pb = spark.createDataFrame(PASS_B, "conv_id_a string, conv_id_b string")
    labels = spark.createDataFrame(
        LABELS, "conv_id_a string, conv_id_b string, is_match boolean"
    )
    union = blocking.union_candidates({"a": pa, "b": pb})
    return {
        r["pass"]: (r["n_candidates"], r["n_covered"], r["n_true_matches"])
        for r in evaluate.per_pass_blocking_quality(labels, union).collect()
    }


def test_exact_per_pass_counts(quality):
    assert quality["a"] == (3, 2, 3)
    assert quality["b"] == (4, 2, 3)


def test_union_row_counts_shared_pairs_once(quality):
    # union pairs: (1,2),(3,4),(1,3),(5,6),(2,4) = 5; covered = all 3
    assert quality["__union__"] == (5, 3, 3)


def test_union_row_matches_single_scheme_metric(spark):
    pa = spark.createDataFrame(PASS_A, "conv_id_a string, conv_id_b string")
    pb = spark.createDataFrame(PASS_B, "conv_id_a string, conv_id_b string")
    labels = spark.createDataFrame(
        LABELS, "conv_id_a string, conv_id_b string, is_match boolean"
    )
    union = blocking.union_candidates({"a": pa, "b": pb})
    n = spark.createDataFrame([(6,)], "n long")
    single = evaluate.blocking_quality_df(
        labels, union.select("conv_id_a", "conv_id_b"), n
    ).collect()[0]
    per = {
        r["pass"]: r
        for r in evaluate.per_pass_blocking_quality(labels, union).collect()
    }["__union__"]
    assert (per["n_candidates"], per["n_covered"]) == (
        single["n_candidates"],
        single["n_covered"],
    )


def test_plan_no_python_no_cartesian_blowup(spark):
    pa = spark.createDataFrame(PASS_A, "conv_id_a string, conv_id_b string")
    labels = spark.createDataFrame(
        LABELS, "conv_id_a string, conv_id_b string, is_match boolean"
    )
    union = blocking.union_candidates({"a": pa})
    out = evaluate.per_pass_blocking_quality(labels, union)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only cross join is the one-row positives total
    assert plan.count("CartesianProduct") <= 1
