"""Progressive ER: deterministic benefit-ordered emission, exact
recall@budget curve, TakeOrdered plan shape (no global sort of the full
stream), and argument guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.progressive import progressive_pairs, recall_at_budget


def _pairs(spark):
    rows = [
        # (a, b, n_bands, dist)
        (1, 2, 4, 3),
        (3, 4, 4, 7),
        (5, 6, 2, 1),
        (7, 8, 2, 1),   # tie with (5,6) on both proxies -> id order
        (9, 10, 1, 50),
    ]
    return spark.createDataFrame(rows, "conv_id_a long, conv_id_b long, n_bands long, dist long")


def test_emission_order_and_budget_cut(spark):
    got = progressive_pairs(_pairs(spark), budget=4).orderBy("rank").collect()
    order = [(r.conv_id_a, r.conv_id_b, r.rank) for r in got]
    assert order == [(1, 2, 1), (3, 4, 2), (5, 6, 3), (7, 8, 4)]
    assert progressive_pairs(_pairs(spark), budget=0).count() == 0


def test_recall_curve_is_exact(spark):
    ranked = progressive_pairs(_pairs(spark), budget=5)
    labels = spark.createDataFrame(
        [(1, 2, True), (7, 8, True), (9, 10, True), (3, 4, False)],
        "conv_id_a long, conv_id_b long, is_match boolean",
    )
    curve = {
        r.budget: (r.n_covered, r.n_true_matches)
        for r in recall_at_budget(ranked, labels, [1, 3, 4, 5]).collect()
    }
    assert curve == {1: (1, 3), 3: (1, 3), 4: (2, 3), 5: (3, 3)}


def test_plan_is_take_ordered_not_global_sort(spark):
    big = spark.range(0, 5000).select(
        F.col("id").alias("conv_id_a"),
        (F.col("id") + 100000).alias("conv_id_b"),
        (F.col("id") % 16).alias("n_bands"),
        (F.col("id") % 64).alias("dist"),
    )
    out = progressive_pairs(big, budget=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert out.count() == 10


def test_custom_benefit_and_guards(spark):
    df = _pairs(spark).withColumnRenamed("n_bands", "score")
    got = progressive_pairs(df, 2, benefit_cols=["score"]).orderBy("rank").collect()
    assert [(r.conv_id_a, r.conv_id_b) for r in got] == [(1, 2), (3, 4)]
    with pytest.raises(ValueError):
        progressive_pairs(df.select("conv_id_a", "conv_id_b"), 2)
    with pytest.raises(ValueError):
        progressive_pairs(df, -1)
    with pytest.raises(ValueError):
        progressive_pairs(df, 2, benefit_cols=["score"], ascending=[True, False])
    with pytest.raises(ValueError):
        recall_at_budget(_pairs(spark), _pairs(spark), [])
