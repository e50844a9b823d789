"""Deterministic sampling operators: content-stability, distribution
sanity, incremental-append stability, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.ops.sampling import sample_fraction, split_assign, stratified_sample_n


@pytest.fixture(scope="module")
def people(spark):
    rows = [(i, f"user_{i}", i % 7) for i in range(5000)]
    return spark.createDataFrame(rows, "id long, name string, grp int")


def test_sample_fraction_is_deterministic(spark, people):
    a = {r["id"] for r in sample_fraction(people, "id", 0.3).collect()}
    b = {r["id"] for r in sample_fraction(people, "id", 0.3).collect()}
    c = {
        r["id"]
        for r in sample_fraction(people.repartition(17), "id", 0.3).collect()
    }
    assert a == b == c  # rerun- and partitioning-independent


def test_sample_fraction_rate_close(spark, people):
    n = sample_fraction(people, "id", 0.3).count()
    assert 0.25 * 5000 < n < 0.35 * 5000


def test_sample_fraction_monotone_in_rate(spark, people):
    """A row kept at rate p is kept at every rate q > p (nested samples)."""
    s20 = {r["id"] for r in sample_fraction(people, "id", 0.2).collect()}
    s50 = {r["id"] for r in sample_fraction(people, "id", 0.5).collect()}
    assert s20 <= s50


def test_sample_fraction_salt_gives_different_sample(spark, people):
    a = {r["id"] for r in sample_fraction(people, "id", 0.3, salt="x").collect()}
    b = {r["id"] for r in sample_fraction(people, "id", 0.3, salt="y").collect()}
    assert a != b
    # independent draws: overlap near 9% of the table, not 0 or 30%
    assert 0.02 * 5000 < len(a & b) < 0.2 * 5000


def test_sample_fraction_edges(spark, people):
    assert sample_fraction(people, "id", 0.0).count() == 0
    assert sample_fraction(people, "id", 1.0).count() == 5000
    with pytest.raises(ValueError):
        sample_fraction(people, "id", 1.5)


def test_sample_fraction_append_stable(spark, people):
    """Decisions made on the first half don't change when more data arrives."""
    first = people.where(F.col("id") < 2500)
    sel_first = {r["id"] for r in sample_fraction(first, "id", 0.4).collect()}
    sel_all = {r["id"] for r in sample_fraction(people, "id", 0.4).collect()}
    assert sel_first == {i for i in sel_all if i < 2500}


def test_split_assign_exhaustive_disjoint(spark, people):
    out = split_assign(people, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000  # every row exactly one split
    assert 0.75 * 5000 < counts["train"] < 0.85 * 5000
    assert 0.06 * 5000 < counts["val"] < 0.14 * 5000
    assert 0.06 * 5000 < counts["test"] < 0.14 * 5000


def test_split_assign_validates(spark, people):
    with pytest.raises(ValueError):
        split_assign(people, "id", {})
    with pytest.raises(ValueError):
        split_assign(people, "id", {"a": -1.0, "b": 2.0})
    with pytest.raises(ValueError):
        split_assign(people, "id", {"a": 0.0})


def test_split_assign_consistent_with_sample_fraction(spark, people):
    """Same salt ⇒ the 'first' split IS the fraction sample (shared hash)."""
    s = {r["id"] for r in sample_fraction(people, "id", 0.8, salt="z").collect()}
    tr = {
        r["id"]
        for r in split_assign(people, "id", {"train": 0.8, "rest": 0.2}, salt="z")
        .where(F.col("split") == "train")
        .collect()
    }
    assert s == tr


def test_stratified_sample_exact_n(spark, people):
    out = stratified_sample_n(people, strata="grp", key="id", n_per_stratum=25)
    counts = [r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()]
    assert counts == [25] * 7
    # deterministic under reruns and repartitioning
    a = {r["id"] for r in out.collect()}
    b = {
        r["id"]
        for r in stratified_sample_n(
            people.repartition(13), strata="grp", key="id", n_per_stratum=25
        ).collect()
    }
    assert a == b


def test_stratified_sample_small_groups_kept_whole(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(5)], "id long, grp int")
    out = stratified_sample_n(df, strata="grp", key="id", n_per_stratum=10)
    assert out.count() == 5


def test_stratified_sample_reservoir_property(spark, people):
    """Appending rows only displaces the current max-hash members — the
    surviving sample of the old rows is a prefix of the old sample in hash
    order (reservoir semantics without RNG state)."""
    old = people.where(F.col("id") < 4000)
    s_old = {r["id"] for r in stratified_sample_n(old, "grp", "id", 25).collect()}
    s_all = {r["id"] for r in stratified_sample_n(people, "grp", "id", 25).collect()}
    # every old row still sampled after the append was sampled before
    assert {i for i in s_all if i < 4000} <= s_old


def test_sample_fraction_plan_is_scan_plus_filter(spark, people):
    out = sample_fraction(people, "id", 0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure codegen filter, no shuffle
