"""Sorted-neighborhood blocking (pipeline/snm): scalable global rank and
sliding-window pair generation.

global_rank must equal the single-partition row_number it replaces, for any
input partitioning; sorted_neighborhood_pairs must emit exactly the pairs a
brute-force sliding window over the sorted order produces, each once.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.snm import global_rank, sorted_neighborhood_pairs


def _brute_snm(keys: dict[str, str], window: int) -> set[tuple[str, str]]:
    order = sorted(keys, key=lambda i: (keys[i], i))
    out = set()
    for i, j in itertools.combinations(range(len(order)), 2):
        if 0 < j - i < window:
            out.add((order[i], order[j]))
    return out


@pytest.fixture(scope="module")
def keyed(spark):
    rng = random.Random(0x5A11)
    rows = {f"id{i:03d}": "".join(rng.choices("abcdef", k=6)) for i in range(97)}
    df = spark.createDataFrame(
        list(rows.items()), "conv_id string, sort_key string"
    ).repartition(8)
    return rows, df


def test_global_rank_is_dense_and_ordered(spark, keyed):
    rows, df = keyed
    ranked = global_rank(df, [F.asc("sort_key"), F.asc("conv_id")]).collect()
    got = {r["conv_id"]: r["rank"] for r in ranked}
    order = sorted(rows, key=lambda i: (rows[i], i))
    assert got == {cid: pos for pos, cid in enumerate(order)}


def test_global_rank_partition_invariant(spark, keyed):
    rows, df = keyed
    a = {
        r["conv_id"]: r["rank"]
        for r in global_rank(df, [F.asc("sort_key"), F.asc("conv_id")],
                             num_partitions=3).collect()
    }
    b = {
        r["conv_id"]: r["rank"]
        for r in global_rank(df.repartition(13),
                             [F.asc("sort_key"), F.asc("conv_id")],
                             num_partitions=11).collect()
    }
    assert a == b


def test_global_rank_no_single_partition_window(spark, keyed):
    """The reason this module exists: the plan must not contain a windowing
    exchange into ONE partition (SinglePartition) over the data."""
    _, df = keyed
    plan = (
        global_rank(df, [F.asc("sort_key"), F.asc("conv_id")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only SinglePartition allowed is over the per-partition COUNT table
    data_side = plan.split("BroadcastExchange")[0]
    assert "SinglePartition" not in data_side


@pytest.mark.parametrize("window", [2, 3, 5, 10])
def test_snm_pairs_match_brute_force(spark, keyed, window):
    rows, df = keyed
    got = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in sorted_neighborhood_pairs(
            df, "conv_id", F.col("sort_key"), window
        ).collect()
    }
    assert got == _brute_snm(rows, window)


def test_snm_pairs_exactly_once(spark, keyed):
    rows, df = keyed
    out = sorted_neighborhood_pairs(df, "conv_id", F.col("sort_key"), 6)
    assert out.count() == out.distinct().count()


def test_snm_rank_gap_column(spark):
    df = spark.createDataFrame(
        [("a", "k1"), ("b", "k2"), ("c", "k3"), ("d", "k4")],
        "conv_id string, k string",
    )
    got = {
        (r["conv_id_a"], r["conv_id_b"]): r["rank_gap"]
        for r in sorted_neighborhood_pairs(df, "conv_id", F.col("k"), 3).collect()
    }
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 2, ("b", "d"): 2,
    }


def test_snm_window_validation(spark, keyed):
    _, df = keyed
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "conv_id", F.col("sort_key"), 1)
