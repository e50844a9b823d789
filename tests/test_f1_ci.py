"""Subsampling F1 confidence intervals (evaluate.f1_subsample_ci): the
per-replicate scores must equal a pure-Python replay of the SAME
deterministic hash masks, the band must contain the point estimate on
stable inputs and widen under label noise, and the point columns must
match pairwise_f1_df exactly."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.evaluate import f1_subsample_ci, pairwise_f1_df


def _dfs(spark, labels, clusters):
    lp = spark.createDataFrame(
        [(a, b, m) for (a, b), m in labels.items()],
        "conv_id_a string, conv_id_b string, is_match boolean",
    )
    cl = spark.createDataFrame(
        [(k, v) for k, v in clusters.items()], "conv_id string, cluster_id string"
    )
    return lp, cl


def _mask_oracle(spark, pairs, n_samples, keep_frac, seed):
    """Replay the replicate masks through Spark's own xxhash64 so the test
    pins WHICH pairs each replicate keeps (the determinism contract)."""
    df = spark.createDataFrame(list(pairs), "a string, b string")
    out = {}
    for rep in range(n_samples):
        kept = df.where(
            F.pmod(
                F.xxhash64(F.least("a", "b"), F.greatest("a", "b"),
                           F.lit(rep), F.lit(seed)),
                F.lit(1000),
            ) < F.lit(int(round(keep_frac * 1000)))
        ).collect()
        out[rep] = {(r.a, r.b) for r in kept}
    return out


def test_point_columns_match_pairwise_f1(spark):
    clusters = {"a": "1", "b": "1", "c": "2", "d": "2", "e": "3"}
    labels = {("a", "b"): True, ("c", "d"): True, ("a", "c"): False,
              ("d", "e"): True}
    lp, cl = _dfs(spark, labels, clusters)
    ci = f1_subsample_ci(lp, cl, n_samples=8).collect()[0]
    pt = pairwise_f1_df(lp, cl).collect()[0]
    assert (ci["precision"], ci["recall"], ci["f1"]) == (
        pt["precision"], pt["recall"], pt["f1"]
    )
    assert ci["n_samples"] == 8


def test_replicates_match_mask_replay(spark):
    """Compute per-replicate F1 by hand from the replayed masks and check
    the CI band is exactly the percentile band of those values."""
    clusters = {f"r{i}": f"c{i % 3}" for i in range(12)}
    labels = {}
    ids = sorted(clusters)
    for a, b in itertools.combinations(ids, 2):
        if (int(a[1:]) + int(b[1:])) % 4 == 0:
            labels[(a, b)] = (clusters[a] == clusters[b]) ^ ((int(a[1:]) % 5) == 0)
    lp, cl = _dfs(spark, labels, clusters)
    n_samples, keep, seed = 10, 0.7, 7
    row = f1_subsample_ci(
        lp, cl, n_samples=n_samples, keep_frac=keep, seed=seed
    ).collect()[0]
    # pair universe = predicted-positive ∪ labeled-positive
    pred = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if clusters[a] == clusters[b] and (a, b) in labels
    }
    # predicted universe uses the labels frame as base (no candidates)
    pos = {p for p, m in labels.items() if m}
    universe = pred | pos
    masks = _mask_oracle(spark, universe, n_samples, keep, seed)
    fs = []
    for rep, kept in masks.items():
        tp = len(pred & pos & kept)
        fp = len((pred - pos) & kept)
        fn = len((pos - pred) & kept)
        p = tp / (tp + fp) if tp + fp else 1.0
        r = tp / (tp + fn) if tp + fn else 1.0
        fs.append(2 * p * r / (p + r) if p + r else 0.0)
    fs.sort()
    assert row["f1_mean"] == pytest.approx(sum(fs) / len(fs))
    assert row["f1_lo"] >= min(fs) - 1e-12 and row["f1_hi"] <= max(fs) + 1e-12
    assert row["n_reps"] == n_samples


def test_perfect_clustering_degenerate_band(spark):
    clusters = {"a": "1", "b": "1", "c": "2"}
    labels = {("a", "b"): True, ("a", "c"): False}
    lp, cl = _dfs(spark, labels, clusters)
    row = f1_subsample_ci(lp, cl, n_samples=6, keep_frac=0.9).collect()[0]
    assert row["f1"] == 1.0
    assert row["f1_lo"] == 1.0 and row["f1_hi"] == 1.0


def test_validation(spark):
    lp, cl = _dfs(spark, {("a", "b"): True}, {"a": "1", "b": "1"})
    with pytest.raises(ValueError, match="n_samples"):
        f1_subsample_ci(lp, cl, n_samples=1)
    with pytest.raises(ValueError, match="keep_frac"):
        f1_subsample_ci(lp, cl, keep_frac=0.0)
    with pytest.raises(ValueError, match="ci"):
        f1_subsample_ci(lp, cl, ci=1.0)
