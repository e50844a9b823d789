"""Exact set-similarity self-join via prefix filtering (ops/setjoin).

The claim under test is EXACTNESS: prefix filtering is a lossless candidate
pruner for token-Jaccard, so the output must equal a brute-force all-pairs
Jaccard over the same rows — at every threshold, including ties exactly at
the threshold and singleton-token records.
"""

from __future__ import annotations

import itertools
import math
import random
import re

import pytest
from pyspark.sql import functions as F

from hexspark.ops.setjoin import prefix_jaccard_join

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _tokset(text: str) -> frozenset[str]:
    return frozenset(t for t in _TOKEN_RE.split(text.lower()) if t)


def _brute_pairs(rows: dict[int, str], threshold: float):
    out = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        sa, sb = _tokset(rows[a]), _tokset(rows[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out[(a, b)] = (inter, len(sa), len(sb), jac)
    return out


_DOCS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "the quick brown fox jumps over the lazy cat",
    2: "the quick brown fox leaps over the lazy dog",
    3: "entirely different words appear in this one",
    4: "entirely different words appear in this text",
    5: "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    6: "singletoken",
    7: "singletoken",
    8: "stopword stopword stopword the the the",  # dup tokens collapse
    9: "",
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in _DOCS.items()], "doc_id long, text string"
    ).repartition(4)


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_prefix_jaccard_matches_brute_force(spark, docs_df, threshold):
    got = {
        (r["doc_id_a"], r["doc_id_b"]): (
            r["inter"], r["size_a"], r["size_b"], r["jaccard"],
        )
        for r in prefix_jaccard_join(
            docs_df, "doc_id", F.col("text"), threshold
        ).collect()
    }
    want = _brute_pairs(_DOCS, threshold)
    assert set(got) == set(want)
    for k, (i, sa, sb, j) in want.items():
        gi, gsa, gsb, gj = got[k]
        assert (gi, gsa, gsb) == (i, sa, sb), k
        assert gj == pytest.approx(j), k


def test_prefix_jaccard_randomized_exactness(spark):
    """Random token sets at a threshold with many exact-boundary ties."""
    rng = random.Random(0x5E7)
    vocab = [f"tok{i}" for i in range(30)]
    rows = {
        i: " ".join(rng.sample(vocab, rng.randint(1, 12))) for i in range(60)
    }
    df = spark.createDataFrame(
        list(rows.items()), "doc_id long, text string"
    ).repartition(8)
    for threshold in (0.4, 2 / 3):
        got = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in prefix_jaccard_join(df, "doc_id", F.col("text"), threshold).collect()
        }
        assert got == set(_brute_pairs(rows, threshold))


def test_prefix_actually_prunes(spark, docs_df):
    """The candidate join really is on prefix tokens only: at t=0.8 a pair
    sharing only FREQUENT tokens (every record has 'the') must never reach
    the verify stage as a candidate of doc 3/4 — checked indirectly by the
    exactness tests, and directly here by counting prefix rows (<= full
    token rows)."""
    from hexspark.ops.setjoin import tokens

    toks = tokens(docs_df, "doc_id", F.col("text"))
    n_tokens = toks.count()
    # rebuild the prefix set the operator uses at t=0.8
    out = prefix_jaccard_join(docs_df, "doc_id", F.col("text"), 0.8)
    out.collect()
    # prefix length for a 9-token set at t=0.8: 9 - ceil(7.2) + 1 = 2
    sizes = (
        toks.groupBy("doc_id").count().select(F.sum(
            F.col("count") - F.ceil(0.8 * F.col("count")) + 1
        )).collect()[0][0]
    )
    assert sizes < n_tokens  # the join input is strictly smaller


def test_threshold_validation(spark, docs_df):
    with pytest.raises(ValueError):
        prefix_jaccard_join(docs_df, "doc_id", F.col("text"), 0.0)
    with pytest.raises(ValueError):
        prefix_jaccard_join(docs_df, "doc_id", F.col("text"), 1.5)


def test_no_cartesian_in_plan(spark, docs_df):
    plan = (
        prefix_jaccard_join(docs_df, "doc_id", F.col("text"), 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Measure family (prefix_sim_join): cosine / dice / overlap
# ---------------------------------------------------------------------------


def _brute_sim(rows: dict[int, str], threshold: float, measure: str):
    out = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        sa, sb = _tokset(rows[a]), _tokset(rows[b])
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if measure == "jaccard":
            sim = inter / (len(sa) + len(sb) - inter)
        elif measure == "cosine":
            sim = inter / math.sqrt(len(sa) * len(sb))
        elif measure == "dice":
            sim = 2 * inter / (len(sa) + len(sb))
        else:
            sim = float(inter)
        if sim >= threshold:
            out[(a, b)] = (inter, len(sa), len(sb), sim)
    return out


@pytest.mark.parametrize(
    "measure,thresholds",
    [
        ("cosine", (0.3, 0.5, 0.8, 1.0)),
        ("dice", (0.3, 0.5, 0.8, 1.0)),
        ("overlap", (1, 2, 4)),
    ],
)
def test_prefix_sim_matches_brute_force(spark, docs_df, measure, thresholds):
    from hexspark.ops.setjoin import prefix_sim_join

    for threshold in thresholds:
        got = {
            (r["doc_id_a"], r["doc_id_b"]): (
                r["inter"], r["size_a"], r["size_b"], r[measure],
            )
            for r in prefix_sim_join(
                docs_df, "doc_id", F.col("text"), threshold, measure
            ).collect()
        }
        want = _brute_sim(_DOCS, threshold, measure)
        assert set(got) == set(want), (measure, threshold)
        for k, (i, sa, sb, s) in want.items():
            gi, gsa, gsb, gs = got[k]
            assert (gi, gsa, gsb) == (i, sa, sb), (measure, threshold, k)
            assert gs == pytest.approx(s), (measure, threshold, k)


def test_prefix_sim_randomized_exactness_all_measures(spark):
    """Random token sets, exact-boundary ties likely; every measure's
    output must equal the brute force at every threshold (the prefix bound
    is measure-specific — a too-short prefix silently drops pairs, which
    is exactly what this sweeps for)."""
    from hexspark.ops.setjoin import prefix_sim_join

    rng = random.Random(0xC05)
    vocab = [f"tok{i}" for i in range(30)]
    rows = {
        i: " ".join(rng.sample(vocab, rng.randint(1, 12))) for i in range(60)
    }
    df = spark.createDataFrame(
        list(rows.items()), "doc_id long, text string"
    ).repartition(8)
    cases = [
        ("cosine", 0.4), ("cosine", 2 / 3), ("dice", 0.5), ("dice", 0.75),
        ("overlap", 2), ("overlap", 3),
    ]
    for measure, threshold in cases:
        got = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in prefix_sim_join(
                df, "doc_id", F.col("text"), threshold, measure
            ).collect()
        }
        assert got == set(_brute_sim(rows, threshold, measure)), (measure, threshold)


def test_cosine_is_length_forgiving_vs_jaccard(spark):
    """The reason cosine is in the family: a 3-token record fully contained
    in a 12-token record scores 3/12=0.25 Jaccard but 3/6=0.5 cosine —
    asymmetric-length near-dups survive a 0.5 cosine gate that a 0.5
    Jaccard gate drops."""
    from hexspark.ops.setjoin import prefix_sim_join

    rows = {0: "alpha beta gamma", 1: " ".join(["alpha", "beta", "gamma"] + [f"pad{i}" for i in range(9)])}
    df = spark.createDataFrame(list(rows.items()), "doc_id long, text string")
    cos = prefix_sim_join(df, "doc_id", F.col("text"), 0.5, "cosine").collect()
    jac = prefix_sim_join(df, "doc_id", F.col("text"), 0.5, "jaccard").collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in cos] == [(0, 1)]
    assert jac == []


def test_prefix_sim_validation(spark, docs_df):
    from hexspark.ops.setjoin import prefix_sim_join

    with pytest.raises(ValueError, match="measure"):
        prefix_sim_join(docs_df, "doc_id", F.col("text"), 0.5, "euclid")
    with pytest.raises(ValueError, match="count"):
        prefix_sim_join(docs_df, "doc_id", F.col("text"), 0.5, "overlap")
    with pytest.raises(ValueError, match="count"):
        prefix_sim_join(docs_df, "doc_id", F.col("text"), 0, "overlap")
    with pytest.raises(ValueError, match="threshold"):
        prefix_sim_join(docs_df, "doc_id", F.col("text"), 1.5, "cosine")
