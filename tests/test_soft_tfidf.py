"""SoftTFIDF (pipeline/tokensim.soft_tfidf): the codegen nested-HOF score
must equal a pure-Python replay with identical arithmetic (same fold
order over token-sorted arrays), reward rare-token agreement over
stopword agreement, bridge per-token typos, and hit exactly 1.0 on
identical token sets."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.tokensim import soft_tfidf, tfidf_weight_arrays


def _toks(text: str) -> list[str]:
    return sorted(
        {t for t in re.split(" +", re.sub("[^a-z0-9 ]", " ", text.lower()).strip()) if t}
    )


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _sim_milli(a: str, b: str) -> int:
    m = max(len(a), len(b))
    return 1000 - (1000 * _lev(a, b)) // m if m else 1000


def _weights(rows):
    docs = {rid: _toks(text) for rid, text in rows}
    n = len(rows)
    df: dict[str, int] = {}
    for ts in docs.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    out = {}
    for rid, ts in docs.items():
        vs = [math.log(n / df[t]) for t in ts]
        norm = math.sqrt(math.fsum(v * v for v in vs))
        # mirror Spark's plain left-fold sum for the norm: use plain sum
        norm = math.sqrt(sum(v * v for v in vs))
        out[rid] = [(t, (v / norm if norm > 0 else 0.0)) for t, v in zip(ts, vs)]
    return out


def _soft_dir(A, B, theta):
    if not A or not B:
        return 0.0
    acc = 0.0
    for t, w in A:
        best = max(((_sim_milli(t, u), wu) for u, wu in B))
        if best[0] >= theta:
            acc = acc + w * best[1] * (best[0] / 1000.0)
    return acc


def _run(spark, rows, pairs, theta=900):
    docs = spark.createDataFrame(rows, "rec_id string, name string")
    p = spark.createDataFrame(pairs, "id_a string, id_b string")
    out = soft_tfidf(p, docs, "id_a", "id_b", "rec_id", F.col("name"), theta)
    return {(r.id_a, r.id_b): (r.st_ab, r.st_ba) for r in out.collect()}


ROWS = [
    ("r1", "acme corporation limited"),
    ("r2", "acme corporaton limited"),   # typo'd token
    ("r3", "zenith corporation limited"),
    ("r4", "unrelated words entirely"),
    ("r5", "acme zenith"),
]


def test_identical_sets_score_one(spark):
    rows = ROWS + [("r6", "limited corporation acme")]  # same set as r1
    got = _run(spark, rows, [("r1", "r6")])
    ab, ba = got[("r1", "r6")]
    assert ab == pytest.approx(1.0, abs=1e-9)
    assert ba == pytest.approx(1.0, abs=1e-9)


def test_matches_pure_python_replay(spark):
    pairs = [("r1", "r2"), ("r1", "r3"), ("r1", "r4"), ("r2", "r3"), ("r1", "r5")]
    got = _run(spark, ROWS, pairs)
    W = _weights(ROWS)
    for (a, b), (ab, ba) in got.items():
        assert ab == pytest.approx(_soft_dir(W[a], W[b], 900), abs=1e-9), (a, b)
        assert ba == pytest.approx(_soft_dir(W[b], W[a], 900), abs=1e-9), (a, b)


def test_typo_bridged_and_rare_tokens_dominate(spark):
    got = _run(spark, ROWS, [("r1", "r2"), ("r1", "r3")])
    # r1-r2 differ only by a one-char typo inside 'corporation': SoftTFIDF
    # bridges it and scores near 1; a pure token measure would drop the
    # whole token
    assert got[("r1", "r2")][0] > 0.9
    # r1-r3 agree on the two COMMON tokens but differ on the rare
    # discriminating one -> visibly lower
    assert got[("r1", "r3")][0] < got[("r1", "r2")][0] - 0.2


def test_disjoint_and_empty(spark):
    rows = ROWS + [("r7", "???")]  # tokenless record
    got = _run(spark, rows, [("r1", "r4"), ("r1", "r7")])
    assert got[("r1", "r4")] == (0.0, 0.0)
    assert got[("r1", "r7")] == (0.0, 0.0)


@pytest.mark.parametrize("seed,theta", [(2, 900), (9, 750)])
def test_randomized_vs_replay(spark, seed, theta):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(20)] + ["común", "the", "of"]
    rows = [
        (
            f"d{i:02d}",
            " ".join(rng.choice(vocab, size=rng.integers(2, 7), replace=False)),
        )
        for i in range(25)
    ]
    ids = [r for r, _ in rows]
    pairs = [(ids[i], ids[j]) for i in range(0, 24, 3) for j in (i + 1, i + 2)]
    got = _run(spark, rows, pairs, theta)
    W = _weights(rows)
    for (a, b), (ab, ba) in got.items():
        assert ab == pytest.approx(_soft_dir(W[a], W[b], theta), abs=1e-9)
        assert ba == pytest.approx(_soft_dir(W[b], W[a], theta), abs=1e-9)


def test_no_python_in_scoring_plan(spark):
    """The pair-scoring expression itself is pure codegen: no Python eval
    operators anywhere in the plan (the weight arrays are aggregates +
    joins, also JVM-side)."""
    docs = spark.createDataFrame(ROWS, "rec_id string, name string")
    p = spark.createDataFrame([("r1", "r2")], "id_a string, id_b string")
    out = soft_tfidf(p, docs, "id_a", "id_b", "rec_id", F.col("name"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
