"""Decontamination: planted-overlap detection, pure-Python parity,
short-doc cleanliness, broadcast-join plan, guards."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from hexspark.ops.decontam import eval_ngram_set, ngram_contamination

_DDL = "doc_id int, text string"

_EVAL = [
    (100, "What is the capital of France? The capital of France is Paris."),
    (101, "Name the largest planet. Jupiter is the largest planet of all."),
]

_TRAIN = [
    # contains the eval 8-gram "the capital of france the capital of france"?
    # Build a verbatim crib: copies an exact 9-word span from eval doc 100.
    (1, "trivia night notes: what is the capital of france the capital "
        "of france is paris obviously everyone knows that"),
    (2, "a completely original discussion of orbital mechanics and "
        "planetary formation with no benchmark text at all in it"),
    (3, "short doc"),
]


def _py_ngrams(text: str, n: int):
    ws = re.findall(r"[a-z0-9]+", text.lower())
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _py_report(train, eval_docs, n, min_hits=1):
    banned = set()
    for _, t in eval_docs:
        banned |= _py_ngrams(t, n)
    out = {}
    for i, t in train:
        grams = _py_ngrams(t, n)
        hits = len(grams & banned)
        frac = hits / len(grams) if grams else 0.0
        out[i] = (len(grams), hits, frac, hits >= min_hits)
    return out


def _spark_report(spark, train, eval_docs, n, **kw):
    df = ngram_contamination(
        spark.createDataFrame(train, _DDL), spark.createDataFrame(eval_docs, _DDL), n, **kw
    )
    return {
        r["doc_id"]: (r["n_ngrams"], r["n_contaminated"], r["contam_frac"], r["contaminated"])
        for r in df.collect()
    }


def test_planted_crib_detected_and_python_parity(spark):
    got = _spark_report(spark, _TRAIN, _EVAL, n=8)
    expected = _py_report(_TRAIN, _EVAL, n=8)
    assert {k: v[:2] for k, v in got.items()} == {k: v[:2] for k, v in expected.items()}
    for k in got:
        assert got[k][2] == pytest.approx(expected[k][2]) and got[k][3] == expected[k][3]
    assert got[1][3] is True and got[1][1] > 0
    assert got[2] == (pytest.approx(got[2][0]), 0, 0.0, False)
    # shorter than 8 words → zero grams, clean by definition, still present
    assert got[3] == (0, 0, 0.0, False)


def test_randomized_python_parity(spark):
    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(30)]
    eval_docs = [(200 + i, " ".join(rng.choice(vocab) for _ in range(20))) for i in range(4)]
    train = []
    for i in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 40))]
        if rng.random() < 0.4:
            # splice a verbatim 6-word crib from a random eval doc
            src = rng.choice(eval_docs)[1].split()
            k = rng.randrange(0, len(src) - 6)
            pos = rng.randrange(0, len(words) + 1)
            words[pos:pos] = src[k : k + 6]
        train.append((i, " ".join(words)))
    got = _spark_report(spark, train, eval_docs, n=6)
    assert got == {
        k: (v[0], v[1], pytest.approx(v[2]), v[3])
        for k, v in _py_report(train, eval_docs, n=6).items()
    }


def test_min_hits_gate(spark):
    got = _spark_report(spark, _TRAIN, _EVAL, n=8, min_hits=10)
    assert got[1][3] is False and got[1][1] > 0


def test_plan_broadcasts_eval_side(spark):
    df = ngram_contamination(
        spark.createDataFrame(_TRAIN, _DDL), spark.createDataFrame(_EVAL, _DDL), 8
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_guards(spark):
    t = spark.createDataFrame(_TRAIN, _DDL)
    e = spark.createDataFrame(_EVAL, _DDL)
    with pytest.raises(ValueError, match="n must be"):
        eval_ngram_set(e, 1)
    with pytest.raises(ValueError, match="min_hits"):
        ngram_contamination(t, e, 8, min_hits=0)
