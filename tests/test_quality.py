"""Repetition quality filters: identical-arithmetic pure-Python parity
(randomized), hand-audited fixtures, degenerate docs, threshold gating."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from hexspark.ops.quality import (
    DEFAULT_THRESHOLDS,
    repetition_filter,
    repetition_stats,
)

_DDL = "doc_id int, text string"


def _py_stats(text: str):
    """Identical-arithmetic replica of repetition_stats for one doc."""
    lines = text.split("\n")
    lc = Counter(lines)
    n_lines = len(lines)
    dup_lines = sum(c for c in lc.values() if c > 1)
    line_chars = sum(c * len(l) for l, c in lc.items())
    dup_line_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
    words = re.findall(r"[a-z0-9]+", text.lower())
    n_word_chars = sum(len(w) for w in words)
    bi = Counter(" ".join(words[i : i + 2]) for i in range(len(words) - 1))
    tri = Counter(" ".join(words[i : i + 3]) for i in range(len(words) - 2))
    top_bigram = max((c * (len(g) - 1) for g, c in bi.items()), default=0)
    dup_tri = sum(c * (len(g) - 2) for g, c in tri.items() if c > 1)

    frac = lambda n, d: n / d if d > 0 else 0.0
    return (
        n_lines,
        n_word_chars,
        frac(dup_lines, n_lines),
        frac(dup_line_chars, line_chars),
        frac(top_bigram, n_word_chars),
        frac(dup_tri, n_word_chars),
    )


def _spark_stats(spark, docs):
    out = repetition_stats(spark.createDataFrame(docs, _DDL))
    return {
        r["doc_id"]: (
            r["n_lines"],
            r["n_word_chars"],
            r["dup_line_frac"],
            r["dup_line_char_frac"],
            r["top_bigram_char_frac"],
            r["dup_trigram_char_frac"],
        )
        for r in out.collect()
    }


def test_hand_audited_fixture(spark):
    # 4 lines, "spam spam" twice; bigram "spam spam" occurs 4x in the words
    text = "spam spam\nspam spam\nham eggs\nham"
    got = _spark_stats(spark, [(1, text)])[1]
    # lines: "spam spam" x2 (len 9), "ham eggs" (8), "ham" (3)
    assert got[0] == 4
    assert got[1] == 4 * 4 + 3 + 4 + 3  # spam*4, ham, eggs, ham
    assert got[2] == pytest.approx(2 / 4)
    assert got[3] == pytest.approx(18 / (18 + 8 + 3))
    # words: spam spam spam spam ham eggs ham → bigram "spam spam" c=3, len 8
    assert got[4] == pytest.approx(3 * 8 / 26)
    # trigram "spam spam spam" c=2 len 12
    assert got[5] == pytest.approx(2 * 12 / 26)
    assert got == pytest.approx(_py_stats(text))


def test_degenerate_docs(spark):
    got = _spark_stats(spark, [(1, ""), (2, "word"), (3, "a b")])
    for d in (1, 2, 3):
        assert got[d] == pytest.approx(_py_stats([(1, ""), (2, "word"), (3, "a b")][d - 1][1]))
    assert got[1][2:] == (0.0, 0.0, 0.0, 0.0)
    # two words, one bigram occurring once: top covers the whole doc
    assert got[3][4] == pytest.approx(1.0)
    assert got[3][5] == 0.0


def test_randomized_python_parity(spark):
    rng = random.Random(1234)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "looploop"]
    docs = []
    for i in range(25):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            words = [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
            lines.append(" ".join(words))
        if rng.random() < 0.5 and lines:
            lines.append(lines[0])  # planted duplicate line
        docs.append((i, "\n".join(lines)))
    got = _spark_stats(spark, docs)
    for i, text in docs:
        assert got[i] == pytest.approx(_py_stats(text)), (i, text)


def test_repetition_filter_gates_and_guards(spark):
    docs = [
        # long enough that no single bigram covers 20% of the word chars
        # (Gopher's thresholds assume web-document lengths; a very short
        # doc trivially fails the top-bigram bound and should be handled
        # by a separate min-length gate, as in MassiveText)
        (1, "clean prose with varied words here\nanother fine line follows "
            "and keeps introducing fresh vocabulary so no single phrase "
            "dominates the character mass of this document at all"),
        (2, "spam spam spam spam spam spam spam spam"),
    ]
    out = {r["doc_id"]: r["keep"] for r in repetition_filter(spark.createDataFrame(docs, _DDL)).collect()}
    assert out == {1: True, 2: False}
    with pytest.raises(ValueError, match="unknown threshold"):
        repetition_filter(spark.createDataFrame(docs, _DDL), thresholds={"nope": 0.5})
    # tightening a threshold flips a doc
    strict = repetition_filter(
        spark.createDataFrame(docs, _DDL), thresholds={"top_bigram_char_frac": 0.0}
    )
    assert {r["doc_id"]: r["keep"] for r in strict.collect()} == {1: False, 2: False}
    assert set(DEFAULT_THRESHOLDS) == {
        "dup_line_frac", "dup_line_char_frac", "top_bigram_char_frac", "dup_trigram_char_frac",
    }


def test_plan_no_python_and_doc_keyed_exchanges_only(spark):
    docs = spark.createDataFrame([(1, "a b c\nd e f")], _DDL)
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
