"""Span-level exact-substring dedup: planted shared passage localized
exactly, pure-Python replay parity (randomized), self-match mode,
span-merge disjointness, short docs, stats rollup, guards."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from hexspark.ops.spandedup import duplicated_spans, span_dedup_stats

_DDL = "doc_id int, text string"


def _toks(t):
    return re.findall(r"[a-z0-9]+", t.lower())


def _py_spans(docs, min_len, dup_count=2, self_match=False):
    wins: list[tuple[int, int, str]] = []
    for i, t in docs:
        ws = _toks(t)
        for p in range(len(ws) - min_len + 1):
            wins.append((i, p, " ".join(ws[p : p + min_len])))
    if self_match:
        occ = Counter(wtext for _, _, wtext in wins)
    else:
        occ = Counter()
        for wtext in {(i, wt) for i, _, wt in wins}:
            occ[wtext[1]] += 1
    dup = sorted((i, p) for i, p, wt in wins if occ[wt] >= dup_count)
    out = []
    for i in {d for d, _ in dup}:
        ps = [p for d, p in dup if d == i]
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > min_len:
                out.append((i, start, prev + min_len, prev + min_len - start))
                start = p
            prev = p
        out.append((i, start, prev + min_len, prev + min_len - start))
    return sorted(out)


def _spark_spans(spark, docs, **kw):
    df = duplicated_spans(spark.createDataFrame(docs, _DDL), **kw)
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in df.collect()
    )


_PASSAGE = "the quick brown fox jumps over the lazy dog near the river bank today"


def test_planted_shared_passage_localized(spark):
    # the 14-token passage is embedded at different offsets in two
    # otherwise-unrelated documents; with min_len=8 the detected span
    # must cover exactly the passage in each
    pre1, pre2 = "alpha beta gamma", "one two three four five six"
    docs = [
        (1, pre1 + " " + _PASSAGE + " epsilon zeta"),
        (2, pre2 + " " + _PASSAGE + " seven eight"),
        (3, "a completely unrelated essay about tide pools and weather"),
    ]
    got = _spark_spans(spark, docs, min_len=8)
    assert got == _py_spans(docs, 8)
    spans = {d: (s, e) for d, s, e, _ in got}
    n1, n2, np_ = len(_toks(pre1)), len(_toks(pre2)), len(_toks(_PASSAGE))
    assert spans[1] == (n1, n1 + np_)
    assert spans[2] == (n2, n2 + np_)
    assert 3 not in spans


def test_randomized_python_parity_and_disjointness(spark):
    rng = random.Random(123)
    vocab = [f"w{i}" for i in range(40)]
    passage = [rng.choice(vocab) for _ in range(12)]
    docs = []
    for i in range(14):
        ws = [rng.choice(vocab) for _ in range(rng.randint(5, 50))]
        if rng.random() < 0.5:
            pos = rng.randrange(0, len(ws) + 1)
            ws[pos:pos] = passage
        docs.append((i, " ".join(ws)))
    got = _spark_spans(spark, docs, min_len=6)
    assert got == _py_spans(docs, 6)
    # spans are disjoint per document
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for d, s, e, _ in got:
        per_doc.setdefault(d, []).append((s, e))
    for spans in per_doc.values():
        spans.sort()
        assert all(b[0] >= a[1] for a, b in zip(spans, spans[1:]))


def test_self_match_catches_intra_doc_repeat(spark):
    body = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = [(1, body + " filler middle tokens here " + body)]
    assert _spark_spans(spark, docs, min_len=8) == []  # cross-doc only: nothing
    got = _spark_spans(spark, docs, min_len=8, self_match=True)
    assert got == _py_spans(docs, 8, self_match=True)
    assert len(got) == 2  # both copies localized


def test_stats_rollup_and_short_docs(spark):
    docs = [
        (1, _PASSAGE),
        (2, _PASSAGE),
        (3, "tiny doc"),
    ]
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"], r["dup_frac"])
        for r in span_dedup_stats(spark.createDataFrame(docs, _DDL), min_len=8).collect()
    }
    np_ = len(_toks(_PASSAGE))
    assert out[1] == (np_, 1, np_, pytest.approx(1.0))
    assert out[2] == (np_, 1, np_, pytest.approx(1.0))
    assert out[3] == (2, 0, 0, 0.0)  # shorter than min_len → clean, still present


def test_guards(spark):
    df = spark.createDataFrame([(1, "a b c")], _DDL)
    with pytest.raises(ValueError, match="min_len"):
        duplicated_spans(df, min_len=1)
    with pytest.raises(ValueError, match="dup_count"):
        duplicated_spans(df, dup_count=1)
