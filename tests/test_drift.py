"""Corpus drift: identical-arithmetic pure-Python JS parity (randomized),
bounds and identity, churn fractions, top-k report determinism + plan."""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import pytest

from hexspark.ops.drift import drift_report, js_divergence

_DDL = "doc_id int, text string"


def _py_js(texts_a, texts_b):
    ca = Counter(w for t in texts_a for w in re.findall(r"[a-z0-9]+", t.lower()))
    cb = Counter(w for t in texts_b for w in re.findall(r"[a-z0-9]+", t.lower()))
    na, nb = sum(ca.values()), sum(cb.values())
    js = 0.0
    for w in set(ca) | set(cb):
        p, q = ca[w] / na, cb[w] / nb
        m = (p + q) / 2
        if p > 0:
            js += p * math.log2(p / m) / 2
        if q > 0:
            js += q * math.log2(q / m) / 2
    ao = sum(1 for w in ca if w not in cb)
    bo = sum(1 for w in cb if w not in ca)
    return js, len(ca), len(cb), ao / len(ca), bo / len(cb)


def test_identity_and_disjoint_bounds(spark):
    a = spark.createDataFrame([(1, "alpha beta gamma alpha")], _DDL)
    same = js_divergence(a, a)
    assert same["js_bits"] == pytest.approx(0.0, abs=1e-12)
    assert same["a_only_frac"] == 0.0 and same["b_only_frac"] == 0.0
    b = spark.createDataFrame([(2, "delta epsilon zeta")], _DDL)
    disj = js_divergence(a, b)
    assert disj["js_bits"] == pytest.approx(1.0, rel=1e-12)  # disjoint supports → 1 bit
    assert disj["a_only_frac"] == 1.0 and disj["b_only_frac"] == 1.0


def test_python_parity_randomized(spark):
    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(25)]
    shifted = vocab[:10] + [f"new{i}" for i in range(5)]
    ta = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))) for _ in range(12)]
    tb = [" ".join(rng.choice(shifted) for _ in range(rng.randint(1, 30))) for _ in range(12)]
    a = spark.createDataFrame(list(enumerate(ta)), _DDL)
    b = spark.createDataFrame(list(enumerate(tb)), _DDL)
    got = js_divergence(a, b)
    js, va, vb, ao, bo = _py_js(ta, tb)
    assert got["js_bits"] == pytest.approx(js, rel=1e-10)
    assert (got["vocab_a"], got["vocab_b"]) == (va, vb)
    assert got["a_only_frac"] == pytest.approx(ao)
    assert got["b_only_frac"] == pytest.approx(bo)
    assert 0.0 < got["js_bits"] < 1.0


def test_report_orders_drifted_tokens_first(spark):
    # "stable" identical on both sides; "gone"/"fresh" fully one-sided →
    # they must lead the report
    a = spark.createDataFrame([(1, "stable stable stable gone gone gone gone")], _DDL)
    b = spark.createDataFrame([(2, "stable stable stable fresh fresh fresh fresh")], _DDL)
    rows = drift_report(a, b, top_k=2).collect()
    assert {r["w"] for r in rows} == {"gone", "fresh"}
    assert all(r["js_term"] > 0 for r in rows)
    # gone/fresh are symmetric → equal contributions → token asc tie-break
    assert rows[0]["js_term"] == pytest.approx(rows[1]["js_term"])
    assert [r["w"] for r in rows] == ["fresh", "gone"]
    with pytest.raises(ValueError, match="top_k"):
        drift_report(a, b, top_k=0)


def test_report_plan_take_ordered_no_python(spark):
    a = spark.createDataFrame([(1, "x y z")], _DDL)
    b = spark.createDataFrame([(2, "x y q")], _DDL)
    plan = drift_report(a, b, top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Python" not in plan
