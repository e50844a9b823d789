"""Mixture sampling: exact md5-replay set parity, water-line rates
(binding domain keeps 100%), unlisted-domain drop, guards, plan audit."""

from __future__ import annotations

import hashlib

import pytest

from hexspark.ops.sampling import mixture_sample

_DDL = "doc_id string, domain string"
_HASH_MAX = float(1 << 48)


def _rows():
    rows = []
    for d, n in (("web", 600), ("code", 200), ("dialog", 40)):
        rows += [(f"{d}-{i}", d) for i in range(n)]
    return rows


def _py_keep(key: str, rate: float, salt="s0") -> bool:
    h = int(hashlib.md5((salt + key).encode()).hexdigest()[:12], 16)
    return h < int(rate * _HASH_MAX)


def test_waterline_rates_and_exact_replay(spark):
    df = spark.createDataFrame(_rows(), _DDL)
    out, plan = mixture_sample(
        df, "domain", "doc_id", {"web": 0.6, "code": 0.3, "dialog": 0.1}
    )
    # dialog is binding: 40 / 0.1 = 400 = N_out → dialog rate 1.0,
    # web expects 240 of 600, code expects 120 of 200
    assert plan["dialog"]["rate"] == 1.0
    assert plan["web"]["expected"] == pytest.approx(240.0)
    assert plan["code"]["expected"] == pytest.approx(120.0)
    got = {r["doc_id"] for r in out.collect()}
    expected = {
        k for k, d in _rows() if d in plan and _py_keep(k, plan[d]["rate"])
    }
    assert got == expected
    # realized mixture is near target (hash noise only)
    n = len(got)
    web_frac = sum(1 for k in got if k.startswith("web")) / n
    assert abs(web_frac - 0.6) < 0.08


def test_unlisted_domain_dropped_and_scale(spark):
    df = spark.createDataFrame(_rows() + [("junk-1", "junk")], _DDL)
    out, plan = mixture_sample(
        df, "domain", "doc_id", {"web": 1.0, "code": 1.0}, scale=0.5
    )
    assert "junk" not in plan
    assert all(not r["doc_id"].startswith(("junk", "dialog")) for r in out.collect())
    # code binds (200/0.5=400 < 600/0.5): scale halves both rates
    assert plan["code"]["rate"] == pytest.approx(0.5)
    assert plan["web"]["rate"] == pytest.approx(200.0 / 600.0 * 0.5)


def test_determinism_and_append_stability(spark):
    df = spark.createDataFrame(_rows(), _DDL)
    w = {"web": 0.6, "code": 0.3, "dialog": 0.1}
    a = {r["doc_id"] for r in mixture_sample(df, "domain", "doc_id", w)[0].collect()}
    b = {r["doc_id"] for r in mixture_sample(df.repartition(13), "domain", "doc_id", w)[0].collect()}
    assert a == b  # partitioning-independent


def test_guards(spark):
    df = spark.createDataFrame(_rows(), _DDL)
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, "domain", "doc_id", {})
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "domain", "doc_id", {"web": 0.0})
    with pytest.raises(ValueError, match="scale"):
        mixture_sample(df, "domain", "doc_id", {"web": 1.0}, scale=0.0)
    with pytest.raises(ValueError, match="missing from the corpus"):
        mixture_sample(df, "domain", "doc_id", {"web": 0.5, "nosuch": 0.5})
