"""NMI / variation of information: parity with a pure-Python replica on
randomized partitions, identity and independence edge cases, and the
VI-metric sanity properties."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from hexspark.pipeline.evaluate import mutual_info_df


def _py_nmi_vi(pairs):
    n = len(pairs)
    ca = Counter(c for c, _ in pairs)
    cb = Counter(e for _, e in pairs)
    cells = Counter(pairs)
    mi = sum(
        (o / n) * math.log(n * o / (ca[c] * cb[e]))
        for (c, e), o in cells.items()
    )
    ha = -sum((a / n) * math.log(a / n) for a in ca.values())
    hb = -sum((b / n) * math.log(b / n) for b in cb.values())
    hmax = max(ha, hb)
    nmi = 1.0 if hmax == 0 else mi / hmax
    return mi, ha, hb, nmi, ha + hb - 2 * mi


def _run(spark, assign):
    clusters = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(assign)], "conv_id long, cluster_id long"
    )
    truth = spark.createDataFrame(
        [(i, e) for i, (_, e) in enumerate(assign)], "conv_id long, entity_id long"
    )
    return mutual_info_df(clusters, truth).collect()[0]


@pytest.mark.parametrize("seed,k_pred,k_true", [(3, 4, 5), (19, 2, 8)])
def test_parity_with_python_replica(spark, seed, k_pred, k_true):
    rng = random.Random(seed)
    assign = [(rng.randrange(k_pred), rng.randrange(k_true)) for _ in range(200)]
    r = _run(spark, assign)
    mi, ha, hb, nmi, vi = _py_nmi_vi(assign)
    assert r.n_records == 200
    assert r.mi == pytest.approx(mi, abs=1e-7)
    assert r.h_pred == pytest.approx(ha, abs=1e-7)
    assert r.h_true == pytest.approx(hb, abs=1e-7)
    assert r.nmi == pytest.approx(nmi, abs=1e-7)
    assert r.vi == pytest.approx(vi, abs=1e-7)


def test_identical_partitions(spark):
    assign = [(i % 5, i % 5) for i in range(50)]
    r = _run(spark, assign)
    assert r.nmi == pytest.approx(1.0)
    assert r.vi == pytest.approx(0.0, abs=1e-9)


def test_trivial_partitions_convention(spark):
    # both one big cluster: zero entropy on both sides -> NMI 1.0, VI 0
    assign = [(0, 0)] * 20
    r = _run(spark, assign)
    assert r.nmi == 1.0 and r.vi == pytest.approx(0.0, abs=1e-9)


def test_independent_partitions_have_low_nmi(spark):
    # orthogonal grid: cluster = i mod 4, entity = i div 4 -> MI exactly 0
    assign = [(i % 4, i // 4) for i in range(16)]
    r = _run(spark, assign)
    assert r.mi == pytest.approx(0.0, abs=1e-9)
    assert r.nmi == pytest.approx(0.0, abs=1e-9)
    assert r.vi == pytest.approx(r.h_pred + r.h_true, abs=1e-7)
