"""Adaptive sorted-neighborhood (snm.adaptive_snm_pairs): the distributed
segmentation must equal a pure-Python replay — sort, adjacent-key
similarity, boundary cut, within-segment pairs, segment cap — and beat the
fixed window on a long duplicate run."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.snm import adaptive_snm_pairs, sorted_neighborhood_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _sim(a: str, b: str) -> int:
    m = max(len(a), len(b))
    return 1000 if m == 0 else 1000 - (1000 * _lev(a, b)) // m


def _oracle(rows, min_sim=800, cap=100):
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    segments: list[list[str]] = [[order[0][0]]] if order else []
    for (pid, pkey), (rid, rkey) in zip(order, order[1:]):
        if _sim(pkey, rkey) < min_sim:
            segments.append([rid])
        else:
            segments[-1].append(rid)
    pairs = {}
    for si, seg in enumerate(segments):
        if cap is not None and len(seg) > cap:
            continue
        for a, b in itertools.combinations(sorted(seg), 2):
            pairs[(a, b)] = (si, len(seg))
    return pairs


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "rec_id string, name string")
    out = adaptive_snm_pairs(df, "rec_id", F.col("name"), **kw)
    return {
        (r.rec_id_a, r.rec_id_b): (r.segment_id, r.segment_size)
        for r in out.collect()
    }


@pytest.mark.parametrize("seed", [4, 17])
def test_matches_pure_python_replay(spark, seed):
    rng = np.random.default_rng(seed)
    stems = ["alphabravo", "charliedelta", "echofoxtrot", "golfhotel"]
    rows = []
    for i in range(70):
        stem = stems[rng.integers(len(stems))]
        mut = list(stem)
        for _ in range(rng.integers(0, 3)):
            mut[rng.integers(len(mut))] = "xyz"[rng.integers(3)]
        rows.append((f"r{i:03d}", "".join(mut)))
    got = _run(spark, rows)
    want = _oracle(rows)
    assert set(got) == set(want)
    # segment sizes agree; segment ids agree up to the shared ordinal
    for p in got:
        assert got[p][1] == want[p][1], p
        assert got[p][0] == want[p][0], p


def test_long_run_beats_fixed_window(spark):
    """12 near-identical keys in a row: fixed window=4 misses the far
    pairs inside the run; the adaptive segment keeps the whole run as one
    block and catches all C(12,2) pairs."""
    run = [(f"d{i:02d}", f"duplicate-key-{i % 2}") for i in range(12)]
    others = [("z1", "zzzzzzz"), ("z2", "qqqqqqq")]
    rows = run + others
    adaptive = _run(spark, rows)
    run_pairs = {
        p for p in adaptive if p[0].startswith("d") and p[1].startswith("d")
    }
    assert len(run_pairs) == 12 * 11 // 2
    df = spark.createDataFrame(rows, "rec_id string, name string")
    fixed = sorted_neighborhood_pairs(df, "rec_id", F.col("name"), window=4)
    fixed_run = {
        (r.rec_id_a, r.rec_id_b)
        for r in fixed.collect()
        if r.rec_id_a.startswith("d") and r.rec_id_b.startswith("d")
    }
    assert len(fixed_run) < len(run_pairs)
    # and the unrelated keys never pair with the run
    assert not any("z1" in p or "z2" in p for p in adaptive)


def test_mega_segment_capped_whole(spark):
    rows = [(f"m{i:03d}", "identicalkey") for i in range(30)]
    rows += [("a1", "otherpair"), ("a2", "otherpair")]
    got = _run(spark, rows, max_block=20)
    assert got == {("a1", "a2"): (1, 2)}  # run segment (id 0) dropped whole
    uncapped = _run(spark, rows, max_block=None)
    assert len(uncapped) == 30 * 29 // 2 + 1


def test_validation(spark):
    df_rows = [("a", "x")]
    with pytest.raises(ValueError, match="min_sim_milli"):
        _run(spark, df_rows, min_sim_milli=0)
