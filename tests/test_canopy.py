"""Canopy blocking (pipeline/canopy.py): the distributed center selection +
membership must equal a pure-Python replay of the sequential McCallum-
Nigam-Ungar pass with the same md5 visiting order — centers, overlapping
memberships, and emitted pairs all pinned — and the hot-canopy cap must
mirror the other passes' block-cap discipline."""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import blocking, canopy


def _toks(text: str) -> frozenset[str]:
    return frozenset(t for t in re.split("[^a-z0-9]+", text.lower()) if t)


def _jacc(a: frozenset, b: frozenset) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def _pri(n: str, salt: str = "") -> str:
    return hashlib.md5((salt + n).encode()).hexdigest() + n


def _oracle(rows, t_loose, t_tight, salt=""):
    """Literal sequential canopy: visit by priority; pool members become
    centers; sim >= t_loose joins the canopy (over the FULL record set);
    sim >= t_tight leaves the pool. Similarities in exact millis to match
    the Spark side's integer grid."""
    toks = {rid: _toks(text) for rid, text in rows}
    sims = {
        (a, b): round(_jacc(toks[a], toks[b]) * 1000)
        for a, b in itertools.combinations(sorted(toks), 2)
    }

    def milli(a, b):
        return 1000 if a == b else sims[tuple(sorted((a, b)))]

    pool = set(toks)
    members: dict[str, set[str]] = {}
    for rid in sorted(toks, key=lambda r: _pri(r, salt)):
        if rid not in pool:
            continue
        members[rid] = {
            o for o in toks if milli(rid, o) >= round(t_loose * 1000)
        }
        pool -= {
            o for o in pool if milli(rid, o) >= round(t_tight * 1000)
        }
    pairs = set()
    for ms in members.values():
        pairs |= {tuple(sorted(p)) for p in itertools.combinations(ms, 2)}
    return members, pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "rec_id string, name string")


ROWS = [
    ("a1", "alpha beta gamma delta"),
    ("a2", "alpha beta gamma epsilon"),
    ("a3", "alpha beta gamma delta zeta"),
    ("b1", "one two three four"),
    ("b2", "one two three five"),
    ("c1", "lonely only token"),
]


def test_canopy_matches_sequential_oracle(spark):
    got_members: dict[str, set[str]] = {}
    asg = canopy.canopy_assignments(
        _df(spark, ROWS), "rec_id", F.col("name"), t_loose=0.3, t_tight=0.6
    )
    for r in asg.collect():
        got_members.setdefault(r.center_id, set()).add(r.rec_id)
    want_members, want_pairs = _oracle(ROWS, 0.3, 0.6)
    assert got_members == want_members
    pairs = canopy.canopy_pairs(
        _df(spark, ROWS), "rec_id", F.col("name"), t_loose=0.3, t_tight=0.6
    )
    got_pairs = {(r.conv_id_a, r.conv_id_b) for r in pairs.collect()}
    assert got_pairs == want_pairs


@pytest.mark.parametrize("seed", [2, 13])
def test_canopy_randomized_vs_oracle(spark, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (
            f"r{i:03d}",
            " ".join(rng.choice(vocab, size=rng.integers(3, 9), replace=False)),
        )
        for i in range(60)
    ]
    for t_loose, t_tight in ((0.25, 0.5), (0.4, 0.4)):
        asg = canopy.canopy_assignments(
            _df(spark, rows), "rec_id", F.col("name"), t_loose, t_tight,
            salt=f"s{seed}",
        )
        got: dict[str, set[str]] = {}
        for r in asg.collect():
            got.setdefault(r.center_id, set()).add(r.rec_id)
        want, want_pairs = _oracle(rows, t_loose, t_tight, salt=f"s{seed}")
        assert got == want, (t_loose, t_tight)
        got_pairs = {
            (r.conv_id_a, r.conv_id_b)
            for r in canopy.canopy_pairs(
                _df(spark, rows), "rec_id", F.col("name"), t_loose, t_tight,
                salt=f"s{seed}", max_canopy=None,
            ).collect()
        }
        assert got_pairs == want_pairs


def test_every_record_lands_in_a_canopy(spark):
    asg = canopy.canopy_assignments(
        _df(spark, ROWS), "rec_id", F.col("name"), 0.3, 0.6
    )
    assert {r.rec_id for r in asg.collect()} == {r for r, _ in ROWS}


def test_canopies_overlap(spark):
    """t_loose low, t_tight = 1.0: nothing leaves the pool except exact
    duplicates, so every record centers its own canopy and near records
    appear under several centers."""
    asg = canopy.canopy_assignments(
        _df(spark, ROWS), "rec_id", F.col("name"), t_loose=0.3, t_tight=1.0
    )
    counts: dict[str, int] = {}
    for r in asg.collect():
        counts[r.rec_id] = counts.get(r.rec_id, 0) + 1
    assert max(counts.values()) > 1
    assert len({r.center_id for r in asg.collect()}) == len(ROWS)


def test_monster_canopy_is_capped(spark):
    rows = [(f"m{i:02d}", "same same same tokens") for i in range(30)]
    rows += [("x1", "rare pair words here"), ("x2", "rare pair words there")]
    pairs = canopy.canopy_pairs(
        _df(spark, rows), "rec_id", F.col("name"), 0.3, 0.6, max_canopy=10
    )
    got = {(r.conv_id_a, r.conv_id_b) for r in pairs.collect()}
    assert ("x1", "x2") in got
    assert not any(a.startswith("m") and b.startswith("m") for a, b in got)


def test_threshold_validation(spark):
    with pytest.raises(ValueError, match="t_loose <= t_tight"):
        canopy.canopy_assignments(
            _df(spark, ROWS), "rec_id", F.col("name"), 0.7, 0.4
        )


def test_canopy_feeds_multipass_union(spark):
    df = _df(spark, ROWS)
    u = blocking.union_candidates(
        {
            "canopy": canopy.canopy_pairs(df, "rec_id", F.col("name"), 0.3, 0.6),
            "suffix": blocking.suffix_pairs(df, "rec_id", "name"),
        }
    )
    assert u.where(F.array_contains("passes", "canopy")).count() > 0
