"""Suffix blocking (pipeline/blocking.suffix_keys / suffix_pairs): the
distributed pass must equal a pure-Python replay of the Aizawa-Oyama
suffix-array method — canonical key, all suffixes >= min length, blocks
over the size cap dropped BEFORE pairing — and must co-block records whose
keys differ only by a corrupted PREFIX, which prefix-anchored passes miss."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import blocking


def _canon(text: str, max_key_len: int) -> str:
    return "".join(c for c in text.lower() if c.isalnum())[:max_key_len]


def _suffixes(key: str, min_len: int) -> set[str]:
    return {key[i:] for i in range(len(key) - min_len + 1)} if len(key) >= min_len else set()


def _oracle_pairs(rows, min_len=6, max_key=12, cap=50):
    blocks: dict[str, list[str]] = {}
    for rid, text in rows:
        for s in _suffixes(_canon(text, max_key), min_len):
            blocks.setdefault(s, []).append(rid)
    out: dict[tuple[str, str], set[str]] = {}
    for s, ids in blocks.items():
        if cap is not None and len(ids) > cap:
            continue
        for a, b in itertools.combinations(sorted(ids), 2):
            out.setdefault((a, b), set()).add(s)
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "rec_id string, name string")


@pytest.mark.parametrize("seed", [1, 9])
def test_suffix_pairs_match_pure_python(spark, seed):
    rng = np.random.default_rng(seed)
    alphabet = list("abcdef")
    rows = [
        (f"r{i:03d}", "".join(rng.choice(alphabet, size=rng.integers(4, 14))))
        for i in range(80)
    ]
    got = {
        (r.conv_id_a, r.conv_id_b): (r.suffix_key, r.n_shared_suffixes)
        for r in blocking.suffix_pairs(_df(spark, rows), "rec_id", "name").collect()
    }
    want = _oracle_pairs(rows)
    assert set(got) == set(want)
    for pair, (key, n) in got.items():
        assert key == max(want[pair], key=len)
        assert n == len(want[pair])


def test_prefix_corruption_still_coblocks(spark):
    """'mr johnsmith1' vs 'johnsmith199': the canonical 12-char keys are
    'mrjohnsmith1' and 'johnsmith199' — no shared prefix, so an SNM sort
    key or canon-prefix block misses the pair, but they share the suffix
    'ohnsmith1' (>= 6 chars) once aligned... use keys engineered to share
    an 8-char suffix."""
    rows = [
        ("a", "xx_corehandle"),   # key xxcorehandle
        ("b", "corehandle"),      # key corehandle
        ("c", "zzzzzzzzzz"),
    ]
    pairs = blocking.suffix_pairs(_df(spark, rows), "rec_id", "name").collect()
    got = {(r.conv_id_a, r.conv_id_b) for r in pairs}
    assert ("a", "b") in got
    assert all("c" not in p for p in got)


def test_short_keys_emit_nothing(spark):
    rows = [("a", "abc"), ("b", "ab!c "), ("c", "")]
    assert blocking.suffix_pairs(_df(spark, rows), "rec_id", "name").count() == 0
    assert blocking.suffix_keys(_df(spark, rows), "rec_id", "name").count() == 0


def test_hot_suffix_block_is_capped(spark):
    """60 records ending in the same 6-char suffix but otherwise distinct:
    with the cap below 60 the hot suffix emits nothing, and only genuinely
    similar records (sharing a longer, rarer suffix) pair up."""
    rows = [(f"h{i:02d}", f"u{i:02d}qqqcommon") for i in range(60)]
    rows += [("t1", "zzfineparty"), ("t2", "qqfineparty")]
    capped = blocking.suffix_pairs(
        _df(spark, rows), "rec_id", "name", max_block_size=50
    )
    got = {(r.conv_id_a, r.conv_id_b) for r in capped.collect()}
    want = set(_oracle_pairs(rows, cap=50))
    assert got == want
    assert ("t1", "t2") in got
    # the 60-member 'common' block was dropped whole: the only surviving
    # h-h pairs come through rarer longer suffixes (same second digit ->
    # shared 10-char suffix, 6-member blocks), far below all-pairs
    hh = sum(1 for a, b in got if a.startswith("h") and b.startswith("h"))
    assert hh == sum(
        1 for a, b in _oracle_pairs(rows, cap=50) if a.startswith("h") and b.startswith("h")
    )
    assert hh == 150  # 10 second-digit groups x C(6,2), ~8.5% of all-pairs
    uncapped = blocking.suffix_pairs(
        _df(spark, rows), "rec_id", "name", max_block_size=None
    )
    assert uncapped.count() == len(_oracle_pairs(rows, cap=None))


def test_suffix_pass_feeds_multipass_union(spark):
    rows = [("a", "xx_corehandle"), ("b", "corehandle"), ("c", "zzzz")]
    df = _df(spark, rows)
    u = blocking.union_candidates(
        {
            "suffix": blocking.suffix_pairs(df, "rec_id", "name"),
            "phonetic": blocking.phonetic_pairs(df, "rec_id", "name"),
        }
    )
    row = u.where((F.col("conv_id_a") == "a") & (F.col("conv_id_b") == "b")).collect()
    assert len(row) == 1 and "suffix" in row[0]["passes"]
