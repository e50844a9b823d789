"""Spark column-function tests: the reference semantics exercised through
the pandas-UDF layer on a live session, plus Jaro-Winkler parity with an
independent scalar implementation (strcmp95 conventions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hexspark import columns as C


def jw_scalar(s1: str, s2: str) -> float:
    """Independent scalar Jaro-Winkler, strcmp95 conventions (int-half
    transpositions, 0.7 boost threshold) — the oracle for the vectorized
    batch implementation."""
    s1, s2 = s1[:64], s2[:64]
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    w = max(max(len(s1), len(s2)) // 2 - 1, 0)
    used = [False] * len(s2)
    mj = []
    for i, c in enumerate(s1):
        for j in range(max(0, i - w), min(len(s2) - 1, i + w) + 1):
            if not used[j] and s2[j] == c:
                used[j] = True
                mj.append((i, j))
                break
    m = len(mj)
    if m == 0:
        return 0.0
    a_seq = [s1[i] for i, _ in mj]
    b_seq = [s2[j] for j in sorted(j for _, j in mj)]
    t = sum(x != y for x, y in zip(a_seq, b_seq)) // 2
    jaro = (m / len(s1) + m / len(s2) + (m - t) / m) / 3
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for x, y in zip(s1[:4], s2[:4]):
        if x != y:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1 - jaro)


def test_jaro_winkler_batch_vs_scalar_oracle():
    rng = np.random.default_rng(17)
    cases = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("", ""),
        ("a", ""),
        ("abc", "abc"),
        ("abcdef", "abcxyz"),
    ]
    for _ in range(800):
        n1, n2 = rng.integers(0, 20, 2)
        cases.append(
            (
                "".join(rng.choice(list("abcde "), n1)),
                "".join(rng.choice(list("abcde "), n2)),
            )
        )
    got = C.jaro_winkler_matrix(
        pd.Series([c[0] for c in cases]), pd.Series([c[1] for c in cases])
    )
    for i, (s1, s2) in enumerate(cases):
        assert abs(got[i] - jw_scalar(s1, s2)) < 1e-12, (s1, s2)


def test_hamming_columns_on_spark(spark):
    df = spark.createDataFrame(
        [
            ("deadbeef", "00000000", 4),
            ("abc", "abc", 0),
            ("ggg", "ggg", 1),  # q1: equal invalid → within True, dist NULL
            ("xyz", "abc", 4),  # q2: max_dist > len → within True, dist NULL
            ("abc", "abcd", 2),  # length mismatch → both NULL
            ("f" * 64, "0" * 64, 300),
        ],
        "a string, b string, md int",
    )
    rows = df.select(
        C.hamming_hex("a", "b").alias("d"),
        C.within_dist_hex("a", "b", "md").alias("w"),
    ).collect()
    assert [r["d"] for r in rows] == [24, 0, None, None, None, 256]
    assert [r["w"] for r in rows] == [False, True, True, True, None, True]


def test_hamming_bytes_on_spark(spark):
    df = spark.createDataFrame(
        [(b"\xff" * 32, b"\x00" * 32), (b"\xab\x0c", b"\xab\x0c"), (b"\x01", b"\x01\x02")],
        "a binary, b binary",
    )
    rows = df.select(C.hamming_bytes("a", "b").alias("d")).collect()
    assert [r["d"] for r in rows] == [256, 0, None]


def test_simhash_deterministic_and_locality(spark):
    texts = [
        ("a", "the quick brown fox jumps over the lazy dog " * 10),
        ("b", "the quick brown fox jumps over the lazy dog " * 10),
        ("c", "the quick brown fox leaps over the lazy dog " * 10),
        ("d", "completely unrelated content about spark query engines " * 10),
    ]
    df = spark.createDataFrame(texts, "id string, text string")
    sigs = {
        r["id"]: r["sig"]
        for r in df.select("id", C.simhash256("text").alias("sig")).collect()
    }
    assert all(len(s) == 32 for s in sigs.values())
    assert sigs["a"] == sigs["b"]

    def hd(x, y):
        return int(
            np.unpackbits(
                np.frombuffer(x, dtype=np.uint8) ^ np.frombuffer(y, dtype=np.uint8)
            ).sum()
        )

    assert hd(sigs["a"], sigs["c"]) < hd(sigs["a"], sigs["d"])
    assert hd(sigs["a"], sigs["c"]) <= 40


def test_first_match_probe_query(spark):
    from hexspark.pipeline.probe import first_match_index

    rows = [(i, bytes([i]) * 16) for i in range(100)]
    df = spark.createDataFrame(rows, "idx long, sig binary")
    probe = bytes([40]) * 16
    # exact element at idx 40
    assert first_match_index(df, probe, 0).collect()[0]["first_idx"] == 40
    # no element within 0 of a novel probe (bytes 200 not in table)
    assert first_match_index(df, bytes([200]) * 16, 0).collect()[0]["first_idx"] == -1


def test_jw_arrow_kernels_differential():
    """Reference-style differential test (set_algo loops,
    test_hexhamming.py:69-77): the DuckDB and numpy Jaro-Winkler kernels
    must agree on random strings, edge cases included."""
    import os

    import numpy as np
    import pyarrow as pa

    from hexspark import columns as C

    rng = np.random.default_rng(11)
    chars = np.frombuffer(b"abcdefghij0123456789 ", dtype=np.uint8)
    rows_a, rows_b = [], []
    for _ in range(500):
        la, lb = int(rng.integers(0, 48)), int(rng.integers(0, 48))
        a = bytes(chars[rng.integers(0, len(chars), la)]).decode()
        b = bytes(chars[rng.integers(0, len(chars), lb)]).decode()
        if rng.random() < 0.3:
            b = a[: max(la - 2, 0)] + "xy"  # near-dup prefix case
        rows_a.append(a)
        rows_b.append(b)
    rows_a += ["", "", "abc", "martha"]
    rows_b += ["", "abc", "", "marhta"]
    ca, cb = pa.array(rows_a), pa.array(rows_b)

    try:
        import duckdb  # noqa: F401
    except Exception:
        import pytest

        pytest.skip("duckdb not available")

    saved = C._JW_IMPL
    try:
        C._JW_IMPL = "duckdb"
        jw_duck = C.jw_arrow(ca, cb)
        C._JW_IMPL = "numpy"
        jw_np = C.jw_arrow(ca, cb)
    finally:
        C._JW_IMPL = saved
    assert np.allclose(jw_duck, jw_np, atol=1e-12), (
        np.abs(jw_duck - jw_np).max()
    )


def test_canon_keys_match_spark_expression_on_mixed_unicode(spark):
    """kernels.canon_keys_utf8's byte-level filter must agree with the JVM
    expression substring(regexp_replace(lower(s), '[^a-z0-9 ]', ''), 1, 48)
    for every char whose lowercase stays outside ASCII (multi-byte UTF-8 is
    dropped by both). The documented divergence is the handful of Unicode
    chars that lowercase INTO ASCII — e.g. U+212A KELVIN SIGN → 'k',
    U+0130 İ → 'i' — where the JVM keeps the mapped char and the byte
    filter drops it; the ASCII assumption is stated in kernels.py."""
    import numpy as np

    from hexspark import kernels
    from hexspark.pipeline.simhash import signatures

    texts = [
        "Hello, WORLD! 123",
        "héllo wörld — ünïcode",
        "中文文本 with ascii 42",
        "  spaces   and\tTABS  ",
        "ALL CAPS AND 0987654321 plus punctuation!!!",
        "émoji 🎉 and ação ñandú",
        "",
        "...",
    ]
    df = spark.createDataFrame(
        [(str(i), t, 1) for i, t in enumerate(texts)],
        "conv_id string, doc_text string, n_turns int",
    )
    got = {
        r["conv_id"]: r["canon"] for r in signatures(df).select("conv_id", "canon").collect()
    }
    expected = {
        r["conv_id"]: r["e"]
        for r in df.selectExpr(
            "conv_id",
            "substring(regexp_replace(lower(doc_text), '[^a-z0-9 ]', ''), 1, 48) AS e",
        ).collect()
    }
    assert got == expected

    # the known divergence: chars that lowercase into ASCII
    kelvin = "Kelvin"  # KELVIN SIGN + 'elvin'
    data = np.frombuffer(kelvin.encode(), dtype=np.uint8)
    offs = np.array([0, len(data)], dtype=np.int64)
    mat, lens = kernels.canon_keys_utf8(data, offs, 48)
    byte_canon = bytes(mat[0][: lens[0]]).decode()
    jvm_canon = spark.sql(
        f"SELECT regexp_replace(lower('{kelvin}'), '[^a-z0-9 ]', '') AS e"
    ).collect()[0]["e"]
    assert byte_canon == "elvin" and jvm_canon == "kelvin"  # divergence is real & pinned


def test_edit_distance_scorer(spark):
    """pipeline/scoring.edit_distance: exact Levenshtein vs a pure-Python
    DP oracle; the bounded form returns -1 strictly beyond the cap and the
    exact distance at-or-under it (the A3-style gate contract); similarity
    is 1 - lev/max_len with the empty-empty convention pinned to 1.0."""
    from hexspark.pipeline.scoring import edit_distance, edit_similarity

    def lev_py(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    pairs = [
        ("kitten", "sitting"),
        ("abc", "abc"),
        ("", ""),
        ("", "abcd"),
        ("flaw", "lawn"),
        ("a" * 30, "a" * 28 + "bb"),
        ("tool use agent", "tool-use agent"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a",
        "b",
        edit_distance("a", "b").alias("lev"),
        edit_distance("a", "b", 3).alias("lev3"),
        edit_similarity("a", "b").alias("sim"),
    ).collect()
    for r in rows:
        want = lev_py(r["a"], r["b"])
        assert r["lev"] == want
        assert r["lev3"] == (want if want <= 3 else -1)
        denom = max(len(r["a"]), len(r["b"]))
        want_sim = 1.0 if denom == 0 else 1.0 - want / denom
        assert abs(r["sim"] - want_sim) < 1e-12
