"""Golden-signature fixture for the production SimHash kernel (VERDICT r2
#3): the exact sig_hex bytes for a frozen input set are committed in
tests/golden_simhash.json and asserted byte-for-byte, closing the drift
hole the oracled simhash_sql twin can't see — the twin pins the
tokenize→hash→vote→sign *shape*, not the splitmix64 kernel's output bytes.
The byte layout is API (kernels._BITORDER exists precisely to keep it
stable across kernel rewrites); any change to tokenization, splitmix64,
the vote, the packbits order, or hex formatting fails this test."""

from __future__ import annotations

import json
import os

import numpy as np

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden_simhash.json")))

# Frozen inputs — NEVER regenerate golden_simhash.json to make this pass;
# a mismatch means the kernel's output bytes drifted, which breaks every
# persisted signature table in the field.
TEXTS = {
    "empty": "",
    "space": "   ",
    "ascii": "user: hello agent how are you today agent: i am fine thank you",
    "repeat": "token token token token token token token token",
    "single": "word",
    "unicode": "café naïve 你好 こんにちは \U0001f600 straße",
    "punct": "Hello, World!!! -- does punctuation; matter? (yes/no) [maybe] 42.",
    "long": " ".join(f"tok{i % 97} filler{i % 13}" for i in range(3000)),
    "mixedcase": "The QUICK brown FoX JuMpS oVeR tHe LaZy DoG 0123456789",
    "numbers": "1 22 333 4444 55555 666666 7777777 88888888 999999999",
}


def test_pipeline_signatures_match_golden_bytes(spark):
    from hexspark.pipeline import simhash as sm

    df = spark.createDataFrame(
        [(k, v, 1) for k, v in sorted(TEXTS.items())],
        "conv_id string, doc_text string, n_turns int",
    )
    got = {
        r.conv_id: (r.sig_hex, r.canon, r.n_chars)
        for r in sm.signatures(df).collect()
    }
    assert set(got) == set(GOLDEN)
    for k, g in GOLDEN.items():
        assert got[k] == (g["sig_hex"], g["canon"], g["n_chars"]), k


def test_kernel_direct_matches_golden_bytes():
    """Same goldens through the raw numpy kernel (no Spark, no Arrow): a
    drift isolated to the Spark plumbing vs the kernel shows up as exactly
    one of these two tests failing."""
    from hexspark import kernels

    keys = sorted(TEXTS)
    bufs = [TEXTS[k].encode("utf-8") for k in keys]
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    offs = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offs[1:])
    sig = kernels.simhash256_from_utf8(data, offs)
    hexes = ["".join(chr(c) for c in row) for row in kernels.hex_chars_matrix(sig)]
    for k, h in zip(keys, hexes):
        assert h == GOLDEN[k]["sig_hex"], k
