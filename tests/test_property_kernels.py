"""Property-based tests (hypothesis) for the batch kernels against the
Python-int ground truth — the randomized generalization of the reference's
parametrized golden-value matrix (test/test_hexhamming.py:12-77). Pure
numpy, no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hexspark import kernels

HEX = "0123456789abcdefABCDEF"


@st.composite
def hex_pairs(draw):
    width = draw(st.integers(min_value=0, max_value=96))
    n = draw(st.integers(min_value=1, max_value=16))
    mk = st.text(alphabet=HEX, min_size=width, max_size=width)
    return [draw(mk) for _ in range(n)], [draw(mk) for _ in range(n)], width


@given(hex_pairs())
@settings(max_examples=60, deadline=None)
def test_hamming_hex_matches_int_oracle(case):
    a, b, width = case
    dist, invalid = kernels.hamming_hex_fixed(a, b, width)
    assert not invalid.any()
    for i in range(len(a)):
        expect = (
            bin(int(a[i], 16) ^ int(b[i], 16)).count("1") if width else 0
        )
        assert int(dist[i]) == expect


@given(st.integers(min_value=1, max_value=64), st.data())
@settings(max_examples=60, deadline=None)
def test_hamming_bytes_matches_int_oracle(width, data):
    n = data.draw(st.integers(min_value=1, max_value=16))
    mk = st.binary(min_size=width, max_size=width)
    a = [data.draw(mk) for _ in range(n)]
    b = [data.draw(mk) for _ in range(n)]
    dist = kernels.hamming_bytes_fixed(a, b, width)
    for i in range(n):
        x = int.from_bytes(a[i], "big") ^ int.from_bytes(b[i], "big")
        assert int(dist[i]) == bin(x).count("1")


@given(hex_pairs(), st.integers(min_value=0, max_value=512))
@settings(max_examples=60, deadline=None)
def test_within_dist_agrees_with_distance(case, max_dist):
    """On valid hex, the quirky predicate must agree with the plain
    ``dist <= max_dist`` whenever neither shortcut quirk fires, and must
    return True whenever either quirk (byte-equal q1, max_dist > len q2)
    fires."""
    a, b, width = case
    md = np.full(len(a), max_dist, dtype=np.int64)
    within, raise_invalid = kernels.within_dist_hex_fixed(a, b, width, md)
    assert not raise_invalid.any()
    dist, _ = kernels.hamming_hex_fixed(a, b, width)
    for i in range(len(a)):
        if a[i] == b[i] or max_dist > width:
            assert bool(within[i])
        else:
            assert bool(within[i]) == (int(dist[i]) <= max_dist)


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_within_dist_quirk_q1_skips_validation(data):
    """Byte-equal strings are True even when they are not valid hex at all
    (reference strcmp shortcut, cc:39-41)."""
    width = data.draw(st.integers(min_value=1, max_value=32))
    junk = data.draw(
        st.text(
            alphabet="ghijklmnopqrstuvwxyzGHIJKLMNOPQRSTUVWXYZ!@# ",
            min_size=width, max_size=width,
        )
    )
    md = np.zeros(1, dtype=np.int64)
    within, raise_invalid = kernels.within_dist_hex_fixed([junk], [junk], width, md)
    assert bool(within[0]) and not bool(raise_invalid[0])


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_set_algo_differential(data):
    """All four dispatchable popcount kernels agree on random bytes — the
    randomized form of the reference's differential set_algo loop
    (test_hexhamming.py:69-77)."""
    width = data.draw(st.integers(min_value=1, max_value=48))
    n = data.draw(st.integers(min_value=1, max_value=8))
    mk = st.binary(min_size=width, max_size=width)
    a = [data.draw(mk) for _ in range(n)]
    b = [data.draw(mk) for _ in range(n)]
    prev = kernels.get_kernel_algo()
    results = {}
    try:
        for algo in ("classic", "native", "sse41", "extra"):
            kernels.set_kernel_algo(algo)
            results[algo] = kernels.hamming_bytes_fixed(a, b, width).tolist()
    finally:
        kernels.set_kernel_algo(prev)
    base = results["classic"]
    for algo, got in results.items():
        assert got == base, algo
