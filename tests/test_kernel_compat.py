"""Kernel semantic parity suite.

Every parametrized case from the reference's own test suite
(/root/reference/test/test_hexhamming.py:12-216) re-asserted against
hexspark.compat — same inputs, same expected values, same ValueError
messages — plus the quirk cases documented in SURVEY.md §2.1 (q1-q3) and
differential tests across the set_algo kernel registry.
"""

from __future__ import annotations

import numpy as np
import pytest

from hexspark import kernels
from hexspark.compat import (
    check_bytes_arrays_within_dist,
    check_hexstrings_within_dist,
    hamming_distance_bytes,
    hamming_distance_string,
    set_algo,
)

# --- distance over hex strings (reference test_hexhamming.py:12-40) ---------

STRING_CASES = [
    ("abc", "abc", 0),
    ("000", "001", 1),
    ("ABCDEF", "000001", 16),
    ("", "", 0),
    ("f" * 64, "0" * 64, 256),
    ("f" * 64, "f" * 64, 0),
    ("0" * 64, "0" * 64, 0),
    ("f" * 10000, "0" * 10000, 40000),
    ("f" * 10000, "f" * 10000, 0),
]


@pytest.mark.parametrize("hex1,hex2,expected", STRING_CASES)
def test_hamming_distance_string(hex1, hex2, expected):
    assert expected == hamming_distance_string(hex1, hex2)
    assert len(set_algo("classic")) == 0
    assert expected == hamming_distance_string(hex1, hex2)


# --- distance over bytes (reference :43-77) ----------------------------------

BYTE_CASES = [
    (b"\xab\x0c", b"\xab\x0c", 0),
    (b"\x00", b"\x01", 1),
    (b"\xAB\xCD\xEF", b"\x00\x00\x01", 16),
    (b"", b"", 0),
    (b"\xff" * 32, b"\x00" * 32, 256),
    (b"\xff" * 32, b"\xff" * 32, 0),
    (b"\x00" * 32, b"\x00" * 32, 0),
    (b"\xff" * 5000, b"\x00" * 5000, 40000),
    (b"\xff" * 5000, b"\xff" * 5000, 0),
]


@pytest.mark.parametrize("b1,b2,expected", BYTE_CASES)
def test_hamming_distance_bytes(b1, b2, expected):
    # differential across all registered algos (reference :69-77)
    for algorithm in ("extra", "native", "classic", "sse41"):
        assert set_algo(algorithm) == ""
        assert expected == hamming_distance_bytes(b1, b2)


# --- string error contract (reference :80-101) -------------------------------


@pytest.mark.parametrize(
    "hex1,hex2,msg",
    [
        ("abc", 3, "error occurred while parsing arguments"),
        ("abc", "a", "strings are NOT the same length"),
        ("lol", "foo", "hex string contains invalid char"),
        ("000abcdef", "011abcdgf", "hex string contains invalid char"),
        ("f" * 32, "f" * 31 + "g", "hex string contains invalid char"),
        ("f" * 30, "f" * 29 + "g", "hex string contains invalid char"),
        ("ggg", "ggg", "hex string contains invalid char"),
        ("g" * 15 + "fff", "g" * 15 + "000", "hex string contains invalid char"),
    ],
)
def test_hamming_distance_string_errors(hex1, hex2, msg):
    with pytest.raises(ValueError) as excinfo:
        hamming_distance_string(hex1, hex2)
    assert msg in str(excinfo.value)


# --- within-dist truth table (reference :104-121; shadowed upstream but the
# cases remain the semantic spec per SURVEY.md §5) ----------------------------


@pytest.mark.parametrize(
    "hex1,hex2,max_dist,expected",
    [
        ("000abcdef", "011abcdef", 3, True),
        ("1f0abcdef", "011abcdef", 3, False),
        ("011abcdef", "011abcdef", 1000, True),
    ],
)
def test_check_hexstrings_within_dist(hex1, hex2, max_dist, expected):
    for algorithm in ("extra", "native", "classic", "sse41"):
        assert set_algo(algorithm) == ""
        assert expected == check_hexstrings_within_dist(hex1, hex2, max_dist)


# --- within-dist error contract (reference :124-151) -------------------------


@pytest.mark.parametrize(
    "hex1,hex2,max_dist,msg",
    [
        ("000abcdef", "011abcdef", None, "error occurred while parsing arguments"),
        ("000abcdef", "011abcdef", "HELLO", "error occurred while parsing arguments"),
        ("000abcdef", "011abcdef", -1, "`max_dist` must be >0"),
        ("000abcdef", "011abcdzz", 3, "hex string contains invalid char"),
        ("000abcdef", "011abcdgf", 3, "hex string contains invalid char"),
        ("1f0abcdef", 3, 3, "error occurred while parsing arguments"),
        ("011abcdef", "00", 3, "strings are NOT the same length"),
    ],
)
def test_check_hexstrings_within_dist_errors(hex1, hex2, max_dist, msg):
    with pytest.raises(ValueError) as excinfo:
        check_hexstrings_within_dist(hex1, hex2, max_dist)
    assert msg in str(excinfo.value)


# --- quirk cases (SURVEY.md §2.1 q1-q3; cc:39-41, cc:212-214, cc:207-210) ----


def test_quirk_q1_equal_strings_skip_validation():
    # byte-equal operands return True even when not valid hex (strcmp shortcut)
    assert check_hexstrings_within_dist("ggg", "ggg", 1) is True
    assert check_hexstrings_within_dist("zzz", "zzz", 0) is True


def test_quirk_q2_large_max_dist_skips_validation():
    # max_dist > len → True without validation, even for invalid hex
    assert check_hexstrings_within_dist("xyz", "abc", 4) is True
    # boundary: max_dist == len does NOT take the shortcut → scans → raises
    with pytest.raises(ValueError):
        check_hexstrings_within_dist("xyz", "abc", 3)


def test_quirk_q3_zero_max_dist_accepted():
    assert check_hexstrings_within_dist("abc", "abc", 0) is True
    assert check_hexstrings_within_dist("abc", "abd", 0) is False


def test_early_exit_masks_late_invalid_char():
    # invalid char after the running distance exceeds max_dist → False, not
    # ValueError (validation happens inside the scan loop, cc:52-64)
    assert check_hexstrings_within_dist("fff" + "g", "000" + "g", 2) is False
    # invalid char before the exceed point → ValueError
    with pytest.raises(ValueError):
        check_hexstrings_within_dist("g" + "fff", "g" + "000", 2)


# --- bytes-array first-index search (reference :154-216) ---------------------


@pytest.mark.parametrize(
    "bytes1,bytes2,max_dist,msg",
    [
        (b"\x00" * 16, b"\x00" * 16, None, "error occurred while parsing arguments"),
        (b"\x00" * 16, b"\x00" * 16, "HELLO", "error occurred while parsing arguments"),
        (b"\x00" * 32, b"\x00" * 16, -1, "`max_dist` must be >=0"),
        (b"\x00" * 31, b"\x00" * 16, 3, "`array_of_elems` size must be multiplier of `elem_to_compare`"),
        (b"\x00" * 32, b"", 3, "`elem_to_compare` size must be >0"),
    ],
)
def test_check_bytes_arrays_within_dist_invalid_values(bytes1, bytes2, max_dist, msg):
    with pytest.raises(ValueError) as excinfo:
        check_bytes_arrays_within_dist(bytes1, bytes2, max_dist)
    assert msg in str(excinfo.value)


@pytest.mark.parametrize(
    "bytes1,bytes2,max_dist,expected",
    [
        (b"\x00" * 16, b"\xFF" * 16, 50, -1),
        (b"\x00" * 16, b"\x00" * 15 + b"\x0F" * 1, 4, 0),
        (b"\xFF" * 16 * 8 + b"\x0F" * 16, b"\x00" * 2 + b"\x0F" * 14, 8, 8),
        (b"\xF0" * 64 + b"\x0A" * 64, b"\x0F" * 64, 3 * 64, 1),
    ],
)
def test_check_bytes_arrays_within_dist_calculation(bytes1, bytes2, max_dist, expected):
    for algorithm in ("extra", "native", "classic", "sse41"):
        assert set_algo(algorithm) == ""
        assert expected == check_bytes_arrays_within_dist(bytes1, bytes2, max_dist)


# --- property: batch kernels agree with python int oracle --------------------


def test_batch_hex_kernel_vs_python_oracle():
    rng = np.random.default_rng(7)
    for width in (3, 16, 17, 64, 200):
        a = ["".join(rng.choice(list("0123456789abcdefABCDEF"), width)) for _ in range(64)]
        b = ["".join(rng.choice(list("0123456789abcdefABCDEF"), width)) for _ in range(64)]
        dist, invalid = kernels.hamming_hex_fixed(a, b, width)
        assert not invalid.any()
        for i in range(64):
            expected = bin(int(a[i], 16) ^ int(b[i], 16)).count("1")
            assert int(dist[i]) == expected


def test_batch_bytes_kernel_vs_python_oracle():
    rng = np.random.default_rng(11)
    for width in (1, 16, 32, 64, 100):
        a = [rng.bytes(width) for _ in range(64)]
        b = [rng.bytes(width) for _ in range(64)]
        dist = kernels.hamming_bytes_fixed(a, b, width)
        for i in range(64):
            expected = bin(int.from_bytes(a[i], "big") ^ int.from_bytes(b[i], "big")).count("1")
            assert int(dist[i]) == expected


def test_batch_within_dist_vs_scalar_loop_oracle():
    rng = np.random.default_rng(13)
    width = 24
    chars = list("0123456789abcdef")
    a = ["".join(rng.choice(chars, width)) for _ in range(200)]
    b = ["".join(rng.choice(chars, width)) for _ in range(200)]
    md = rng.integers(0, width + 2, size=200).astype(np.int64)
    within, raise_invalid = kernels.within_dist_hex_fixed(a, b, width, md)
    assert not raise_invalid.any()
    for i in range(200):
        d = bin(int(a[i], 16) ^ int(b[i], 16)).count("1")
        expected = (a[i] == b[i]) or (md[i] > width) or (d <= md[i])
        assert bool(within[i]) == expected, (a[i], b[i], md[i], d)


# --- set_algo real dispatch (reference cc:294-344, h:606-629) ----------------


def test_set_algo_dispatches_distinct_kernels():
    """Each algo name runs its own popcount code path — asserted on the
    per-kernel invocation counters, so the differential loops above are
    genuinely differential (VERDICT r1 #5)."""
    a, b = b"\xab\x00\xff" * 32, b"\x0c\x11\xf0" * 32
    for algorithm in ("classic", "native", "sse41", "extra"):
        assert set_algo(algorithm) == ""
        before = kernels.KERNEL_CALLS[algorithm]
        assert hamming_distance_bytes(a, b) == 352
        assert kernels.KERNEL_CALLS[algorithm] > before
    assert set_algo("extra") == ""


def test_set_algo_string_path_rebinds_too():
    """The hex-string kernel rebinds with set_algo as well (the reference
    rebinds ptr__hamming_distance_string in the same USE__* macros)."""
    for algorithm in ("classic", "native", "sse41", "extra"):
        assert set_algo(algorithm) == ""
        before = kernels.KERNEL_CALLS[algorithm]
        assert hamming_distance_string("abc123", "123abc") == 18
        assert hamming_distance_string("f" * 33, "0" * 33) == 132  # odd width
        assert kernels.KERNEL_CALLS[algorithm] > before
    assert set_algo("extra") == ""


def test_set_algo_unknown_algo_reference_text():
    assert set_algo("turbo") == "Library was built without this algorithm."
    assert set_algo(3) == "error occurred while parsing arguments"


def test_set_algo_cpu_unsupported_reference_text(monkeypatch):
    """cpu_not_support_msg parity (cc:17,479): capability-gated algos report
    the reference's exact message format when the CPU mask lacks their bit."""
    from hexspark import compat

    caps = 1 << 19  # SSE41 only
    monkeypatch.setattr(compat, "_cpu_capabilities", lambda: caps)
    expected = "CPU doesnt support this feature. {%X}" % caps
    assert compat.set_algo("extra") == expected
    assert compat.set_algo("native") == expected
    assert compat.set_algo("sse41") == ""
    assert compat.set_algo("classic") == ""
    assert compat.set_algo("extra" if False else "classic") == ""
    monkeypatch.undo()
    assert set_algo("extra") == ""


def test_all_algos_agree_with_int_oracle():
    rng = np.random.default_rng(23)
    for width in (1, 2, 7, 16, 32, 33):
        a = [rng.bytes(width) for _ in range(32)]
        b = [rng.bytes(width) for _ in range(32)]
        expected = [
            bin(int.from_bytes(x, "big") ^ int.from_bytes(y, "big")).count("1")
            for x, y in zip(a, b)
        ]
        for algorithm in ("classic", "native", "sse41", "extra"):
            assert set_algo(algorithm) == ""
            dist = kernels.hamming_bytes_fixed(a, b, width)
            assert [int(d) for d in dist] == expected, (algorithm, width)
    assert set_algo("extra") == ""
