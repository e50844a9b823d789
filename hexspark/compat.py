"""Drop-in scalar API with the reference's exact public surface + error
contract, backed by the vectorized numpy kernels.

The reference module exports exactly five callables
(hexhamming/python_hexhamming.cc:421-428):
``hamming_distance_string``, ``hamming_distance_bytes``,
``check_hexstrings_within_dist``, ``check_bytes_arrays_within_dist``,
``set_algo``. This module reproduces each — including every ValueError
message verbatim, argument-check ordering, and the documented quirks — so a
user of the reference can switch imports and run their existing code.

Error-contract anchors (all /root/reference/hexhamming/python_hexhamming.cc):
- "error occurred while parsing arguments"                    cc:88-93 et al.
- "strings are NOT the same length"                           cc:104-107
- "bytes are NOT the same length"                             cc:157-160
- "hex string contains invalid char"                          cc:112-116
- "`max_dist` must be >0"   (A3; 0 itself is accepted)        cc:207-210
- "`max_dist` must be >=0"  (A4; asymmetric message is spec)  cc:265-268
- "`elem_to_compare` size must be >0"                         cc:260-263
- "`array_of_elems` size must be multiplier of `elem_to_compare`"  cc:270-273
"""

from __future__ import annotations

import numpy as np

from . import kernels

_PARSE_ERR = "error occurred while parsing arguments"

# set_algo rebinds the actual popcount kernels (cc:294-344, USE__* macros
# h:606-629): 'classic' = nibble LOOKUP16 path, 'native' = byte-wide POPCNT8
# table (hardware-popcnt analogue), 'sse41' = 16-bit POPCNT16 table,
# 'extra' = uint64-view + POPCNT16 fast path (AVX2 analogue, the default).
# Each name resolves to a distinct code path in hexspark.kernels; the
# reference's CPU capability gate (cc:313-336) is mirrored with the same
# bit layout (h:69-72) and error text (cc:17,479).
_ALGO_CAPABILITY_BIT = {
    "extra": 1 << 5,  # bit_AVX2 (h:72)
    "native": 1 << 23,  # bit_POPCNT (h:70)
    "sse41": 1 << 19,  # bit_SSE41 (h:69)
    "classic": 0,  # always available (cc:338-340)
}


def _cpu_capabilities() -> int:
    """Capability mask in the reference's bit layout; numpy performs the
    hardware dispatch the reference does with cpuid, so all bits are set.
    Tests monkeypatch this to exercise the CPU-unsupported branch."""
    return kernels.CPU_CAPABILITIES


def set_algo(name: str) -> str:
    """Switch kernel implementation; returns '' on success, error text
    otherwise (cc:294-344). Unknown algo → the reference's built-without
    message (cc:342); capability-gated algo on an unsupporting CPU → the
    reference's cpu_not_support_msg format (cc:17,479)."""
    if not isinstance(name, str):
        return _PARSE_ERR
    if name not in _ALGO_CAPABILITY_BIT:
        return "Library was built without this algorithm."
    caps = _cpu_capabilities()
    bit = _ALGO_CAPABILITY_BIT[name]
    if (caps & bit) != bit:
        return "CPU doesnt support this feature. {%X}" % caps
    kernels.set_kernel_algo(name)
    return ""


def get_algo() -> str:
    """Currently bound kernel algo (introspection helper; no reference
    counterpart — the reference exposes state only via behavior)."""
    return kernels.get_kernel_algo()


def _require_str(x) -> None:
    if not isinstance(x, str):
        raise ValueError(_PARSE_ERR)


def _require_bytes(x) -> None:
    # PyArg_ParseTuple "s#" accepts str (utf-8) and bytes-like (cc:142)
    if not isinstance(x, (bytes, bytearray, memoryview, str)):
        raise ValueError(_PARSE_ERR)


def _as_bytes(x) -> bytes:
    return x.encode("utf-8") if isinstance(x, str) else bytes(x)


def hamming_distance_string(a: str, b: str) -> int:
    """Popcount of XOR of hex-decoded strings (cc:79-122).
    ≡ bin(int(a,16) ^ int(b,16)).count('1'); case-insensitive; ''/'' → 0."""
    _require_str(a)
    _require_str(b)
    if len(a) != len(b):
        raise ValueError("strings are NOT the same length")
    dist, invalid = kernels.hamming_hex_fixed([a], [b], len(a))
    if bool(invalid[0]):
        raise ValueError("hex string contains invalid char")
    return int(dist[0])


def hamming_distance_bytes(a: bytes, b: bytes) -> int:
    """Popcount of XOR of raw bytes (cc:133-166); no invalid-value concept."""
    _require_bytes(a)
    _require_bytes(b)
    ab, bb = _as_bytes(a), _as_bytes(b)
    if len(ab) != len(bb):
        raise ValueError("bytes are NOT the same length")
    return int(kernels.hamming_bytes_fixed([ab], [bb], len(ab))[0])


def check_hexstrings_within_dist(a: str, b: str, max_dist: int) -> bool:
    """True iff hamming(a, b) <= max_dist, with the reference's quirks
    (cc:177-234; scalar predicate cc:31-68). Check order is the spec:
    parse → length → max_dist sign → trivial-threshold shortcut → scan
    (equal-string shortcut, then per-char validate/accumulate/early-exit)."""
    _require_str(a)
    _require_str(b)
    if isinstance(max_dist, bool):
        max_dist = int(max_dist)  # PyArg "K" accepts bools as ints
    if not isinstance(max_dist, int):
        raise ValueError(_PARSE_ERR)
    if len(a) != len(b):
        raise ValueError("strings are NOT the same length")
    if max_dist < 0:
        raise ValueError("`max_dist` must be >0")
    if max_dist > len(a):
        return True  # q2: no validation on this path (cc:212-214)
    within, raise_invalid = kernels.within_dist_hex_fixed(
        [a], [b], len(a), np.array([max_dist], dtype=np.int64)
    )
    if bool(raise_invalid[0]):
        raise ValueError("hex string contains invalid char")
    return bool(within[0])


def check_bytes_arrays_within_dist(
    array_of_elems: bytes, elem_to_compare: bytes, max_dist: int
) -> int:
    """First index i in the packed array with dist(elem_i, probe) <= max_dist,
    else -1 (cc:246-284)."""
    _require_bytes(array_of_elems)
    _require_bytes(elem_to_compare)
    if not isinstance(max_dist, int):
        raise ValueError(_PARSE_ERR)
    big = _as_bytes(array_of_elems)
    probe = _as_bytes(elem_to_compare)
    if len(probe) == 0:
        raise ValueError("`elem_to_compare` size must be >0")
    if max_dist < 0:
        raise ValueError("`max_dist` must be >=0")
    if len(big) % len(probe) != 0:
        raise ValueError("`array_of_elems` size must be multiplier of `elem_to_compare`")
    return kernels.first_index_within_dist(big, probe, max_dist)
