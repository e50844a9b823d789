"""Arrow-batched pandas-UDF Column functions — the engine's Spark surface
for the reference's scalar operators (SURVEY.md §2.1 A1-A3) plus the
fingerprint/similarity functions the ER pipeline needs.

Design rule (BASELINE.json input_hint): *no per-row Python*. Every UDF body
is numpy/pandas C-level vectorized over the whole Arrow batch; the only
Python-level loops are over fixed small dimensions (distinct row widths,
max-token-length, Jaro scan positions), never over rows.

Null/invalid policy: the reference raises ValueError per call
(python_hexhamming.cc:100-116). In a columnar engine, per-row raise would
poison whole batches, so the column functions return NULL for rows that the
reference would reject (length mismatch, invalid hex, null input) — callers
quarantine NULLs; ``hexspark.compat`` keeps the exact raising behavior for
scalar API parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, DoubleType, LongType

from . import kernels

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _by_width(series_a: pd.Series, series_b: pd.Series):
    """Yield (index_positions, list_a, list_b, width) groups of rows whose
    operands are same-width and non-null. Distinct widths per batch are few;
    this loop is over widths, not rows."""
    a = series_a
    b = series_b
    la = a.str.len()
    lb = b.str.len()
    ok = a.notna() & b.notna() & (la == lb)
    widths = la[ok].unique()
    for w in widths:
        mask = (ok & (la == w)).to_numpy()
        idx = np.flatnonzero(mask)
        yield idx, a.iloc[idx].tolist(), b.iloc[idx].tolist(), int(w)


# ---------------------------------------------------------------------------
# A1: hamming distance over hex strings
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def hamming_hex(a: pd.Series, b: pd.Series) -> pd.Series:
    """Column form of hamming_distance_string (cc:79-122): popcount of XOR of
    hex-decoded operands; NULL on length mismatch / invalid hex / null."""
    out = np.full(len(a), np.nan)
    for idx, la, lb, w in _by_width(a, b):
        dist, invalid = kernels.hamming_hex_fixed(la, lb, w)
        vals = dist.astype(np.float64)
        vals[invalid] = np.nan
        out[idx] = vals
    return pd.Series(out).astype("Int64")


# ---------------------------------------------------------------------------
# A2: hamming distance over binary fingerprints (the hot scoring kernel)
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def hamming_bytes(a: pd.Series, b: pd.Series) -> pd.Series:
    """Column form of hamming_distance_bytes (cc:133-166) on BinaryType."""
    la = a.str.len()
    lb = b.str.len()
    ok = a.notna() & b.notna() & (la == lb)
    out = np.full(len(a), np.nan)
    widths = la[ok].unique()
    for w in widths:
        mask = (ok & (la == w)).to_numpy()
        idx = np.flatnonzero(mask)
        dist = kernels.hamming_bytes_fixed(a.iloc[idx].tolist(), b.iloc[idx].tolist(), int(w))
        out[idx] = dist.astype(np.float64)
    return pd.Series(out).astype("Int64")


# ---------------------------------------------------------------------------
# A3: within-distance predicate (quirk-exact)
# ---------------------------------------------------------------------------


@F.pandas_udf(BooleanType())
def within_dist_hex(a: pd.Series, b: pd.Series, max_dist: pd.Series) -> pd.Series:
    """Column form of check_hexstrings_within_dist with quirks q1-q3
    (cc:177-234 + cc:31-68): equal-string shortcut, max_dist>len shortcut,
    dist<=max_dist otherwise. Reference-raising rows (negative max_dist,
    invalid hex seen before the early-exit point, length mismatch) → NULL."""
    out = np.full(len(a), None, dtype=object)
    md_all = max_dist.to_numpy()
    for idx, la, lb, w in _by_width(a, b):
        md = md_all[idx].astype(np.int64)
        neg = md < 0
        within, raise_invalid = kernels.within_dist_hex_fixed(la, lb, w, md)
        vals = np.where(raise_invalid | neg, None, within).astype(object)
        out[idx] = vals
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------------------
# SimHash fingerprint (pipeline stage B3)
# ---------------------------------------------------------------------------

def simhash256_series(text: pd.Series) -> np.ndarray:
    """(n, 32) uint8 SimHash signatures of a string series. The series is
    converted to one Arrow string array so tokenization + hashing run over
    the raw utf8 byte buffer (kernels.hash_tokens_utf8) — no per-row or
    per-token Python anywhere."""
    import pyarrow as pa

    from . import arrow_kernels as ak

    arr = pa.array(text.fillna(""), type=pa.string())
    offs, data = ak._offsets_and_data(arr)
    # normalize slice base so offsets are relative to data[offs[0]:]
    base = offs[0]
    return kernels.simhash256_from_utf8(data[base : offs[-1]], offs - base)


@F.pandas_udf(BinaryType())
def simhash256(text: pd.Series) -> pd.Series:
    """256-bit SimHash of the document text → 32-byte BinaryType signature.
    Width matches the reference's design fingerprint (README.rst:58: 64 hex
    chars = 256 bits)."""
    if len(text) == 0:
        return pd.Series([], dtype=object)
    sigs = simhash256_series(text)
    return pd.Series([r.tobytes() for r in sigs])


# ---------------------------------------------------------------------------
# Jaro-Winkler similarity (pipeline stage B6's secondary signal)
# ---------------------------------------------------------------------------

_JW_MAXLEN = 64
_JW_PREFIX_SCALE = 0.1
_JW_MAX_PREFIX = 4
_JW_BOOST_THRESHOLD = 0.7  # Winkler's original boost condition: jaro > 0.7
_BIG = np.int64(1 << 30)


_CTZ_DEBRUIJN = np.uint64(0x03F79D71B4CB0A89)
_CTZ_TABLE = np.zeros(64, dtype=np.int64)
with np.errstate(over="ignore"):
    for _k in range(64):
        _CTZ_TABLE[int(((np.uint64(1) << np.uint64(_k)) * _CTZ_DEBRUIJN) >> np.uint64(58))] = _k


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros of nonzero uint64 via de Bruijn."""
    with np.errstate(over="ignore"):
        low = x & (~x + np.uint64(1))
        return _CTZ_TABLE[((low * _CTZ_DEBRUIJN) >> np.uint64(58)).astype(np.int64)]


def _jw_core(MA: np.ndarray, MB: np.ndarray) -> np.ndarray:
    """Jaro-Winkler over aligned (n, L) integer code matrices (0 = padding),
    L <= 64. Works for uint32 code points (pandas path) and uint8 ASCII
    (arrow path).

    The greedy match scan is bitmask-based: each row's b-side positions of
    every alphabet symbol are packed into one uint64 (bit j = position j),
    so per a-position the candidate set is (occ & window & ~used) — three
    u64 vector ops + a de Bruijn count-trailing-zeros for "first unused
    match in window" — instead of (n, L) boolean matrices. ~20x faster than
    the dense formulation at L=48.
    """
    n, L = MA.shape
    assert L <= 64
    if n == 0:
        return np.zeros(0)
    la = (MA != 0).sum(axis=1).astype(np.int64)
    lb = (MB != 0).sum(axis=1).astype(np.int64)
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    # compact alphabet: map codes to vocab indices (pad 0 stays index 0)
    vocab = np.unique(np.concatenate([MA.ravel(), MB.ravel()]))
    if MA.dtype == np.uint8:
        lut = np.zeros(256, dtype=np.int64)
        lut[vocab] = np.arange(len(vocab))
        Ai, Bi = lut[MA], lut[MB]
    else:
        Ai = np.searchsorted(vocab, MA)
        Bi = np.searchsorted(vocab, MB)
    V = len(vocab)

    rows = np.arange(n)
    bitpos = (np.uint64(1) << np.arange(L, dtype=np.uint64))
    occ = np.zeros((n, V), dtype=np.uint64)
    for j in range(L):  # loop over <=64 positions, vectorized over rows
        occ[rows, Bi[:, j]] |= bitpos[j]
    if vocab[0] == 0:
        occ[:, 0] = 0  # padding never matches

    # window masks per (win_value, i): bits [i-win, i+win] clipped to [0, L)
    win_vals = np.arange(L // 2 + 2, dtype=np.int64)
    lo = np.maximum(np.arange(L)[None, :] - win_vals[:, None], 0)
    hi = np.minimum(np.arange(L)[None, :] + win_vals[:, None], L - 1)
    with np.errstate(over="ignore"):
        full = np.uint64(0xFFFFFFFFFFFFFFFF)
        above = np.where(hi >= 63, full, (np.uint64(1) << (hi + 1).astype(np.uint64)) - np.uint64(1))
        win_table = above & ~((np.uint64(1) << lo.astype(np.uint64)) - np.uint64(1))

    used = np.zeros(n, dtype=np.uint64)
    match_j_t = np.full((L, n), -1, dtype=np.int32)  # (L, n): contiguous row writes
    AiT = np.ascontiguousarray(Ai.T)
    MAT = np.ascontiguousarray(MA.T)
    for i in range(L):
        ai = AiT[i]
        cand = occ[rows, ai] & win_table[win, i] & ~used
        cand = np.where(MAT[i] != 0, cand, np.uint64(0))
        hit = cand != 0
        with np.errstate(over="ignore"):
            low = cand & (~cand + np.uint64(1))
        j = _ctz64(cand)
        used |= np.where(hit, low, np.uint64(0))
        match_j_t[i] = np.where(hit, j.astype(np.int32), np.int32(-1))
    match_j = match_j_t.T

    matched_a = match_j >= 0
    m = matched_a.sum(axis=1).astype(np.int64)
    jpos = np.arange(L, dtype=np.int64)
    used_b = (used[:, None] & bitpos[None, :]) != 0

    # compact matched chars (a in a-order, b in b-order) by cumsum-scatter —
    # no argsort: positions come from the running match count per row
    def _compact(M, mask):
        out = np.zeros_like(M)
        k = np.cumsum(mask, axis=1, dtype=np.int32)
        r, c = np.nonzero(mask)
        out[r, k[r, c] - 1] = M[r, c]
        return out

    a_seq = _compact(MA, matched_a)
    b_seq = _compact(MB, used_b)
    rank = jpos[None, :]
    trans_mask = (rank < m[:, None]) & (a_seq != b_seq)
    # strcmp95 convention (shared by DuckDB/rapidfuzz): integer half
    t = (trans_mask.sum(axis=1) // 2).astype(np.float64)

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    both_empty = (la == 0) & (lb == 0)
    jaro = np.where(both_empty, 1.0, jaro)

    pref_eq = (MA[:, :_JW_MAX_PREFIX] == MB[:, :_JW_MAX_PREFIX]) & (MA[:, :_JW_MAX_PREFIX] != 0)
    prefix = np.cumprod(pref_eq, axis=1).sum(axis=1).astype(np.float64)
    jw = np.where(
        jaro > _JW_BOOST_THRESHOLD, jaro + prefix * _JW_PREFIX_SCALE * (1.0 - jaro), jaro
    )
    return jw


_JW_IMPL = None  # resolved lazily: "duckdb" (vectorized C++) or "numpy"
_DUCK_CON = None


def _resolve_jw_impl() -> str:
    global _JW_IMPL
    if _JW_IMPL is None:
        import os

        forced = os.environ.get("HEXSPARK_JW_IMPL")
        if forced:
            _JW_IMPL = forced
        else:
            try:
                import duckdb  # noqa: F401

                _JW_IMPL = "duckdb"
            except Exception:
                _JW_IMPL = "numpy"
    return _JW_IMPL


def _duck():
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect()
        # one thread per connection: parallelism comes from Spark's workers
        _DUCK_CON.execute("SET threads TO 1")
        # jw_arrow aligns output to input purely by row position — pin the
        # ordering guarantee explicitly rather than relying on the default
        # staying true for Arrow scans
        _DUCK_CON.execute("SET preserve_insertion_order=true")
    return _DUCK_CON


def jw_arrow(ca, cb) -> np.ndarray:
    """Jaro-Winkler over two Arrow string arrays → float64 numpy array.

    Kernel dispatch in the spirit of the reference's ``set_algo``
    (python_hexhamming.cc:294-344, runtime choice among equivalent kernels
    pinned equal by differential tests): the fast path hands the Arrow
    buffers to DuckDB's vectorized C++ ``jaro_winkler_similarity`` (~30x
    the numpy formulation, no per-row Python either way); the numpy
    ``_jw_core`` bitmask kernel is the fallback and the differential
    oracle. Both implement the strcmp95 convention with Winkler boost at
    jaro > 0.7. Override with HEXSPARK_JW_IMPL={duckdb,numpy}.
    """
    import pyarrow as pa

    if _resolve_jw_impl() == "duckdb":
        import pyarrow.compute as pc

        tbl = pa.table({"a": ca, "b": cb})
        con = _duck()
        con.register("_jw_in", tbl)
        out = con.execute(
            "SELECT jaro_winkler_similarity(a, b) AS jw FROM _jw_in"
        ).fetch_arrow_table()
        con.unregister("_jw_in")
        jw = out.column("jw").to_numpy(zero_copy_only=False).copy()
        # convention alignment: strcmp95/rapidfuzz define jw("","") = 1.0
        # (two empty strings are identical); DuckDB returns 0.0 there
        both_empty = (
            pc.and_(
                pc.equal(pc.utf8_length(ca), 0), pc.equal(pc.utf8_length(cb), 0)
            )
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        jw[both_empty] = 1.0
        return jw
    from . import arrow_kernels as ak

    MA = ak.ascii_padded_matrix(ca, _JW_MAXLEN)
    MB = ak.ascii_padded_matrix(cb, _JW_MAXLEN)
    return _jw_core(MA, MB)


def jaro_winkler_matrix(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Vectorized Jaro-Winkler over a batch of string pairs.

    strcmp95-convention Jaro (matches DuckDB/rapidfuzz): m matches within
    window max(|a|,|b|)//2-1 (greedy, each char used once, left-to-right),
    t = integer-half of the mismatches between the two matched-char
    sequences; jaro = (m/|a| + m/|b| + (m-t)/m)/3. Winkler boost:
    + l*p*(1-jaro) for common prefix l<=4, p=0.1, applied only when
    jaro > 0.7 (Winkler's original boost threshold).

    Strings are truncated to 64 chars (the pipeline scores canonical keys,
    not raw text). The position scan loops over <=64 fixed positions with
    all rows advanced in lockstep — no per-row Python.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0)
    A = a.fillna("").to_numpy().astype(f"U{_JW_MAXLEN}")
    B = b.fillna("").to_numpy().astype(f"U{_JW_MAXLEN}")
    MA = A.view(np.uint32).reshape(n, _JW_MAXLEN)
    MB = B.view(np.uint32).reshape(n, _JW_MAXLEN)
    return _jw_core(MA, MB)


@F.pandas_udf(DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(jaro_winkler_matrix(a, b))


# ---------------------------------------------------------------------------
# Catalyst-only helpers (no UDF — stay in whole-stage codegen)
# ---------------------------------------------------------------------------


def sig_hex(sig_col):
    """Canonical lowercase 64-hex-char form of a 32-byte signature
    (reference hex-string encoding rules, cc:52-53: case-insensitive input,
    we standardize on lowercase)."""
    return F.lower(F.hex(sig_col))


def valid_hex(col):
    """Vectorized ingest-time analogue of the reference's per-call hex
    validation (cc:112-116): JVM-side rlike, no UDF."""
    return col.rlike("^[0-9a-fA-F]*$")
