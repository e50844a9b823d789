"""PassJoin edit-distance self-join: exactness vs a brute-force DP oracle
(completeness of the pigeonhole segment filter AND soundness of the
verification), short-string corner, and the no-cartesian plan shape."""

from __future__ import annotations

import random

import pytest

from hexspark.ops.editjoin import passjoin_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows: list[tuple[int, str]], tau: int) -> set[tuple[int, int, int]]:
    out = set()
    for x in range(len(rows)):
        for y in range(x + 1, len(rows)):
            ia, ta = rows[x]
            ib, tb = rows[y]
            if abs(len(ta) - len(tb)) > tau:
                continue
            d = _lev(ta, tb)
            if d <= tau:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, d))
    return out


def _corpus(seed: int, n: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    alpha = "abcd"
    rows = []
    for i in range(n):
        L = rng.randint(0, 22)
        rows.append((i, "".join(rng.choice(alpha) for _ in range(L))))
    # planted near-dups: mutate earlier strings with 1-3 edits
    for i in range(n, n + n // 2):
        base = list(rows[rng.randrange(n)][1])
        for _ in range(rng.randint(1, 3)):
            op = rng.choice("sid")
            if op == "s" and base:
                base[rng.randrange(len(base))] = rng.choice(alpha)
            elif op == "i":
                base.insert(rng.randint(0, len(base)), rng.choice(alpha))
            elif op == "d" and base:
                del base[rng.randrange(len(base))]
        rows.append((i, "".join(base)))
    return rows


@pytest.mark.parametrize("tau,seed", [(1, 7), (2, 11), (3, 13)])
def test_passjoin_matches_brute_force(spark, tau, seed):
    rows = _corpus(seed, 60)
    df = spark.createDataFrame(rows, "rid long, txt string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in passjoin_pairs(df, "rid", "txt", tau).collect()
    }
    assert got == _brute(rows, tau)


def test_passjoin_short_corner_and_empties(spark):
    # lengths 0..3 with tau=2: every pair routes through the short corner
    # or the boundary of the long path; includes the empty string.
    rows = [(0, ""), (1, "a"), (2, "ab"), (3, "abc"), (4, "abcd"), (5, "b"), (6, "ba")]
    df = spark.createDataFrame(rows, "rid long, txt string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in passjoin_pairs(df, "rid", "txt", 2).collect()
    }
    assert got == _brute(rows, 2)


def test_passjoin_long_path_has_no_cartesian(spark):
    rows = [(i, f"Customer#{i:09d}") for i in range(200)]
    df = spark.createDataFrame(rows, "rid long, txt string")
    out = passjoin_pairs(df, "rid", "txt", 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # candidate generation joins on the segment key, not all-pairs: the
    # uniform-format corpus still verifies (each name within dist 1 of the
    # ~len alternatives that differ in one digit)
    n = out.count()
    brute = len(_brute(rows, 1))
    assert n == brute


def test_hot_segment_cap_on_boilerplate_corpus(spark):
    # 16-char shared boilerplate + 8 distinguishing chars, tau=2 ->
    # segments 0/1 are corpus-wide hot, segment 2 spans the unique tail.
    import itertools

    tails = ["".join(t) for t in itertools.product("ab", repeat=4)][:14]
    rows = [(i, "BOILERPLATE-HDR." + t * 2) for i, t in enumerate(tails)]
    df = spark.createDataFrame(rows, "rid long, txt string")
    exact = {
        (r.id_a, r.id_b, r.dist)
        for r in passjoin_pairs(df, "rid", "txt", 2).collect()
    }
    assert exact == _brute(rows, 2)  # lossless without the cap
    capped = {
        (r.id_a, r.id_b, r.dist)
        for r in passjoin_pairs(df, "rid", "txt", 2, max_seg_df=4).collect()
    }
    assert capped <= exact  # the cap only prunes, never invents
    # pairs whose distinguishing tail segment is rare (equal tails never
    # happen here; dist-2 pairs share no tail segment key only when the
    # edit falls inside every matching window) -- at least the pairs kept
    # must all verify, and losses are exactly the hot-only-overlap pairs
    for (a, b, d) in exact - capped:
        assert d > 0  # only near-dup (not identical-segment) pairs may drop


def test_cap_guard(spark):
    df = spark.createDataFrame([(1, "abc")], "rid long, txt string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        passjoin_pairs(df, "rid", "txt", 2, max_seg_df=0)
