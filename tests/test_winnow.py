"""Winnowing fingerprints: pure-Python replay parity, the paper's
coverage guarantee (shared >= w+k-1 run -> shared fingerprint) on
randomized corpora, the noise threshold, DuckDB cross-engine oracle on
real testdata, match helper, plan pin, guards."""

from __future__ import annotations

import hashlib
import os
import re

import pytest

from hexspark.ops.winnow import fingerprint_matches, winnow_fingerprints

K, W = 5, 4


def _words(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def _replay(text, k=K, w=W):
    ws = _words(text)
    grams = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
    out = set()
    for s in range(len(hs) - w + 1):
        window = hs[s : s + w]
        mn = min(window)
        # rightmost minimal position (robust winnowing tie rule)
        pos = s + max(j for j, h in enumerate(window) if h == mn)
        out.add((pos, mn))
    return out


_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    (2, "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen"),
    (3, "alpha beta gamma delta"),          # k-1 tokens -> no grams
    (4, ""),                                 # empty
    (5, "red green blue cyan magenta yellow black white"),  # n_grams == w
]


@pytest.fixture(scope="module")
def fps(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    return {
        did: {(r["pos"], r["fp"]) for r in rows}
        for did, rows in __import__("itertools").groupby(
            sorted(
                winnow_fingerprints(docs, k=K, w=W).collect(),
                key=lambda r: r["doc_id"],
            ),
            key=lambda r: r["doc_id"],
        )
    }


def test_matches_python_replay(spark, fps):
    for did, text in _DOCS:
        want = _replay(text)
        got = fps.get(did, set())
        assert got == want, (did, got ^ want)
    assert 3 not in fps and 4 not in fps  # too short: no output rows
    assert len(fps[5]) >= 1               # exactly one window


def test_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: every planted shared run of
    w + k - 1 (= 8) tokens produces a shared fingerprint VALUE; docs
    with no shared k-gram share nothing."""
    import random

    rng = random.Random(17)
    vocab = [f"tok{i}" for i in range(500)]
    shared = [f"plag{i}" for i in range(W + K - 1)]  # 8-token passage

    def doc(n, plant):
        ws = [rng.choice(vocab) for _ in range(n)]
        if plant:
            at = rng.randrange(0, n - len(shared))
            ws[at : at + len(shared)] = shared
        return " ".join(ws)

    rows = [(i, doc(60, plant=i < 10)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(docs, k=K, w=W).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    planted = [by_doc[i] for i in range(10)]
    common = set.intersection(*planted)
    assert common, "every planted doc must share >= 1 fingerprint value"
    # the shared value really is the planted passage's gram hash
    plag_hashes = {
        int(
            hashlib.md5(" ".join(shared[i : i + K]).encode()).hexdigest()[:12], 16
        )
        for i in range(len(shared) - K + 1)
    }
    assert common & plag_hashes
    # unplanted docs (random 500-token vocab) share no gram with the
    # passage — their fingerprint sets must miss ALL planted-gram hashes
    for i in range(10, 20):
        assert not (by_doc[i] & plag_hashes)


def test_match_helper_finds_planted_pairs_only(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "intro words then the quick brown fox jumps over the lazy "
            "dog tonight again and an outro"),
        (3, "completely different vocabulary with no overlap at all "
            "whatsoever in any window"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(docs, k=K, w=W)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["n_shared_fps"]
        for r in fingerprint_matches(fp).collect()
    }
    assert set(got) == {(1, 2)} and got[(1, 2)] >= 1


def test_matches_duckdb_on_testdata(spark):
    """Cross-engine oracle on REAL testdata: the full selection —
    md5-derived gram hashes, window minima, rightmost tie rule,
    positions — replayed by DuckDB SQL over the same parquet."""
    import duckdb

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("testdata absent")
    docs = spark.read.parquet(path)
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(docs, k=K, w=W).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(f"""
            WITH raw AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents),
            gsrc AS (
              SELECT doc_id, ws, unnest(generate_series(1, len(ws) - {K} + 1)) AS i
              FROM raw WHERE len(ws) >= {K}),
            h AS (
              SELECT doc_id, i - 1 AS gi,
                     ('0x' || substr(md5(array_to_string(ws[i : i + {K} - 1], ' ')),
                                     1, 12))::BIGINT AS hv
              FROM gsrc),
            counts AS (SELECT doc_id, count(*) AS n FROM h GROUP BY 1),
            starts AS (
              SELECT doc_id, unnest(generate_series(0, n::INT - {W})) AS s
              FROM counts WHERE n >= {W}),
            cand AS (
              SELECT st.doc_id, st.s, h.gi, h.hv
              FROM starts st JOIN h USING (doc_id)
              WHERE h.gi BETWEEN st.s AND st.s + {W} - 1),
            m AS (SELECT doc_id, s, min(hv) AS fp FROM cand GROUP BY 1, 2),
            sel AS (
              SELECT c.doc_id, m.fp, max(c.gi) AS pos
              FROM cand c JOIN m USING (doc_id, s) WHERE c.hv = m.fp
              GROUP BY c.doc_id, m.fp, s)
            SELECT DISTINCT doc_id, pos, fp FROM sel
        """).fetchall()
    }
    assert got == want and len(got) > 500


def test_plan_no_python_no_cartesian(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    out = winnow_fingerprints(docs, k=K, w=W)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_guards(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="gram length"):
        winnow_fingerprints(docs, k=0)
    with pytest.raises(ValueError, match="window size"):
        winnow_fingerprints(docs, w=0)
