"""Monge-Elkan token comparator: exact-integer parity vs a DuckDB mirror,
reorder invariance, typo behavior, gate algebra, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import tokensim

PAIRS = [
    ("p1", "Robert Smith", "Smith, Robert"),        # pure reorder
    ("p2", "Robert Smith", "robert smyth"),          # one-token typo
    ("p3", "Jennifer Lopez", "completely other"),    # strangers
    ("p4", "Wei Zhang", "Wei Zhang"),                # identical
    ("p5", "solo", "multi token other side"),        # asymmetric sizes
    ("p6", "", "nonempty"),                          # empty side
    ("p7", "a1 b2!! c3", "A1 B2 c3"),                # punct/case canon
]

# DuckDB mirror: same tokenizer (lower, alnum->space, split, drop empties),
# same integer inner sim 1000 - (1000*levenshtein)//maxlen, same
# sum-of-best-per-token in each direction. Pure SQL over unnested tokens —
# the oracle can afford the explode formulation; the Spark side must not.
MIRROR_SQL = """
WITH lists_a AS (
  SELECT pair_id,
         list_filter(string_split(trim(regexp_replace(lower(a), '[^a-z0-9 ]', ' ', 'g')), ' '),
                     x -> length(x) > 0) AS ts
  FROM pairs
),
lists_b AS (
  SELECT pair_id,
         list_filter(string_split(trim(regexp_replace(lower(b), '[^a-z0-9 ]', ' ', 'g')), ' '),
                     x -> length(x) > 0) AS ts
  FROM pairs
),
toks_a AS (
  SELECT pair_id, ts[i::INT] AS tok, i
  FROM lists_a, unnest(range(1, len(ts) + 1)) AS t(i)
),
toks_b AS (
  SELECT pair_id, ts[i::INT] AS tok, i
  FROM lists_b, unnest(range(1, len(ts) + 1)) AS t(i)
),
best_ab AS (
  SELECT ta.pair_id, ta.i,
         max(1000 - (1000 * levenshtein(ta.tok, tb.tok))
                     // greatest(length(ta.tok), length(tb.tok))) AS best
  FROM toks_a ta JOIN toks_b tb USING (pair_id)
  GROUP BY ta.pair_id, ta.i
),
best_ba AS (
  SELECT tb.pair_id, tb.i,
         max(1000 - (1000 * levenshtein(tb.tok, ta.tok))
                     // greatest(length(ta.tok), length(tb.tok))) AS best
  FROM toks_b tb JOIN toks_a ta USING (pair_id)
  GROUP BY tb.pair_id, tb.i
),
na AS (SELECT pair_id, count(*) AS n_a FROM toks_a GROUP BY pair_id),
nb AS (SELECT pair_id, count(*) AS n_b FROM toks_b GROUP BY pair_id)
SELECT p.pair_id,
       coalesce((SELECT sum(best) FROM best_ab WHERE pair_id = p.pair_id), 0)::INT AS me_sum_ab,
       coalesce((SELECT n_a FROM na WHERE pair_id = p.pair_id), 0)::INT AS me_n_a,
       coalesce((SELECT sum(best) FROM best_ba WHERE pair_id = p.pair_id), 0)::INT AS me_sum_ba,
       coalesce((SELECT n_b FROM nb WHERE pair_id = p.pair_id), 0)::INT AS me_n_b
FROM pairs p
"""


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, "pair_id string, a string, b string")


@pytest.fixture(scope="module")
def scored(pairs_df):
    return tokensim.monge_elkan(pairs_df, "a", "b").persist()


def test_matches_duckdb_mirror(scored):
    got = {
        r["pair_id"]: (r["me_sum_ab"], r["me_n_a"], r["me_sum_ba"], r["me_n_b"])
        for r in scored.collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs(pair_id VARCHAR, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO pairs VALUES (?, ?, ?)", PAIRS)
    want = {t[0]: t[1:] for t in con.sql(MIRROR_SQL).fetchall()}
    assert got == want


def test_reorder_and_identity_score_1000(scored):
    rows = {r["pair_id"]: r for r in scored.collect()}
    for pid in ("p1", "p4", "p7"):
        r = rows[pid]
        assert r["me_sum_ab"] == 1000 * r["me_n_a"], pid
        assert r["me_sum_ba"] == 1000 * r["me_n_b"], pid


def test_typo_and_strangers(scored):
    rows = {r["pair_id"]: r for r in scored.collect()}
    typo = rows["p2"]
    # "robert" exact (1000) + "smith"~"smyth" (800): mean >= 850
    assert typo["me_sum_ab"] * 2 >= 1700 * typo["me_n_a"]
    stranger = rows["p3"]
    assert stranger["me_sum_ab"] < 600 * stranger["me_n_a"]


def test_empty_side_scores_zero(scored):
    r = {x["pair_id"]: x for x in scored.collect()}["p6"]
    assert (r["me_sum_ab"], r["me_n_a"]) == (0, 0)
    assert r["me_sum_ba"] == 0 and r["me_n_b"] == 1


def test_gate_keeps_reorders_drops_strangers(pairs_df):
    kept = {
        r["pair_id"]
        for r in tokensim.monge_elkan_gate(pairs_df, "a", "b", 850).collect()
    }
    assert {"p1", "p2", "p4", "p7"} <= kept
    assert "p3" not in kept and "p6" not in kept


def test_plan_is_narrow_no_python_no_exchange(pairs_df):
    out = tokensim.monge_elkan(pairs_df, "a", "b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # scoring adds no shuffle to the pair frame
    assert "Generate" not in plan  # no explode formulation
