"""PPRL Bloom-encoding linkage: encoding parity vs a DuckDB SQL mirror,
planted-typo behavior, blocking recall, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import pprl

NAMES = [
    ("a1", "Robert Smith"),
    ("a2", "robert smyth"),   # typo twin of a1
    ("a3", "Jennifer Lopez"),
    ("a4", "JENNIFER LOPEZ!"),  # case/punct twin of a3 (canon-identical)
    ("a5", "Wei Zhang"),
    ("a6", "completely different person"),
    ("a7", "x"),               # 1-char edge: sentinels guarantee 2 grams
    ("a8", ""),                # empty edge: grams of "^$" only
]

# DuckDB mirror of bloom_positions: same padding, same 2-byte gram code,
# same ((a*code + b) % P) % M universal hashes. Pure portable SQL — the
# whole point of the mod-2^31 hash family is that no hugeint emulation is
# needed (cf. the splitmix CTE chain the SimHash oracle requires).
ENCODE_SQL = f"""
WITH padded AS (
  SELECT rec_id,
         '^' || regexp_replace(lower(name), '[^a-z0-9 ]', '', 'g') || '$' AS s
  FROM names
),
grams AS (
  SELECT rec_id,
         ascii(substr(s, i, 1))::BIGINT * 128
           + ascii(substr(s, i + 1, 1))::BIGINT AS code
  FROM padded, unnest(range(1, length(s)::BIGINT)) AS t(i)
),
hashes AS (
  SELECT rec_id,
         ((code * h.a + h.b) % {pprl.PRIME}) % {pprl.M_BITS} AS pos
  FROM grams,
       (VALUES {", ".join(f"({a}, {b})" for a, b in zip(pprl.HASH_A, pprl.HASH_B))})
         AS h(a, b)
)
SELECT DISTINCT rec_id, pos::INT AS pos FROM hashes
"""


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(NAMES, "rec_id string, name string")


@pytest.fixture(scope="module")
def encoded(names_df):
    return pprl.encode(names_df, "rec_id", "name").persist()


def test_encoding_matches_duckdb_mirror(encoded):
    got = {
        (r["rec_id"], p)
        for r in encoded.select("rec_id", "bloom_bits").collect()
        for p in r["bloom_bits"]
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE names(rec_id VARCHAR, name VARCHAR)")
    con.executemany("INSERT INTO names VALUES (?, ?)", NAMES)
    want = set(map(tuple, con.sql(ENCODE_SQL).fetchall()))
    assert got == want
    assert len(want) > 0


def test_bitmap_shape(encoded):
    rows = {r["rec_id"]: r for r in encoded.collect()}
    for r in rows.values():
        bits = r["bloom_bits"]
        assert bits == sorted(set(bits))
        assert all(0 <= p < pprl.M_BITS for p in bits)
        assert r["n_bits"] == len(bits)
    # empty string still encodes (the '^$' sentinel gram)
    assert rows["a8"]["n_bits"] >= 1
    # 1-char string: grams '^x' and 'x$'
    assert rows["a7"]["n_bits"] >= 2


def _dice_milli(bits_a, bits_b):
    common = len(set(bits_a) & set(bits_b))
    return 2000 * common // (len(bits_a) + len(bits_b))


def test_dice_separates_twins_from_strangers(encoded):
    rows = {r["rec_id"]: r["bloom_bits"] for r in encoded.collect()}
    assert _dice_milli(rows["a3"], rows["a4"]) == 1000  # canon-identical
    assert _dice_milli(rows["a1"], rows["a2"]) >= 700   # one typo
    assert _dice_milli(rows["a1"], rows["a3"]) < 500    # strangers
    assert _dice_milli(rows["a5"], rows["a6"]) < 500


def test_link_finds_planted_twins_one_table(names_df):
    got = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in pprl.link(names_df, None, "rec_id", "name", min_dice_milli=700).collect()
    }
    assert ("a1", "a2") in got
    assert ("a3", "a4") in got
    assert ("a1", "a3") not in got
    assert ("a5", "a6") not in got


def test_blocked_pairs_subset_of_bruteforce(spark, encoded):
    """Blocking must never invent pairs: every blocked pair with dice >= t
    must appear in the exhaustive all-pairs set at the same threshold, and
    the planted twins must survive blocking (recall on the fixture)."""
    rows = {r["rec_id"]: r["bloom_bits"] for r in encoded.collect()}
    brute = {
        (a, b)
        for a in rows
        for b in rows
        if a < b and _dice_milli(rows[a], rows[b]) * 1 >= 700
    }
    blocked = {
        (r["rec_id_a"], r["rec_id_b"])
        for r in pprl.dice_link(pprl.candidate_pairs(encoded), 700).collect()
    }
    assert blocked <= brute
    assert ("a1", "a2") in blocked and ("a3", "a4") in blocked


def test_two_table_mode_is_a_cross_quadrant(spark):
    a = spark.createDataFrame(
        [("p1", "maria garcia"), ("p2", "john doe")], "rec_id string, name string"
    )
    b = spark.createDataFrame(
        [("q1", "maria garcia"), ("q2", "unrelated entry")], "rec_id string, name string"
    )
    got = pprl.link(a, b, "rec_id", "name", min_dice_milli=900).collect()
    pairs = {(r["rec_id_a"], r["rec_id_b"]) for r in got}
    assert pairs == {("p1", "q1")}
    # integer-exact triple: identical strings share every bit
    (row,) = [r for r in got if r["rec_id_a"] == "p1"]
    assert row["common_bits"] == row["bits_a"] == row["bits_b"]


def test_plan_is_pure_catalyst_equijoin(names_df):
    linked = pprl.link(names_df, None, "rec_id", "name")
    plan = linked._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
