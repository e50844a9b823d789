"""Phonetic (Soundex) blocking pass: key semantics vs a pure-Python
Soundex reference, sound-alike recall, hot-block cap, multi-pass union
provenance, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hexspark.pipeline import blocking


def _py_soundex(word: str) -> str:
    """Classic US-Census Soundex (the algorithm Spark's builtin codes):
    keep first letter; map consonants to digits; collapse ADJACENT equal
    codes (h/w are transparent between them, vowels break runs); drop
    vowels/h/w/y; pad/truncate to 4."""
    codes = {}
    for letters, d in (
        ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
        ("l", "4"), ("mn", "5"), ("r", "6"),
    ):
        for ch in letters:
            codes[ch] = d
    w = word.lower()
    first = w[0].upper()
    out = [first]
    prev = codes.get(w[0], "")
    for ch in w[1:]:
        code = codes.get(ch, "")
        if code and code != prev:
            out.append(code)
        if ch not in "hw":  # h/w transparent: keep prev through them
            prev = code
        if len(out) == 4:
            break
    return "".join(out).ljust(4, "0")


NAMES = [
    ("n1", "Robert Smith"),
    ("n2", "Rupert Smyth"),       # both tokens sound-alike with n1
    ("n3", "robert smith"),       # exact (case)
    ("n4", "Jennifer Lopez"),
    ("n5", "Tymczak Ashcraft"),   # classic soundex edge names
    ("n6", "Wei Zhang"),
]


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(NAMES, "rec_id string, name string")


def test_keys_match_python_soundex_reference(spark):
    words = ["robert", "rupert", "smith", "smyth", "tymczak", "ashcraft",
             "pfister", "jackson", "honeyman", "wei", "zhang", "lopez"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["sx"] for r in df.select("w", F.soundex("w").alias("sx")).collect()}
    for w in words:
        assert got[w] == _py_soundex(w), (w, got[w], _py_soundex(w))
    # the sound-alike pins the blocker relies on
    assert got["robert"] == got["rupert"] == "R163"
    assert got["smith"] == got["smyth"] == "S530"


def test_pairs_block_soundalikes_not_strangers(names_df):
    pairs = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in blocking.phonetic_pairs(names_df, "rec_id", "name").collect()
    }
    assert ("n1", "n2") in pairs  # Robert Smith ~ Rupert Smyth
    assert ("n1", "n3") in pairs  # exact
    assert not any("n4" in p or "n6" in p for p in pairs)


def test_null_and_nonalpha_rows_produce_no_pairs(spark):
    df = spark.createDataFrame(
        [("x1", "12345 !!"), ("x2", ""), ("x3", "Smith")],
        "rec_id string, name string",
    )
    keyed = blocking.phonetic_keys(df, "rec_id", "name")
    assert {r["rec_id"] for r in keyed.collect()} == {"x3"}
    assert blocking.phonetic_pairs(df, "rec_id", "name").count() == 0


def test_hot_block_cap_drops_monster_key(spark):
    rows = [(f"h{i}", "Smith Smith") for i in range(12)] + [
        ("g1", "Lopez Garcia"), ("g2", "Lopez Garcia")
    ]
    df = spark.createDataFrame(rows, "rec_id string, name string")
    capped = blocking.phonetic_pairs(df, "rec_id", "name", max_block_size=10)
    pairs = {(r["conv_id_a"], r["conv_id_b"]) for r in capped.collect()}
    assert pairs == {("g1", "g2")}  # the 12-row Smith block is dropped
    uncapped = blocking.phonetic_pairs(df, "rec_id", "name", max_block_size=None)
    assert uncapped.count() == 12 * 11 // 2 + 1


def test_union_with_other_pass_carries_provenance(spark, names_df):
    phon = blocking.phonetic_pairs(names_df, "rec_id", "name")
    other = spark.createDataFrame(
        [("n1", "n2"), ("n4", "n6")], "conv_id_a string, conv_id_b string"
    )
    u = blocking.union_candidates({"phonetic": phon, "other": other})
    rows = {(r["conv_id_a"], r["conv_id_b"]): r["passes"] for r in u.collect()}
    assert rows[("n1", "n2")] == ["other", "phonetic"]
    assert rows[("n4", "n6")] == ["other"]
    assert rows[("n1", "n3")] == ["phonetic"]


def test_plan_equijoin_no_python(names_df):
    pairs = blocking.phonetic_pairs(names_df, "rec_id", "name")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
