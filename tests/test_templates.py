"""Template mining + boilerplate scoring (pipeline/templates.py): mined
templates and per-conversation ratios must equal a pure-Python replay,
respect the distinct-conversation df gate, scope digests by role, and
score against a fixed external template registry."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hexspark.pipeline.templates import boilerplate_ratio, turn_templates

GREET = "hello how can i help you today"
LEGAL = "this conversation may be recorded"


def _tr(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, role string, text string")


def _corpus():
    rows = []
    for i in range(12):
        cid = f"c{i:02d}"
        rows.append((cid, "assistant", GREET))
        if i < 5:
            rows.append((cid, "system", LEGAL))
        rows.append((cid, "user", f"unique question number {i}"))
        rows.append((cid, "assistant", f"unique answer {i} with words"))
    return rows


def test_templates_mined_with_df_gate(spark):
    tr = _tr(spark, _corpus())
    t5 = {r.sample_text: r.df for r in turn_templates(tr, min_df=5).collect()}
    assert t5 == {GREET: 12, LEGAL: 5}
    t6 = {r.sample_text for r in turn_templates(tr, min_df=6).collect()}
    assert t6 == {GREET}
    # unique turns never qualify
    assert not any("unique" in s for s in t5)


def test_df_counts_conversations_not_occurrences(spark):
    rows = [("c1", "assistant", GREET)] * 5 + [("c2", "assistant", GREET)]
    tr = _tr(spark, rows)
    out = turn_templates(tr, min_df=2).collect()
    assert len(out) == 1
    assert out[0].df == 2 and out[0].n_occurrences == 6


def test_role_scopes_the_digest(spark):
    rows = [(f"a{i}", "user", GREET) for i in range(3)]
    rows += [(f"b{i}", "assistant", GREET) for i in range(2)]
    tr = _tr(spark, rows)
    got = {(r.role, r.df) for r in turn_templates(tr, min_df=2).collect()}
    assert got == {("user", 3), ("assistant", 2)}


def test_boilerplate_ratio_matches_replay(spark):
    tr = _tr(spark, _corpus())
    out = {r.conv_id: r for r in boilerplate_ratio(tr, min_df=5).collect()}
    for i in range(12):
        cid = f"c{i:02d}"
        r = out[cid]
        tpl_chars = len(GREET) + (len(LEGAL) if i < 5 else 0)
        uniq = len(f"unique question number {i}") + len(f"unique answer {i} with words")
        assert r.n_turns == (4 if i < 5 else 3)
        assert r.n_template_turns == (2 if i < 5 else 1)
        assert r.n_template_chars == tpl_chars
        assert r.template_char_frac == pytest.approx(
            tpl_chars / (tpl_chars + uniq)
        )


def test_fixed_registry_and_empty_text(spark):
    rows = [("x1", "assistant", GREET), ("x1", "user", "hi"), ("x2", "user", None)]
    tr = _tr(spark, rows)
    registry = turn_templates(_tr(spark, _corpus()), min_df=5)
    out = {r.conv_id: r for r in boilerplate_ratio(tr, templates=registry).collect()}
    assert out["x1"].n_template_turns == 1
    assert out["x1"].template_char_frac == pytest.approx(
        len(GREET) / (len(GREET) + 2)
    )
    # NULL-text conversation: zero chars -> frac 0.0, not NaN
    assert out["x2"].n_chars == 0 and out["x2"].template_char_frac == 0.0


def test_min_df_validation(spark):
    with pytest.raises(ValueError, match="min_df"):
        turn_templates(_tr(spark, _corpus()), min_df=1)
