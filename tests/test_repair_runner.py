"""Repair pipeline mode (PipelineConfig.repair_min_avg) — the post-hoc
precision pass complementing robust mode.

Fixture: two true entities {a1,a2,a3} (alpha vocab) and {b1,b2,b3} (beta
vocab, fully disjoint) plus ONE junk conversation g = 28 alpha + 20 beta
tokens. g sits ~83-89 SimHash bits from both entities (under the
max_dist=92 gate) while every direct a×b pair is ~128 bits apart — so g is
a pure glue NODE: default transitive closure wires all 7 conversations
into one cluster exclusively through g's edges. Adversarial detail: g
shares a 28-token prefix with the a-side, so Jaro-Winkler on the canon is
a perfect 1.0 for g-a pairs — the score blend alone cannot reject them;
only g's within-cluster average (~0.70, vs >= 0.82 for every true member,
measured) exposes it. repair_min_avg=0.8 must evict exactly g and split
the glued cluster into the two true entities.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from hexspark.pipeline.runner import PipelineConfig, Runner

A = [f"alpha{i}" for i in range(48)]
B = [f"beta{i}" for i in range(48)]


def _txt(toks):
    return " ".join(toks)


def _mut(toks, n, tag):
    return toks[:-n] + [f"{tag}{i}" for i in range(n)]


TEXTS = {
    "a1": _txt(A),
    "a2": _txt(_mut(A, 2, "am")),
    "a3": _txt(_mut(A, 3, "an")),
    "b1": _txt(B),
    "b2": _txt(_mut(B, 2, "bm")),
    "b3": _txt(_mut(B, 3, "bn")),
    "g": _txt(A[:28] + B[28:48]),
}

CFG = dict(max_dist=92, n_bands=64)


def _transcripts(spark, texts, ts):
    rows = [(k, 1, "user", v, "", ts) for k, v in texts.items()]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


@pytest.fixture(scope="module")
def glued(spark):
    return _transcripts(spark, TEXTS, datetime(2024, 1, 1))


@pytest.fixture(scope="module")
def runs(spark, glued, tmp_path_factory):
    wd_default = str(tmp_path_factory.mktemp("repair_default"))
    wd_repair = str(tmp_path_factory.mktemp("repair_on"))
    r_default = Runner(spark, wd_default, PipelineConfig(**CFG))
    r_repair = Runner(spark, wd_repair, PipelineConfig(**CFG, repair_min_avg=0.8))
    return (
        (r_default, r_default.run(glued)),
        (r_repair, r_repair.run(glued)),
    )


def _clusters(result, table="clusters"):
    return {r["conv_id"]: r["cluster_id"] for r in result.tables[table].collect()}


def test_fixture_g_is_the_only_bridge(runs):
    (_, res_default), _ = runs
    edges = sorted(
        (r["conv_id_a"], r["conv_id_b"]) for r in res_default.tables["edges"].collect()
    )
    cross = [(x, y) for x, y in edges if x[0] != y[0] and "g" not in (x[0], y[0])]
    assert cross == [], f"direct a-b edges would break the glue-node shape: {cross}"
    assert any("g" in (x, y) and (x[0] == "a" or y[0] == "a") for x, y in edges)
    assert any("g" in (x, y) and (x[0] == "b" or y[0] == "b") for x, y in edges)


def test_default_mode_glues_through_g(runs):
    (_, res_default), _ = runs
    cl = _clusters(res_default)
    assert len(set(cl.values())) == 1


def test_repair_mode_evicts_g_and_splits(runs):
    _, (r_repair, res_repair) = runs
    # raw closure still glued — repair happens after, not by re-gating
    raw = _clusters(res_repair, "clusters_raw")
    assert len(set(raw.values())) == 1
    evicted = res_repair.tables["evicted_nodes"].collect()
    assert [r["conv_id"] for r in evicted] == ["g"]
    assert evicted[0]["avg_within"] < 0.8
    cl = _clusters(res_repair)
    assert cl["a1"] == cl["a2"] == cl["a3"]
    assert cl["b1"] == cl["b2"] == cl["b3"]
    assert cl["a1"] != cl["b1"]
    assert cl["g"] == "g"  # evicted -> singleton


def test_repair_stages_in_lineage_and_resume(spark, glued, runs):
    _, (r_repair, res_repair) = runs
    assert res_repair.stages_run == [
        "conversations", "signatures", "candidate_pairs", "edges",
        "clusters_raw", "evicted_nodes", "clusters",
    ]
    metrics_stages = {
        r["stage"]
        for r in r_repair.io.read("stage_metrics").select("stage").distinct().collect()
    }
    assert {"clusters_raw", "evicted_nodes", "clusters"} <= metrics_stages
    # resume skips everything, including both repair stages
    r2 = Runner(spark, r_repair.workdir, PipelineConfig(**CFG, repair_min_avg=0.8))
    res2 = r2.run(glued)
    assert res2.stages_run == []
    assert "evicted_nodes" in res2.stages_skipped and "clusters" in res2.stages_skipped


def test_repair_threshold_is_config_drift(spark, glued, runs):
    _, (r_repair, _) = runs
    with pytest.raises(ValueError, match="different pipeline config"):
        Runner(spark, r_repair.workdir, PipelineConfig(**CFG, repair_min_avg=0.9)).run(glued)


def test_incremental_refused_under_repair(spark, glued, tmp_path):
    wd = str(tmp_path / "repair_inc")
    cfg = PipelineConfig(**CFG, repair_min_avg=0.8)
    Runner(spark, wd, cfg).run(glued)
    newtr = _transcripts(spark, {"c9": _txt(_mut(A, 4, "cx"))}, datetime(2024, 1, 2))
    with pytest.raises(ValueError, match="not monotone"):
        Runner(spark, wd, cfg).run_incremental(newtr)
