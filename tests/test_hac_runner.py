"""Runner(clustering_mode="hac") — average-linkage refinement as a
production clusters stage. On the glued-entity fixture (two triangle
entities + one false bridge edge at dist ~59), HAC prices the cross-entity
merge at mean(59, missing...) >> threshold and refuses — splitting the
glued cluster by PRICE where robust mode splits it by STRUCTURE."""

from __future__ import annotations

from datetime import datetime

import pytest

from hexspark.pipeline.runner import PipelineConfig, Runner
from tests.test_robust_runner import CFG, TEXTS, _transcripts


@pytest.fixture(scope="module")
def glued(spark):
    return _transcripts(spark, TEXTS, datetime(2024, 1, 1))


def _clusters(result):
    rows = result.tables["clusters"].collect()
    out: dict[str, set[str]] = {}
    for r in rows:
        out.setdefault(r["cluster_id"], set()).add(r["conv_id"])
    return out


def test_hac_mode_splits_the_glued_entity(spark, glued, tmp_path):
    wd_cc = str(tmp_path / "cc")
    wd_hac = str(tmp_path / "hac")
    res_cc = Runner(spark, wd_cc, PipelineConfig(**CFG)).run(glued)
    res_hac = Runner(
        spark, wd_hac, PipelineConfig(**CFG, clustering_mode="hac")
    ).run(glued)
    assert max(len(m) for m in _clusters(res_cc).values()) == 6  # CC glues
    hac = _clusters(res_hac)
    # average linkage prices {a*} x {b*} at mean(59, 2x60 missing) > 60
    # and refuses: the two true entities come back as separate clusters
    assert {frozenset(m) for m in hac.values()} == {
        frozenset({"a1", "a2", "a3"}),
        frozenset({"b1", "b2", "b3"}),
    }
    # min-member canonical ids (B9 invariant holds in hac mode)
    for cid, members in hac.items():
        assert cid == min(members)


def test_hac_mode_perfect_on_clean_corpus(spark, tmp_path):
    from hexspark import fixtures
    from hexspark.pipeline import evaluate

    tr = fixtures.transcripts_df(spark, n_base=150, seed=11, mutation_rate=0.01)
    res = Runner(
        spark,
        str(tmp_path / "clean"),
        PipelineConfig(max_dist=40, clustering_mode="hac"),
    ).run(tr)
    labels = fixtures.labeled_pairs_df(spark, tr)
    m = evaluate.pairwise_f1(labels, res.tables["clusters"])
    assert m["f1"] == 1.0, m


def test_hac_mode_refuses_incremental_and_composes(spark, glued, tmp_path):
    wd = str(tmp_path / "inc")
    runner = Runner(spark, wd, PipelineConfig(**CFG, clustering_mode="hac"))
    runner.run(glued)
    batch = _transcripts(spark, {"z1": "zeta " * 30}, datetime(2024, 1, 2))
    with pytest.raises(ValueError, match="not monotone"):
        runner.run_incremental(batch)
    with pytest.raises(ValueError, match="one precision lever"):
        Runner(
            spark,
            str(tmp_path / "x"),
            PipelineConfig(clustering_mode="hac", robust=True),
        )
