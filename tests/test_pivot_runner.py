"""Runner(clustering_mode="pivot") — pivot clustering as a production
clusters stage. Same glued-entity fixture as the robust-mode tests: two
triangle entities joined by one false edge. Default CC glues them; pivot
mode must bound every cluster by one node's direct match-neighborhood
(here <= 4 of the 6), recover clean corpora perfectly, refuse the
non-monotone incremental fold, and participate in the config drift guard.
"""

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


def test_pivot_mode_bounds_the_glued_entity(spark, glued, tmp_path):
    wd_cc = str(tmp_path / "cc")
    wd_piv = str(tmp_path / "piv")
    res_cc = Runner(spark, wd_cc, PipelineConfig(**CFG)).run(glued)
    res_piv = Runner(
        spark, wd_piv, PipelineConfig(**CFG, clustering_mode="pivot")
    ).run(glued)
    glued_cc = _clusters(res_cc)
    assert max(len(m) for m in glued_cc.values()) == 6  # CC glues all six
    piv = _clusters(res_piv)
    # every pivot cluster fits inside one node's closed neighborhood (<= 4
    # on this graph) and its id is one of its own members (the pivot)
    assert max(len(m) for m in piv.values()) <= 4
    assert len(piv) >= 2
    for cid, members in piv.items():
        assert cid in members
    # partition of the full corpus
    assert sorted(m for ms in piv.values() for m in ms) == sorted(TEXTS)


def test_pivot_mode_perfect_on_clean_corpus(spark, tmp_path):
    """Well-separated duplicate groups are cliques in the match graph; a
    clique is exactly one pivot's neighborhood, so pivot mode must match
    ground truth exactly there (F1 = 1.0)."""
    from hexspark import fixtures
    from hexspark.pipeline import evaluate

    tr = fixtures.transcripts_df(spark, n_base=150, seed=11, mutation_rate=0.01)
    wd = str(tmp_path / "clean")
    res = Runner(
        spark,
        wd,
        PipelineConfig(max_dist=40, clustering_mode="pivot", pivot_salt="x"),
    ).run(tr)
    labels = fixtures.labeled_pairs_df(spark, tr)
    m = evaluate.pairwise_f1(labels, res.tables["clusters"])
    assert m["f1"] == 1.0, m


def test_pivot_mode_refuses_incremental(spark, glued, tmp_path):
    wd = str(tmp_path / "inc")
    runner = Runner(spark, wd, PipelineConfig(**CFG, clustering_mode="pivot"))
    runner.run(glued)
    batch = _transcripts(spark, {"z1": "zeta " * 30}, datetime(2024, 1, 2))
    with pytest.raises(ValueError, match="not monotone"):
        runner.run_incremental(batch)


def test_pivot_mode_is_config_drift(spark, glued, tmp_path):
    wd = str(tmp_path / "drift")
    Runner(spark, wd, PipelineConfig(**CFG)).run(glued)
    with pytest.raises(ValueError, match="different pipeline config"):
        Runner(spark, wd, PipelineConfig(**CFG, clustering_mode="pivot")).run(glued)


def test_pivot_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="clustering_mode"):
        Runner(spark, str(tmp_path / "a"), PipelineConfig(clustering_mode="kmeans"))
    with pytest.raises(ValueError, match="one precision lever"):
        Runner(
            spark,
            str(tmp_path / "b"),
            PipelineConfig(clustering_mode="pivot", robust=True),
        )
    with pytest.raises(ValueError, match="one precision lever"):
        Runner(
            spark,
            str(tmp_path / "c"),
            PipelineConfig(clustering_mode="pivot", repair_min_avg=0.5),
        )
