"""Runner(clustering_mode="star") — star clustering as a production
clusters stage. Same glued-entity fixture as the pivot/robust mode tests:
star mode must bound every cluster by one center's direct neighborhood,
put cluster ids on best-connected members, recover clean corpora
perfectly, and refuse the non-monotone incremental fold."""

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


def test_star_mode_bounds_the_glued_entity(spark, glued, tmp_path):
    wd = str(tmp_path / "star")
    res = Runner(
        spark, wd, PipelineConfig(**CFG, clustering_mode="star")
    ).run(glued)
    st = _clusters(res)
    # two triangle entities + one false bridge: no star cluster can hold
    # all six, each cluster id is a member (the center), and the result is
    # a partition of the corpus
    assert max(len(m) for m in st.values()) <= 4
    assert len(st) >= 2
    for cid, members in st.items():
        assert cid in members
    assert sorted(m for ms in st.values() for m in ms) == sorted(TEXTS)


def test_star_mode_perfect_on_clean_corpus(spark, tmp_path):
    """Well-separated duplicate groups are cliques in the match graph; a
    clique is one center's neighborhood, so star mode must match ground
    truth exactly (F1 = 1.0) — with no salt to choose, unlike pivot."""
    from hexspark import fixtures
    from hexspark.pipeline import evaluate

    tr = fixtures.transcripts_df(spark, n_base=150, seed=11, mutation_rate=0.01)
    wd = str(tmp_path / "clean")
    res = Runner(
        spark, wd, PipelineConfig(max_dist=40, clustering_mode="star")
    ).run(tr)
    labels = fixtures.labeled_pairs_df(spark, tr)
    m = evaluate.pairwise_f1(labels, res.tables["clusters"])
    assert m["f1"] == 1.0, m


def test_star_mode_refuses_incremental(spark, glued, tmp_path):
    wd = str(tmp_path / "inc")
    runner = Runner(spark, wd, PipelineConfig(**CFG, clustering_mode="star"))
    runner.run(glued)
    batch = _transcripts(spark, {"z1": "zeta " * 30}, datetime(2024, 1, 2))
    with pytest.raises(ValueError, match="not monotone"):
        runner.run_incremental(batch)


def test_star_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="one precision lever"):
        Runner(
            spark,
            str(tmp_path / "b"),
            PipelineConfig(clustering_mode="star", robust=True),
        )
    with pytest.raises(ValueError, match="one precision lever"):
        Runner(
            spark,
            str(tmp_path / "c"),
            PipelineConfig(clustering_mode="star", repair_min_avg=0.5),
        )
