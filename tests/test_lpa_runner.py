"""Runner(clustering_mode="lpa") — unseeded label propagation as a
production clusters stage. Same glued-entity fixture as the pivot/star/
robust tests: lpa must split the two dense entities along the sparse
bridge, recover clean corpora perfectly, refuse the non-monotone
incremental fold, and not compose with other precision levers."""

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


def test_lpa_mode_splits_the_glued_entity(spark, glued, tmp_path):
    wd = str(tmp_path / "lpa")
    res = Runner(
        spark, wd, PipelineConfig(**CFG, clustering_mode="lpa")
    ).run(glued)
    st = _clusters(res)
    # two dense triangle entities + one bridge edge: majority voting
    # starves the bridge, so no community holds all six and the result is
    # a total partition of the corpus
    assert max(len(m) for m in st.values()) <= 4
    assert len(st) >= 2
    assert sorted(m for ms in st.values() for m in ms) == sorted(TEXTS)


def test_lpa_mode_perfect_on_clean_corpus(spark, tmp_path):
    """Well-separated duplicate groups are cliques; within a clique every
    member's majority label converges to the clique minimum, so lpa mode
    must match ground truth exactly (F1 = 1.0)."""
    from hexspark import fixtures
    from hexspark.pipeline import evaluate

    tr = fixtures.transcripts_df(spark, n_base=150, seed=11, mutation_rate=0.01)
    wd = str(tmp_path / "clean")
    res = Runner(
        spark, wd, PipelineConfig(max_dist=40, clustering_mode="lpa")
    ).run(tr)
    labels = fixtures.labeled_pairs_df(spark, tr)
    m = evaluate.pairwise_f1(labels, res.tables["clusters"])
    assert m["f1"] == 1.0, m


def test_lpa_mode_refuses_incremental_and_compose(spark, glued, tmp_path):
    wd = str(tmp_path / "inc")
    runner = Runner(spark, wd, PipelineConfig(**CFG, clustering_mode="lpa"))
    runner.run(glued)
    batch = _transcripts(spark, {"z1": "zeta " * 30}, datetime(2024, 1, 2))
    with pytest.raises(ValueError, match="not monotone"):
        runner.run_incremental(batch)
    with pytest.raises(ValueError, match="one precision lever"):
        Runner(
            spark, str(tmp_path / "b"),
            PipelineConfig(clustering_mode="lpa", robust=True),
        )
    with pytest.raises(ValueError, match="clustering_mode"):
        Runner(spark, str(tmp_path / "c"), PipelineConfig(clustering_mode="nope"))
