"""edge_confidence stage: the Runner materializes bootstrap merge
confidence when stability_samples is set, the bridge edge of the glued
fixture scores strictly below the intra-entity edges, the stage lands in
lineage, and a resumed run skips it."""

from __future__ import annotations

from datetime import datetime

import pytest

from hexspark.pipeline.runner import PipelineConfig, Runner
from tests.test_robust_runner import TEXTS, _transcripts

# constants picked for a clean deterministic bridge-vs-triangle gap on
# this fixture (masks are content-hashed, so the counts are exact and
# stable): per replicate a triangle edge co-clusters w.p.
# keep + (1-keep)*keep^2 = 0.890 vs the bridge's bare keep = 0.75
CFG = dict(max_dist=60, n_bands=32, stability_samples=16,
           stability_keep_frac=0.75, stability_seed=5)


@pytest.fixture(scope="module")
def stab_run(spark, tmp_path_factory):
    glued = _transcripts(spark, TEXTS, datetime(2024, 1, 1))
    wd = str(tmp_path_factory.mktemp("stability_run"))
    runner = Runner(spark, wd, PipelineConfig(**CFG))
    res = runner.run(glued)
    return wd, runner, res, glued


def test_edge_confidence_table_and_bridge_gap(stab_run):
    _, _, res, _ = stab_run
    conf = {
        (min(r.conv_id_a, r.conv_id_b), max(r.conv_id_a, r.conv_id_b)): r.n_cocluster
        for r in res.tables["edge_confidence"].collect()
    }
    bridge = conf.pop(("a3", "b1"))
    assert conf, "expected intra-entity edges besides the bridge"
    # every remaining edge is inside a true triangle: co-clusters whenever
    # any 2 of its 3 edges survive; the lone bridge only when itself drawn
    assert bridge < min(conf.values())
    assert max(conf.values()) <= 16


def test_stage_in_lineage_and_resume_skips(stab_run, spark):
    wd, _, res, glued = stab_run
    assert "edge_confidence" in res.stages_run
    rerun = Runner(spark, wd, PipelineConfig(**CFG)).run(glued)
    assert "edge_confidence" in rerun.stages_skipped


def test_off_by_default(spark, tmp_path):
    glued = _transcripts(spark, TEXTS, datetime(2024, 1, 1))
    res = Runner(spark, str(tmp_path), PipelineConfig(max_dist=60, n_bands=32)).run(glued)
    assert "edge_confidence" not in res.stages_run
    assert "edge_confidence" not in res.tables
