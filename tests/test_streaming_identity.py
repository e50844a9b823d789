"""Persistent entity ids through the STREAM fold: because the stream folds
every micro-batch through the same Runner surface, turning on
persist_entity_ids must give live consumers a run-stable entity_id table —
ids minted at bootstrap survive later micro-batches, a mid-stream merge of
two prior entities keeps the bigger one's id and tombstones the other via
entity_retirements, and an empty drain leaves both tables untouched."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from hexspark.pipeline.runner import PipelineConfig
from hexspark.streaming import fold_transcript_stream
from tests.test_robust_runner import TEXTS, WITNESS, _transcripts

CFG = PipelineConfig(max_dist=60, n_bands=32, persist_entity_ids=True)


def _drain(spark, src, workdir):
    q = fold_transcript_stream(spark, src, workdir, config=CFG)
    q.awaitTermination()


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_identity")
    src = str(root / "incoming")
    workdir = str(root / "workdir")
    os.makedirs(src)

    # file 1: the two entities minus the bridge-leaning a3 -> bootstrap
    base = {k: v for k, v in TEXTS.items() if k != "a3"}
    _transcripts(spark, base, datetime(2024, 1, 1)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, workdir)
    ids1 = {
        r.conv_id: r.entity_id
        for r in spark.read.parquet(os.path.join(workdir, "entity_ids")).collect()
    }

    # file 2: a3 + the witness arrive and glue {a*} with {b*} -> fold
    _transcripts(
        spark, {"a3": TEXTS["a3"], "c1": WITNESS}, datetime(2024, 1, 2)
    ).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, workdir)
    ids2 = {
        r.conv_id: r.entity_id
        for r in spark.read.parquet(os.path.join(workdir, "entity_ids")).collect()
    }
    return src, workdir, ids1, ids2


def test_bootstrap_ids_survive_the_fold(spark, streamed):
    _, _, ids1, ids2 = streamed
    assert set(ids2) == set(ids1) | {"a3", "c1"}
    assert all(v.startswith("new:") for v in ids1.values())
    # every surviving id is a prior id (majority carry-over): the fold adds
    # conversations to existing entities, it never re-mints
    assert set(ids2.values()) <= set(ids1.values())


def test_midstream_merge_retires_loser(spark, streamed):
    _, workdir, ids1, ids2 = streamed
    glued = ids2["a3"]
    # the glue pulled members of both prior entities under ONE id
    prior_ids_in_glued = {
        ids1[k] for k, v in ids2.items() if v == glued and k in ids1
    }
    assert len(prior_ids_in_glued) == 2
    retired = {
        r.entity_id: r.absorbed_into
        for r in spark.read.parquet(
            os.path.join(workdir, "entity_retirements")
        ).collect()
    }
    live = set(ids2.values())
    loser = next(pid for pid in prior_ids_in_glued if pid != glued)
    assert glued in prior_ids_in_glued  # winner id is a carried prior id
    assert retired[loser] == glued
    assert loser not in live


def test_empty_drain_leaves_entity_tables_untouched(spark, streamed):
    src, workdir, _, ids2 = streamed
    mtime = os.path.getmtime(os.path.join(workdir, "entity_ids"))
    _drain(spark, src, workdir)
    assert os.path.getmtime(os.path.join(workdir, "entity_ids")) == mtime
    ids3 = {
        r.conv_id: r.entity_id
        for r in spark.read.parquet(os.path.join(workdir, "entity_ids")).collect()
    }
    assert ids3 == ids2
