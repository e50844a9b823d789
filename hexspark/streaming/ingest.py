"""Structured-Streaming ingest: fold transcript micro-batches into the
clustering continuously.

The north rule's pipeline is batch (Iceberg snapshots), and the incremental
path (pipeline/incremental.py) already gives daily-batch folds; this module
closes the gap to a live feed: a file-source stream of transcript parquet
files where each micro-batch is folded through the SAME Runner surface —
the first batch bootstraps the full pipeline, every later batch runs the
incremental merge. No separate streaming engine semantics to validate: a
fold is exactly `Runner.run` / `Runner.run_incremental`, so the
batch-equivalence contract pinned by tests/test_incremental.py carries
over verbatim.

Exactly-once: the file source tracks consumed files in the stream
checkpoint, and foreachBatch replays after a crash are made idempotent by
recording the last folded epoch per stream-id in the workdir (the standard
idempotent-foreachBatch pattern) — a replayed epoch is skipped instead of
tripping the runner's batch-overlap guard.

At scale this is the right shape: each micro-batch pays cost proportional
to the batch (incremental blocking never generates the old-old quadrant),
state lives in the stage tables (Iceberg/parquet), not executor memory,
and the stream survives restarts from its checkpoint.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.runner import PipelineConfig, Runner

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _fold_state_path(workdir: str) -> str:
    return os.path.join(workdir, "stream_fold_state.json")


def _load_fold_state(workdir: str) -> dict:
    p = _fold_state_path(workdir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_fold_state(workdir: str, state: dict) -> None:
    os.makedirs(workdir, exist_ok=True)
    tmp = _fold_state_path(workdir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _fold_state_path(workdir))


def _has_completed_run(workdir: str) -> bool:
    p = os.path.join(workdir, "run_manifest.json")
    if not os.path.exists(p):
        return False
    with open(p) as f:
        m = json.load(f)
    return bool(m.get("completed", {}).get("clusters"))


def make_fold_batch(runner: Runner):
    """foreachBatch callback folding one micro-batch of transcripts into
    the runner's workdir. Split out for direct unit testing."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        workdir = runner.workdir
        state = _load_fold_state(workdir)
        last = state.get("last_epoch", -1)
        if epoch_id <= last:
            return  # crash-replayed epoch: already folded, skip
        if not batch_df.isEmpty():
            if _has_completed_run(workdir):
                runner.run_incremental(batch_df)
            else:
                runner.run(batch_df)
        state["last_epoch"] = epoch_id
        _save_fold_state(workdir, state)

    return fold


def fold_transcript_stream(
    spark: SparkSession,
    source_dir: str,
    workdir: str,
    config: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Start the fold stream over a directory of transcript parquet files.

    available_now=True drains everything currently available and stops
    (the batch-ingest / test mode); False runs continuously. Returns the
    StreamingQuery — callers awaitTermination().
    """
    runner = Runner(spark, workdir, config)
    reader = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    writer = (
        reader.writeStream.foreachBatch(make_fold_batch(runner))
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(workdir, "_stream_checkpoint"),
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
