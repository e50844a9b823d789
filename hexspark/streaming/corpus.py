"""Ingest-time corpus hygiene: scrub + quality-gate document micro-batches
as they ARRIVE, so raw PII never lands in a stage table and junk never
accumulates — the streaming front half of pipeline/corpus.CorpusRunner.

Division of labor (why only stages 1-2 stream): the scrub and the
repetition gate are PER-DOCUMENT — batch-local application is exactly
corpus application, so streaming them is semantically free. Dedup,
LM training, drift, and mixture are CORPUS-WIDE — a per-batch decision
would depend on arrival order (a batch-local "unique" doc may duplicate
last week's) — so they stay in the periodic batch CorpusRunner run over
the accumulated `quality_stream` table, which this module keeps append-
only and immutable. That split is the standard production shape:
streaming hygiene at the edge, global passes on a schedule.

Exactly-once: the file source tracks consumed files in the stream
checkpoint; foreachBatch appends are made idempotent with the same
per-checkpoint epoch record ingest.py uses — a crash-replayed epoch
whose record says "done" is skipped, so the sink never double-appends.
(The epoch record is the simple variant: the append is the fold's ONLY
write, so record-present <=> append-committed is enforced by writing
the record strictly after the append.)

At 100 TB this is one stateless codegen projection + one doc-keyed
repetition aggregate per micro-batch — cost proportional to the batch,
no state store, restart from the checkpoint.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.pii import scrub_documents
from ..ops.quality import repetition_filter

DOC_DDL = "doc_id long, text string, lang string"


def _state_path(workdir: str) -> str:
    return os.path.join(workdir, "stream_hygiene_state.json")


def _load_state(workdir: str) -> dict:
    p = _state_path(workdir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_state(workdir: str, state: dict) -> None:
    os.makedirs(workdir, exist_ok=True)
    tmp = _state_path(workdir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(workdir))


def hygiene_batch(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict | None = None,
) -> DataFrame:
    """One batch through scrub + repetition gate: redacted text REPLACES
    the text column, PII totals ride along, repetition-failing docs drop.
    Works identically on a batch or (inside foreachBatch) a micro-batch —
    both stages are per-document, so batch-local ≡ corpus-wide."""
    passthrough = [c for c in docs.columns if c not in (id_col, text_col)]
    scrub = scrub_documents(docs, id_col, text_col).select(
        id_col, F.col("redacted_text").alias(text_col), "n_pii_total"
    )
    kept = docs.select(id_col, *passthrough).join(scrub, id_col)
    rep = repetition_filter(kept, id_col, text_col, thresholds)
    return kept.join(rep.where(F.col("keep")).select(id_col), id_col, "left_semi")


def hygiene_stream_to_parquet(
    spark: SparkSession,
    src_dir: str,
    workdir: str,
    checkpoint_key: str = "default",
    doc_ddl: str = DOC_DDL,
    thresholds: dict | None = None,
    available_now: bool = True,
):
    """readStream(parquet drop-dir) → per-batch hygiene → exactly-once
    append to <workdir>/quality_stream. Returns the StreamingQuery.

    The accumulated quality_stream table is the input for the periodic
    batch CorpusRunner run (dedup onward); it is append-only, so that
    run composes with incremental consumers the same way the ER stage
    tables do.
    """
    out_dir = os.path.join(workdir, "quality_stream")

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        state = _load_state(workdir)
        rec = state.get(checkpoint_key, {})
        if epoch_id <= rec.get("done_epoch", -1):
            return  # crash-replayed epoch already appended: skip
        cleaned = hygiene_batch(batch_df, thresholds=thresholds)
        cleaned.write.mode("append").parquet(out_dir)
        state[checkpoint_key] = {"done_epoch": epoch_id}
        _save_state(workdir, state)

    stream = spark.readStream.schema(doc_ddl).parquet(src_dir)
    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", os.path.join(workdir, "ckpt_" + checkpoint_key)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
