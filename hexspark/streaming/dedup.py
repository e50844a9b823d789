"""In-stream exact deduplication with watermark-bounded state — the
streaming face of ops/dedup.exact_dedup_groups.

A 100-TB ingest sees the same record twice for boring reasons: at-least-
once upstream delivery, producer retries, replayed partitions. Dropping
repeats *in the stream* (instead of a nightly dedup over the sink) needs
per-key state, and unbounded `dropDuplicates` state is the classic
streaming OOM — every key ever seen, forever. Spark's
`dropDuplicatesWithinWatermark` bounds it: a key's state lives only until
the watermark passes its event time + delay, which matches the real
contract (duplicates arrive NEAR their original — a retry storm spans
minutes, not months). Keys re-appearing after the watermark window are
emitted again; that tail is the batch dedup's job, and the two compose:
stream dedup keeps the sink's duplicate rate near zero cheaply, the
nightly exact_dedup_groups pass is the exactness backstop.

State size: O(keys inside the watermark horizon) — input-rate bounded,
not history bounded. The exchange is one hash partition on the dedup key,
same as the batch groupBy. No Python in the hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

EVENT_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """First occurrence per key within the watermark horizon.

    Streaming input: `withWatermark(ts) -> dropDuplicatesWithinWatermark`
    (engine-managed, bounded state). Batch input: the earliest row per key
    by (ts, remaining payload) via min_by — a deterministic first-wins that
    matches the stream path's arrival-order winner on time-ordered batch
    data, so stream and batch outputs are comparable row-for-row in tests
    (plain dropDuplicates keeps an ARBITRARY row per key and can flip
    payloads between runs)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    import pyspark.sql.functions as F

    keys = list(key_cols)
    payload = [c for c in events.columns if c not in keys]
    # one hash exchange on the key — identical shuffle shape to
    # dropDuplicates, plus an order-free min_by combine instead of "any"
    order = F.struct(*[F.col(ts_col)] + [F.col(c) for c in payload if c != ts_col])
    row = events.groupBy(*keys).agg(
        F.min_by(F.struct(*payload), order).alias("_first")
    )
    return row.select(*keys, *[F.col(f"_first.{c}").alias(c) for c in payload]).select(
        *events.columns
    )


def stream_dedup_to_parquet(
    spark,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: Sequence[str] = ("event_id",),
    watermark_delay: str = "30 minutes",
):
    """availableNow drain: parquet file stream -> watermarked dedup ->
    append-mode parquet sink. Returns the started query; exactly-once end
    to end via the file-source + sink checkpoint."""
    stream = (
        spark.readStream.schema(EVENT_DDL).format("parquet").load(src_dir)
    )
    deduped = dedup_stream(stream, key_cols=key_cols, watermark_delay=watermark_delay)
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
