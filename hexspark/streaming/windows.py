"""Watermarked windowed aggregation over the event stream — the native
Structured-Streaming idiom (state in the engine, bounded by the watermark),
complementing ingest.py's foreachBatch fold (state in stage tables).

Semantics contract (what the tests pin):

* `windowed_event_counts` on a STREAM with watermark `delay` produces, after
  the stream drains, exactly the rows a BATCH `groupBy(window(...))` over
  the same *retained* input produces — Structured Streaming's correctness
  promise for append-mode windowed aggregation. Late rows (event time older
  than `max(event_time seen) - delay` at the time their micro-batch runs)
  are dropped by the engine; everything else is exact.

* Append output mode: a window's row is emitted ONCE, when the watermark
  passes its end — so downstream sinks see immutable facts, the property a
  100-TB ingest needs for idempotent downstream consumption.

At scale this is the standard shape: per-(window, type) state is O(open
windows x group cardinality), the watermark bounds it (state for closed
windows is dropped), and the shuffle is the same single keyed exchange the
batch aggregate pays. No custom state, no Python in the hot path — pure
JVM windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# event-time watermarks require TIMESTAMP (Spark's EventTimeWatermark node
# rejects TIMESTAMP_NTZ): the engine compares event times against a
# watermark it tracks in instant semantics. The session pins a fixed
# timezone (hexspark.session), so wall-clock arithmetic stays deterministic.
EVENT_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window counts + exact decimal value sums per event_type.

    Works identically on a streaming or a batch DataFrame (the streaming
    variant additionally drops watermark-late rows and emits append-mode
    finalized windows): window(ts) → groupBy(window, event_type) → count +
    sum. The sum accumulates in decimal(38,9) — exact and order-independent,
    so stream-vs-batch equality is byte-exact (a double sum would depend on
    partial-aggregation order; see the round-2 event_sessions lesson).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark_delay)
    agg = (
        src.groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,9)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    return agg.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def stream_window_counts_to_parquet(
    spark,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    available_now: bool = True,
):
    """readStream(parquet dir) → watermarked windowed agg → append-mode
    parquet sink. Returns the StreamingQuery (caller awaits termination).

    Append mode means only FINALIZED windows (watermark passed win_end)
    reach the sink — re-running after more files arrive appends newly
    finalized windows and never rewrites an emitted one.
    """
    events = spark.readStream.schema(EVENT_DDL).parquet(src_dir)
    out = windowed_event_counts(events, window_duration, watermark_delay)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
