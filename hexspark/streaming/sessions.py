"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the engine feature for operators Structured
Streaming's built-in aggregations can't express (a session's key space is
data-dependent: windows open and close based on the DATA's inter-event
gaps, not a fixed grid).

Semantics (the streaming twin of the batch ``event_sessions`` query):
events are grouped per user; a session is a maximal run of events whose
consecutive gaps are <= ``gap``. A session is EMITTED when

* a later event of the same user arrives with a gap > ``gap`` (closed by
  data), or
* the event-time watermark passes ``last_event + gap`` (closed by timeout —
  so idle users' trailing sessions still flush without waiting for their
  next visit).

State per user is O(1): (start_us, end_us, n_events, sum_value) of the one
open session — not the events themselves — so executor state stays bounded
no matter how long sessions get. Batches arrive unordered within a
micro-batch (we sort in-batch); the watermark guarantees no event older
than an emitted session's close can arrive later (same contract the
windowed aggregation relies on).

Exact sums: values accumulate as integer micro-units (value * 1e6 rounded)
inside state, converted once at emit — associative and order-independent,
the same double-summation discipline the batch query uses via decimal.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

SESSION_OUTPUT_DDL = (
    "user_id long, start_us long, end_us long, n_events long, sum_value double"
)
_STATE_DDL = "start_us long, end_us long, n_events long, sum_micro long"

_US = 1_000_000


def _to_micro(v: float) -> int:
    return int(round(v * _US))


def _session_fn(gap_us: int):
    """Builds the per-group state function (closure carries the gap)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed last_event + gap: flush the open session
            if state.exists:
                closed.append(state.get)
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")
            for ts_us, val in zip(rows["ts_us"], rows["value"]):
                ts_us = int(ts_us)
                if cur is None:
                    cur = [ts_us, ts_us, 1, _to_micro(val)]
                elif ts_us - cur[1] > gap_us:
                    closed.append(tuple(cur))
                    cur = [ts_us, ts_us, 1, _to_micro(val)]
                else:
                    cur[1] = ts_us
                    cur[2] += 1
                    cur[3] += _to_micro(val)
            if cur is not None:
                state.update(tuple(cur))
                # flush when the watermark passes the session-close bound;
                # the engine rejects timestamps at-or-behind the current
                # watermark, so clamp (the session then flushes on the very
                # next watermark advance — correct, just not earlier)
                bound_ms = (cur[1] + gap_us) // 1000 + 1
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(bound_ms, wm_ms + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "start_us": [c[0] for c in closed],
                    "end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] / _US for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events(event_id, ts timestamp, user_id, event_type, value) STREAM →
    append-mode stream of CLOSED sessions (see module docstring).

    Plan: one keyed exchange on user_id into the Arrow state operator —
    identical shuffle envelope to the batch sessionization; state size is
    one fixed-width tuple per active user.
    """
    n = [int(s) for s in gap.split() if s.isdigit()]
    unit = gap.split()[-1].rstrip("s")
    mult = {"minute": 60, "second": 1, "hour": 3600}[unit]
    gap_us = n[0] * mult * _US

    prepped = (
        events.withWatermark("ts", watermark_delay)
        .withColumn(
            "ts_us",
            F.expr("timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00Z', ts)"),
        )
        .select("user_id", "event_id", "ts", "ts_us", "value")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        outputStructType=SESSION_OUTPUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_sessions_to_parquet(
    spark: "SparkSession",
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    schema: str | None = None,
):
    """readStream(parquet dir) → stateful sessionization → append sink.
    Returns the StreamingQuery (caller awaits termination)."""
    from .windows import EVENT_DDL

    events = spark.readStream.schema(schema or EVENT_DDL).parquet(src_dir)
    out = sessionize_stream(events, gap=gap, watermark_delay=watermark_delay)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
