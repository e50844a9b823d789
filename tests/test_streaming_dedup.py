"""In-stream dedup: duplicates dropped within the watermark horizon
(including across micro-batches and across a checkpoint restart), state
released after the watermark passes."""

from __future__ import annotations

import datetime as dt
import os

from hexspark.streaming.dedup import EVENT_DDL, stream_dedup_to_parquet

_T0 = dt.datetime(2024, 3, 1)


def _ev(eid: int, minutes: int, etype: str = "click", value: float = 1.0, user: int = 1):
    return (eid, _T0 + dt.timedelta(minutes=minutes), user, etype, value)


def _write_batch(spark, rows, src_dir: str, name: str):
    spark.createDataFrame(rows, EVENT_DDL).coalesce(1).write.mode("append").parquet(
        os.path.join(src_dir, name)
    )


def _drain(spark, src, out, ckpt):
    q = stream_dedup_to_parquet(spark, src, out, ckpt, watermark_delay="30 minutes")
    q.awaitTermination()


def test_stream_dedup_within_and_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1: event 1 delivered twice in the same batch, events 2,3 once
    _write_batch(
        spark,
        [_ev(1, 0), _ev(1, 0, value=99.0), _ev(2, 5), _ev(3, 10)],
        src,
        "b1=1",
    )
    _drain(spark, src + "/*", out, ckpt)
    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3}
    # first-wins: the duplicate's payload must not replace the original
    vals = {r["event_id"]: r["value"] for r in spark.read.parquet(out).collect()}
    assert vals[1] == 1.0

    # batch 2 (fresh drain = restart from checkpoint): event 2 re-delivered
    # 10 min later (inside the 30-min horizon -> dropped, even across the
    # restart: dedup state lives in the checkpoint), plus new event 4
    _write_batch(spark, [_ev(2, 15), _ev(4, 20)], src, "b2=1")
    _drain(spark, src + "/*", out, ckpt)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4]

    # batch 3: advance the watermark far past event 3's horizon, then
    # batch 4 re-delivers event 3 — state was released, so it's emitted
    # again (the documented horizon contract; the batch backstop owns the
    # long tail)
    _write_batch(spark, [_ev(5, 600)], src, "b3=1")
    _drain(spark, src + "/*", out, ckpt)
    _write_batch(spark, [_ev(3, 601)], src, "b4=1")
    _drain(spark, src + "/*", out, ckpt)
    rows = sorted(
        (r["event_id"], r["ts"]) for r in spark.read.parquet(out).collect()
    )
    ids = [e for e, _ in rows]
    assert sorted(ids) == [1, 2, 3, 3, 4, 5]  # 3 re-emitted post-horizon


def test_batch_path_plain_dedup(spark):
    from hexspark.streaming.dedup import dedup_stream

    df = spark.createDataFrame(
        [_ev(1, 0), _ev(1, 1), _ev(2, 2)], EVENT_DDL
    )
    out = dedup_stream(df)
    assert out.count() == 2
    assert not out.isStreaming
