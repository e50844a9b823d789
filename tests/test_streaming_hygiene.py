"""The PII scrub is a stateless codegen projection, so it runs UNCHANGED
on a Structured-Streaming source — the ingest-time scrub a pipeline wants
before raw text ever lands in a stage table. Pins scrub-on-stream ≡
scrub-on-batch and the no-state streaming plan."""

from __future__ import annotations

from hexspark.ops.pii import scrub_documents

_DDL = "doc_id long, text string"

_DOCS = [
    (1, "mail alice@example.org or call (555) 123-4567 now"),
    (2, "a perfectly clean document"),
    (3, "card 4242424242424242 and host 10.0.0.1"),
]


def test_stream_scrub_equals_batch(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    spark.createDataFrame(_DOCS, _DDL).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(_DDL).parquet(src)
    q = (
        scrub_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["doc_id"]: (r["n_pii_total"], r["redacted_text"])
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        r["doc_id"]: (r["n_pii_total"], r["redacted_text"])
        for r in scrub_documents(spark.createDataFrame(_DOCS, _DDL)).collect()
    }
    assert got == expected
    assert got[1] == (2, "mail [EMAIL] or call [PHONE] now")
    assert got[3][0] == 2 and "[CARD]" in got[3][1] and "[IP]" in got[3][1]
    # stateless: no state store, no watermark, no aggregation in the query
    assert not q.lastProgress["stateOperators"]
