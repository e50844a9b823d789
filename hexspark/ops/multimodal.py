"""Multimodal column plumbing: image/audio/video payloads as opaque binary
columns with typed metadata, processed through Arrow-batched mapInPandas.

The decode step is STUBBED (this container has no image/audio libraries) —
``decode_image`` raises NotImplementedError unless the deterministic fake
decoder is requested — but everything Spark-side is real and tested:
schemas, batch shapes, partition-size control, and the mapInPandas
signature a real decoder would drop into.

At 100 TB the important properties are:
- binary payloads never pass through Python row-at-a-time: mapInPandas
  streams Arrow record batches, and maxRecordsPerBatch bounds worker memory
  against multi-MB payloads;
- metadata (width/height/duration/codec) lives in plain columns so filters
  on it push down to the parquet scan without touching payload bytes;
- feature extraction emits fixed-width vectors (array<float>) that feed the
  ANN operators in hexspark.ops.ann.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms long"
)
FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

_FEATURE_DIM = 16


def decode_image(payload: bytes):
    """Real decode requires an image library not present in this container."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv — not available in this sandbox; "
        "use extract_features(..., fake_decode=True) for the deterministic stub"
    )


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in feature extractor: byte-histogram moments of
    the payload, reduced to _FEATURE_DIM floats. Replaces the decode +
    model-forward step while keeping identical batch shapes."""
    n = len(payloads)
    out = np.zeros((n, _FEATURE_DIM), dtype=np.float32)
    if n == 0:
        return out
    lens = payloads.str.len().to_numpy()
    w = int(lens.max()) if len(lens) else 0
    if w == 0:
        return out
    mat = np.frombuffer(b"".join(p.ljust(w, b"\x00") for p in payloads), dtype=np.uint8).reshape(n, w)
    valid = np.arange(w)[None, :] < lens[:, None]  # ignore padding bytes
    nib = mat >> 4
    for k in range(_FEATURE_DIM):
        out[:, k] = ((nib == k) & valid).sum(axis=1) / np.maximum(lens, 1)
    return out


def extract_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """media(MEDIA_SCHEMA) → features(FEATURE_SCHEMA) via mapInPandas.

    With fake_decode=False the decode step raises NotImplementedError (the
    honest sandbox behavior); with True the deterministic byte-histogram
    stub runs so the Spark-side plumbing is fully exercisable in tests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                decode_image(pdf["payload"].iloc[0] if len(pdf) else b"")
            feats = _fake_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads 1-64 KiB)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        size = int(rng.integers(1024, 65536))
        rows.append(
            (
                i,
                kinds[i % 3],
                rng.bytes(size),
                "application/octet-stream",
                int(rng.integers(16, 4096)),
                int(rng.integers(16, 4096)),
                int(rng.integers(0, 600000)),
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]
    )
    return spark.createDataFrame(pdf, MEDIA_SCHEMA)
