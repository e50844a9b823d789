"""Multimodal column plumbing: image/audio/video payloads as opaque binary
columns with typed metadata, processed through Arrow-batched mapInPandas.

Decode support is real for the two container formats parseable with zero
codec dependencies — uncompressed 24-bit BMP and PCM WAV — implemented as
byte-level header parsing + numpy payload stats inside the mapInPandas
kernel. Compressed formats (JPEG/MP3/H.264 ...) still raise
NotImplementedError: this container has no codec libraries, and a fake
decoder would only hide that. The deterministic byte-histogram feature
extractor stands in for the model-forward step in all cases.

At 100 TB the important properties are:
- binary payloads never pass through Python row-at-a-time as a *plan*
  construct: mapInPandas streams Arrow record batches, and
  maxRecordsPerBatch bounds worker memory against multi-MB payloads (the
  per-file header parse inside a batch is how any real decoder works);
- metadata (width/height/duration/codec) lives in plain columns so filters
  on it push down to the parquet scan without touching payload bytes;
- feature extraction emits fixed-width vectors (array<float>) that feed the
  ANN operators in hexspark.ops.ann.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms long"
)
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "duration_ms long, feature array<float>"
)

_FEATURE_DIM = 16
_BMP_HEADER = 54
_WAV_HEADER = 44


# ---------------------------------------------------------------------------
# encoders (test/fixture side): minimal valid uncompressed containers
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixel_source: np.ndarray) -> bytes:
    """Minimal valid 24-bit uncompressed BMP (BITMAPINFOHEADER). Rows are
    4-byte aligned per the format; pixel bytes are tiled from pixel_source."""
    row = ((width * 3 + 3) // 4) * 4
    data_size = row * height
    if len(pixel_source):
        reps = -(-data_size // len(pixel_source))
        px = np.tile(pixel_source.astype(np.uint8), reps)[:data_size]
    else:
        px = np.zeros(data_size, dtype=np.uint8)
    header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER + data_size, 0, 0, _BMP_HEADER)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + info + px.tobytes()


def encode_wav(sample_rate: int, samples_i16: np.ndarray) -> bytes:
    """Minimal valid mono 16-bit PCM WAV (RIFF/WAVE, fmt + data chunks)."""
    data = samples_i16.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------


def decode_media(payload: bytes) -> tuple[int, int, int]:
    """Parse (width, height, duration_ms) out of a binary payload.

    Real parsing for uncompressed BMP (dims from BITMAPINFOHEADER) and PCM
    WAV (duration from the data-chunk size / byte rate, walking RIFF
    chunks). Unknown magics raise NotImplementedError — decoding compressed
    media needs codec libraries this container doesn't ship."""
    if payload[:2] == b"BM" and len(payload) >= _BMP_HEADER:
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = abs(int.from_bytes(payload[22:26], "little", signed=True))
        return width, height, 0
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, byte_rate, data_len = 12, 0, 0
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                byte_rate = int.from_bytes(payload[pos + 16 : pos + 20], "little")
            elif cid == b"data":
                data_len = sz
            pos += 8 + sz + (sz & 1)
        duration_ms = (data_len * 1000) // byte_rate if byte_rate else 0
        return 0, 0, duration_ms
    raise NotImplementedError(
        "only uncompressed BMP and PCM WAV are decodable without codec "
        "libraries; compressed formats need Pillow/ffmpeg, absent in this "
        "container"
    )


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in feature extractor: byte-histogram moments of
    the payload, reduced to _FEATURE_DIM floats. Replaces the model-forward
    step while keeping identical batch shapes."""
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

    BMP/WAV payloads are really decoded (header parse per file inside the
    Arrow batch); unknown formats raise NotImplementedError unless
    fake_decode=True, in which case metadata columns pass through so the
    Spark-side plumbing stays exercisable for opaque codecs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, durations = [], [], []
            for payload, mw, mh, md in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["duration_ms"]
            ):
                try:
                    w, h, d = decode_media(payload)
                except NotImplementedError:
                    if not fake_decode:
                        raise
                    w, h, d = int(mw or 0), int(mh or 0), int(md or 0)
                widths.append(w)
                heights.append(h)
                durations.append(d)
            feats = _fake_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "width": pd.Series(widths, dtype="int32", index=pdf.index),
                    "height": pd.Series(heights, dtype="int32", index=pdf.index),
                    "duration_ms": pd.Series(durations, dtype="int64", index=pdf.index),
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def encode_bmp_pixels(pixels: np.ndarray) -> bytes:
    """Exact-pixel 24-bit BMP writer: pixels is (h, w, 3) uint8 in the
    format's native bottom-up row order, rows padded to 4 bytes."""
    h, w, _ = pixels.shape
    row = ((w * 3 + 3) // 4) * 4
    buf = np.zeros((h, row), dtype=np.uint8)
    buf[:, : w * 3] = pixels.reshape(h, w * 3)
    data = buf.tobytes()
    header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER + len(data), 0, 0, _BMP_HEADER)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 pixel array from an uncompressed 24-bit BMP, in the
    stored (bottom-up) row order — the inverse of encode_bmp_pixels."""
    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = abs(int.from_bytes(payload[22:26], "little", signed=True))
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp != 24:
        raise NotImplementedError(f"only 24-bit BMPs supported, got {bpp}-bit")
    row = ((w * 3 + 3) // 4) * 4
    mat = np.frombuffer(payload, dtype=np.uint8, count=h * row, offset=off)
    return mat.reshape(h, row)[:, : w * 3].reshape(h, w, 3).copy()


def decode_wav_samples(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 sample array) from a mono 16-bit PCM WAV."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a WAV payload")
    pos, rate, data = 12, 0, b""
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            rate = int.from_bytes(payload[pos + 12 : pos + 16], "little")
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    return rate, np.frombuffer(data, dtype="<i2")


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every image payload to (out_w, out_h) —
    REAL pixel work (decode 24-bit BMP → index-map → re-encode), not a
    metadata rewrite. Non-image rows pass through untouched, so the
    operator composes over a mixed-modality media table.

    Plan shape: one mapInPandas over Arrow batches; payload bytes never
    shuffle (the operator is a map, no exchange), and the metadata columns
    are updated in the same pass so downstream pushdown filters stay
    truthful. The index-map is vectorized numpy per file — the per-file
    loop inside a batch is how any decoder works (cf. extract_features)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"target dims must be positive, got {out_w}x{out_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for kind, payload, mw, mh in zip(
                pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if kind != "image":
                    payloads.append(payload)
                    widths.append(mw)
                    heights.append(mh)
                    continue
                px = decode_bmp_pixels(payload)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out = px[yi][:, xi]
                payloads.append(encode_bmp_pixels(out))
                widths.append(out_w)
                heights.append(out_h)
            out_pdf = pdf.copy()
            out_pdf["payload"] = payloads
            out_pdf["width"] = pd.Series(widths, dtype="int32", index=pdf.index)
            out_pdf["height"] = pd.Series(heights, dtype="int32", index=pdf.index)
            yield out_pdf

    return media.mapInPandas(run, MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, t_ms long, amplitude int"


def sample_audio_frames(media: DataFrame, n_frames: int) -> DataFrame:
    """Evenly-spaced frame sampling over audio payloads — the audio/video
    analogue of video frame-sampling for feature pipelines: each audio row
    explodes into up to ``n_frames`` rows (media_id, frame_idx, t_ms,
    amplitude), with frame positions floor(i * n_samples / n_frames). Real
    PCM decode (RIFF walk + int16 view); non-audio rows emit nothing.

    Output rows are fixed-width and tiny — the explode happens AFTER decode
    inside the worker, so the shuffle-facing stream carries 20-byte rows,
    never payload bytes."""
    if n_frames <= 0:
        raise ValueError(f"n_frames must be positive, got {n_frames}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, amps = [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                rate, samples = decode_wav_samples(payload)
                if not len(samples) or not rate:
                    continue
                k = min(n_frames, len(samples))
                pos = (np.arange(k, dtype=np.int64) * len(samples)) // k
                ids.extend([mid] * k)
                idxs.extend(range(k))
                ts.extend(((pos * 1000) // rate).tolist())
                amps.extend(samples[pos].astype(int).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "t_ms": pd.Series(ts, dtype="int64"),
                    "amplitude": pd.Series(amps, dtype="int32"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents(doc_id, text):
    even doc_ids become 24-bit BMPs (dims from text length, pixels from the
    text bytes), odd doc_ids become 8 kHz PCM WAVs (samples from the text
    bytes). Every field a decoder recovers is a pure function of
    (doc_id, length(text)), so a SQL oracle can verify the real decode
    round-trip without parsing binaries."""
    src = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("kind"),
        "text",
        (F.lit(8) + F.length("text") % 32).cast("int").alias("gen_w"),
        (F.lit(4) + F.length("text") % 16).cast("int").alias("gen_h"),
        (F.lit(64) + F.length("text") % 1000).cast("int").alias("gen_samples"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for kind, text, w, h, ns in zip(
                pdf["kind"], pdf["text"], pdf["gen_w"], pdf["gen_h"], pdf["gen_samples"]
            ):
                raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if kind == "image":
                    payloads.append(encode_bmp(int(w), int(h), raw))
                else:
                    reps = -(-int(ns) // max(len(raw), 1))
                    samples = (
                        np.tile(raw, reps)[: int(ns)].astype(np.int16) - 64
                        if len(raw)
                        else np.zeros(int(ns), dtype=np.int16)
                    )
                    payloads.append(encode_wav(8000, samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "mime": [
                        "image/bmp" if k == "image" else "audio/wav" for k in pdf["kind"]
                    ],
                    "width": pdf["gen_w"].astype("int32"),
                    "height": pdf["gen_h"].astype("int32"),
                    "duration_ms": (pdf["gen_samples"].astype("int64") * 2 * 1000) // 16000,
                }
            )

    return src.mapInPandas(build, MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests: valid BMPs (kind=image),
    valid WAVs (kind=audio), and opaque random payloads (kind=video, the
    compressed-codec stand-in that must raise without fake_decode)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
            payload = encode_bmp(w, h, rng.integers(0, 256, 64, dtype=np.uint8))
            dur = 0
        elif kind == "audio":
            ns = int(rng.integers(100, 4000))
            payload = encode_wav(8000, rng.integers(-500, 500, ns).astype(np.int16))
            w = h = 0
            dur = (ns * 2 * 1000) // 16000
        else:
            w, h, dur = 0, 0, int(rng.integers(0, 600000))
            payload = rng.bytes(int(rng.integers(1024, 65536)))
        rows.append((i, kind, payload, "application/octet-stream", w, h, dur))
    pdf = pd.DataFrame(
        rows, columns=["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]
    )
    return spark.createDataFrame(pdf, MEDIA_SCHEMA)
