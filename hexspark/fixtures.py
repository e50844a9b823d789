"""Deterministic synthetic transcript generator (FIXTURES.md F1/F2).

Generates the `input_hint` table shape exactly:
    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)
plus ground-truth `labeled_pairs(conv_id_a, conv_id_b, is_match)` from the
duplicate lineage.

Generation is **distributed and seed-deterministic**: conversations are
derived from `spark.range` ids through `mapInPandas`, each base conversation
seeded by its own id — so the same (seed, n_base) always produces identical
rows regardless of partitioning or cluster size, and generation scales out
with the cluster instead of bottlenecking on the driver.

Duplicate model: each base conversation spawns 0-4 near-duplicates by token
substitution at a low per-token mutation rate, calibrated so duplicates land
within the SimHash hamming radius used by blocking while unrelated
conversations (drawn from the same vocabulary) do not.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "code", "browser", "calculator", "none"])

# Seeded vocabulary — plain token soup; ~2k distinct tokens gives realistic
# collision rates between unrelated conversations.
_VOCAB_RNG = np.random.default_rng(20240613)
_VOCAB = np.array(
    [
        "".join(_VOCAB_RNG.choice(list("abcdefghijklmnopqrstuvwxyz"), _VOCAB_RNG.integers(3, 10)))
        for _ in range(2000)
    ]
)

_EPOCH = datetime(2025, 1, 1)


def _gen_base_conv(rng: np.random.Generator, n_turns: int) -> list[np.ndarray]:
    """Token arrays per turn for one base conversation (one vectorized draw)."""
    lens = rng.integers(8, 60, n_turns)
    idx = rng.integers(0, len(_VOCAB), int(lens.sum()))
    return np.split(_VOCAB[idx], np.cumsum(lens[:-1]))


def _mutate(rng: np.random.Generator, turns: list[np.ndarray], rate: float) -> list[np.ndarray]:
    """Substitute each token with probability `rate` (one vectorized draw)."""
    flat = np.concatenate(turns)
    flips = rng.random(len(flat)) < rate
    n_flips = int(flips.sum())
    if n_flips:
        flat = flat.copy()
        flat[flips] = _VOCAB[rng.integers(0, len(_VOCAB), n_flips)]
    lens = np.fromiter((len(t) for t in turns), dtype=np.int64, count=len(turns))
    return np.split(flat, np.cumsum(lens[:-1]))


def _emit_conv(
    rows: list, conv_id: str, turns: list[np.ndarray], rng: np.random.Generator, base_ts: datetime
) -> None:
    ts = base_ts
    for ti, toks in enumerate(turns):
        role = str(_ROLES[ti % 2]) if ti % 5 != 4 else str(rng.choice(_ROLES[2:]))
        tool = str(rng.choice(_TOOLS[:-1])) if role == "tool" else None
        ts = ts + timedelta(seconds=int(rng.integers(1, 120)))
        rows.append((conv_id, ti, str(role), " ".join(toks.tolist()), tool, ts))


def transcripts_df(
    spark: SparkSession,
    n_base: int = 400,
    seed: int = 42,
    mutation_rate: float = 0.01,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts table.

    Each base id spawns 0-4 near-duplicates; duplicate conv_ids are
    ``conv_{base:08d}_d{k}``, base conv_ids ``conv_{base:08d}_d0`` (so the
    lexicographic min of a true cluster is the base — convenient for
    eyeballing, irrelevant for correctness).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list = []
            for base in pdf["id"].tolist():
                rng = np.random.default_rng((seed, int(base)))
                n_turns = int(rng.integers(4, 13))
                turns = _gen_base_conv(rng, n_turns)
                n_dups = int(rng.integers(0, 5))
                base_ts = _EPOCH + timedelta(minutes=int(base))
                _emit_conv(rows, f"conv_{base:08d}_d0", turns, rng, base_ts)
                for k in range(1, n_dups + 1):
                    mturns = _mutate(rng, turns, mutation_rate)
                    _emit_conv(rows, f"conv_{base:08d}_d{k}", mturns, rng, base_ts)
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    return spark.range(0, n_base, 1, parts).mapInPandas(gen, TRANSCRIPT_SCHEMA)


def labeled_pairs_df(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """Ground-truth pairs from the generator's id lineage: two conversations
    match iff they share the same base id. Emits ALL intra-base pairs as
    positives; negatives are implied (any pair not listed).

    Returns labeled_pairs(conv_id_a, conv_id_b, is_match=true) with
    conv_id_a < conv_id_b.
    """
    from pyspark.sql import functions as F

    convs = transcripts.select("conv_id").distinct().withColumn(
        "base_id", F.regexp_extract("conv_id", r"^conv_(\d+)_d\d+$", 1)
    )
    a = convs.alias("a")
    b = convs.alias("b")
    return (
        a.join(b, F.col("a.base_id") == F.col("b.base_id"))
        .where(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("conv_id_a"),
            F.col("b.conv_id").alias("conv_id_b"),
            F.lit(True).alias("is_match"),
        )
    )
