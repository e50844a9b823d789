"""Salted equi-join: spread a skewed big-side key over n_salts reducers.

The shuffle-join failure mode at 100 TB is one hot key: hashpartitioning
sends every row with that key to ONE reducer, and the stage runs at the
speed of that single task no matter how many executors exist. Salting
fixes the layout without changing the semantics — the big side gets a
deterministic salt in [0, n_salts), the small side is replicated once per
salt value, and the join key becomes (key, salt), so the hot key's rows
land on n_salts different reducers. Cost: the small side's shuffle volume
multiplies by n_salts — which is why this is for *moderate* small sides;
a truly tiny side should broadcast instead (no shuffle at all), and AQE's
skew-join split handles the in-between when partition stats surface the
skew at runtime. This operator is for the case AQE can't see: skew known
ahead of time (a power-law entity, a null-heavy foreign key) on a join
too big to broadcast.

This generalizes the salt-split machinery the blocking layer applies to
oversize LSH blocks (pipeline/blocking.py salt chains) into a reusable
join operator for arbitrary tables.

The salt must be DETERMINISTIC (a hash of caller-named columns, never
rand()): retried tasks must re-derive the same salt or a lost executor
re-shuffles rows to different reducers than their join partners.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_join_salt"


def salted_equijoin(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_from: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` x ``small`` on the ``on`` columns with the big side
    salted by ``pmod(xxhash64(*salt_from), n_salts)``. Returns exactly the
    rows a plain ``big.join(small, on, how)`` returns (column order: on,
    big-only, small-only). ``salt_from`` names big-side columns whose
    values spread the hot key's rows — a line number, a timestamp, any
    column that varies within the hot key. ``how`` supports 'inner' and
    'left' (the shapes where the big side dominates; for 'right'/'outer'
    swap roles at the call site)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equijoin supports inner/left, got {how!r}")
    if not salt_from:
        raise ValueError("salt_from must name at least one big-side column")
    overlap = set(big.columns) & set(small.columns) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts))
    big_s = big.withColumn(SALT_COL, salt.cast("int"))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
