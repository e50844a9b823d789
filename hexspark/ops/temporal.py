"""Temporal joins Spark lacks as built-ins: as-of join and interval (range)
join, expressed so Catalyst executes them as ONE keyed exchange each — no
theta-join, no per-row Python, no broadcast-nested-loop fallback.

Why these shapes at 100 TB:

* ``asof_join`` is the union + ordered-window formulation: tag both inputs,
  union them, and carry the most recent right-side values forward with
  ``last(..., ignorenulls=True)`` over a per-key ordered window. Cost is one
  hash exchange on the key plus a per-partition sort — the same envelope as
  any window aggregate — instead of the naive
  ``left JOIN right ON key AND r.ts <= l.ts`` + row_number, which Spark
  plans as an exploding inequality join. Skew is per-key, identical to any
  groupBy on the same key.

* ``interval_join`` buckets time: each interval row is exploded to the
  fixed-width buckets it overlaps, each point row keyed by its own bucket,
  and the match becomes an equi-join on (key, bucket) followed by the exact
  range predicate. A point lies in exactly one bucket, so no pair is emitted
  twice and no post-join dedup is needed. Shuffle volume is
  |points| + |intervals| * ceil(span/bucket) — choose ``bucket_us`` near the
  typical interval span so the explode factor stays ~2.

Reference parity note: the reference engine (hexhamming) has no temporal
operators; these extend the engine the way its users combine it with event
logs (see SURVEY.md §2.4 — windows/sessionization category).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# epoch-microseconds of a TIMESTAMP_NTZ without any session-timezone cast
# (same wall-clock arithmetic the sessionization query uses)
_EPOCH_US = "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {col})"


def _ts_us(col: str):
    return F.expr(_EPOCH_US.format(col=col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join.

    For every left row, attach ``value_cols`` from the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same ``key`` (inclusive on
    equal timestamps), or nulls when none exists. With ``tolerance_us`` the
    match must additionally satisfy left_ts - right_ts <= tolerance_us.

    Right-side determinism is the CALLER's contract: at most one right row
    per (key, right_ts) — pre-aggregate duplicates (e.g. groupBy(key, ts)
    .agg(max(...))) exactly as any as-of engine requires for a well-defined
    answer. Left rows pass through unchanged, one output row per input row.

    Plan: one exchange on ``key``, one sort on (ts, side), |value_cols| + 1
    running ``last(ignorenulls)`` frames — all whole-stage-codegen'd.
    """
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    l_tag = (
        left.withColumn("_ts_us", _ts_us(left_ts))
        .withColumn("_side", F.lit(1))
    )
    for c in value_cols:
        # typed nulls: unionByName must see the right side's exact type
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tag = (
        right.select(
            F.col(key),
            _ts_us(right_ts).alias("_ts_us"),
            F.lit(0).alias("_side"),
            *[F.col(c) for c in value_cols],
        )
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows (_side=0) sort before left rows at equal ts → inclusive <=
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts_us").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match_ts_us", F.last(F.when(F.col("_side") == 0, F.col("_ts_us")), ignorenulls=True).over(w))
    for c in value_cols:
        matched = matched.withColumn(
            c, F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    out = matched.where(F.col("_side") == 1)
    if tolerance_us is not None:
        in_tol = F.col("_ts_us") - F.col("_match_ts_us") <= F.lit(tolerance_us)
        for c in value_cols:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
        out = out.withColumn("_match_ts_us", F.when(in_tol, F.col("_match_ts_us")))
    return out.select(*lcols, *value_cols, F.col("_match_ts_us").alias("matched_ts_us"))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Inner join of point rows onto interval rows of the same ``key`` with
    ``start_ts <= point_ts < end_ts`` (half-open), via fixed-width time
    buckets so the physical plan is an equi-join.

    Returns one row per matching (interval, point) pair carrying all columns
    of both inputs (names must not clash). Intervals are exploded to
    ceil(span / bucket_us) bucket rows; each point carries exactly one
    bucket, so pairs are emitted exactly once — the exact predicate prunes
    false bucket collisions, nothing is double-counted.
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash - {key}:
        raise ValueError(f"column name clash between inputs: {sorted(clash - {key})}")

    b = F.lit(bucket_us)
    iv = (
        intervals.withColumn("_s_us", _ts_us(start_ts))
        .withColumn("_e_us", _ts_us(end_ts))
        # last bucket is the one holding end-1 (half-open interval); empty
        # or negative intervals produce an empty sequence and drop out
        .withColumn(
            "_bkt",
            F.explode(
                F.when(
                    F.col("_e_us") > F.col("_s_us"),
                    F.sequence(
                        F.floor(F.col("_s_us") / b),
                        F.floor((F.col("_e_us") - 1) / b),
                    ),
                ).otherwise(F.array().cast("array<bigint>"))
            ),
        )
    )
    pt = points.withColumn("_p_us", _ts_us(point_ts)).withColumn(
        "_bkt", F.floor(F.col("_p_us") / b)
    )
    joined = iv.join(pt, [key, "_bkt"]).where(
        (F.col("_p_us") >= F.col("_s_us")) & (F.col("_p_us") < F.col("_e_us"))
    )
    return joined.drop("_bkt", "_s_us", "_e_us", "_p_us")
