"""B10 — per-partition lineage/metrics for resumability (north_rule).

stage_metrics(stage, partition_id, rows_out, wall_ms, run_id, ts): one row
per output partition per stage, computed with a groupBy(spark_partition_id)
aggregate over the stage's materialized output — observable skew per
partition, row-count lineage per stage, cheap enough to run always.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "stage string, partition_id int, rows_out long, wall_ms long, run_id string, ts timestamp"
)


def partition_metrics(
    df: DataFrame, stage: str, run_id: str, wall_ms: int
) -> DataFrame:
    """Per-partition row counts of df, stamped with stage/run lineage."""
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows_out"))
        .select(
            F.lit(stage).alias("stage"),
            F.col("partition_id"),
            F.col("rows_out"),
            F.lit(wall_ms).cast("long").alias("wall_ms"),
            F.lit(run_id).alias("run_id"),
            F.lit(now).cast("timestamp").alias("ts"),
        )
    )


class StageTimer:
    def __init__(self) -> None:
        self.t0 = time.monotonic()

    def wall_ms(self) -> int:
        return int((time.monotonic() - self.t0) * 1000)
