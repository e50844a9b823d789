"""Stage table IO: Iceberg when a catalog is configured, parquet fallback.

The north rule targets Iceberg tables. This sandbox has no Iceberg runtime
jar, so `TableIO` probes for an Iceberg-capable catalog at construction and
falls back to plain parquet paths with identical call sites — on a real
cluster, setting

    spark.sql.catalog.lake                = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type           = hadoop | hive | rest
    hexspark.catalog                      = lake
    hexspark.warehouse                    = <namespace>

switches every stage write to `df.writeTo('lake.<ns>.<table>')
.createOrReplace()` with no code change. Writes are atomic-by-rename for
parquet (write to tmp dir, rename) to keep resume semantics safe.

Runtime-jar status (checked 2026-08-18): no iceberg-spark-runtime jar
exists anywhere on this sandbox image (searched / and the pyspark jars
dir) and the sandbox has no network route to Maven Central
(`Name or service not known`), so the Iceberg branch cannot be executed
against a real catalog here. It is contract-tested against a duck-typed
fake catalog in tests/test_io_iceberg.py (probe, writeTo/partitionedBy/
bucket-transform call shapes, read-back, exists) — the strongest evidence
available without the jar.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        self.catalog = spark.conf.get("hexspark.catalog", None)
        self.namespace = spark.conf.get("hexspark.warehouse", "hexspark")
        self.use_iceberg = False
        if self.catalog:
            try:
                spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}")
                self.use_iceberg = True
            except Exception:
                self.use_iceberg = False
        if not self.use_iceberg:
            os.makedirs(workdir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog}.{self.namespace}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:
            w = df.writeTo(f"{self.catalog}.{self.namespace}.{name}")
            if partition_by:
                from pyspark.sql.functions import col

                w = w.partitionedBy(*[col(c) for c in partition_by])
            w.createOrReplace()
            return
        tmp = self._path(f"_tmp_{name}")
        final = self._path(name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def append(self, df: DataFrame, name: str) -> None:
        if self.use_iceberg:
            df.writeTo(f"{self.catalog}.{self.namespace}.{name}").append()
            return
        df.write.mode("append").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(f"{self.catalog}.{self.namespace}.{name}")
        return self.spark.read.parquet(self._path(name))

    def write_bucketed(
        self, df: DataFrame, name: str, bucket_cols: list[str], n_buckets: int
    ) -> str:
        """Write a stage table bucketed (and sorted) by ``bucket_cols`` so
        downstream equi-joins on those columns are CO-LOCATED: two tables
        bucketed the same way join with ZERO exchanges (the 100TB move for
        join keys reused across stages — e.g. signatures ⋈ clusters on
        conv_id — where a shuffle of the big side would dominate the job).

        Iceberg mode uses a bucket(...) partition transform; parquet mode
        uses Spark's native bucketBy, which requires a catalog table entry
        (saveAsTable) — the data lands under the workdir, the catalog entry
        carries the bucketing metadata Spark's planner needs to elide the
        exchange. Returns the table identifier to read/join on.
        """
        if self.use_iceberg:
            from pyspark.sql.functions import bucket, col

            ident = f"{self.catalog}.{self.namespace}.{name}"
            # bucket-transform EVERY bucket column so multi-column callers
            # get the same co-location semantics as the parquet path's
            # bucketBy(n, *cols) (previously only cols[0] was bucketed,
            # silently diverging between backends)
            transforms = [bucket(n_buckets, col(c)) for c in bucket_cols]
            df.writeTo(ident).partitionedBy(
                transforms[0], *transforms[1:]
            ).createOrReplace()
            return ident
        ident = f"hexspark_bucketed_{name}"
        self.spark.sql(f"DROP TABLE IF EXISTS {ident}")
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .option("path", self._path(f"bucketed_{name}"))
            .saveAsTable(ident)
        )
        return ident
