"""Tier-table storage backends: parquet (default) and Iceberg.

BASELINE.json mandates the retention tiers as incrementally-maintained
Iceberg tables. This sandbox ships no ``iceberg-spark-runtime`` jar, so the
storage seam is an explicit interface instead of an asserted "one-line
swap": ``TierPipeline`` talks only to :class:`StorageBackend`, the parquet
implementation is the default, and the Iceberg implementation activates
whenever the runtime jar is on the session classpath
(:func:`iceberg_available`). The tier e2e tests parameterize over both
backends and skip the Iceberg leg cleanly when the jar is absent
(tests/test_storage_backend.py), so checkpoint/lineage behavior is pinned
to be backend-independent.

Both backends implement the same contract the pipeline needs:

- ``overwrite_partitions(df, ref, partition_cols)`` -- dynamic partition
  overwrite: only the partitions present in ``df`` are replaced (Iceberg:
  ``writeTo(...).overwritePartitions()``; parquet:
  ``partitionOverwriteMode=dynamic``). This is what makes incremental
  reruns idempotent.
- ``read(spark, ref)`` -- full-table read (partition pruning comes from
  downstream filters either way).
- ``ref(base_dir, name)`` -- backend-native table reference (a path for
  parquet, a catalog table identifier for Iceberg).
- ``append(df, ref)`` -- append-only side tables (lineage metrics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "StorageBackend",
    "ParquetBackend",
    "IcebergBackend",
    "iceberg_available",
    "default_backend",
]


def iceberg_available(spark: SparkSession) -> bool:
    """True when an iceberg-spark-runtime jar is resolvable on the session's
    JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class StorageBackend:
    """Contract between TierPipeline and the physical table format."""

    def ref(self, base_dir: str, name: str) -> str:
        raise NotImplementedError

    def exists(self, spark: SparkSession, ref: str) -> bool:
        raise NotImplementedError

    def overwrite_partitions(
        self, df: DataFrame, ref: str, partition_cols: list[str]
    ) -> None:
        raise NotImplementedError

    def read(self, spark: SparkSession, ref: str) -> DataFrame:
        raise NotImplementedError

    def append(self, df: DataFrame, ref: str) -> None:
        raise NotImplementedError


class ParquetBackend(StorageBackend):
    """Plain partitioned parquet with dynamic partition overwrite."""

    def ref(self, base_dir: str, name: str) -> str:
        return os.path.join(base_dir, name)

    def exists(self, spark: SparkSession, ref: str) -> bool:
        from .stateio import StateIO

        return StateIO(spark).exists(ref)

    def overwrite_partitions(
        self, df: DataFrame, ref: str, partition_cols: list[str]
    ) -> None:
        spark = df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(ref)
        )

    def read(self, spark: SparkSession, ref: str) -> DataFrame:
        return spark.read.parquet(ref)

    def append(self, df: DataFrame, ref: str) -> None:
        df.write.mode("append").parquet(ref)


class IcebergBackend(StorageBackend):
    """Iceberg tables in a Hadoop catalog rooted at the pipeline base dir.

    Requires ``iceberg-spark-runtime`` on the classpath (gate with
    :func:`iceberg_available`). The catalog is registered lazily per
    session under ``catalog_name`` with ``type=hadoop`` and
    ``warehouse=<base_dir>``, so a DFS base dir works unchanged.
    """

    def __init__(self, catalog_name: str = "graft_tiers"):
        self.catalog_name = catalog_name
        self._warehouse: str | None = None

    def _ensure_catalog(self, spark: SparkSession, warehouse: str) -> None:
        prefix = f"spark.sql.catalog.{self.catalog_name}"
        spark.conf.set(prefix, "org.apache.iceberg.spark.SparkCatalog")
        spark.conf.set(f"{prefix}.type", "hadoop")
        spark.conf.set(f"{prefix}.warehouse", warehouse)
        self._warehouse = warehouse

    def ref(self, base_dir: str, name: str) -> str:
        # one namespace per pipeline base dir; the catalog warehouse IS the
        # base dir so refs stay stable across sessions
        spark = SparkSession.getActiveSession()
        if spark is not None:
            self._ensure_catalog(spark, base_dir)
        return f"{self.catalog_name}.tiers.{name}"

    def exists(self, spark: SparkSession, ref: str) -> bool:
        return spark.catalog.tableExists(ref)

    def overwrite_partitions(
        self, df: DataFrame, ref: str, partition_cols: list[str]
    ) -> None:
        spark = df.sparkSession
        if not spark.catalog.tableExists(ref):
            (
                df.writeTo(ref)
                .using("iceberg")
                .partitionedBy(*partition_cols)
                .create()
            )
        else:
            df.writeTo(ref).overwritePartitions()

    def read(self, spark: SparkSession, ref: str) -> DataFrame:
        return spark.table(ref)

    def append(self, df: DataFrame, ref: str) -> None:
        if not df.sparkSession.catalog.tableExists(ref):
            df.writeTo(ref).using("iceberg").create()
        else:
            df.writeTo(ref).append()


def default_backend(spark: SparkSession | None = None) -> StorageBackend:
    """Iceberg when the runtime jar is present, parquet otherwise."""
    if spark is not None and iceberg_available(spark):
        return IcebergBackend()
    return ParquetBackend()
