"""Micro-batch appendable entry stream (zio/AppendableEntryStream.scala:8-60,
ZEntryFitter.scala:14-105 re-expressed as checkpointed batch jobs).

The reference's fitter holds back one mutable "pending last entry" per
series because the next observation may trim or extend it
(TSEntryFitter.scala:14-16). Distributed equivalent: a state table holding
exactly that pending entry per series + a watermark. Each ``append(batch)``:

1. enforces the late-data contract: rows at or before a series' pending
   entry timestamp are rejected into a quarantine count (the reference
   throws, TimestampValidator.scala:89-94; at scale we count + drop);
2. unions the pending entries with the new batch, runs the fitter kernel
   per series;
3. every fitted entry except the per-series last is FINAL and appended to
   the entries table; the last goes back to the state table;
4. state commit is atomic (write new state dir, then swap a pointer file),
   so a crashed append can be re-run idempotently: pinned by
   tests/test_pipeline_e2e.py (TestStreamingAppend).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.entries import fit_entries
from ..plans.stateio import StateIO

__all__ = ["AppendStream"]


class AppendStream:
    def __init__(
        self,
        base_dir: str,
        key_cols: list[str],
        compress: bool = True,
        io: StateIO | None = None,
    ):
        self.base_dir = base_dir
        self.key_cols = list(key_cols)
        self.compress = compress
        # pointer state goes through the Hadoop FS router: a DFS base dir
        # (hdfs://, s3a://, shared file://) stays visible across drivers
        self.io = io or StateIO()
        self.io.makedirs(base_dir)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.base_dir, "STATE")

    @property
    def entries_path(self) -> str:
        return os.path.join(self.base_dir, "entries")

    def _state_path(self, epoch: int) -> str:
        return os.path.join(self.base_dir, f"state_e{epoch}")

    def _read_pointer(self) -> int:
        # read_json_state recovers a crashed commit's surviving tmp file
        state = self.io.read_json_state(self._pointer)
        return state["epoch"] if state is not None else -1

    def _commit_pointer(self, epoch: int) -> None:
        # tmp + rename commit, DFS-capable via the StateIO router; the
        # Hadoop branch's delete+rename window is closed on read
        # (StateIO.read_json_state)
        self.io.write_json_atomic(self._pointer, {"epoch": epoch})

    def pending(self, spark: SparkSession) -> DataFrame | None:
        epoch = self._read_pointer()
        if epoch < 0:
            return None
        return spark.read.parquet(self._state_path(epoch))

    def append(self, batch: DataFrame, epoch: int | None = None) -> dict:
        """Ingest one micro-batch (key cols + ts/value/validity). Returns
        metrics. Re-running the same epoch is idempotent (same inputs ->
        same outputs -> same state)."""
        spark = batch.sparkSession
        prev_epoch = self._read_pointer()
        epoch = prev_epoch + 1 if epoch is None else epoch

        state = self.pending(spark)
        n_batch = batch.count()
        if state is not None:
            # late-data contract: drop rows not strictly after the pending ts
            joined = batch.join(
                state.select(*self.key_cols, F.col("ts").alias("pending_ts")),
                self.key_cols,
                "left",
            )
            ok = joined.filter(
                F.col("pending_ts").isNull() | (F.col("ts") > F.col("pending_ts"))
            ).drop("pending_ts")
            n_late = n_batch - ok.count()
            merged = state.unionByName(ok.select(state.columns))
        else:
            ok = batch
            n_late = 0
            merged = batch.select(*self.key_cols, "ts", "value", "validity")

        fitted = fit_entries(merged, self.key_cols, compress=self.compress)
        w = Window.partitionBy(*self.key_cols).orderBy(F.desc("ts"))
        ranked = fitted.withColumn("rn", F.row_number().over(w)).persist()
        final = ranked.filter(F.col("rn") > 1).drop("rn")
        new_state = ranked.filter(F.col("rn") == 1).drop("rn")

        # stage new state first, then append finals, then commit the pointer;
        # a rerun of a crashed epoch overwrites the same staged paths
        new_state.write.mode("overwrite").parquet(self._state_path(epoch))
        final.write.mode("overwrite").parquet(
            os.path.join(self.entries_path, f"epoch={epoch}")
        )
        n_final = final.count()
        ranked.unpersist()
        self._commit_pointer(epoch)
        return {
            "epoch": epoch,
            "rows_batch": n_batch,
            "rows_late_dropped": n_late,
            "rows_finalized": n_final,
        }

    def entries(self, spark: SparkSession, include_pending: bool = True) -> DataFrame:
        """The materialized series: all finalized entries (+ pending last)."""
        df = spark.read.option("basePath", self.entries_path).parquet(
            self.entries_path
        ).drop("epoch")
        if include_pending:
            p = self.pending(spark)
            if p is not None:
                df = df.unionByName(p.select(df.columns))
        return df
