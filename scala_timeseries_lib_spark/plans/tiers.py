"""Continuous-aggregate retention tiers: raw entries -> 1m -> 1h -> 1d.

Each tier is a parquet table (Iceberg when a runtime jar is available; the
storage layer is a thin interface -- see ``storage.py``) of rolled-up
points carrying reaggregatable sufficient statistics, so every coarser tier
is computed from the previous tier without touching raw data
(wsum/dur/min/max are associative).

Incremental maintenance: each run processes only entries with
``ts >= watermark - step`` (one-bucket overlap because a late-arriving
entry can extend the last, still-open bucket), recomputes exactly the
affected buckets, and overwrites those bucket partitions idempotently
(dynamic partition overwrite). The checkpoint stores per-partition
watermarks + row/byte lineage metrics; a killed job rerun from the same
checkpoint produces byte-identical tables (pinned by
tests/test_pipeline_e2e.py).

Scale: writes are partitioned by (day, key-hash bucket) -- the salted
(url-bucket, time-bucket) scheme from the north rule -- so hot domains
spread over ``n_salt`` files and time pruning works on the partition
column.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.series_ops import reaggregate_rollup, rollup_time_weighted

__all__ = ["TierPipeline", "TIER_STEPS"]

TIER_STEPS = {"1m": 60_000, "1h": 3_600_000, "1d": 86_400_000}


class TierPipeline:
    """Materialize and incrementally maintain the 1m/1h/1d rollup tiers."""

    def __init__(
        self,
        base_dir: str,
        key_cols: list[str],
        steps: dict[str, int] | None = None,
        n_salt: int = 16,
    ):
        self.base_dir = base_dir
        self.key_cols = list(key_cols)
        self.steps = dict(steps or TIER_STEPS)
        names = list(self.steps)
        assert all(
            self.steps[b] % self.steps[a] == 0
            for a, b in zip(names, names[1:])
        ), "tier steps must nest"
        self.n_salt = n_salt

    # -- paths -------------------------------------------------------------
    def tier_path(self, name: str) -> str:
        return os.path.join(self.base_dir, f"tier_{name}")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.base_dir, "_checkpoint.json")

    @property
    def metrics_path(self) -> str:
        return os.path.join(self.base_dir, "_metrics")

    # -- checkpoint --------------------------------------------------------
    def read_checkpoint(self) -> dict:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as fh:
                return json.load(fh)
        return {"watermark_ms": None, "runs": []}

    def _commit_checkpoint(self, ckpt: dict) -> None:
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ckpt, fh, indent=1, sort_keys=True)
        os.replace(tmp, self.checkpoint_path)  # atomic commit

    # -- build -------------------------------------------------------------
    def _salted(self, df: DataFrame) -> DataFrame:
        """Partition layout columns: day + key-hash salt bucket."""
        return df.withColumn(
            "p_day", (F.col("bucket") - F.pmod(F.col("bucket"), F.lit(86_400_000)))
        ).withColumn(
            "p_salt", F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_salt))
        )

    def update(self, entries: DataFrame, run_id: str | None = None) -> dict:
        """Process new entries incrementally; returns the lineage record.

        ``entries`` is the full entries table (or a stream batch); rows at or
        above ``watermark - max_step`` are (re)processed. Overwrites only the
        affected day partitions, so reruns are idempotent.
        """
        spark = entries.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        ckpt = self.read_checkpoint()
        names = list(self.steps)
        finest = names[0]
        max_step = max(self.steps.values())

        watermark = ckpt["watermark_ms"]
        if watermark is not None:
            # Recompute complete days only: dynamic partition overwrite
            # replaces whole (day, salt) partitions, so the input must
            # contain EVERY entry intersecting the recomputed days. One full
            # day of overlap below the watermark covers open buckets and
            # re-extended last entries (entry validity is capped <= 1 day).
            lo_day = (watermark - watermark % max_step) - max_step
            new_entries = entries.filter(F.col("ts") + F.col("validity") > lo_day)
        else:
            lo_day = None
            new_entries = entries

        stats = new_entries.agg(
            F.count(F.lit(1)).alias("rows"),
            F.max(F.col("ts") + F.col("validity")).alias("max_until"),
        ).collect()[0]
        rows_in = stats["rows"] or 0
        lineage = {
            "run_id": run_id or f"run-{len(ckpt['runs'])}",
            "rows_in": int(rows_in),
            "bytes_in_approx": int(rows_in) * 28,  # 3x8B numeric + key overhead
            "tiers": {},
            "started_unix": int(time.time()),
        }
        if rows_in == 0:
            ckpt["runs"].append(lineage)
            self._commit_checkpoint(ckpt)
            return lineage

        tier_df = rollup_time_weighted(new_entries, self.key_cols, self.steps[finest])
        if lo_day is not None:
            # drop partial buckets in days that are not being rewritten
            tier_df = tier_df.filter(F.col("bucket") >= lo_day)
        self._write_tier(finest, tier_df, lineage)
        for name in names[1:]:
            tier_df = reaggregate_rollup(tier_df, self.key_cols, self.steps[name])
            self._write_tier(name, tier_df, lineage)

        ckpt["watermark_ms"] = int(stats["max_until"])
        ckpt["runs"].append(lineage)
        self._commit_checkpoint(ckpt)
        self._write_metrics(spark, lineage)
        return lineage

    def _write_tier(self, name: str, df: DataFrame, lineage: dict) -> None:
        out = self._salted(df)
        path = self.tier_path(name)
        # cache to avoid recomputing for metrics + the next tier's input
        out = out.persist()
        n = out.count()
        (
            out.repartition("p_day", "p_salt")
            .write.mode("overwrite")
            .partitionBy("p_day", "p_salt")
            .parquet(path)
        )
        lineage["tiers"][name] = {"points": n, "path": path}
        out.unpersist()

    def _write_metrics(self, spark: SparkSession, lineage: dict) -> None:
        rec = [
            (
                lineage["run_id"],
                name,
                t["points"],
                lineage["rows_in"],
                lineage["started_unix"],
            )
            for name, t in lineage["tiers"].items()
        ]
        spark.createDataFrame(
            rec, "run_id string, tier string, points long, rows_in long, started long"
        ).write.mode("append").parquet(self.metrics_path)

    def read_tier(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.tier_path(name)).drop("p_day", "p_salt")
