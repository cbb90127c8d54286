"""Continuous-aggregate retention tiers: raw entries -> 1m -> 1h -> 1d.

Each tier is a partitioned table of rolled-up points carrying
reaggregatable sufficient statistics, so every coarser tier is computed
from the previous tier without touching raw data (wsum/dur/min/max are
associative). The physical format goes through the StorageBackend seam
(plans/storage.py): partitioned parquet with dynamic partition overwrite
by default, Iceberg tables (``writeTo(...).overwritePartitions()``) when
an ``iceberg-spark-runtime`` jar is on the classpath -- the partition spec
and the idempotent-rerun contract carry over unchanged, pinned by
tests/test_storage_backend.py.

Incremental maintenance: each run processes, per key-salt partition, only
entries whose domain reaches past that partition's checkpointed watermark
minus one full day of overlap (a late-arriving entry can extend the last,
still-open bucket), recomputes exactly the affected day partitions, and
overwrites them idempotently (dynamic partition overwrite). The checkpoint
stores PER-SALT-PARTITION watermarks; lineage row/byte metrics are emitted
per (day, salt) output partition to a side table. A killed job rerun from
the same checkpoint produces byte-identical tables (pinned by
tests/test_pipeline_e2e.py).

Scale: writes are partitioned by (time slab, key-hash bucket) -- the salted
(url-bucket, time-bucket) scheme from the north rule -- so hot domains
spread over ``n_salt`` files and time pruning works on the partition
column. Partition slabs widen with the tier (>= 256 buckets per slab):
coarser tiers have ~1/60th the rows, and per-dir commit cost would dominate
their writes under a fixed daily layout. On incremental runs each coarser
tier reads the STORED finer tier back for its full rewrite window, so raw
data is only ever scanned by the finest tier.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.series_ops import reaggregate_rollup, rollup_time_weighted_parts
from .stateio import StateIO
from .storage import ParquetBackend, StorageBackend

__all__ = ["TierPipeline", "TIER_STEPS"]

TIER_STEPS = {"1m": 60_000, "1h": 3_600_000, "1d": 86_400_000}


class TierPipeline:
    """Materialize and incrementally maintain the 1m/1h/1d rollup tiers.

    Rerun idempotence is **up to rounding, not byte-exact** (ADVICE r3):
    coarser-tier float aggregates (``twmean``/``integral_s``) are sums of
    doubles, and IEEE summation order differs between the first-run chain
    (per-branch partial reaggregation of the in-memory finest tier) and an
    incremental rerun (single reaggregation of the stored tier) -- and is
    not even deterministic WITHIN one path, since hash-aggregate
    accumulation order follows row arrival order. A rewrite of an unchanged
    partition may therefore flip the last ulp of a float column. Exact
    columns (``bucket``, ``vmin``/``vmax``, ``support_ms``, ``n_pieces``)
    are byte-stable; float equality across reruns is pinned at 9 decimals
    by tests/test_pipeline_e2e.py. Consumers needing cross-run hash
    equality should round floats (functions/rounding.py:eps_floor), as the
    oracle queries do."""

    def __init__(
        self,
        base_dir: str,
        key_cols: list[str],
        steps: dict[str, int] | None = None,
        n_salt: int = 16,
        io: StateIO | None = None,
        backend: StorageBackend | None = None,
    ):
        self.base_dir = base_dir
        # physical table format seam (plans/storage.py): parquet by default,
        # IcebergBackend when the runtime jar is present -- the pipeline
        # only ever calls ref/read/overwrite_partitions/append, so the
        # checkpoint + lineage behavior is backend-independent (pinned by
        # tests/test_storage_backend.py)
        self.backend = backend or ParquetBackend()
        # checkpoint/pointer state goes through the Hadoop FS router so a
        # DFS base dir (hdfs://, s3a://, shared file://) works cluster-wide
        self.io = io or StateIO()
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
        return self.backend.ref(self.base_dir, f"tier_{name}")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.base_dir, "_checkpoint.json")

    @property
    def metrics_path(self) -> str:
        return os.path.join(self.base_dir, "_metrics")

    # -- checkpoint --------------------------------------------------------
    def read_checkpoint(self) -> dict:
        ckpt = self.io.read_json_state(self.checkpoint_path)
        if ckpt is not None:
            # migrate pre-per-partition checkpoints (single global watermark)
            if "watermarks" not in ckpt:
                wm = ckpt.pop("watermark_ms", None)
                ckpt["watermarks"] = (
                    {} if wm is None
                    else {str(s): wm for s in range(self.n_salt)}
                )
            return ckpt
        return {"watermarks": {}, "runs": []}

    def _commit_checkpoint(self, ckpt: dict) -> None:
        # atomic commit (tmp + rename), DFS-capable via the StateIO router
        self.io.write_json_atomic(self.checkpoint_path, ckpt)

    # -- build -------------------------------------------------------------
    def _part_step(self, name: str) -> int:
        """Time width of one output partition for this tier.

        Coarser tiers get coarser partitions (>= 256 buckets per partition,
        never finer than a day): a (day, salt) layout that is right for the
        1m tier would give the 1d tier hundreds of near-empty dirs, and
        partitioned-write cost is dominated by the dir count, not the rows
        (measured ~7ms/dir for dynamic-overwrite commit on this box).
        """
        return max(86_400_000, 256 * self.steps[name])

    def _salted(self, df: DataFrame, part_step: int) -> DataFrame:
        """Partition layout columns: time slab + key-hash salt bucket."""
        return df.withColumn(
            "p_day", (F.col("bucket") - F.pmod(F.col("bucket"), F.lit(part_step)))
        ).withColumn(
            "p_salt", F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_salt))
        )

    @staticmethod
    def _lo_map(lows: dict[int, int]):
        """salt -> lower-bound map literal; missing salts read as -inf so
        they pass every bound (one map-lookup expression per row, instead
        of an n_salt-way boolean chain)."""
        pairs = [x for s, lo in lows.items() for x in (F.lit(s), F.lit(lo))]
        lookup = F.create_map(*pairs) if pairs else F.create_map()
        return lambda salt_col: F.coalesce(
            F.element_at(lookup, salt_col.cast("int")), F.lit(-(1 << 62))
        )

    def _per_salt_bucket_filter(self, lows: dict[int, int]):
        """bucket >= lows[salt] per key-salt, True for salts without a low."""
        salt_col = F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_salt))
        return F.col("bucket") >= self._lo_map(lows)(salt_col)

    def update(self, entries: DataFrame, run_id: str | None = None) -> dict:
        """Process new entries incrementally; returns the lineage record.

        ``entries`` is the full entries table (or a stream batch). Each
        key-salt partition advances independently: rows of salt ``s`` are
        (re)processed only where their domain reaches past
        ``watermarks[s] - 1 day``. Overwrites only the affected
        (day, salt) partitions, so reruns are idempotent.
        """
        spark = entries.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        ckpt = self.read_checkpoint()
        names = list(self.steps)
        finest = names[0]
        max_step = max(self.steps.values())

        salted_in = entries.withColumn(
            "p_salt", F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_salt))
        )
        wms = ckpt["watermarks"]
        # changed_from[s]: the earliest finest bucket that may still change
        # for salt s -- one full max_step of overlap below the watermark
        # covers open buckets and re-extended last entries (entry validity
        # is capped <= max_step)
        changed_from = {
            s: (wms[str(s)] - wms[str(s)] % max_step) - max_step
            for s in range(self.n_salt)
            if str(s) in wms
        }
        # per tier: the lower edge of the rewritten partitions, aligned DOWN
        # to that tier's partition step (dynamic overwrite replaces whole
        # partitions, so every bucket of a touched partition must be present)
        lows = {
            name: {
                s: cf - cf % self._part_step(name)
                for s, cf in changed_from.items()
            }
            for name in names
        }
        if changed_from:
            bound = self._lo_map(lows[finest])(F.col("p_salt"))
            new_entries = salted_in.filter(
                F.col("ts") + F.col("validity") > bound
            )
        else:
            new_entries = salted_in

        stats = new_entries.groupBy("p_salt").agg(
            F.count(F.lit(1)).alias("rows"),
            F.max(F.col("ts") + F.col("validity")).alias("max_until"),
        ).collect()
        rows_in = sum(r["rows"] for r in stats)
        lineage = {
            "run_id": run_id or f"run-{len(ckpt['runs'])}",
            "rows_in": int(rows_in),
            "bytes_in_approx": int(rows_in) * 28,  # 3x8B numeric + key overhead
            "rows_in_by_salt": {str(r["p_salt"]): int(r["rows"]) for r in stats},
            "tiers": {},
            "started_unix": int(time.time()),
        }
        if rows_in == 0:
            ckpt["runs"].append(lineage)
            self._commit_checkpoint(ckpt)
            return lineage

        new_entries = new_entries.drop("p_salt")
        # finest tier via the full/partial split: fully-covered buckets come
        # straight out of a Generate+Project (no hash aggregate); only the
        # <=2 edge pieces per entry aggregate. Both branches stay
        # key-partitioned, so the first-run in-memory chain below
        # reaggregates each branch shuffle-free (a union would report
        # UnknownPartitioning and force a full finest-tier exchange).
        par = spark.sparkContext.defaultParallelism * 2
        base = new_entries.repartition(par, *self.key_cols)
        b_full, b_part = rollup_time_weighted_parts(
            base, self.key_cols, self.steps[finest]
        )
        if changed_from:
            # drop partial buckets below the rewritten partitions (per salt)
            keep = self._per_salt_bucket_filter(lows[finest])
            b_full, b_part = b_full.filter(keep), b_part.filter(keep)
        # persist each tier's PRE-salted frame: both its own write and the
        # next tier's reaggregation read it, so every tier is computed once
        # (caching the salted projection instead would not match the
        # reaggregation's subplan and each tier would recompute the chain)
        persisted = [b_full.persist(), b_part.persist()]
        tier_df = b_full.unionByName(b_part)
        try:
            for i, name in enumerate(names):
                if i > 0:
                    if changed_from:
                        # a coarser tier's partitions are wider than the
                        # finer tier's increment, so read the STORED finer
                        # tier back for the full rewrite window -- coarser
                        # tiers never touch raw data, only the previous tier
                        prev = self.backend.read(
                            spark, self.tier_path(names[i - 1])
                        ).drop("p_day", "p_salt")
                        src = prev.filter(
                            self._per_salt_bucket_filter(lows[name])
                        )
                        tier_df = reaggregate_rollup(
                            src, self.key_cols, self.steps[name]
                        )
                    elif i == 1:
                        # first run: chain from the persisted finest-tier
                        # branches (each key-partitioned -> shuffle-free
                        # partial reaggregation; only the per-branch partial
                        # results shuffle for the final combine)
                        h_parts = reaggregate_rollup(
                            b_full, self.key_cols, self.steps[name]
                        ).unionByName(
                            reaggregate_rollup(
                                b_part, self.key_cols, self.steps[name]
                            )
                        )
                        tier_df = reaggregate_rollup(
                            h_parts, self.key_cols, self.steps[name]
                        )
                    else:
                        # coarser first-run tiers chain from the previous
                        # (small, persisted) tier frame
                        tier_df = reaggregate_rollup(
                            persisted[-1], self.key_cols, self.steps[name]
                        )
                    tier_df = tier_df.persist()
                    persisted.append(tier_df)
                self._write_tier(name, tier_df, lineage)
        finally:
            for df in persisted:
                df.unpersist()

        for r in stats:
            if r["max_until"] is not None:
                ckpt["watermarks"][str(r["p_salt"])] = int(r["max_until"])
        ckpt["runs"].append(lineage)
        self._commit_checkpoint(ckpt)
        self._write_metrics(spark, lineage)
        return lineage

    # rough on-disk row width for byte lineage: bucket/twmean/vmin/vmax/
    # integral_s/support_ms/n_pieces numerics + key overhead
    _ROW_BYTES = 64

    def _write_tier(self, name: str, df: DataFrame, lineage: dict) -> None:
        """``df`` must already be persisted by the caller (both the metrics
        pass and the write below read it, and so does the next tier)."""
        out = self._salted(df, self._part_step(name))
        path = self.tier_path(name)
        # per-output-partition row/byte lineage (the north rule's
        # "lineage + row/byte metrics emitted per partition")
        parts = out.groupBy("p_day", "p_salt").count().collect()
        n = sum(r["count"] for r in parts)
        # user-numbered repartition: AQE's size-based coalescing would squash
        # a small tier to ONE task, which then writes every (day, salt)
        # partition dir serially; pinning the count keeps the file fan-out
        # parallel (same trap as the Arrow kernel stages, operators/_kernel.py)
        n_write = min(
            max(len(parts), 1),
            df.sparkSession.sparkContext.defaultParallelism * 2,
        )
        self.backend.overwrite_partitions(
            out.repartition(n_write, "p_day", "p_salt"),
            path,
            ["p_day", "p_salt"],
        )
        lineage["tiers"][name] = {
            "points": n,
            "path": path,
            "partitions": [
                {
                    "p_day": int(r["p_day"]),
                    "p_salt": int(r["p_salt"]),
                    "rows": int(r["count"]),
                    "bytes_approx": int(r["count"]) * self._ROW_BYTES,
                }
                for r in sorted(parts, key=lambda r: (r["p_day"], r["p_salt"]))
            ],
        }

    def _write_metrics(self, spark: SparkSession, lineage: dict) -> None:
        rec = [
            (
                lineage["run_id"],
                name,
                p["p_day"],
                p["p_salt"],
                p["rows"],
                p["bytes_approx"],
                lineage["rows_in"],
                lineage["started_unix"],
            )
            for name, t in lineage["tiers"].items()
            for p in t["partitions"]
        ]
        self.backend.append(
            spark.createDataFrame(
                rec,
                "run_id string, tier string, p_day long, p_salt int, rows long, "
                "bytes_approx long, rows_in long, started long",
            ),
            self.backend.ref(self.base_dir, "_metrics"),
        )

    def read_tier(self, spark: SparkSession, name: str) -> DataFrame:
        return self.backend.read(spark, self.tier_path(name)).drop(
            "p_day", "p_salt"
        )
