"""Two-parallelism scaling measurement (the sandbox proxy for N vs 4N
executors, BASELINE.json / BASELINE.md).

Measures the tier rollup COMPUTE (raw -> 1m -> 1h -> 1d, forced via
aggregation, no file-system writes) on an input amplified ``--replicate``
times (distinct key spaces), so per-core work dominates fixed overhead.

Methodology notes (why warmup + best-of-k):
- a fresh JVM runs the first rollup interpreted; whole-stage-codegen classes
  JIT-compile during it. One full untimed pipeline pass warms that up.
- single-JVM local mode shares one heap across all cores; timing noise from
  GC is real, so we report the best of ``--iters`` timed passes per core
  count (the cluster-relevant steady-state number).

Prints one JSON line per run.

Usage: python tools/scaling_bench.py --cores 8 [--sf-dir ...]
       [--replicate 12] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=12)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import force
    from scala_timeseries_lib_spark.operators import series_ops as ops
    from scala_timeseries_lib_spark.operators.entries import derive_entries
    from scala_timeseries_lib_spark.plans.session import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=max(args.cores * 2, 16),
        extra_conf={"spark.driver.memory": "24g"},
    )
    keys = ["user_id", "event_type"]
    events = spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
    if args.replicate > 1:
        rep = spark.range(args.replicate).select(F.col("id").alias("rep"))
        events = events.crossJoin(rep).withColumn(
            "user_id", F.col("user_id") + F.col("rep") * 1_000_000
        ).drop("rep")
    entries = derive_entries(events, keys, ts_col="ts", value_col="value")
    entries = entries.persist()
    n_entries = entries.count()  # materialize input once, outside the timer

    def run():
        tier_1m = ops.rollup_time_weighted(entries, keys, 60_000)
        tier_1m.persist()
        p1 = force(tier_1m)
        tier_1h = ops.reaggregate_rollup(tier_1m, keys, 3_600_000)
        tier_1h.persist()
        p2 = force(tier_1h)
        tier_1d = ops.reaggregate_rollup(tier_1h, keys, 86_400_000)
        p3 = force(tier_1d)
        tier_1m.unpersist()
        tier_1h.unpersist()
        return p1 + p2 + p3

    run()  # untimed warmup: JIT-compiles the codegen'd explode+agg pipeline

    best, points = None, 0
    for _ in range(max(args.iters, 1)):
        t0 = time.time()
        points = run()
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)

    print(
        json.dumps(
            {
                "cores": args.cores,
                "entries": n_entries,
                "points": points,
                "wall_sec": round(best, 3),
                "points_per_sec": round(points / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
