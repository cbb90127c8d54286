"""Two-parallelism scaling measurement (the sandbox proxy for N vs 4N
executors, BASELINE.json / BENCH/BASELINE.md) — self-adjudicating.

Measures the tier rollup COMPUTE (raw -> 1m -> 1h -> 1d, forced via
aggregation, no file-system writes) on an input amplified ``--replicate``
times (distinct key spaces), so per-core work dominates fixed overhead.

Masters: ``--cores K`` runs ``local[K]`` (threads in one JVM);
``--master 'local-cluster[N,C,MEM_MB]'`` runs N separate executor JVMs with
C cores each -- the honest multi-JVM proxy for N executors on a cluster
(each JVM brings its own heap, allocator, and GC).

``--pair`` runs the north rule's literal 2-executor -> 8-executor pair (4
cores each = the mandated 8/32 core counts) in ONE invocation, with the
pure-CPU hardware probe (tools/cpu_ceiling_probe.py) run inline BEFORE and
AFTER the timed passes. The emitted JSON then carries everything a third
party needs to adjudicate the claim without trusting the narrative:

- ``raw_efficiency``   = (t_N / t_4N) / 4 — the unadjusted measurement;
- ``probe_before`` / ``probe_after`` — the box's own per-core slowdown
  between the same two core counts at the time of the run (an
  embarrassingly-parallel integer loop; no engine, no JVM);
- ``probe_ceiling``    = max of the two probes' max_strong_scaling_
  efficiency (the box at its BEST during the window — the conservative
  normalization base);
- ``probe_normalized_efficiency`` = raw / ceiling — what the same job
  would score on non-degraded hardware, under the probe's bound.

Methodology notes (why warmup + best-of-k):
- a fresh JVM runs the first rollup interpreted; whole-stage-codegen classes
  JIT-compile during it. One full untimed pipeline pass warms that up.
- single-box timings vary +/-15-30% run to run with GC phase alignment and
  VM co-tenancy, so we report the best of ``--iters`` timed passes per core
  count (the cluster-relevant steady-state number).

Tier chain (round 3, matches bench.py): 1m via the full/partial split
(rollup_time_weighted_parts) forced WITHOUT a 74M-row cache; 1h chained
from the recomputed key-partitioned branches (shuffle-free per branch, tiny
final combine); 1d from the cached 1h tier.

Prints one JSON line per run.

Usage: python tools/scaling_bench.py --cores 8 [--sf-dir ...]
       [--replicate 48] [--iters 3] [--master 'local-cluster[2,4,6144]']
       python tools/scaling_bench.py --pair          # the scaling artifact
Collect >=5 serialized --pair invocations with tools/scaling_evidence.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIR_MASTERS = ("local-cluster[2,4,6144]", "local-cluster[8,4,6144]")


def _cores_of(master: str, cores: int | None) -> int:
    if master.startswith("local-cluster["):
        n, c, _m = master[len("local-cluster["):-1].split(",")
        return int(n) * int(c)
    return cores


def measure_master(master: str, cores: int, sf_dir: str,
                   replicate: int, iters: int) -> dict:
    """Warmup + best-of-``iters`` tier-chain wall time on ``master``.
    Starts and stops its own SparkSession (fresh JVMs per measurement)."""
    from pyspark.sql import functions as F

    from bench import force
    from scala_timeseries_lib_spark.operators import series_ops as ops
    from scala_timeseries_lib_spark.operators.entries import derive_entries
    from scala_timeseries_lib_spark.plans.session import get_spark

    spark = get_spark(
        master=master,
        shuffle_partitions=max(cores * 2, 16),
        extra_conf={"spark.driver.memory": "24g"},
    )
    keys = ["user_id", "event_type"]
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if replicate > 1:
        rep = spark.range(replicate).select(F.col("id").alias("rep"))
        events = events.crossJoin(rep).withColumn(
            "user_id", F.col("user_id") + F.col("rep") * 1_000_000
        ).drop("rep")
    entries = derive_entries(events, keys, ts_col="ts", value_col="value")
    entries = entries.persist()
    n_entries = entries.count()  # materialize input once, outside the timer

    par = spark.sparkContext.defaultParallelism * 2

    def run():
        # the 1m-tier force and the 1h/1d chain are INDEPENDENT jobs (the
        # chain recomputes the cheap branches rather than reading a cache),
        # exactly like a real pipeline submitting per-tier writes
        # concurrently -- overlapping them hides per-job fixed overhead
        # (measured -26% wall at 32 cores, -5% at 8)
        import threading  # noqa: PLC0415

        df = entries.repartition(par, *keys)
        full, partial = ops.rollup_time_weighted_parts(df, keys, 60_000)
        res = {}

        def j_finest():
            res["p1"] = force(full.unionByName(partial))

        def j_chain():
            h_parts = ops.reaggregate_rollup(full, keys, 3_600_000).unionByName(
                ops.reaggregate_rollup(partial, keys, 3_600_000)
            )
            tier_1h = ops.reaggregate_rollup(h_parts, keys, 3_600_000)
            tier_1h.persist()
            res["p2"] = force(tier_1h)
            res["p3"] = force(
                ops.reaggregate_rollup(tier_1h, keys, 86_400_000)
            )
            tier_1h.unpersist()

        jobs = [threading.Thread(target=j_finest), threading.Thread(target=j_chain)]
        for t in jobs:
            t.start()
        for t in jobs:
            t.join()
        return res["p1"] + res["p2"] + res["p3"]

    run()  # untimed warmup: JIT-compiles the codegen'd explode+agg pipeline

    best, walls, points = None, [], 0
    for _ in range(max(iters, 1)):
        t0 = time.time()
        points = run()
        wall = time.time() - t0
        walls.append(round(wall, 3))
        best = wall if best is None else min(best, wall)
    spark.stop()
    return {
        "master": master,
        "cores": cores,
        "entries": n_entries,
        "points": points,
        "wall_sec": round(best, 3),
        "walls_all": walls,
        "points_per_sec": round(points / best, 1),
    }


def run_pair(sf_dir: str, replicate: int, iters: int) -> dict:
    """One self-adjudicating N -> 4N invocation:
    probe, t_N, probe, t_4N, probe.

    Three probes because the box state drifts on a minutes timescale (the
    first collected pair saw the ceiling move 0.75 -> 0.94 WITHIN one
    invocation): ``probe_mid`` + ``probe_after`` bracket the 4N leg, which
    is the leg the all-core slowdown actually caps (the N leg runs 8-wide
    and does not saturate the box), so ``probe_ceiling`` is their max (the
    box at its best around the 32-wide leg -- the conservative
    normalization base)."""
    from cpu_ceiling_probe import measure as probe

    out = {"metric": "scaling_pair", "sf_dir": sf_dir,
           "replicate": replicate, "iters": iters,
           "started_unix": int(time.time())}
    out["probe_before"] = probe()
    out["n"] = measure_master(
        PAIR_MASTERS[0], _cores_of(PAIR_MASTERS[0], None),
        sf_dir, replicate, iters,
    )
    out["probe_mid"] = probe()
    out["n4"] = measure_master(
        PAIR_MASTERS[1], _cores_of(PAIR_MASTERS[1], None),
        sf_dir, replicate, iters,
    )
    out["probe_after"] = probe()
    t_n, t_4n = out["n"]["wall_sec"], out["n4"]["wall_sec"]
    ceiling = max(
        out["probe_mid"]["max_strong_scaling_efficiency"],
        out["probe_after"]["max_strong_scaling_efficiency"],
    )
    out["raw_efficiency"] = round((t_n / t_4n) / 4.0, 3)
    out["probe_ceiling"] = ceiling
    out["probe_normalized_efficiency"] = round(
        out["raw_efficiency"] / ceiling, 3
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--master", default=None,
                    help="overrides --cores; e.g. local-cluster[2,4,6144]")
    ap.add_argument("--pair", action="store_true",
                    help="run the 2->8 executor pair with inline probes")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=48)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if args.pair:
        print(json.dumps(run_pair(args.sf_dir, args.replicate, args.iters)))
        return

    if not args.master and args.cores is None:
        ap.error("need --cores, --master, or --pair")
    master = args.master or f"local[{args.cores}]"
    print(json.dumps(measure_master(
        master, _cores_of(master, args.cores), args.sf_dir,
        args.replicate, args.iters,
    )))


if __name__ == "__main__":
    main()
