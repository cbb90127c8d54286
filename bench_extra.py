"""Round-6 optimization harness (guide §1): per-query noop-sink isolation.

NOT part of the driver contract -- ``bench.py`` stays the frozen
measurement. This file exists so each optimization can be measured in
isolation (noop sink computes every column of every row without paying a
real sink, guide §1.4), with jobs labelled (§1.5) and the
``.explain("formatted")`` plan captured to ``plans/r06/<query>_<tag>.txt``
for the plan-diff evidence.

Usage:
  python bench_extra.py [--sf /root/testdata/sf0.1] [--repeat 3]
      [--queries ts_merge_plus,ts_rollup_1h] [--tag before] [--no-explain]
      [--tiers]  # also time the tier-pipeline stages individually
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "ts_entries",
    "ts_rollup_1h",
    "ts_merge_plus",
    "ts_sample_10m",
    "ts_sliding_integral_1h",
    "ts_gorilla_roundtrip",
    "ts_fill_locf",
    "ts_step_integral",
]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--tag", default=None,
                    help="write plans/r06/<query>_<tag>.txt explains")
    ap.add_argument("--tiers", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from scala_timeseries_lib_spark.plans.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    names = (args.queries.split(",") if args.queries else DEFAULT_QUERIES)
    qs = entry_mod.queries()

    # warmup (JIT + python workers), same shape as bench.py
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        noop(qs["ts_rollup_1h"](spark, warm))
        noop(qs["ts_merge_plus"](spark, warm))
        noop(qs["ts_gorilla_roundtrip"](spark, warm))

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if args.tag:
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(fn(spark, args.sf)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        best, ss = None, []
        for i in range(args.repeat):
            sc.setJobDescription(f"r06 {name} pass {i}")
            t0 = time.time()
            noop(fn(spark, args.sf))
            dt = time.time() - t0
            ss.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        out[name] = round(best, 3)
        samples[name] = ss
        print(f"  {name:28s} best={best:.3f}  {ss}", file=sys.stderr)

    if args.tiers:
        from scala_timeseries_lib_spark.operators import series_ops as ops

        def stage(label, fn, k=args.repeat):
            best, ss = None, []
            for i in range(k):
                sc.setJobDescription(f"r06 tier:{label} pass {i}")
                t0 = time.time()
                fn()
                dt = time.time() - t0
                ss.append(round(dt, 3))
                best = dt if best is None else min(best, dt)
            sc.setJobDescription(None)
            out[f"tier:{label}"] = round(best, 3)
            samples[f"tier:{label}"] = ss
            print(f"  tier:{label:23s} best={best:.3f}  {ss}", file=sys.stderr)

        stage("entries", lambda: noop(entry_mod._entries(spark, args.sf)))
        t1m = ops.rollup_time_weighted(
            entry_mod._entries(spark, args.sf), entry_mod.KEYS, 60_000,
            disjoint=False)
        stage("1m_rollup", lambda: noop(t1m))

        def full_chain():
            import bench
            bench.tier_pipeline_points(spark, args.sf)

        stage("full_chain_bench_shape", full_chain)

    print(json.dumps({"sf": args.sf, "best": out, "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
