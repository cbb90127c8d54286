"""Kernel (Arrow/numpy) vs relational (pure-Catalyst) merge crossover.

Times the same binary merge through both engines at $SPARK_GRAFT_SF_DIR
(default sf0.1), plain and at ``--replicate k`` key-space amplification
(the overhead-amortized regime), best-of-``--repeat`` serialized passes per
cell. One JSON line; the table lands in BENCH/BASELINE.md.

Usage: python tools/merge_crossover.py [--replicate 16] [--repeat 3]
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
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--ops", default="plus,fallback")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from bench import force
    from scala_timeseries_lib_spark.operators.merge import merge_series
    from scala_timeseries_lib_spark.plans.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32)

    entries = entry_mod._entries(spark, sf_dir)
    a = entries.where(F.col("event_type") == "click").drop("event_type")
    b = entries.where(F.col("event_type") == "view").drop("event_type")

    def amplify(df, k):
        rep = spark.sparkSession.range(k) if False else spark.range(k)
        return df.crossJoin(
            rep.select(F.col("id").alias("rep"))
        ).withColumn(
            "user_id", F.col("user_id") + F.col("rep") * 1_000_000
        ).drop("rep")

    cells = {}
    for label, (la, lb) in {
        "sf": (a, b),
        f"sf_x{args.replicate}": (
            amplify(a, args.replicate), amplify(b, args.replicate)
        ),
    }.items():
        la, lb = la.persist(), lb.persist()
        n = la.count() + lb.count()
        for engine in ("kernel", "relational"):
            # warmup, then best-of-k serialized
            force(merge_series(la, lb, ["user_id"], op="plus", engine=engine))
            for op in args.ops.split(","):
                best = None
                for _ in range(args.repeat):
                    t0 = time.time()
                    rows = force(
                        merge_series(la, lb, ["user_id"], op=op, engine=engine)
                    )
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                cells[f"{label}.{op}.{engine}"] = {
                    "sec": round(best, 3),
                    "rows": rows,
                    "input_entries": n,
                }
        la.unpersist(), lb.unpersist()

    out = {"metric": "merge_crossover", "cells": cells, "sf_dir": sf_dir,
           "cpus": int(cpus), "repeat": args.repeat}
    for label in ("sf", f"sf_x{args.replicate}"):
        for op in args.ops.split(","):
            k = cells[f"{label}.{op}.kernel"]["sec"]
            r = cells[f"{label}.{op}.relational"]["sec"]
            out[f"speedup_{label}_{op}"] = round(k / r, 2)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
