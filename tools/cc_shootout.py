"""Connected-components shootout: min-label propagation vs the
large-star/small-star contraction (Kiveris et al., SoCC 2014) — the
measurement behind the ``neardup_clusters`` default (VERDICT r3 #3).

Three regimes:

1. **Deep chain, 10^5 docs** (the label-prop worst case: rounds = component
   DIAMETER). Star runs to convergence (O(log n) rounds). Label-prop would
   need 10^5 rounds (one Spark job each, ~days); instead its per-round cost
   is measured over ``--lp-rounds`` rounds and the full cost reported as an
   extrapolation — marked as such.
2. **Deep chain, small (256)** — both run to actual convergence; outputs
   compared for equality.
3. **Realistic LSH graph at sf0.01** (dense, flat components from shared
   buckets) — both run to convergence; outputs compared.

Prints one JSON line; the table lands in BENCH/BASELINE.md.

Usage: python tools/cc_shootout.py [--chain 100000] [--small-chain 256]
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
    ap.add_argument("--chain", type=int, default=100_000)
    ap.add_argument("--small-chain", type=int, default=256)
    ap.add_argument("--lp-rounds", type=int, default=20,
                    help="label-prop rounds to time on the big chain "
                         "(extrapolation base)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from scala_timeseries_lib_spark.functions.dedup import (
        minhash_lsh_pairs,
        neardup_clusters,
    )
    from scala_timeseries_lib_spark.plans.session import get_spark

    spark = get_spark(shuffle_partitions=32)
    out = {"metric": "cc_shootout"}

    def chain_frames(k):
        docs = spark.range(k).select(F.col("id").alias("doc_id"))
        pairs = spark.range(k - 1).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        return docs, pairs

    # -- regime 1: 10^5 chain ------------------------------------------------
    docs, pairs = chain_frames(args.chain)
    t0 = time.time()
    stars = neardup_clusters(docs, pairs, algorithm="star",
                             max_iterations=64)
    n_comp = stars.select("canonical_id").distinct().count()
    star_sec = round(time.time() - t0, 3)
    assert n_comp == 1, f"chain must be one component, got {n_comp}"
    out["chain_100k"] = {
        "n_docs": args.chain,
        "star_sec_to_convergence": star_sec,
        "lp_status": "extrapolated (rounds = diameter)",
    }
    # label-prop per-round cost on the same graph, WITHOUT convergence
    import scala_timeseries_lib_spark.functions.dedup as dd

    edges = pairs.select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("t")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("t"))
    ).localCheckpoint(eager=True)
    labels = docs.select(
        F.col("doc_id").alias("s"), F.col("doc_id").alias("label")
    ).localCheckpoint(eager=True)
    t0 = time.time()
    for _ in range(args.lp_rounds):
        prop = (
            edges.join(
                labels.select(F.col("s").alias("t"),
                              F.col("label").alias("nlabel")),
                "t",
            ).groupBy("s").agg(F.min("nlabel").alias("nmin"))
        )
        labels = labels.join(prop, "s", "left").select(
            "s",
            F.least(F.col("label"),
                    F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
        ).localCheckpoint(eager=True)
    per_round = (time.time() - t0) / args.lp_rounds
    out["chain_100k"]["lp_sec_per_round"] = round(per_round, 3)
    out["chain_100k"]["lp_sec_extrapolated_full"] = round(
        per_round * args.chain, 1
    )
    _ = dd  # keep the namespace import explicit for readers

    # -- regime 2: small chain, both to convergence --------------------------
    docs_s, pairs_s = chain_frames(args.small_chain)
    res = {}
    for algo in ("label_prop", "star"):
        t0 = time.time()
        cl = neardup_clusters(
            docs_s, pairs_s, algorithm=algo,
            max_iterations=args.small_chain + 8,
        )
        vals = sorted((r.doc_id, r.canonical_id) for r in cl.collect())
        res[algo] = {"sec": round(time.time() - t0, 3), "vals": vals}
    assert res["label_prop"]["vals"] == res["star"]["vals"]
    out["chain_small"] = {
        "n_docs": args.small_chain,
        "label_prop_sec": res["label_prop"]["sec"],
        "star_sec": res["star"]["sec"],
        "outputs_equal": True,
    }

    # -- regime 3: realistic LSH graph at sf0.01 -----------------------------
    docs_r = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    pairs_r = minhash_lsh_pairs(docs_r, max_bucket_size=50).localCheckpoint(
        eager=True
    )
    res_r = {}
    for algo in ("label_prop", "star"):
        t0 = time.time()
        cl = neardup_clusters(docs_r, pairs_r, algorithm=algo)
        vals = sorted(
            (r.doc_id, r.canonical_id) for r in cl.collect()
        )
        res_r[algo] = {"sec": round(time.time() - t0, 3), "vals": vals}
    assert res_r["label_prop"]["vals"] == res_r["star"]["vals"]
    out["lsh_sf001"] = {
        "n_pairs": pairs_r.count(),
        "label_prop_sec": res_r["label_prop"]["sec"],
        "star_sec": res_r["star"]["sec"],
        "outputs_equal": True,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
