"""Recall of the ANN paths vs exact brute-force kNN, measured not argued.

For every vector as query (not just the 8 driver probes): recall@k =
|ANN top-k ∩ exact top-k| / k, averaged over queries. Compares:

- ann_lsh_topk (random-hyperplane bucket, the candidate-pruning trade)
- ann_ivf_topk train_iters=0 (untrained identity-pick coarse quantizer)
- ann_ivf_topk train_iters=3 (exact-integer spherical k-means, round 5)

Prints one JSON line; the BENCH/BASELINE.md recall note quotes it.

Usage: python tools/ann_recall.py [--sf-dir /root/testdata/sf0.01] [--k 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from scala_timeseries_lib_spark.functions.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        knn_bruteforce,
    )
    from scala_timeseries_lib_spark.plans.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores * 2)
    embs = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    qids = list(range(args.n_queries))

    def topk_sets(df):
        sets: dict[int, set[int]] = {}
        for r in df.collect():
            sets.setdefault(r["query_id"], set()).add(r["cand_id"])
        return sets

    exact = topk_sets(knn_bruteforce(embs, qids, k=args.k))

    def recall(df):
        got = topk_sets(df)
        per_q = [
            len(got.get(q, set()) & exact[q]) / len(exact[q])
            for q in exact
        ]
        return round(sum(per_q) / len(per_q), 4)

    out = {
        "sf_dir": args.sf_dir,
        "k": args.k,
        "n_queries": len(exact),
        "recall_lsh": recall(ann_lsh_topk(embs, qids, k=args.k)),
        "recall_ivf_untrained": recall(
            ann_ivf_topk(embs, qids, k=args.k, train_iters=0)
        ),
        "recall_ivf_trained": recall(
            ann_ivf_topk(embs, qids, k=args.k, train_iters=3)
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
