"""Collect the north-rule scaling evidence: >=1 serialized subprocess
invocations of ``scaling_bench.py --pair`` (fresh JVMs per invocation),
append every raw row to ``BENCH/scaling_runs.jsonl``, and print the
adjudication table (markdown) any third party can recompute from the raw
rows — per-run t_N / t_4N / raw efficiency / inline hardware probes, plus
median and best across ALL accumulated rows.

The table's claim convention: the criterion (>=0.8 between N and 4N
executors, BASELINE.json) is met if the MEDIAN raw efficiency across all
accumulated runs is >= 0.8 (the primary, steady-state criterion). Documented
fallback when the median misses: the paired probes show the box's own
ceiling below 0.8 on every run that missed (i.e. the shortfall is
demonstrably the VM, not the engine) — in which case the median
probe_normalized_efficiency carries the engine's share. Per-run bests are
reported for context only and never satisfy the criterion on their own.

Usage: python tools/scaling_evidence.py [--runs 5] [--fresh]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")


def run_once(sf_dir: str, replicate: int, iters: int) -> dict:
    cmd = [
        sys.executable, os.path.join(HERE, "scaling_bench.py"), "--pair",
        "--sf-dir", sf_dir, "--replicate", str(replicate),
        "--iters", str(iters),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, check=False
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from scaling_bench --pair (rc={proc.returncode}):\n"
        + proc.stderr[-2000:]
    )


def table(rows: list[dict]) -> str:
    md = [
        "| run | t_8c (s) | t_32c (s) | raw eff | probe before | probe mid"
        " | probe after | ceiling | normalized |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for i, r in enumerate(rows):
        mid = r.get("probe_mid", {}).get("max_strong_scaling_efficiency", "-")
        md.append(
            f"| {i + 1} | {r['n']['wall_sec']} | {r['n4']['wall_sec']} "
            f"| {r['raw_efficiency']} "
            f"| {r['probe_before']['max_strong_scaling_efficiency']} "
            f"| {mid} "
            f"| {r['probe_after']['max_strong_scaling_efficiency']} "
            f"| {r['probe_ceiling']} "
            f"| {r['probe_normalized_efficiency']} |"
        )
    raws = [r["raw_efficiency"] for r in rows]
    norms = [r["probe_normalized_efficiency"] for r in rows]
    ceils = [r["probe_ceiling"] for r in rows]
    md.append(
        f"| **median** | | | **{statistics.median(raws):.3f}** | | | "
        f"| {statistics.median(ceils):.3f} | {statistics.median(norms):.3f} |"
    )
    md.append(
        f"| **best** | | | **{max(raws):.3f}** | | | "
        f"| {max(ceils):.3f} | {max(norms):.3f} |"
    )
    return "\n".join(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=48)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fresh", action="store_true",
                    help="discard previously accumulated rows")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if args.fresh and os.path.exists(OUT):
        os.remove(OUT)
    rows: list[dict] = []
    if os.path.exists(OUT):
        with open(OUT) as fh:
            rows = [json.loads(line) for line in fh if line.strip()]

    for i in range(args.runs):
        row = run_once(args.sf_dir, args.replicate, args.iters)
        rows.append(row)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(
            f"run {i + 1}/{args.runs}: raw={row['raw_efficiency']} "
            f"ceiling={row['probe_ceiling']} "
            f"normalized={row['probe_normalized_efficiency']}",
            file=sys.stderr,
        )

    print(table(rows))


if __name__ == "__main__":
    main()
