"""Hardware scaling-ceiling probe: per-core slowdown between two
parallelism levels, measured with an engine-free pure-CPU workload.

Runs K independent OS processes, each executing the SAME fixed integer
loop (no shared memory, no allocation growth, no I/O, no Python GIL
contention -- separate processes). On ideal hardware wall time is flat in
K; any increase is the box itself (frequency scaling under all-core load,
VM co-tenancy / host oversubscription), not the workload.

The ratio t_small / t_big bounds the achievable *strong-scaling*
efficiency between the two levels for ANY workload on this box:

    max_efficiency(small -> big) = t_small / t_big   (per-core speed ratio)

e.g. t8=5.75s, t32=7.35s => no job, however perfectly parallel, can
exceed (t8/t32) = 0.78 efficiency going 8 -> 32 cores here.

Usage: python tools/cpu_ceiling_probe.py [small] [big] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def _run(procs: int, n: int) -> float:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_burn, [n] * procs)
    return time.time() - t0


def measure(small: int = 8, big: int = 32, reps: int = 3,
            n: int = 60_000_000) -> dict:
    """Importable probe (tools/scaling_bench.py runs this inline before and
    after each timed scaling pair so every scaling artifact carries its own
    hardware context). Returns the probe dict; ``max_strong_scaling_
    efficiency`` is the ceiling any workload is subject to that instant."""
    _run(small, n // 10)  # warm pool/page-cache
    t_small = min(_run(small, n) for _ in range(reps))
    t_big = min(_run(big, n) for _ in range(reps))
    return {
        "procs_small": small,
        "procs_big": big,
        "t_small_sec": round(t_small, 3),
        "t_big_sec": round(t_big, 3),
        "per_core_slowdown": round(t_big / t_small, 3),
        "max_strong_scaling_efficiency": round(t_small / t_big, 3),
    }


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    print(json.dumps(measure(small, big, reps)))


if __name__ == "__main__":
    main()
