"""Uniform double reservoir (Vitter Algorithm R) + stats snapshot.

From-scratch port-free reimplementation of the reference's
stats/ThreadUnsafeDoubleUniformReservoir.scala:26-78 (Vitter's Algorithm R
over doubles, keeping the REAL observed min/max outside the sample) and its
UniformDoubleSnapshot.computeStats (ThreadUnsafeDoubleUniformReservoir.scala:
86-148): mean over the sample, SAMPLE standard deviation (n-1 denominator,
0.0 for n <= 1), and the codahale-style interpolated quantile
``pos = q * (n + 1)`` for the median. Zero observations snapshot to all
zeros (Stats.ZeroStats, line 84).

The reference object is single-threaded and mutable by design ("thread
unsafe", line 20-25); this one is the same, intended for per-series use
inside a kernel. The DISTRIBUTED analog is
``operators.series_ops.reservoir_stats``: a bottom-k-by-uniform-hash
sample per key (equivalent in distribution to Algorithm R's uniform
without-replacement sample, but order-independent and mergeable across
partitions) with exact min/max/count carried alongside.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass

__all__ = ["Stats", "Reservoir", "compute_stats", "DEFAULT_SIZE"]

DEFAULT_SIZE = 1028  # ThreadUnsafeDoubleUniformReservoir.DefaultSize


@dataclass(frozen=True)
class Stats:
    min: float
    max: float
    mean: float
    stddev: float
    median: float


ZERO_STATS = Stats(0.0, 0.0, 0.0, 0.0, 0.0)


def _quantile(sorted_vals, q: float) -> float:
    """codahale UniformSnapshot.getValue (reference lines 132-147):
    interpolated position q * (n + 1) over the sorted sample."""
    n = len(sorted_vals)
    if n == 0:
        return 0.0
    pos = q * (n + 1)
    idx = int(pos)
    if idx < 1:
        return sorted_vals[0]
    if idx >= n:
        return sorted_vals[-1]
    lower, upper = sorted_vals[idx - 1], sorted_vals[idx]
    return lower + (pos - math.floor(pos)) * (upper - lower)


def compute_stats(sample, mn: float, mx: float) -> Stats:
    """Snapshot over a (possibly sub-)sample with the REAL min/max."""
    vals = sorted(float(v) for v in sample)
    n = len(vals)
    if n == 0:
        return ZERO_STATS
    mean = sum(vals) / n
    if n <= 1:
        sd = 0.0
    else:
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
    return Stats(mn, mx, mean, sd, _quantile(vals, 0.5))


class Reservoir:
    """Vitter Algorithm R over doubles; O(size) memory, single-threaded.

    ``seed`` makes replacement choices deterministic (the reference uses
    ThreadLocalRandom -- nondeterministic by design; a seed keeps tests and
    distributed twins reproducible)."""

    def __init__(self, size: int = DEFAULT_SIZE, seed: int | None = None):
        if size <= 0:
            raise ValueError("reservoir size must be positive")
        self.size = size
        self.count = 0
        self.min = math.inf
        self.max = -math.inf
        self.values: list[float] = []
        self._rng = random.Random(seed)

    def update(self, value: float) -> "Reservoir":
        value = float(value)
        if value < self.min:
            self.min = value
        if value > self.max:
            self.max = value
        if self.count < self.size:
            self.values.append(value)
        else:
            # Algorithm R: keep slot r with probability size/count
            r = self._rng.randrange(self.count)
            if r < self.size:
                self.values[r] = value
        self.count += 1
        return self

    def update_many(self, values) -> "Reservoir":
        for v in values:
            self.update(v)
        return self

    def snapshot(self) -> Stats:
        if self.count == 0:
            return ZERO_STATS
        return compute_stats(self.values, self.min, self.max)
