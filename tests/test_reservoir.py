"""Uniform reservoir (Vitter Algorithm R) semantics, kernel + distributed.

Reference contract: stats/ThreadUnsafeDoubleUniformReservoir.scala:26-78
(real min/max kept outside the sample; snapshot = mean, SAMPLE stddev with
0.0 for n<=1, codahale (n+1)-interpolated median; all-zeros snapshot for
zero observations, line 84)."""

import math
import random

import pytest

from scala_timeseries_lib_spark.kernel.reservoir import (
    DEFAULT_SIZE,
    Reservoir,
    Stats,
    compute_stats,
)


class TestKernelReservoir:
    def test_default_size_matches_reference(self):
        assert DEFAULT_SIZE == 1028
        assert Reservoir().size == 1028

    def test_empty_snapshot_is_zero_stats(self):
        assert Reservoir().snapshot() == Stats(0.0, 0.0, 0.0, 0.0, 0.0)

    def test_unfilled_reservoir_is_exact(self):
        r = Reservoir(size=100).update_many([4.0, 1.0, 3.0, 2.0])
        s = r.snapshot()
        assert (s.min, s.max, s.mean) == (1.0, 4.0, 2.5)
        # sample stddev over {1,2,3,4}: sqrt(5/3)
        assert s.stddev == pytest.approx(math.sqrt(5.0 / 3.0))
        # codahale median for n=4: pos=2.5 -> 2 + 0.5*(3-2) = 2.5
        assert s.median == pytest.approx(2.5)

    def test_single_value_stddev_zero(self):
        s = Reservoir().update(7.5).snapshot()
        assert s == Stats(7.5, 7.5, 7.5, 0.0, 7.5)

    def test_real_min_max_survive_eviction(self):
        """min/max track ALL observations, not just the surviving sample."""
        r = Reservoir(size=8, seed=1)
        r.update(-1000.0)
        r.update(1000.0)
        r.update_many(float(i) for i in range(500))
        s = r.snapshot()
        assert s.min == -1000.0 and s.max == 1000.0
        assert len(r.values) == 8 and r.count == 502

    def test_uniformity_smoke(self):
        """Algorithm R keeps each element with probability size/count:
        the sample mean over many trials tracks the population mean."""
        means = []
        for trial in range(30):
            r = Reservoir(size=64, seed=trial)
            r.update_many(float(i) for i in range(2000))
            means.append(r.snapshot().mean)
        grand = sum(means) / len(means)
        assert grand == pytest.approx(999.5, rel=0.05)

    def test_quantile_interpolation_rule(self):
        # n=2: pos=1.5 -> average of the two
        assert compute_stats([1.0, 3.0], 1.0, 3.0).median == pytest.approx(2.0)
        # n=3: pos=2.0 -> exactly the middle element
        assert compute_stats([1.0, 2.0, 9.0], 1.0, 9.0).median == pytest.approx(2.0)


class TestDistributedReservoir:
    def test_matches_kernel_when_unfilled(self, spark):
        """sample = everything when count <= size: the distributed snapshot
        must equal the sequential kernel twin exactly."""
        from scala_timeseries_lib_spark.operators.series_ops import reservoir_stats

        rng = random.Random(7)
        rows = []
        expected = {}
        for k in ("a", "b", "c"):
            vals = [round(rng.uniform(-50, 50), 3) for _ in range(rng.randint(1, 60))]
            rows += [(k, 1000 + 10 * i, v, 10) for i, v in enumerate(vals)]
            expected[k] = Reservoir(size=1028).update_many(vals).snapshot()
        df = spark.createDataFrame(rows, "k string, ts long, value double, validity long")
        got = {r["k"]: r for r in reservoir_stats(df, ["k"], size=1028).collect()}
        for k, exp in expected.items():
            g = got[k]
            assert g["n"] == g["sample_n"]
            assert g["vmin"] == exp.min and g["vmax"] == exp.max
            assert g["mean"] == pytest.approx(exp.mean, abs=1e-9)
            assert g["stddev"] == pytest.approx(exp.stddev, abs=1e-9)
            assert g["median"] == pytest.approx(exp.median, abs=1e-9)

    def test_capped_sample_bounds_and_real_extremes(self, spark):
        from scala_timeseries_lib_spark.operators.series_ops import reservoir_stats

        rows = [("k", 1000 + i, float(i), 1) for i in range(500)]
        df = spark.createDataFrame(rows, "k string, ts long, value double, validity long")
        r = reservoir_stats(df, ["k"], size=32).collect()[0]
        assert r["n"] == 500 and r["sample_n"] == 32
        assert r["vmin"] == 0.0 and r["vmax"] == 499.0  # exact, not sampled
        # uniform sample of 0..499: mean lands near the population mean
        assert 150 < r["mean"] < 350

    def test_deterministic_under_seed(self, spark):
        from scala_timeseries_lib_spark.operators.series_ops import reservoir_stats

        rows = [("k", 1000 + i, float(i * i % 97), 1) for i in range(300)]
        df = spark.createDataFrame(rows, "k string, ts long, value double, validity long")
        a = reservoir_stats(df.repartition(7), ["k"], size=16, seed=5).collect()[0]
        b = reservoir_stats(df.repartition(3), ["k"], size=16, seed=5).collect()[0]
        assert a == b  # partitioning-independent and seed-deterministic
