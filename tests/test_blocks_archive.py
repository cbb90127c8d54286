"""Gorilla blocks table round-trip: entries -> blocks -> entries, with
time-range pruning before decode (the superblock read path)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scala_timeseries_lib_spark.kernel.fitter import fit
from scala_timeseries_lib_spark.operators.blocks import read_blocks, write_blocks

pytestmark = pytest.mark.spark


def _series(rng, n=200):
    ts = 1_000_000 + np.cumsum(rng.integers(1, 5000, n)).astype(np.int64)
    value = rng.normal(50, 20, n).round(3)
    validity = rng.integers(1, 5000, n).astype(np.int64)
    return fit(list(zip(ts.tolist(), value.tolist(), validity.tolist())), compress=False)


class TestBlocksTable:
    def test_round_trip_and_pruning(self, spark):
        rng = np.random.default_rng(3)
        series = {f"k{i}": _series(rng) for i in range(3)}
        rows = [
            (k, t, v, d) for k, es in series.items() for t, v, d in es
        ]
        df = spark.createDataFrame(rows, "key string, ts long, value double, validity long")
        blocks = write_blocks(
            df, ["key"], bucket_ms=100_000, max_entries_per_block=25, compress=False
        ).cache()
        # archival splits entries at bucket boundaries (TimeBucketer
        # semantics): the round-trip returns the boundary-split series
        from scala_timeseries_lib_spark.kernel.bucket import split_at_buckets

        series = {
            k: split_at_buckets(es, 100_000, origin=0) for k, es in series.items()
        }

        meta = blocks.agg(
            F.max("n_entries").alias("mx"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        assert meta["mx"] <= 25
        assert meta["n"] > 3  # multiple blocks per series

        decoded = read_blocks(blocks, ["key"])
        for k, es in series.items():
            got = [
                (r["ts"], r["value"], r["validity"])
                for r in decoded.filter(F.col("key") == k).orderBy("ts").collect()
            ]
            assert got == es

        # pruned read: only blocks overlapping the window are decoded
        lo = series["k0"][50][0]
        hi = series["k0"][100][0]
        pruned = read_blocks(blocks, ["key"], from_ts=lo, to_ts=hi)
        got = [
            (r["ts"], r["value"], r["validity"])
            for r in pruned.filter(F.col("key") == "k0").orderBy("ts").collect()
        ]
        want = [e for e in series["k0"] if e[0] + e[2] > lo - 100_000 and e[0] < hi + 100_000]
        # pruning is block-granular: result must cover the window exactly and
        # stay within one bucket of slack on each side
        covered = [e for e in got if e[0] + e[2] > lo and e[0] < hi]
        expected_window = [e for e in series["k0"] if e[0] + e[2] > lo and e[0] < hi]
        assert covered == expected_window
        assert all(e in want for e in got)
        blocks.unpersist()

    def test_storage_is_compressed(self, spark):
        # regular grid compresses far below 24 bytes/entry
        n = 5000
        rows = [("k", 1_000_000 + i * 1000, 42.5, 1000) for i in range(n)]
        df = spark.createDataFrame(rows, "key string, ts long, value double, validity long")
        blocks = write_blocks(df, ["key"], bucket_ms=10_000_000, compress=False)
        total = blocks.agg(F.sum(F.length("block_bytes"))).collect()[0][0]
        assert total < n * 24 / 8  # > 8x compression


class TestVectorizedEncodeEquivalence:
    """The numpy block segmentation must be byte-equal to the sequential
    TimeBucketer twin (bucket_entries_maxn + per-block codec)."""

    @pytest.mark.parametrize("seed,compress", [(1, True), (2, False), (7, True)])
    def test_blocks_match_sequential_twin(self, spark, seed, compress):
        from scala_timeseries_lib_spark.kernel.bucket import (
            bucket_entries_maxn,
            bucket_generator,
        )
        from scala_timeseries_lib_spark.kernel.gorilla import compress_tuple_block

        rng = np.random.default_rng(seed)
        bucket_ms, max_n = 50_000, 7
        series = {}
        for i in range(4):
            n = int(rng.integers(3, 120))
            ts = 1_000_000 + np.cumsum(rng.integers(1, 40_000, n)).astype(np.int64)
            value = rng.normal(0, 10, n).round(2)
            # long validities straddle multiple buckets; occasional huge gaps
            # leave empty buckets between blocks
            validity = rng.integers(1, 120_000, n).astype(np.int64)
            series[f"s{i}"] = fit(
                list(zip(ts.tolist(), value.tolist(), validity.tolist())),
                compress=False,
            )
        rows = [(k, t, v, d) for k, es in series.items() for t, v, d in es]
        df = spark.createDataFrame(
            rows, "key string, ts long, value double, validity long"
        )
        got = {
            k: sorted(v)
            for k, v in _group_blocks(
                write_blocks(
                    df, ["key"], bucket_ms=bucket_ms,
                    max_entries_per_block=max_n, compress=compress,
                ).collect()
            ).items()
        }
        want = {}
        for k, es in series.items():
            origin = es[0][0] - es[0][0] % bucket_ms
            blks = bucket_entries_maxn(
                es, bucket_generator(origin, bucket_ms), max_n
            )
            want[k] = sorted(
                (int(bs), int(bv), compress_tuple_block(bents, compress=compress),
                 len(bents))
                for bs, bents, bv in blks
                if bents
            )
        assert got == want


def _group_blocks(rows):
    out = {}
    for r in rows:
        out.setdefault(r["key"], []).append(
            (r["block_start_ts"], r["block_validity"], bytes(r["block_bytes"]),
             r["n_entries"])
        )
    return out
