"""Streaming merge under a hot key: correctness + bounded state.

Round-6 hardening (VERDICT next-round #5): one key carries ~100x the
entries of the others across 3+ micro-batches. The emitted rows must
still equal the batch merge restricted to the stable prefix, and the
per-key pending state (the s0_*/s1_* arrays in the state store) must be
bounded by the inter-stream LAG — a handful of entries — not by the
number of entries the hot key has streamed through.
"""

import os

import pytest

pytestmark = pytest.mark.spark

SCHEMA = "key string, ts long, value double, validity long"


def _run_stream(spark, src_l, src_r, ckpt, out):
    from scala_timeseries_lib_spark.streaming.structured import (
        stream_merge_series,
    )

    left = spark.readStream.schema(SCHEMA).parquet(src_l)
    right = spark.readStream.schema(SCHEMA).parquet(src_r)
    merged = stream_merge_series(left, right, ["key"], op="plus")
    q = (
        merged.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise RuntimeError("streaming trigger did not finish within 180s")


def _expected(left_rows, right_rows):
    import numpy as np

    from scala_timeseries_lib_spark.kernel.merge import merge_apply_numeric

    keys = {r[0] for r in left_rows} | {r[0] for r in right_rows}
    out = []
    for k in keys:
        a = sorted((ts, v, d) for kk, ts, v, d in left_rows if kk == k)
        b = sorted((ts, v, d) for kk, ts, v, d in right_rows if kk == k)
        if not a or not b:
            continue
        frontier = min(a[-1][0] + a[-1][2], b[-1][0] + b[-1][2])
        m_ts, m_val, m_dur = merge_apply_numeric(
            np.array([e[0] for e in a]), np.array([e[1] for e in a]),
            np.array([e[2] for e in a]),
            np.array([e[0] for e in b]), np.array([e[1] for e in b]),
            np.array([e[2] for e in b]),
            op="plus", compress=True,
        )
        for ts, v, d in zip(m_ts.tolist(), m_val.tolist(), m_dur.tolist()):
            if ts + d < frontier:
                out.append((k, ts, v, d))
    return sorted(out)


def test_hot_key_stream_correct_and_state_bounded(spark, tmp_path):
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    os.makedirs(src_l)
    os.makedirs(src_r)

    # hot key: 100 contiguous entries/side/batch over 4 batches; cold keys:
    # 1 entry/side/batch. Values vary so RLE cannot collapse the hot runs.
    n_batches, hot_per_batch = 4, 100
    left_all, right_all = [], []
    for b in range(n_batches):
        lb, rb = [], []
        base = b * hot_per_batch * 10
        for i in range(hot_per_batch):
            ts = base + i * 10
            lb.append(("hot", ts, float(i % 7), 10))
            # right side lags by one entry width: ends 10 below left's end
            rb.append(("hot", ts - 10, float(i % 5), 10))
        for k in ("c1", "c2"):
            lb.append((k, b * 40, float(b), 20))
            rb.append((k, b * 40 + 5, float(b + 1), 20))
        left_all += lb
        right_all += rb
        spark.createDataFrame(lb, SCHEMA).coalesce(1).write.mode(
            "append").parquet(src_l)
        spark.createDataFrame(rb, SCHEMA).coalesce(1).write.mode(
            "append").parquet(src_r)
        _run_stream(spark, src_l, src_r, ckpt, out)

    got = sorted(
        (r["key"], r["ts"], r["value"], r["validity"])
        for r in spark.read.parquet(out).collect()
    )
    exp = _expected(left_all, right_all)
    assert got == exp
    hot_rows = [r for r in got if r[0] == "hot"]
    assert len(hot_rows) > 300  # the hot key genuinely streamed ~100x

    # State bound: pending arrays are pruned to the inter-stream lag (one
    # entry here) plus the frontier straddler — nowhere near the 400
    # entries the hot key pushed through. Read the state store directly.
    state = (
        spark.read.format("statestore")
        .option("path", ckpt)
        .load()
        .selectExpr(
            "key.key AS k",
            "size(value.groupState.s0_ts) AS n0",
            "size(value.groupState.s1_ts) AS n1",
        )
        .collect()
    )
    by_key = {r["k"]: (r["n0"], r["n1"]) for r in state}
    assert set(by_key) == {"hot", "c1", "c2"}
    for k, (n0, n1) in by_key.items():
        assert 0 <= n0 <= 4 and 0 <= n1 <= 4, (
            f"state for {k} not bounded by lag: s0={n0} s1={n1}"
        )
