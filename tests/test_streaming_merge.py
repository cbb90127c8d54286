"""Streaming interval merge (applyInPandasWithState) vs the batch engine.

The reference's StreamMerger.scala:3-58 is commented-out, unfinished code;
stream_merge_series is the working Structured Streaming analog. Micro-batches
are delivered through file sources with availableNow triggers and a persistent
checkpoint (restarts between them); the emitted rows must equal the one-shot
batch merge restricted to the stable prefix (segments ending strictly below
the joint frontier = min over sides of the last entry's end).
"""

import os

import pytest

from scala_timeseries_lib_spark.kernel.fitter import fit
from scala_timeseries_lib_spark.kernel.merge import (
    merge_apply_numeric,
)

pytestmark = pytest.mark.spark

SCHEMA = "key string, ts long, value double, validity long"


def _run_stream(spark, src_l, src_r, ckpt, out, op="plus"):
    from scala_timeseries_lib_spark.streaming.structured import (
        stream_merge_series,
    )

    left = spark.readStream.schema(SCHEMA).parquet(src_l)
    right = spark.readStream.schema(SCHEMA).parquet(src_r)
    merged = stream_merge_series(left, right, ["key"], op=op)
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


def _expected(left_rows, right_rows, op):
    """Batch merge per key, restricted to the stable prefix."""
    import numpy as np

    keys = {r[0] for r in left_rows} | {r[0] for r in right_rows}
    out = []
    for k in keys:
        a = sorted((ts, v, d) for kk, ts, v, d in left_rows if kk == k)
        b = sorted((ts, v, d) for kk, ts, v, d in right_rows if kk == k)
        if not a or not b:
            continue  # no joint frontier -> nothing stable
        frontier = min(a[-1][0] + a[-1][2], b[-1][0] + b[-1][2])
        m_ts, m_val, m_dur = merge_apply_numeric(
            np.array([e[0] for e in a]), np.array([e[1] for e in a]),
            np.array([e[2] for e in a]),
            np.array([e[0] for e in b]), np.array([e[1] for e in b]),
            np.array([e[2] for e in b]),
            op=op, compress=True,
        )
        for ts, v, d in zip(m_ts.tolist(), m_val.tolist(), m_dur.tolist()):
            if ts + d < frontier:
                out.append((k, ts, v, d))
    return sorted(out)


def _collect(spark, out_dir):
    try:
        return sorted(
            (r["key"], r["ts"], r["value"], r["validity"])
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def test_stale_compression_across_watermark(spark, tmp_path):
    """The adversarial case for the pruning discipline: after [0,10) of the
    right side is pruned, the recomputed run below the emitted watermark
    goes stale (value 1 instead of 2) and compression would drag it across
    the watermark — the clip at the watermark must cut it so no region is
    re-emitted with a wrong value."""
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    os.makedirs(src_l); os.makedirs(src_r)

    left_all = [("k", 0, 1.0, 100)]
    right_b = [
        [("k", 0, 1.0, 10)],     # [0,10)=2 ... frontier 10, nothing emits
        [("k", 10, 0.0, 10)],    # frontier 20: emit [0,10)=2; prune [0,10)
        [("k", 30, 5.0, 10)],    # frontier 40: stale run [0,30)=1 must clip
    ]
    spark.createDataFrame(left_all, SCHEMA).coalesce(1).write.mode(
        "append").parquet(src_l)
    right_rows = []
    for batch in right_b:
        right_rows += batch
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
            "append").parquet(src_r)
        _run_stream(spark, src_l, src_r, ckpt, out, op="plus")

    got = _collect(spark, out)
    assert got == _expected(left_all, right_rows, "plus")
    # spot-pin the dangerous rows: [0,10) once with value 2, then [10,30)=1
    assert ("k", 0, 2.0, 10) in got
    assert ("k", 10, 1.0, 20) in got
    assert not any(ts == 0 and v == 1.0 for _, ts, v, _ in got)


@pytest.mark.parametrize("op", ["plus_strict", "fallback"])
def test_randomized_stream_equals_batch_prefix(spark, tmp_path, op):
    import random

    rng = random.Random(17 if op == "plus_strict" else 29)
    left_all, right_all = [], []
    for k in ("k1", "k2", "k3"):
        for rows in (left_all, right_all):
            t = rng.randint(0, 50)
            for _ in range(rng.randint(5, 25)):
                dur = rng.randint(1, 30)
                rows.append((k, t, float(rng.randint(-2, 3)), dur))
                t += dur + (0 if rng.random() < 0.6 else rng.randint(1, 25))
                if rows and rows[-1][1] == t:
                    t += 1

    def chunks(rows, n=3):
        per_key = {}
        for r in sorted(rows, key=lambda r: (r[0], r[1])):
            per_key.setdefault(r[0], []).append(r)
        out = [[] for _ in range(n)]
        for k, rs in per_key.items():
            step = (len(rs) + n - 1) // n
            for i in range(n):
                out[i] += rs[i * step:(i + 1) * step]
        return out

    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    os.makedirs(src_l); os.makedirs(src_r)
    for lb, rb in zip(chunks(left_all), chunks(right_all)):
        if lb:
            spark.createDataFrame(lb, SCHEMA).coalesce(1).write.mode(
                "append").parquet(src_l)
        if rb:
            spark.createDataFrame(rb, SCHEMA).coalesce(1).write.mode(
                "append").parquet(src_r)
        _run_stream(spark, src_l, src_r, ckpt, out, op=op)

    got = _collect(spark, out)
    exp = _expected(left_all, right_all, op)
    assert got == exp
    assert len(got) > 10


def test_streaming_merge_rejects_fill_ops(spark, tmp_path):
    from scala_timeseries_lib_spark.streaming.structured import (
        stream_merge_series,
    )

    src = str(tmp_path / "empty_src")
    os.makedirs(src)
    df = spark.readStream.schema(SCHEMA).parquet(src)
    with pytest.raises(ValueError):
        stream_merge_series(df, df, ["key"], op="minus",
                            left_default=1.0, right_default=2.0)
    with pytest.raises(ValueError):
        stream_merge_series(df, df, ["key"], op=lambda a, b: None)
