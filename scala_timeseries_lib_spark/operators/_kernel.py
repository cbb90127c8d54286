"""Salted-bucket dispatch for per-series kernels.

``applyInPandas`` costs ~2-3 ms of Arrow/pandas overhead per Spark group.
Web-scale series tables have millions of small series, so grouping by the
raw series key would be dominated by that overhead. Instead we group by
``hash(key) % n_buckets`` -- every UDF call receives a whole bucket of
series and fans out to the kernel (vectorized across the bucket where the
kernel supports it). This is the salted-repartition scheme the north rule
asks for: many small series cannot pile up behind one another, and AQE
skew splitting applies underneath. A single pathological SERIES still
lands in one bucket (its kernel is order-dependent); the escape hatch for
that shape is time-slicing -- see ``merge_series(time_slice=...)``, which
splits the series at absolute time boundaries and repairs the RLE at the
borders relationally.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_per_series", "apply_per_bucket"]

# Estimated (Catalyst sizeInBytes, i.e. roughly compressed-input) bytes per
# salt bucket. Each bucket is materialized as ONE pandas frame in a Python
# worker, so this bounds kernel-stage worker memory at any input size; it
# also sets the task-wave count at toy size (see _default_buckets).
_BUCKET_BYTES = int(os.environ.get("SPARK_GRAFT_KERNEL_BUCKET_BYTES", str(8 << 20)))


def _default_buckets(df: DataFrame) -> int:
    """Size-adaptive salt-bucket count for the kernel stage.

    ``ceil(estimated_bytes / _BUCKET_BYTES)`` clamped to
    ``[defaultParallelism, defaultParallelism * 32]``. The estimate is
    Catalyst's driver-side ``sizeInBytes`` on the already-built plan (no job
    runs). Rationale, measured round 6 (OPTIMIZATION_r06.md): per-task
    Arrow/Python overhead dominates small inputs, so tiny inputs want
    exactly ONE task wave (n = defaultParallelism: 1.33 s -> 0.97 s on the
    sf0.1 gorilla roundtrip vs the old fixed 4x); huge inputs want buckets
    bounded by BYTES, not core count, so worker memory stays flat while
    parallelism grows with the data. Falls back to the old fixed
    ``4 * defaultParallelism`` when the estimate is unusable (streaming
    frames, unknown-stat sources report 2^63-ish sentinels).
    """
    sc = df.sparkSession.sparkContext
    p = max(sc.defaultParallelism, 1)
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = -1
    if est <= 0 or est >= (1 << 50):
        return max(p * 4, 16)
    return min(max(math.ceil(est / _BUCKET_BYTES), p, 16), p * 32)


def apply_per_series(
    df: DataFrame,
    key_cols: list[str],
    series_fn,
    out_schema,
    n_buckets: int | None = None,
    sort_within: str | None = "ts",
):
    """Run ``series_fn(key_tuple, pdf) -> pdf`` once per distinct series.

    ``out_schema`` must start with the key columns. The per-series frames
    returned by ``series_fn`` must NOT include the key columns; they are
    attached here.
    """
    import pandas as pd

    if n_buckets is None:
        n_buckets = _default_buckets(df)

    out_names = [f.name for f in out_schema.fields]

    def _bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for key, g in pdf.groupby(key_cols, sort=False):
            if not isinstance(key, tuple):
                key = (key,)
            if sort_within is not None:
                g = g.sort_values(sort_within, kind="mergesort")
            res = series_fn(key, g)
            if res is None or len(res) == 0:
                continue
            for col, val in zip(key_cols, key):
                res[col] = val
            frames.append(res[out_names])
        if not frames:
            return pd.DataFrame(columns=out_names)
        return pd.concat(frames, ignore_index=True)

    return _dispatch(df, key_cols, _bucket, out_schema, n_buckets)


def apply_per_bucket(
    df: DataFrame,
    key_cols: list[str],
    bucket_fn,
    out_schema,
    n_buckets: int | None = None,
):
    """Run ``bucket_fn(pdf) -> pdf`` once per salt bucket (a whole batch of
    series, key columns included in both input and output). For kernels that
    can vectorize ACROSS series (e.g. the offset-packed merge) this removes
    the per-series Python loop entirely."""
    if n_buckets is None:
        n_buckets = _default_buckets(df)
    return _dispatch(df, key_cols, bucket_fn, out_schema, n_buckets)


def _dispatch(df, key_cols, bucket_fn, out_schema, n_buckets):
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets))
    )
    # pin the kernel stage's parallelism: the cost here is Python CPU per
    # row, not shuffle bytes, so AQE's size-based coalescing (which would
    # happily squash a few-MB shuffle into ONE partition and serialize the
    # whole Arrow stage) must not apply. A user-numbered repartition is
    # never coalesced by AQE; groupBy reuses its hash distribution, so no
    # second exchange appears.
    salted = salted.repartition(n_buckets, "_salt")
    return salted.groupBy("_salt").applyInPandas(
        lambda pdf: bucket_fn(pdf.drop(columns=["_salt"])), schema=out_schema
    )
