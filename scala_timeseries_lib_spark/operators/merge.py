"""DataFrame-level interval merges (the reference's join family, SURVEY.md 2.6).

The merge is a sort-merge full-outer *interval-alignment* join on time, per
series key. Spark's hash-partitioned cogroup does the heavy lifting (one
shuffle per side on the key); the per-key interval logic runs vectorized in
the numpy kernel (``kernel.merge.merge_apply_numeric``) over Arrow batches.

For the named numeric operators the kernel path is fully vectorized
(searchsorted over the boundary union); a generic Python ``op`` callable is
also supported at reduced speed (kernel.merge.merge_entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["merge_series", "merge_series_n", "strict_zip_series", "NUMERIC_OPS"]

NUMERIC_OPS = ("plus", "plus_strict", "minus_strict", "multiply_strict", "fallback")


def merge_series(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    op: str = "plus",
    compress: bool = True,
    time_slice: int | None = None,
) -> DataFrame:
    """Merge two entries tables series-by-series with a numeric operator.

    ``op``: one of ``plus`` (non-strict, NumericTimeSeries.scala:18-26),
    ``plus_strict``/``minus_strict``/``multiply_strict``
    (TimeSeries.scala:277-328) or ``fallback`` (TimeSeries.scala:530-534).
    Keys present on only one side behave as merging with the empty series
    (strict ops yield nothing; non-strict ops pass the defined side through).

    ``time_slice`` (ms) is the hot-series escape hatch: one series is
    otherwise inherently sequential inside its kernel call, so a single
    pathological key (a domain with billions of snapshots) would create a
    straggler. With a slice width set, both sides are pre-split at absolute
    ``k*time_slice`` boundaries JVM-side, each (key, slice) merges as an
    independent group (the boundary-union merge is local in time), and a
    relational gaps-and-islands pass re-merges equal contiguous runs across
    slice borders -- the result is identical to the unsliced merge (pinned
    by test). Requires ``compress=True`` (the border re-fit is an RLE).
    """
    import numpy as np
    import pandas as pd

    from ..kernel.merge import merge_apply_numeric

    if time_slice is not None:
        if not compress:
            raise ValueError("time_slice requires compress=True")
        from .series_ops import split_at_buckets

        left = split_at_buckets(left, time_slice).withColumnRenamed(
            "bucket", "_slice"
        )
        right = split_at_buckets(right, time_slice).withColumnRenamed(
            "bucket", "_slice"
        )
        group_cols = [*key_cols, "_slice"]
    else:
        group_cols = key_cols

    key_fields = [left.schema[k] for k in group_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )

    from ._kernel import apply_per_bucket

    def _merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        """Offset-packed merge of a whole salt bucket in ONE vectorized call.

        Every series gets a disjoint [idx*stride, (idx+1)*stride) region of
        the int64 time axis (stride > the bucket's full time span, so
        regions can never touch and segments never cross series). The
        boundary-union merge kernel then processes all series of the bucket
        at once -- no per-series Python loop, no per-series numpy-call
        overhead.
        """
        if len(pdf) == 0:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        keys = pdf[group_cols]
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(keys) if len(group_cols) > 1 else keys.iloc[:, 0]
        )
        ts = pdf["ts"].to_numpy(np.int64)
        dur = pdf["validity"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.float64)
        side = pdf["side"].to_numpy()
        base = int(ts.min())
        stride = int((ts + dur).max()) - base + 1
        packed = codes.astype(np.int64) * stride + (ts - base)

        def pick(s):
            m = side == s
            order = np.argsort(packed[m], kind="stable")
            return packed[m][order], val[m][order], dur[m][order]

        m_ts, m_val, m_dur = merge_apply_numeric(
            *pick(0), *pick(1), op=op, compress=compress
        )
        idx = m_ts // stride
        out = pd.DataFrame(
            {
                "ts": m_ts % stride + base,
                "value": m_val,
                "validity": m_dur,
            }
        )
        key_vals = (
            uniques[idx].to_frame(index=False)
            if len(group_cols) > 1
            else pd.DataFrame({group_cols[0]: uniques[idx]})
        )
        key_vals.columns = group_cols
        return pd.concat(
            [key_vals.reset_index(drop=True), out], axis=1
        )[[f.name for f in out_schema.fields]]

    # union with a side tag + single salted bucket kernel: one shuffle
    # total, and it sidesteps Spark's self-cogroup attribute ambiguity when
    # both inputs share lineage (two filters of the same parent DataFrame)
    tagged = left.select(
        *group_cols, "ts", "value", "validity", F.lit(0).alias("side")
    ).unionByName(
        right.select(*group_cols, "ts", "value", "validity", F.lit(1).alias("side"))
    )
    merged = apply_per_bucket(tagged, group_cols, _merge_bucket, out_schema)
    if time_slice is None:
        return merged
    return _rle_repair(merged.drop("_slice"), key_cols)


def _rle_repair(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Relational gaps-and-islands RLE: merge adjacent contiguous equal-value
    entries across slice borders (one window + one aggregation, JVM-side)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("ts")
    prev_end = F.lag(F.col("ts") + F.col("validity")).over(w)
    prev_val = F.lag("value").over(w)
    brk = F.when(
        prev_end.isNull()
        | (prev_end != F.col("ts"))
        | (prev_val != F.col("value")),
        1,
    ).otherwise(0)
    island = F.sum(brk).over(
        Window.partitionBy(*key_cols).orderBy("ts").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return (
        df.withColumn("_island", island)
        .groupBy(*key_cols, "_island")
        .agg(
            F.min("ts").alias("ts"),
            F.min("value").alias("value"),  # equal within an island
            (F.max(F.col("ts") + F.col("validity")) - F.min("ts")).alias(
                "validity"
            ),
        )
        .drop("_island")
    )


def strict_zip_series(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compress: bool = True,
) -> DataFrame:
    """strictZip (TimeSeries.scala:335): tuple-valued segments where BOTH
    series are defined. Output: key cols + ts, a_value, b_value, validity.
    Same offset-packed single-call bucket kernel as merge_series."""
    import numpy as np
    import pandas as pd

    from ..kernel.merge import strict_zip_arrays

    key_fields = [left.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("a_value", DoubleType()),
            StructField("b_value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )
    out_names = [f.name for f in out_schema.fields]

    from ._kernel import apply_per_bucket

    def _zip_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=out_names)
        keys = pdf[key_cols]
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(keys) if len(key_cols) > 1 else keys.iloc[:, 0]
        )
        ts = pdf["ts"].to_numpy(np.int64)
        dur = pdf["validity"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.float64)
        side = pdf["side"].to_numpy()
        base = int(ts.min())
        stride = int((ts + dur).max()) - base + 1
        packed = codes.astype(np.int64) * stride + (ts - base)

        def pick(s):
            m = side == s
            order = np.argsort(packed[m], kind="stable")
            return packed[m][order], val[m][order], dur[m][order]

        z_ts, za, zb, z_dur = strict_zip_arrays(
            *pick(0), *pick(1), compress=compress
        )
        idx = z_ts // stride
        key_vals = (
            uniques[idx].to_frame(index=False)
            if len(key_cols) > 1
            else pd.DataFrame({key_cols[0]: uniques[idx]})
        )
        key_vals.columns = key_cols
        out = pd.DataFrame(
            {"ts": z_ts % stride + base, "a_value": za, "b_value": zb,
             "validity": z_dur}
        )
        return pd.concat([key_vals.reset_index(drop=True), out], axis=1)[out_names]

    tagged = left.select(
        *key_cols, "ts", "value", "validity", F.lit(0).alias("side")
    ).unionByName(
        right.select(*key_cols, "ts", "value", "validity", F.lit(1).alias("side"))
    )
    return apply_per_bucket(tagged, key_cols, _zip_bucket, out_schema)


def merge_series_n(
    dfs: list[DataFrame],
    key_cols: list[str],
    op: str = "plus",
    compress: bool = True,
) -> DataFrame:
    """K-ary interval merge (TimeSeriesMerger.scala:64-79 generalized):
    merge k entries tables series-by-series in one pass over the boundary
    union, instead of chaining k-1 binary merges (which would re-fit and
    re-shuffle at every step).

    ``op``: ``plus`` (non-strict sum of defined slots) or ``plus_strict``
    (defined only where all k sides are). One shuffle total: all sides are
    unioned with a side tag and grouped once.
    """
    import numpy as np
    import pandas as pd

    from ..kernel.merge import merge_apply_numeric_n

    n_sides = len(dfs)
    key_fields = [dfs[0].schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )
    out_names = [f.name for f in out_schema.fields]

    from ._kernel import apply_per_bucket

    def _merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # same offset-packing as merge_series: disjoint per-series time
        # regions let one k-sided vectorized call handle the whole bucket
        if len(pdf) == 0:
            return pd.DataFrame(columns=out_names)
        keys = pdf[key_cols]
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(keys) if len(key_cols) > 1 else keys.iloc[:, 0]
        )
        ts = pdf["ts"].to_numpy(np.int64)
        dur = pdf["validity"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.float64)
        side = pdf["side"].to_numpy()
        base = int(ts.min())
        stride = int((ts + dur).max()) - base + 1
        packed = codes.astype(np.int64) * stride + (ts - base)
        sides = []
        for i in range(n_sides):
            m = side == i
            order = np.argsort(packed[m], kind="stable")
            sides.append((packed[m][order], val[m][order], dur[m][order]))
        m_ts, m_val, m_dur = merge_apply_numeric_n(sides, op=op, compress=compress)
        idx = m_ts // stride
        key_vals = (
            uniques[idx].to_frame(index=False)
            if len(key_cols) > 1
            else pd.DataFrame({key_cols[0]: uniques[idx]})
        )
        key_vals.columns = key_cols
        out = pd.DataFrame(
            {"ts": m_ts % stride + base, "value": m_val, "validity": m_dur}
        )
        return pd.concat([key_vals.reset_index(drop=True), out], axis=1)[out_names]

    tagged = None
    for i, df in enumerate(dfs):
        part = df.select(*key_cols, "ts", "value", "validity", F.lit(i).alias("side"))
        tagged = part if tagged is None else tagged.unionByName(part)
    return apply_per_bucket(tagged, key_cols, _merge_bucket, out_schema)
