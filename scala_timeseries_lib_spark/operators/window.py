"""Sliding-window operators.

Two execution strategies, chosen by semantics (SURVEY.md 2.9 / 3.3):

- ``sliding_grid_agg``: time-aware aggregates over a *continuous* resampled
  grid. On a hole-free grid with window = m*rate the reference's sweep emits
  exactly at grid points, so the aggregate equals a plain Spark range-frame
  window -- 100% JVM-side, whole-stage-codegen, no Python. (Equivalence is
  pinned against the kernel sweep in tests/test_spark_operators.py.)

- ``sliding_window_exact``: the reference-exact sweep (arbitrary emission
  boundaries, holes, time-unaware aggregators) via the numpy kernel per
  series group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = [
    "sliding_grid_agg",
    "sliding_window_exact",
    "sliding_window_exact_relational",
    "rolling_values",
    "rolling_values_relational",
    "dynamic_window_exact",
    "dynamic_window_relational",
    "sample_closest",
    "sample_closest_relational",
]


def sliding_grid_agg(
    grid: DataFrame,
    key_cols: list[str],
    window_width: int,
    rate: int,
    agg: str = "integral",
    timeunit: str = "ms",
) -> DataFrame:
    """Trailing-window aggregate over an already-sampled uniform grid.

    ``grid`` must be hole-free per series with constant validity = rate
    (e.g. from operators.series_ops.sample_strict_grid after LOCF fill).
    The window covers entries intersecting ``[t - window_width, t]``, i.e.
    grid entries with ``ts > t - window_width - rate`` (reference removal
    rule, WindowSlider.scala:226-228).

    ``agg``: integral | mean (time-weighted) | std (time-weighted biased,
    BasicAggregators.scala:71-96) | sum | min | max | median (exact, the
    queueAggregator case).
    """
    from ..kernel.integral import seconds_factor

    f = seconds_factor(timeunit)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("ts")
        .rangeBetween(-(window_width + rate - 1), 0)
    )
    v, d = F.col("value"), F.col("validity")
    if agg == "integral":
        expr = F.sum(v * d * F.lit(f)).over(w)
    elif agg == "mean":
        expr = F.sum(v * d).over(w) / F.sum(d).over(w)
    elif agg == "std":
        m1 = F.sum(v * d).over(w) / F.sum(d).over(w)
        m2 = F.sum(v * v * d).over(w) / F.sum(d).over(w)
        expr = F.sqrt(F.greatest(m2 - m1 * m1, F.lit(0.0)))
    elif agg == "sum":
        expr = F.sum(v).over(w)
    elif agg == "min":
        expr = F.min(v).over(w)
    elif agg == "max":
        expr = F.max(v).over(w)
    elif agg == "median":
        # the queueAggregator case (whole-window contents, Aggregator.scala:
        # 60-63): exact median from the sorted frame contents -- JVM-side
        # collect_list over the frame, no Python
        arr = F.sort_array(F.collect_list(v).over(w))
        n = F.size(arr)
        mid_hi = (n / 2 + 1).cast("int")
        mid_lo = ((n + 1) / 2).cast("int")
        expr = F.when(
            n % 2 == 1, F.element_at(arr, mid_lo)
        ).otherwise(
            (F.element_at(arr, (n / 2).cast("int")) + F.element_at(arr, mid_hi))
            / 2.0
        )
    else:
        raise ValueError(f"unknown agg {agg!r}")
    return grid.withColumn("value", expr)


_AGG_FACTORIES = {
    "sum": "SumAggregator",
    "mean": "MeanAggregator",
    "std": "StdAggregator",
    "min": "MinAggregator",
    "max": "MaxAggregator",
    "integral": "IntegralAggregator",
}


def sliding_window_exact(
    df: DataFrame,
    key_cols: list[str],
    window_width: int,
    agg: str,
    sample_rate: int | None = None,
    use_closest: bool = True,
    timeunit: str = "ms",
    compress: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """Reference-exact slidingWindow / slidingIntegral per series
    (TimeSeries.scala:412-443). One shuffle on the key.

    ``agg="median"`` is the queue-aggregator case (CollectAggregator --
    the window's whole contents ride along); it runs the sequential
    per-series sweep since the aggregate is not expressible as reversible
    add/drop state. For the standard aggregators
    (sum/mean/std/min/max/integral) the whole
    salt bucket runs through ONE vectorized kernel call
    (kernel.window.window_sweep_grouped: prefix-sum differences and
    sparse-table range min/max over the contiguous window ranges, offset-
    packed across series; closest-in-window resampling batched via
    sample_arrays_closest_grouped). The sequential per-series sweep remains
    the semantics twin (pinned equivalent in tests) and the fallback for
    strict-resample inputs and packed-axis overflow. Float note: the
    vectorized sums differ from the incremental sweep at ~1e-13 relative
    (prefix-difference vs add/drop rounding), and std inflates true-zero
    variances to ~1e-7 -- round before comparing across paths/engines.

    ``engine="relational"`` opts sum/mean into the zero-Python twin
    (:func:`sliding_window_exact_relational`, boundary-union + running
    carries — bit-identical to the SEQUENTIAL sweep's accumulation order).
    ``"auto"`` routes by MEASUREMENT (BENCH/BASELINE.md exact-sweep
    crossover row): the un-resampled ``sum`` sweep goes relational (2.5×
    the kernel at sf0.1 — the sweep is pure boundary algebra, Catalyst's
    home turf); resampled aggs stay on the kernel (the dense resample grid
    is numpy's home turf, same verdict as sample_closest).
    """
    import numpy as np
    import pandas as pd

    if engine not in ("auto", "kernel", "relational"):
        raise ValueError(f"unknown engine {engine!r}")
    relational_ok = agg in ("sum", "mean") and (
        sample_rate is None or use_closest
    ) and not (agg == "mean" and sample_rate is None)
    if engine == "relational" and not relational_ok:
        raise ValueError(
            "engine='relational' supports agg in (sum, mean) with "
            "closest-in-window resampling only (mean needs a sample_rate)"
        )
    if engine == "relational" or (
        engine == "auto" and agg == "sum" and sample_rate is None
    ):
        return sliding_window_exact_relational(
            df, key_cols, window_width, agg,
            sample_rate=sample_rate, compress=compress,
        )

    from ..kernel import window as kwin
    from ..kernel.fitter import fit, fit_arrays_grouped
    from ..kernel.sample import sample_arrays_closest_grouped

    key_fields = [df.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )
    out_names = [f.name for f in out_schema.fields]

    if agg not in _AGG_FACTORIES and agg != "median":
        raise ValueError(f"unknown agg {agg!r}")

    def make_agg():
        if agg == "median":
            # the queueAggregator case (CollectAggregator, reference
            # BasicAggregators.scala:127-136 / Aggregator.scala:60-63): the
            # whole window rides along and the aggregate is a function of
            # its contents; empty windows are holes (None)
            import statistics  # noqa: PLC0415

            return kwin.CollectAggregator(
                fn=lambda vals: statistics.median(vals) if vals else None
            )
        cls = getattr(kwin, _AGG_FACTORIES[agg])
        if agg == "integral":
            return cls(timeunit)
        return cls()

    from ._kernel import apply_per_bucket, apply_per_series

    vectorizable = agg in kwin._GROUPED_AGGS and (
        sample_rate is None or use_closest
    )

    def _sweep_seq(key, pdf: pd.DataFrame) -> pd.DataFrame:
        entries = list(
            zip(pdf["ts"].tolist(), pdf["value"].tolist(), pdf["validity"].tolist())
        )
        out = []
        for (ts, _content, validity), a in kwin.window_sweep(
            entries, window_width, make_agg(), sample_rate, use_closest
        ):
            if a is not None:
                out.append((ts, float(a), validity))
        if compress:
            out = fit(out, compress=True)
        return pd.DataFrame(out, columns=["ts", "value", "validity"])

    if not vectorizable:
        return apply_per_series(df, key_cols, _sweep_seq, out_schema)

    def _sweep_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=out_names)
        pdf = pdf.sort_values([*key_cols, "ts"], kind="mergesort",
                              ignore_index=True)
        codes, uniques = pd.factorize(pd.MultiIndex.from_frame(pdf[key_cols]), use_na_sentinel=False)
        c = codes.astype(np.int64)
        t = pdf["ts"].to_numpy(np.int64)
        v = pdf["value"].to_numpy(np.float64)
        d = pdf["validity"].to_numpy(np.int64)
        res = None
        if sample_rate is not None:
            rs = sample_arrays_closest_grouped(c, t, v, d, sample_rate)
            if rs is not None:
                c, t, v, d = rs
                res = kwin.window_sweep_grouped(
                    c, t, v, d, window_width, agg=agg, timeunit=timeunit
                )
        else:
            res = kwin.window_sweep_grouped(
                c, t, v, d, window_width, agg=agg, timeunit=timeunit
            )
        if res is None:
            # packed-axis overflow: sequential per-series fallback
            frames = []
            for key, g in pdf.groupby(key_cols, sort=False):
                if not isinstance(key, tuple):
                    key = (key,)
                r = _sweep_seq(key, g)
                for col, kv in zip(key_cols, key):
                    r[col] = kv
                frames.append(r[out_names])
            if not frames:
                return pd.DataFrame(columns=out_names)
            return pd.concat(frames, ignore_index=True)
        oc, ot, ov, od = res
        if compress:
            keep, ot, ov, od = fit_arrays_grouped(oc, ot, ov, od, compress=True)
            oc = oc[keep]
        key_vals = uniques[oc].to_frame(index=False)
        key_vals.columns = key_cols
        out = pd.DataFrame({"ts": ot, "value": ov, "validity": od})
        return pd.concat(
            [key_vals.reset_index(drop=True), out], axis=1
        )[out_names]

    return apply_per_bucket(df, key_cols, _sweep_bucket, out_schema)


def sliding_window_exact_relational(
    df: DataFrame,
    key_cols: list[str],
    window_width: int,
    agg: str,
    sample_rate: int | None = None,
    compress: bool = True,
) -> DataFrame:
    """Pure-Catalyst exact sliding sweep (WindowSlider.scala:114-269) for
    the decomposable aggregators ``sum`` and ``mean`` — zero Python stages.

    The sweep's emission boundaries are exactly the union of ADD events
    (every entry ``ts``) and DROP events (every ``ts + validity + width``,
    where the entry leaves the trailing window): between consecutive events
    the window contents are constant. So the sweep is one boundary-union +
    running-carry plan, like the relational merge: explode each entry into
    a signed add row and a signed drop row, ONE per-key window sort by
    ``(p, ord)`` with drops ordered BEFORE adds at ties (the kernel
    retracts before adding — same float accumulation order, bit-identical
    sums), running-sum the signed contributions, keep the last row of each
    tie group via the ``lead(p) > p`` filter, and clip segments to the
    sweep domain ``[min ts, max until)``. For ``sum`` an empty window
    correctly emits 0.0 (the running sum of a fully retracted prefix); for
    ``mean`` (time-aware: requires ``sample_rate``, closest-in-window
    resample via :func:`sample_closest_relational`) an empty window is a
    hole (``sum(validity) = 0``). NaN values surface as null, matching the
    kernel twin's NaN across the Arrow boundary.

    Matches ``sliding_window_exact(engine="kernel")`` exactly (twin-tested,
    tests/test_relational_merge.py); crossover vs the vectorized kernel is
    measured in BENCH/BASELINE.md and sets the ``auto`` default."""
    from .merge import _rle_repair

    if window_width <= 0:
        raise ValueError("Needs a strictly positive window size")
    if agg not in ("sum", "mean"):
        raise ValueError(
            f"relational exact sweep supports sum|mean, got {agg!r}"
        )
    if agg == "mean" and sample_rate is None:
        raise ValueError("time-aware aggregators require a sample_rate")
    if sample_rate is not None:
        df = sample_closest_relational(
            df, key_cols, sample_rate, compress=False
        )

    w_key = Window.partitionBy(*key_cols)
    ent = df.select(*key_cols, "ts", "value", "validity").withColumn(
        "_maxu", F.max(F.col("ts") + F.col("validity")).over(w_key)
    )
    if agg == "sum":
        x = F.col("value")
        d = F.lit(0).cast("long")
    else:
        x = F.col("value") * F.col("validity")
        d = F.col("validity")
    add = F.struct(
        F.col("ts").alias("p"), F.lit(1).alias("ord"),
        x.alias("x"), d.alias("d"),
    )
    drop = F.struct(
        (F.col("ts") + F.col("validity") + F.lit(window_width)).alias("p"),
        F.lit(0).alias("ord"),
        (-x).alias("x"), (-d).alias("d"),
    )
    ev = ent.select(
        *key_cols, "_maxu", F.explode(F.array(add, drop)).alias("e")
    ).select(
        *key_cols, "_maxu",
        F.col("e.p").alias("p"), F.col("e.ord").alias("ord"),
        F.col("e.x").alias("x"), F.col("e.d").alias("d"),
    )
    w_sort = Window.partitionBy(*key_cols).orderBy("p", "ord")
    w_run = w_sort.rowsBetween(Window.unboundedPreceding, 0)
    segs = (
        ev.select(
            *key_cols, "_maxu", "p",
            F.sum("x").over(w_run).alias("sx"),
            F.sum("d").over(w_run).alias("sd"),
            F.lead("p").over(w_sort).alias("np"),
        )
        .where(F.col("np").isNull() | (F.col("np") > F.col("p")))
        .where(F.col("p") < F.col("_maxu"))
    )
    value = (
        F.col("sx") if agg == "sum"
        else F.when(F.col("sd") > 0, F.col("sx") / F.col("sd"))
    )
    out = segs.select(
        *key_cols,
        F.col("p").alias("ts"),
        value.alias("value"),
        (F.least(F.coalesce(F.col("np"), F.col("_maxu")), F.col("_maxu"))
         - F.col("p")).alias("validity"),
    ).where(F.col("validity") > 0)
    if agg == "mean":
        out = out.where(F.col("value").isNotNull())
    if compress:
        out = _rle_repair(out, key_cols)
    # NaN sums surface as null, like the kernel's NaN across Arrow
    return out.select(
        *key_cols, "ts",
        F.when(~F.isnan("value"), F.col("value")).alias("value"),
        "validity",
    )


def rolling_values_relational(
    df: DataFrame,
    key_cols: list[str],
    window_ms: int,
    agg: str = "sum",
    compress: bool = True,
) -> DataFrame:
    """Pure-Catalyst ``rolling`` for the decomposable aggregates (sum /
    mean), zero Python stages.

    The insight (same contiguous-range argument as the kernel,
    kernel/window.py:rolling_grouped): on FITTED entries (ordered,
    disjoint -- the operator's standing precondition) end times are
    increasing, so the entries expelled from entry i's window
    ``[ts_i - window_ms, ts_i)`` form a PREFIX of the series: exactly
    those j with ``end_j <= ts_i - window_ms``. Hence

        rolling_i = cumsum_i - cumsum_{removed(i)}

    where ``removed(i)`` resolves with the same single-sort carry trick as
    the relational merge: union each entry's end event (carrying its
    cumulative sum/count) with a probe at ``ts_i - window_ms`` (carrying
    the entry's own cumulative row), sort per key by (point, kind) with
    end events first at ties (``end_j <= p`` removes), and take the
    running last end-carry at each probe. Two window sorts over one
    per-key exchange; the optional RLE compression is the merge engine's
    gaps-and-islands pass. Matches ``rolling_values(engine="kernel")``
    exactly (twin-tested)."""
    from .merge import _rle_repair

    if window_ms <= 0:
        raise ValueError("Needs a strictly positive window size")
    if agg not in ("sum", "mean"):
        raise ValueError(
            f"relational rolling supports sum|mean, got {agg!r}"
        )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ent = df.select(
        *key_cols, "ts", "value", "validity",
        F.sum("value").over(w_cum).alias("_s"),
        F.count(F.lit(1)).over(w_cum).alias("_c"),
    )
    probes = ent.select(
        *key_cols,
        (F.col("ts") - F.lit(window_ms)).alias("p"),
        F.lit(1).alias("kind"),
        F.struct("ts", "value", "validity", "_s", "_c").alias("row"),
        F.lit(None).cast("struct<s:double,c:bigint>").alias("endc"),
    )
    ends = ent.select(
        *key_cols,
        (F.col("ts") + F.col("validity")).alias("p"),
        F.lit(0).alias("kind"),
        F.lit(None).cast(
            "struct<ts:bigint,value:double,validity:bigint,_s:double,_c:bigint>"
        ).alias("row"),
        F.struct(F.col("_s").alias("s"), F.col("_c").alias("c")).alias("endc"),
    )
    w_carry = (
        Window.partitionBy(*key_cols)
        .orderBy("p", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        probes.unionByName(ends)
        .withColumn(
            "_rm", F.last("endc", ignorenulls=True).over(w_carry)
        )
        .where(F.col("kind") == 1)
    )
    s = F.col("row._s") - F.coalesce(F.col("_rm.s"), F.lit(0.0))
    c = F.col("row._c") - F.coalesce(F.col("_rm.c"), F.lit(0))
    value = s if agg == "sum" else s / c
    out = carried.select(
        *key_cols,
        F.col("row.ts").alias("ts"),
        value.alias("value"),
        F.col("row.validity").alias("validity"),
    )
    if not compress:
        return out
    return _rle_repair(out, key_cols).select(
        *key_cols, "ts", "value", "validity"
    )


def rolling_values(
    df: DataFrame,
    key_cols: list[str],
    window_ms: int,
    agg: str = "sum",
    compress: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """NumericTimeSeries.rolling (scala:49-64): every entry's value becomes
    the aggregate of the VALUES of entries overlapping ``[ts - window_ms,
    ts)`` plus its own; timestamps and validities are unchanged (then
    optionally RLE-compressed like any mapEntries result).

    Not expressible as a Spark range frame (an entry enters the window
    through its END time, which is another row's attribute) -- but for the
    DECOMPOSABLE aggregates (sum/mean) it IS expressible as cumulative sums
    minus an as-of carry over end events, and ``engine="auto"`` routes
    those through the pure-Catalyst :func:`rolling_values_relational`
    (zero Python). min/max (order statistics need the kernel's sparse-table
    RMQ) and ``engine="kernel"`` run the contiguous-range kernel per salt
    bucket (one searchsorted + prefix sums / RMQ -- same argument as the
    exact sweep); arbitrary aggregators via kernel.window.rolling."""
    if engine not in ("auto", "kernel", "relational"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "relational" or (engine == "auto" and agg in ("sum", "mean")):
        return rolling_values_relational(
            df, key_cols, window_ms, agg=agg, compress=compress
        )
    import numpy as np
    import pandas as pd

    from ..kernel import window as kwin
    from ..kernel.fitter import fit_arrays_grouped
    from ._kernel import apply_per_bucket

    key_fields = [df.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )
    out_names = [f.name for f in out_schema.fields]
    agg_fns = {"sum": sum, "mean": lambda v: sum(v) / len(v),
               "min": min, "max": max}

    def _roll_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=out_names)
        pdf = pdf.sort_values([*key_cols, "ts"], kind="mergesort",
                              ignore_index=True)
        codes, uniques = pd.factorize(pd.MultiIndex.from_frame(pdf[key_cols]), use_na_sentinel=False)
        res = kwin.rolling_grouped(
            codes.astype(np.int64),
            pdf["ts"].to_numpy(np.int64),
            pdf["value"].to_numpy(np.float64),
            pdf["validity"].to_numpy(np.int64),
            window_ms, agg=agg,
        )
        if res is None:
            # packed-axis overflow: sequential per-series fallback
            frames = []
            for key, g in pdf.groupby(key_cols, sort=False):
                out = kwin.rolling(
                    list(zip(g["ts"], g["value"], g["validity"])),
                    agg_fns[agg], window_ms, compress=False,
                )
                r = pd.DataFrame(out, columns=["ts", "value", "validity"])
                for col, kv in zip(key_cols,
                                   key if isinstance(key, tuple) else (key,)):
                    r[col] = kv
                frames.append(r[out_names])
            merged = pd.concat(frames, ignore_index=True)
            codes, uniques = pd.factorize(
                pd.MultiIndex.from_frame(merged[key_cols]),
                use_na_sentinel=False,
            )
            oc = codes.astype(np.int64)
            ot = merged["ts"].to_numpy(np.int64)
            ov = merged["value"].to_numpy(np.float64)
            od = merged["validity"].to_numpy(np.int64)
        else:
            oc, ot, ov, od = res
        if compress:
            keep, ot, ov, od = fit_arrays_grouped(oc, ot, ov, od, compress=True)
            oc = oc[keep]
        key_vals = uniques[oc].to_frame(index=False)
        key_vals.columns = key_cols
        out = pd.DataFrame({"ts": ot, "value": ov, "validity": od})
        return pd.concat(
            [key_vals.reset_index(drop=True), out], axis=1
        )[out_names]

    return apply_per_bucket(df, key_cols, _roll_bucket, out_schema)


def dynamic_window_exact(
    df: DataFrame,
    key_cols: list[str],
    start_pred,
    stop_pred,
    agg: str = "mean",
    timeunit: str = "ms",
) -> DataFrame:
    """Predicate-delimited windows (WindowSlider.scala:286-319): a window
    opens at the first entry where ``start and not stop`` holds and extends
    up to (excluding) the next entry where ``stop`` holds; one output entry
    per window spanning its loose domain.

    ``start_pred``/``stop_pred`` are Python callables over a (ts, value,
    validity) tuple, evaluated in the kernel. Relational equivalents (flag +
    cumulative-stop-count sessionization) exist for column predicates -- the
    ts_dynamic_window oracle in __spark_entry__ shows the SQL shape.
    """
    import pandas as pd

    from ..kernel import window as kwin
    from ._kernel import apply_per_series

    key_fields = [df.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )

    def make_agg():
        cls = getattr(kwin, _AGG_FACTORIES[agg])
        return cls(timeunit) if agg == "integral" else cls()

    def _dyn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        entries = list(
            zip(pdf["ts"].tolist(), pdf["value"].tolist(), pdf["validity"].tolist())
        )
        out = kwin.dynamic_window(entries, start_pred, stop_pred, make_agg)
        return pd.DataFrame(
            [(t, float(v), d) for t, v, d in out],
            columns=["ts", "value", "validity"],
        )

    return apply_per_series(df, key_cols, _dyn, out_schema)


def dynamic_window_relational(
    df: DataFrame,
    key_cols: list[str],
    start_expr,
    stop_expr,
    agg: str = "mean",
    timeunit: str = "ms",
) -> DataFrame:
    """dynamicWindow (WindowSlider.scala:286-319) for COLUMN predicates --
    100% Catalyst, no Python: a window opens at the first entry satisfying
    ``start and not stop`` and extends until the next entry satisfying
    ``stop``. Sessionization is the flag + cumulative-stop-count pattern:
    the running count of prior stop rows is the session id, sessions keep
    their non-stop rows from the first start row on, and one entry per
    session spans its loose domain.

    ``agg``: mean (time-weighted) | sum | min | max | integral. For
    arbitrary Python predicates use dynamic_window_exact (same semantics,
    kernel-based; equivalence pinned in tests)."""
    from ..kernel.integral import seconds_factor

    w_ord = Window.partitionBy(*key_cols).orderBy("ts")
    flagged = df.withColumn("_stp", stop_expr.cast("int")).withColumn(
        "_strt", (start_expr & ~stop_expr).cast("int")
    )
    seg = F.coalesce(
        F.sum("_stp").over(
            w_ord.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    flagged = flagged.withColumn("_seg", seg).filter(F.col("_stp") == 0)
    w_seg = Window.partitionBy(*key_cols, "_seg")
    wstart = F.min(F.when(F.col("_strt") == 1, F.col("ts"))).over(w_seg)
    rows_in = flagged.withColumn("_wstart", wstart).filter(
        F.col("_wstart").isNotNull() & (F.col("ts") >= F.col("_wstart"))
    )
    v, d = F.col("value"), F.col("validity")
    if agg == "mean":
        expr = F.sum(v * d) / F.sum(d)
    elif agg == "sum":
        expr = F.sum(v)
    elif agg == "min":
        expr = F.min(v)
    elif agg == "max":
        expr = F.max(v)
    elif agg == "integral":
        expr = F.sum(v * d * F.lit(seconds_factor(timeunit)))
    else:
        raise ValueError(f"unknown agg {agg!r}")
    return rows_in.groupBy(*key_cols, "_wstart").agg(
        expr.alias("value"),
        (F.max(F.col("ts") + d) - F.first("_wstart")).alias("validity"),
    ).withColumnRenamed("_wstart", "ts").select(
        *key_cols, "ts", "value", "validity"
    )


def sample_closest_relational(
    df: DataFrame,
    key_cols: list[str],
    rate: int,
    compress: bool = False,
) -> DataFrame:
    """Pure-Catalyst closest-in-window sampling, zero Python stages.

    Declarative restatement of the vectorized kernel
    (kernel/sample.py:sample_arrays_closest — itself pinned against the
    reference's sequential cursor): at grid point p the candidates are
    ``lo`` (last entry with ts <= p) and ``cand_after`` (first entry with
    ts >= p, index-clipped to R = last entry with ts <= p + rate/2); the
    chosen entry is the closer start (ties to the later), accepted iff its
    take rule holds.

    Physical shape: entries get (index j, nxt, until, n) from one per-key
    window; each grid point emits TWO probe rows (at p and at p + rate/2);
    ONE ascending (point, kind) sort carries the last entry with ts <=
    point (entries sort before probes at ties — `<=` semantics) and the
    SAME partition re-sorted descending carries the first entry with ts >=
    point; the two probe rows of each p merge back with a shuffle-free
    groupBy (hash-partitioning on key satisfies (key, p) clustering) and
    the choose/take rule is a CASE expression. Two shuffles total, matches
    ``sample_closest(engine="kernel")`` exactly (twin-tested)."""
    from .merge import _rle_repair

    half = rate // 2
    w_ent = Window.partitionBy(*key_cols).orderBy("ts")
    w_key = Window.partitionBy(*key_cols)
    ent = df.select(
        *key_cols, "ts", "value", "validity",
        F.row_number().over(w_ent).alias("j"),
        F.lead("ts").over(w_ent).alias("nxt"),
        (F.col("ts") + F.col("validity")).alias("until"),
        F.count(F.lit(1)).over(w_key).alias("n"),
        F.min("ts").over(w_key).alias("gstart"),
        F.max(F.col("ts") + F.col("validity")).over(w_key).alias("gend"),
    )
    # grid: start + k*rate for p < gend (kernel: k = (end-1-start)//rate)
    heads = ent.where(F.col("j") == 1).select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("gstart"),
                F.col("gstart")
                + ((F.col("gend") - 1 - F.col("gstart")) / rate).cast("long")
                * rate,
                F.lit(rate),
            )
        ).alias("p"),
    )
    estruct = F.struct("j", "ts", "value", "until", "nxt", "n")
    e_rows = ent.select(
        *key_cols,
        F.col("ts").alias("pt"),
        F.lit(0).alias("kind"),
        estruct.alias("e"),
        F.lit(None).cast("bigint").alias("p"),
        F.lit(None).cast("int").alias("probe"),
    )
    p_rows = heads.select(
        *key_cols,
        F.col("p").alias("pt"),
        F.lit(1).alias("kind"),
        F.lit(None).cast(e_rows.schema["e"].dataType.simpleString()).alias("e"),
        F.col("p"),
        F.lit(0).alias("probe"),  # probe at p itself
    ).unionByName(
        heads.select(
            *key_cols,
            (F.col("p") + half).alias("pt"),
            F.lit(1).alias("kind"),
            F.lit(None).cast(
                e_rows.schema["e"].dataType.simpleString()
            ).alias("e"),
            F.col("p"),
            F.lit(1).alias("probe"),  # probe at p + half
        )
    )
    # user-numbered repartition: AQE would coalesce this small exchange to
    # a handful of partitions and serialize the two window sorts (the
    # round-2 coalescing trap); pinning the count keeps them parallel
    par = df.sparkSession.sparkContext.defaultParallelism * 2
    rows = e_rows.unionByName(p_rows).repartition(par, *key_cols)
    w_asc = (
        Window.partitionBy(*key_cols)
        .orderBy("pt", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # descending pass: entries must precede probes at equal pt here too so
    # the probe's running frame includes a ts == pt entry ('>=')
    w_desc = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("pt").desc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        rows.withColumn("le", F.last("e", ignorenulls=True).over(w_asc))
        .withColumn("ge", F.last("e", ignorenulls=True).over(w_desc))
        .where(F.col("kind") == 1)
    )
    # merge the two probe rows of each grid point (no shuffle: key hash
    # partitioning satisfies the (key, p) clustering)
    per_p = carried.groupBy(*key_cols, "p").agg(
        F.max(F.when(F.col("probe") == 0, F.col("le"))).alias("lo"),
        F.max(F.when(F.col("probe") == 0, F.col("ge"))).alias("after"),
        F.max(F.when(F.col("probe") == 1, F.col("le"))).alias("r"),
    )
    # kernel index arithmetic: lo=clip(L,0); cand_after=min(after, clip(R,0))
    lo = F.coalesce(F.col("lo"), F.col("after"))  # L=-1 -> first entry
    r_clip = F.coalesce(F.col("r"), F.col("after"))  # R=-1 handled by `has`
    cand = F.when(
        F.col("after").isNull() | (F.col("after.j") > r_clip["j"]), r_clip
    ).otherwise(F.col("after"))
    d_lo = F.abs(lo["ts"] - F.col("p"))
    d_cand = F.abs(cand["ts"] - F.col("p"))
    chosen = F.when(d_lo < d_cand, lo).otherwise(cand)
    has = F.col("r").isNotNull()  # R >= 0
    is_last = chosen["j"] == chosen["n"]
    take_last = F.col("p") < chosen["until"]
    take_mid = (
        (F.col("p") < chosen["until"])
        & (chosen["nxt"] > F.col("p") + half)
    ) | (F.abs(chosen["ts"] - F.col("p")) < F.abs(chosen["nxt"] - F.col("p")))
    ok = has & F.when(is_last, take_last).otherwise(take_mid)
    out = per_p.where(ok).select(
        *key_cols,
        F.col("p").alias("ts"),
        chosen["value"].alias("value"),
        F.lit(rate).cast("long").alias("validity"),
    )
    if not compress:
        return out
    return _rle_repair(out, key_cols).select(
        *key_cols, "ts", "value", "validity"
    )


def sample_closest(
    df: DataFrame,
    key_cols: list[str],
    rate: int,
    compress: bool = False,
    engine: str = "auto",
) -> DataFrame:
    """Closest-in-window sampling (TimeSeries.scala:598-646,
    useClosestInWindow=true): at each grid point ``first_ts + k*rate`` take
    the value of the entry starting closest to the point within
    ``[p - rate/2, p + rate/2)``, falling back to the entry defined at the
    point.

    ``engine="auto"`` keeps the KERNEL: measured (sf0.01/sf0.1, 32 cores,
    best-of-3) the vectorized kernel wins ~1.2x on the realistic sliced
    query shape and 19x on dense grids (27.6M grid points: numpy arange +
    searchsorted vs 55M rows through two window sorts) — dense-grid
    generation is the kernel's home turf, unlike the merge family where
    the relational engine won and became the default.
    ``engine="relational"`` opts into the pure-Catalyst
    :func:`sample_closest_relational` (zero Python stages, twin-tested
    equal) for deployments that must avoid Python workers entirely.
    The kernel is the vectorized restatement of the sequential cursor
    (kernel.sample.sample_arrays_closest, pinned against the sequential
    sampler by fuzz and against DuckDB by the ts_sample_closest oracle)."""
    if engine not in ("auto", "kernel", "relational"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "relational":
        return sample_closest_relational(
            df, key_cols, rate, compress=compress
        )
    import numpy as np
    import pandas as pd

    from ..kernel.fitter import fit_arrays_grouped
    from ..kernel.sample import (
        sample_arrays_closest,
        sample_arrays_closest_grouped,
    )
    from ._kernel import apply_per_bucket

    key_fields = [df.schema[k] for k in key_cols]
    out_schema = StructType(
        [
            *key_fields,
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("validity", LongType()),
        ]
    )
    out_names = [f.name for f in out_schema.fields]

    def _sample_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=out_names)
        pdf = pdf.sort_values([*key_cols, "ts"], kind="mergesort",
                              ignore_index=True)
        codes, uniques = pd.factorize(pd.MultiIndex.from_frame(pdf[key_cols]), use_na_sentinel=False)
        ts = pdf["ts"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.float64)
        dur = pdf["validity"].to_numpy(np.int64)
        res = sample_arrays_closest_grouped(codes, ts, val, dur, rate)
        if res is None:
            # packed-axis overflow: per-series loop (correct, not batched)
            starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
            oc, og, ov, od = [], [], [], []
            for s0, s1 in zip(starts, np.r_[starts[1:], codes.size]):
                g, v, d = sample_arrays_closest(
                    ts[s0:s1], val[s0:s1], dur[s0:s1], int(ts[s0]), rate
                )
                oc.append(np.full(len(g), codes[s0], np.int64))
                og.append(np.asarray(g, np.int64))
                ov.append(np.asarray(v, np.float64))
                od.append(np.asarray(d, np.int64))
            res = (np.concatenate(oc), np.concatenate(og),
                   np.concatenate(ov), np.concatenate(od))
        out_codes, g, v, d = res
        if compress:
            _keep, g, v, d = fit_arrays_grouped(out_codes, g, v, d,
                                                compress=True)
            out_codes = out_codes[_keep]
        key_vals = uniques[out_codes].to_frame(index=False)
        key_vals.columns = key_cols
        out = pd.DataFrame({"ts": g, "value": v, "validity": d})
        return pd.concat(
            [key_vals.reset_index(drop=True), out], axis=1
        )[out_names]

    return apply_per_bucket(df, key_cols, _sample_bucket, out_schema)
