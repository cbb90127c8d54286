"""Relational (pure-Catalyst) merge engine vs the Arrow kernel twin.

The relational path (operators/merge.py merge_series_relational) must be
indistinguishable from the kernel path (engine="kernel") for every named
numeric op, including per-side minus defaults, single-sided keys, empty
sides, and touching/overlapping/gapped entries. Reference semantics:
TimeSeriesMerger.scala:13-196, NumericTimeSeries.scala:18-45,
TimeSeries.scala:277-335,530-534.
"""

import numpy as np
import pytest

from scala_timeseries_lib_spark.operators.merge import (
    merge_series,
    merge_series_n,
    merge_series_n_relational,
    merge_series_relational,
    strict_zip_series,
    strict_zip_series_relational,
)


def _mk(spark, seed, n_keys=6, max_entries=40, only_keys=None):
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_keys):
        key = f"k{k}"
        if only_keys is not None and key not in only_keys:
            continue
        t = int(rng.integers(0, 5))
        for _ in range(int(rng.integers(0, max_entries))):
            t += int(rng.integers(0, 20))
            dur = int(rng.integers(1, 15))
            rows.append((key, t, float(rng.integers(-3, 4)), dur))
            # 70% touching (RLE-relevant), 30% gapped
            t += dur if rng.random() < 0.7 else dur + int(rng.integers(1, 10))
    if not rows:
        rows = []
    return spark.createDataFrame(
        rows, "user_id string, ts long, value double, validity long"
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


OPS = [
    ("plus", {}),
    ("plus_strict", {}),
    ("minus", {}),
    ("minus", dict(left_default=1.5)),
    ("minus", dict(right_default=-2.0)),
    ("minus", dict(left_default=1.5, right_default=-2.0)),
    ("minus_strict", {}),
    ("multiply_strict", {}),
    ("fallback", {}),
]


@pytest.mark.parametrize("op,kw", OPS, ids=[f"{o}-{sorted(k)}" for o, k in OPS])
def test_relational_matches_kernel(spark, op, kw):
    a, b = _mk(spark, 11), _mk(spark, 22)
    kernel = _canon(merge_series(a, b, ["user_id"], op=op, engine="kernel", **kw))
    rel = _canon(merge_series_relational(a, b, ["user_id"], op=op, **kw))
    assert kernel == rel
    assert len(kernel) > 0


def test_relational_single_sided_keys(spark):
    # keys present on exactly one side behave as merge-with-empty
    a = _mk(spark, 31, only_keys={"k0", "k1", "k2"})
    b = _mk(spark, 32, only_keys={"k2", "k3", "k4"})
    for op in ("plus", "plus_strict", "fallback"):
        kernel = _canon(merge_series(a, b, ["user_id"], op=op, engine="kernel"))
        rel = _canon(merge_series_relational(a, b, ["user_id"], op=op))
        assert kernel == rel, op


def test_relational_empty_side(spark):
    a = _mk(spark, 41)
    empty = a.limit(0)
    rel = _canon(merge_series_relational(a, empty, ["user_id"], op="plus"))
    kernel = _canon(merge_series(a, empty, ["user_id"], op="plus", engine="kernel"))
    assert rel == kernel
    assert _canon(merge_series_relational(a, empty, ["user_id"], op="plus_strict")) == []
    # the auto skew guard must survive empty/one-sided inputs (checkpoint
    # + count over zero rows) and match the plain plan
    assert _canon(merge_series(a, empty, ["user_id"], op="plus")) == kernel
    assert _canon(merge_series(empty, empty, ["user_id"], op="plus")) == []


def test_relational_touching_entries_same_instant(spark):
    # an entry starting exactly where another ends must take effect
    # immediately (end markers sort before starts at equal p)
    a = spark.createDataFrame(
        [("k", 0, 1.0, 10), ("k", 10, 2.0, 10)],
        "user_id string, ts long, value double, validity long",
    )
    b = spark.createDataFrame(
        [("k", 5, 10.0, 10), ("k", 15, 20.0, 5)],
        "user_id string, ts long, value double, validity long",
    )
    rel = _canon(merge_series_relational(a, b, ["user_id"], op="plus"))
    kernel = _canon(merge_series(a, b, ["user_id"], op="plus", engine="kernel"))
    assert rel == kernel
    # spot-check one segment: at t=10 both new a-entry (2.0) and b (10.0)
    assert ("k", 10, 12.0, 5) in rel


def test_relational_rle_compression(spark):
    # equal contiguous results must merge into one entry across the join
    a = spark.createDataFrame(
        [("k", 0, 1.0, 10), ("k", 10, 2.0, 10)],
        "user_id string, ts long, value double, validity long",
    )
    b = spark.createDataFrame(
        [("k", 0, 2.0, 10), ("k", 10, 1.0, 10)],
        "user_id string, ts long, value double, validity long",
    )
    rel = _canon(merge_series_relational(a, b, ["user_id"], op="plus"))
    assert rel == [("k", 0, 3.0, 20)]


def test_n_ary_relational_matches_kernel(spark):
    # engine="kernel" is load-bearing: the dispatcher default is relational,
    # so omitting it would compare the relational path to itself
    sides = [_mk(spark, s) for s in (51, 52, 53)]
    for op in ("plus", "plus_strict"):
        kernel = _canon(
            merge_series_n(sides, ["user_id"], op=op, engine="kernel")
        )
        rel = _canon(merge_series_n_relational(sides, ["user_id"], op=op))
        assert kernel == rel, op
        assert len(kernel) > 0


def test_strict_zip_relational_matches_kernel(spark):
    a, b = _mk(spark, 61), _mk(spark, 62)
    kernel = _canon(strict_zip_series(a, b, ["user_id"], engine="kernel"))
    rel = _canon(strict_zip_series_relational(a, b, ["user_id"]))
    assert kernel == rel
    assert len(kernel) > 0


def test_nan_values_match_kernel_split(spark):
    """NaN input values: the kernels keep NaN segments but never RLE-merge
    adjacent NaN runs (numpy NaN != NaN); Spark's NaN = NaN is true, so the
    relational islands must break on NaN explicitly. Binary named ops treat
    NaN results as holes on BOTH engines (kernel keep-mask, relational
    filter); n-ary and strict-zip keep them, split."""
    nan = float("nan")
    rows_a = [("k", 0, 1.0, 10), ("k", 10, nan, 10), ("k", 20, nan, 10),
              ("k", 35, 2.0, 5)]
    rows_b = [("k", 0, nan, 15), ("k", 15, 3.0, 10), ("k", 30, nan, 10)]
    schema = "user_id string, ts long, value double, validity long"
    a = spark.createDataFrame(rows_a, schema)
    b = spark.createDataFrame(rows_b, schema)

    def _cmp_nan(k_rows, r_rows):
        assert len(k_rows) == len(r_rows)
        for kr, rr in zip(k_rows, r_rows):
            for kv, rv in zip(kr, rr):
                if isinstance(kv, float) and np.isnan(kv):
                    assert isinstance(rv, float) and np.isnan(rv)
                else:
                    assert kv == rv

    # binary: NaN results are holes on both engines
    for op in ("plus", "plus_strict", "fallback"):
        kernel = _canon(merge_series(a, b, ["user_id"], op=op, engine="kernel"))
        rel = _canon(merge_series_relational(a, b, ["user_id"], op=op))
        _cmp_nan(kernel, rel)
    # n-ary: NaN kept, adjacent NaN runs stay split like the kernel
    for op in ("plus", "plus_strict"):
        kernel = _canon(
            merge_series_n([a, b], ["user_id"], op=op, engine="kernel")
        )
        rel = _canon(merge_series_n_relational([a, b], ["user_id"], op=op))
        _cmp_nan(kernel, rel)
    # strict zip: NaN pair slots kept, split
    kernel = _canon(strict_zip_series(a, b, ["user_id"], engine="kernel"))
    rel = _canon(strict_zip_series_relational(a, b, ["user_id"]))
    _cmp_nan(kernel, rel)


def test_skew_guard_routes_hot_keys(spark):
    """engine='auto' must detect a key above hot_threshold WITHOUT a caller
    hint, merge it through an auto-sized time_slice, keep the cold keys on
    the plain plan, and produce output identical to every manual plan."""
    from pyspark.sql import functions as F

    a, b = _mk(spark, 201), _mk(spark, 202)
    # a synthetic hot key: 5k touching entries on each side
    hot_a = spark.range(5000).select(
        F.lit("hotkey").alias("user_id"), (F.col("id") * 10).alias("ts"),
        (F.pmod(F.col("id"), F.lit(7))).cast("double").alias("value"),
        F.lit(10).cast("long").alias("validity"),
    )
    hot_b = spark.range(5000).select(
        F.lit("hotkey").alias("user_id"),
        (F.col("id") * 10 + 3).alias("ts"),
        (F.pmod(F.col("id"), F.lit(5))).cast("double").alias("value"),
        F.lit(10).cast("long").alias("validity"),
    )
    left = a.unionByName(hot_a)
    right = b.unionByName(hot_b)

    expected = _canon(merge_series(
        left, right, ["user_id"], op="plus", engine="kernel"
    ))
    # guard fires (threshold 1000 < 10k hot entries): split routing
    routed = _canon(merge_series(
        left, right, ["user_id"], op="plus", hot_threshold=1000
    ))
    assert routed == expected
    # guard present but nothing hot: plain relational, same output
    unrouted = _canon(merge_series(left, right, ["user_id"], op="plus"))
    assert unrouted == expected
    # guard off: fully lazy plain relational, same output
    lazy = _canon(merge_series(
        left, right, ["user_id"], op="plus", skew_guard=False
    ))
    assert lazy == expected
    # the routed plan stays zero-Python
    plan = merge_series(
        left, right, ["user_id"], op="plus", hot_threshold=1000
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    # null key components must route too (null-safe predicate)
    def _canon_null(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    null_hot_a = hot_a.withColumn("user_id", F.lit(None).cast("string"))
    null_hot_b = hot_b.withColumn("user_id", F.lit(None).cast("string"))
    exp_null = _canon_null(merge_series(
        a.unionByName(null_hot_a), b.unionByName(null_hot_b), ["user_id"],
        op="plus", engine="kernel",
    ))
    got_null = _canon_null(merge_series(
        a.unionByName(null_hot_a), b.unionByName(null_hot_b), ["user_id"],
        op="plus", hot_threshold=1000,
    ))
    assert got_null == exp_null


def test_n_ary_and_zip_time_slice_and_guard(spark):
    """The hot-key escape generalizes to the whole merge family: n-ary and
    strict-zip sliced outputs equal the plain plans, and the auto guard
    routes a synthetic hot key with no caller hint."""
    from pyspark.sql import functions as F

    sides = [_mk(spark, s) for s in (221, 222, 223)]
    for op in ("plus", "plus_strict"):
        base = _canon(merge_series_n_relational(sides, ["user_id"], op=op))
        sliced = _canon(merge_series_n_relational(
            sides, ["user_id"], op=op, time_slice=41
        ))
        assert base == sliced, op
        assert len(base) > 0
    a, b = _mk(spark, 231), _mk(spark, 232)
    zbase = _canon(strict_zip_series_relational(a, b, ["user_id"]))
    zsliced = _canon(strict_zip_series_relational(
        a, b, ["user_id"], time_slice=53
    ))
    assert zbase == zsliced
    assert len(zbase) > 0

    hot = spark.range(4000).select(
        F.lit("hotkey").alias("user_id"), (F.col("id") * 10).alias("ts"),
        (F.pmod(F.col("id"), F.lit(7))).cast("double").alias("value"),
        F.lit(10).cast("long").alias("validity"),
    )
    hs = [s.unionByName(hot) for s in sides]
    exp = _canon(merge_series_n(hs, ["user_id"], op="plus", engine="kernel"))
    got = _canon(merge_series_n(hs, ["user_id"], op="plus", hot_threshold=1000))
    assert got == exp
    za, zb = a.unionByName(hot), b.unionByName(hot)
    zexp = _canon(strict_zip_series(za, zb, ["user_id"], engine="kernel"))
    zgot = _canon(strict_zip_series(za, zb, ["user_id"], hot_threshold=1000))
    assert zgot == zexp


def test_auto_engine_routes_named_ops_relationally(spark):
    a, b = _mk(spark, 71), _mk(spark, 72)
    df = merge_series(a, b, ["user_id"], op="plus")  # engine="auto"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert plan.count("Exchange") == 1
    # callable op must still take the kernel
    df2 = merge_series(
        a, b, ["user_id"],
        op=lambda x, y: (x or 0.0) + (y or 0.0) or None,
    )
    assert "FlatMapGroupsInPandas" in df2._jdf.queryExecution().executedPlan().toString()


def test_relational_engine_rejects_unsupported(spark):
    a, b = _mk(spark, 81), _mk(spark, 82)
    with pytest.raises(ValueError):
        merge_series(a, b, ["user_id"], op="plus", engine="relational",
                     compress=False)
    with pytest.raises(ValueError):
        merge_series(a, b, ["user_id"], op=lambda x, y: None,
                     engine="relational")


def test_relational_time_slice_identical_output(spark):
    # the hot-key escape hatch must not change results: slice at absolute
    # boundaries, merge per (key, slice), RLE-repair across borders
    a, b = _mk(spark, 91), _mk(spark, 92)
    base = _canon(merge_series_relational(a, b, ["user_id"], op="plus"))
    sliced = _canon(
        merge_series_relational(a, b, ["user_id"], op="plus", time_slice=37)
    )
    assert base == sliced
    # and through the dispatcher (auto engine now accepts time_slice)
    via_dispatch = _canon(
        merge_series(a, b, ["user_id"], op="plus", time_slice=37)
    )
    assert base == via_dispatch
    plan = merge_series(
        a, b, ["user_id"], op="plus", time_slice=37
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan


def test_relational_time_slice_rejects_hole_filling_ops(spark):
    a, b = _mk(spark, 93), _mk(spark, 94)
    with pytest.raises(ValueError):
        merge_series_relational(
            a, b, ["user_id"], op="minus",
            left_default=1.0, right_default=2.0, time_slice=100,
        )


def test_rolling_relational_matches_kernel(spark):
    """rolling(sum|mean) via cumulative sums minus an as-of end-event carry
    (operators/window.py rolling_values_relational) must match the
    contiguous-range kernel bit-for-bit on fitted series."""
    from scala_timeseries_lib_spark.operators.window import rolling_values

    df = _mk(spark, 101)
    for agg in ("sum", "mean"):
        for window_ms in (13, 60, 500):
            kernel = _canon(rolling_values(
                df, ["user_id"], window_ms, agg=agg, engine="kernel"
            ))
            rel = _canon(rolling_values(
                df, ["user_id"], window_ms, agg=agg, engine="relational"
            ))
            assert kernel == rel, (agg, window_ms)
            assert len(kernel) > 0
    # uncompressed twin too (no RLE pass)
    k = _canon(rolling_values(df, ["user_id"], 60, compress=False,
                              engine="kernel"))
    r = _canon(rolling_values(df, ["user_id"], 60, compress=False,
                              engine="relational"))
    assert k == r
    # min/max must stay on the kernel (order statistics need RMQ)
    plan = rolling_values(
        df, ["user_id"], 60, agg="min"
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    plan2 = rolling_values(
        df, ["user_id"], 60, agg="sum"
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan2
    with pytest.raises(ValueError):
        rolling_values(df, ["user_id"], 60, agg="min", engine="relational")


def test_sample_closest_relational_matches_kernel(spark):
    """Closest-in-window sampling via two as-of carries over one per-key
    sort (operators/window.py sample_closest_relational) must match the
    vectorized kernel across rates, raw and compressed."""
    from scala_timeseries_lib_spark.operators.window import sample_closest

    df = _mk(spark, 111, max_entries=60)
    for rate in (7, 20, 121):
        for compress in (False, True):
            kernel = _canon(sample_closest(
                df, ["user_id"], rate, compress=compress, engine="kernel"
            ))
            rel = _canon(sample_closest(
                df, ["user_id"], rate, compress=compress,
                engine="relational",
            ))
            assert kernel == rel, (rate, compress)
            assert len(kernel) > 0
    # the relational path is zero-Python; the AUTO default stays on the
    # kernel (measured faster on every realistic shape -- see docstring)
    rel_plan = sample_closest(
        df, ["user_id"], 20, engine="relational"
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in rel_plan
    auto_plan = sample_closest(
        df, ["user_id"], 20
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in auto_plan


def test_sliding_exact_relational_matches_sequential(spark):
    """The zero-Python exact-sweep twin must reproduce the SEQUENTIAL
    sweep's accumulation bit-for-bit (drops retract before adds at each
    cursor, same float order), for sum over raw holey entries and mean
    over the closest-in-window resampled grid."""
    from scala_timeseries_lib_spark.kernel import window as kwin
    from scala_timeseries_lib_spark.kernel.fitter import fit
    from scala_timeseries_lib_spark.operators.window import (
        sliding_window_exact,
    )

    df = _mk(spark, 301, n_keys=8, max_entries=50)
    width = 60

    def seq_ref(agg_factory, sample_rate=None):
        per_key = {}
        for r in df.collect():
            per_key.setdefault(r["user_id"], []).append(
                (r["ts"], r["value"], r["validity"])
            )
        out = []
        for key, entries in per_key.items():
            entries.sort()
            emitted = []
            for (ts, _c, validity), a in kwin.window_sweep(
                entries, width, agg_factory(), sample_rate, True
            ):
                if a is not None:
                    emitted.append((ts, float(a), validity))
            for ts, v, d in fit(emitted, compress=True):
                out.append((key, ts, v, d))
        return sorted(out)

    for agg, factory, rate in (
        ("sum", kwin.SumAggregator, None),
        ("mean", kwin.MeanAggregator, 20),
    ):
        rel = _canon(sliding_window_exact(
            df, ["user_id"], width, agg,
            sample_rate=rate, engine="relational", compress=True,
        ))
        assert rel == seq_ref(factory, rate), agg
        assert len(rel) > 50
        # compress=False twin too (every emission, no RLE)
        rel_raw = _canon(sliding_window_exact(
            df, ["user_id"], width, agg,
            sample_rate=rate, engine="relational", compress=False,
        ))
        assert len(rel_raw) >= len(rel)
    # the relational plan is zero-Python; auto stays on the kernel
    plan = sliding_window_exact(
        df, ["user_id"], width, "sum", engine="relational"
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" not in plan
    with pytest.raises(ValueError):
        sliding_window_exact(
            df, ["user_id"], width, "median", engine="relational"
        )


def test_sliding_exact_relational_matches_kernel_rounded(spark):
    """Vs the VECTORIZED kernel engine: identical up to the documented
    ~1e-13 prefix-difference float divergence (compare at 9 decimals,
    same rounding the oracle queries apply)."""
    from scala_timeseries_lib_spark.operators.window import (
        sliding_window_exact,
    )

    df = _mk(spark, 311, n_keys=6, max_entries=40)

    def rounded(rows):
        return sorted(
            (r[0], r[1], round(r[2], 9), r[3]) for r in rows
        )

    for agg, rate in (("sum", None), ("mean", 25)):
        kernel = rounded(_canon(sliding_window_exact(
            df, ["user_id"], 80, agg, sample_rate=rate, engine="kernel",
            compress=False,
        )))
        rel = rounded(_canon(sliding_window_exact(
            df, ["user_id"], 80, agg, sample_rate=rate,
            engine="relational", compress=False,
        )))
        assert kernel == rel, agg
        assert len(kernel) > 50


def test_relational_stress_high_entropy(spark):
    """One wide adversarial batch instead of per-example fuzzing (a Spark
    round per hypothesis example would be minutes): 40 keys mixing dense
    RLE chains, long validities, negative timestamps, huge magnitudes, and
    singleton series — kernel and relational must agree on every op."""
    rng = np.random.default_rng(987)
    rows_a, rows_b = [], []
    for k in range(40):
        key = f"k{k}"
        style = k % 4
        for rows, seed_shift in ((rows_a, 0), (rows_b, 1)):
            t = int(rng.integers(-1_000_000, 1_000_000))
            n = 1 if style == 3 else int(rng.integers(2, 120))
            for _ in range(n):
                if style == 0:      # dense chain, tiny values (RLE-heavy)
                    dur = int(rng.integers(1, 4))
                    v = float(rng.integers(0, 2))
                    gap = 0
                elif style == 1:    # long validities, big magnitudes
                    dur = int(rng.integers(10_000, 500_000))
                    v = float(rng.integers(-10**9, 10**9))
                    gap = int(rng.integers(0, 1_000_000))
                else:               # mixed
                    dur = int(rng.integers(1, 500))
                    v = float(rng.integers(-50, 50))
                    gap = int(rng.integers(0, 800))
                rows.append((key, t, v, dur))
                t += dur + gap + (1 if gap == 0 and rng.random() < 0.5 else 0)
                # keep strictly increasing when gap==0 kept half the time
                if gap == 0 and rows[-1][1] == t:
                    t += 1
    a = spark.createDataFrame(
        rows_a, "user_id string, ts long, value double, validity long"
    )
    b = spark.createDataFrame(
        rows_b, "user_id string, ts long, value double, validity long"
    )
    for op, kw in OPS:
        kernel = _canon(
            merge_series(a, b, ["user_id"], op=op, engine="kernel", **kw)
        )
        rel = _canon(merge_series_relational(a, b, ["user_id"], op=op, **kw))
        assert kernel == rel, op
        assert len(kernel) > 100

    # same adversarial batch through the relational exact sweep vs the
    # sequential kernel (negative timestamps, dense RLE chains, huge
    # magnitudes, singleton series — bit-exact, both widths)
    from scala_timeseries_lib_spark.kernel import window as kwin
    from scala_timeseries_lib_spark.kernel.fitter import fit
    from scala_timeseries_lib_spark.operators.window import (
        sliding_window_exact,
    )

    per_key = {}
    for key, ts, v, dur in rows_a:
        per_key.setdefault(key, []).append((ts, v, dur))
    for width in (7, 100_000):
        expected = []
        for key, entries in per_key.items():
            entries.sort()
            emitted = [
                (ts, float(agg), dur)
                for (ts, _c, dur), agg in kwin.window_sweep(
                    entries, width, kwin.SumAggregator()
                )
                if agg is not None
            ]
            for ts, v, d in fit(emitted, compress=True):
                expected.append((key, ts, v, d))
        got = _canon(sliding_window_exact(
            a, ["user_id"], width, "sum", engine="relational",
        ))
        assert got == sorted(expected), width
        assert len(got) > 1000
