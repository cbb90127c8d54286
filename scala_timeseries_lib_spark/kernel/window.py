"""Sliding windows: the reference's WindowSlider sweep + reversible aggregators.

Re-expressed from window/WindowSlider.scala:114-269 and
window/BasicAggregators.scala / IntegralAggregator.scala:

- a width-``w`` trailing window slides over the entries; an output entry is
  emitted for each maximal interval over which the *window contents* are
  constant. Additions happen at entry timestamps; a removal happens when an
  entry's end equals ``cursor - w``. Windows are ``[begin, end)`` and the
  window never slides past the last entry's domain.
- aggregators maintain O(1) incremental state with add/drop (retract), the
  same contract as Spark's AggregateFunction with an inverse.
- time-aware aggregators (mean/std/integral, which depend on validity)
  require the entries to be resampled onto a fixed grid first
  (WindowSlider.scala:71-90).
"""

from __future__ import annotations

import math
from collections import deque

from .integral import seconds_factor

__all__ = [
    "Aggregator",
    "SumAggregator",
    "MeanAggregator",
    "StdAggregator",
    "MinAggregator",
    "MaxAggregator",
    "IntegralAggregator",
    "CollectAggregator",
    "window_sweep",
    "window_sweep_grouped",
    "rolling",
    "rolling_grouped",
    "sliding_window",
    "dynamic_window",
]


class Aggregator:
    """Reversible aggregator protocol (window/ReversibleAggregator.scala:29-80)."""

    time_aware = False

    def current(self):  # Option[A]
        raise NotImplementedError

    def add(self, entry):  # entry = (ts, value, validity)
        raise NotImplementedError

    def drop(self, entry):
        raise NotImplementedError


class SumAggregator(Aggregator):
    """Plain sum of values; ignores durations (BasicAggregators.scala:22-35)."""

    def __init__(self):
        self.sum = 0.0

    def current(self):
        return self.sum

    def add(self, entry):
        self.sum += entry[1]

    def drop(self, entry):
        self.sum -= entry[1]


class MeanAggregator(Aggregator):
    """Time-weighted mean sum(v_i*d_i)/sum(d_i); None when sum(d)=0
    (BasicAggregators.scala:41-64)."""

    time_aware = True

    def __init__(self):
        self.sum = 0.0
        self.durations = 0

    def current(self):
        return self.sum / self.durations if self.durations > 0 else None

    def add(self, entry):
        self.sum += float(entry[1]) * entry[2]
        self.durations += entry[2]

    def drop(self, entry):
        self.sum -= float(entry[1]) * entry[2]
        self.durations -= entry[2]


class StdAggregator(Aggregator):
    """Time-weighted biased std sqrt(E_w[X^2]-E_w[X]^2)
    (BasicAggregators.scala:71-96)."""

    time_aware = True

    def __init__(self):
        self.mean = MeanAggregator()
        self.square_mean = MeanAggregator()

    def current(self):
        m = self.mean.current()
        s = self.square_mean.current()
        if m is None or s is None:
            return None
        return math.sqrt(s - m * m)

    def add(self, entry):
        ts, v, d = entry
        self.mean.add(entry)
        self.square_mean.add((ts, v * v, d))

    def drop(self, entry):
        ts, v, d = entry
        self.mean.drop(entry)
        self.square_mean.drop((ts, v * v, d))


class MinAggregator(Aggregator):
    """Exact sliding min via ascending-minima deque
    (BasicAggregators.scala:105-122)."""

    def __init__(self, key=None):
        self.q = deque()
        self.key = key or (lambda x: x)

    def current(self):
        return self.q[0] if self.q else None

    def add(self, entry):
        v = entry[1]
        k = self.key(v)
        while self.q and self.key(self.q[-1]) > k:
            self.q.pop()
        self.q.append(v)

    def drop(self, entry):
        if self.q and self.q[0] == entry[1]:
            self.q.popleft()


class MaxAggregator(MinAggregator):
    """Min aggregator under reversed ordering (Aggregator.scala:74-80)."""

    def __init__(self):
        super().__init__(key=lambda x: -x)


class IntegralAggregator(Aggregator):
    """Reversible add/drop of entry integrals (window/IntegralAggregator.scala:17-33)."""

    time_aware = True

    def __init__(self, timeunit: str = "ms", initial: float = 0.0):
        self.f = seconds_factor(timeunit)
        self.integral = initial

    def current(self):
        return self.integral

    def add(self, entry):
        self.integral += float(entry[1]) * entry[2] * self.f

    def drop(self, entry):
        self.integral -= float(entry[1]) * entry[2] * self.f


class CollectAggregator(Aggregator):
    """Keeps the whole window (QueueAggregator, BasicAggregators.scala:127-136).
    ``current`` applies ``fn`` to the tuple of values, or returns the tuple."""

    def __init__(self, fn=None):
        self.q = deque()
        self.fn = fn

    def current(self):
        vals = list(self.q)
        return self.fn(vals) if self.fn else tuple(vals)

    def add(self, entry):
        self.q.append(entry[1])

    def drop(self, entry):
        self.q.popleft()


def window_sweep(entries, width: int, aggregator: Aggregator, sample_rate=None,
                 use_closest: bool = True):
    """The two-pointer sweep (WindowSlider.scala:114-269).

    Yields ``((cursor_ts, window_contents_tuple, validity), aggregate)`` for
    each emission. If ``sample_rate`` is given, the entries are resampled
    first starting at the first entry's timestamp (WindowSlider.scala:71-90);
    this is mandatory for time-aware aggregators.
    """
    if width <= 0:
        raise ValueError("Needs a strictly positive window size")
    entries = list(entries)
    if not entries:
        return
    if sample_rate is not None:
        from .sample import sample

        entries = sample(entries, entries[0][0], sample_rate, use_closest)
        if not entries:
            return
    elif aggregator.time_aware:
        raise ValueError("time-aware aggregators require a sample_rate")

    n = len(entries)
    i = 0  # index of first remaining entry
    window = deque()  # of entries
    cursor = entries[0][0]
    INF = float("inf")

    while True:
        # --- whatToUpdate (WindowSlider.scala:195-269) ---
        if i >= n and window and window[-1][0] + window[-1][2] == cursor:
            return  # reached end of the last entry's domain
        take = i < n and entries[i][0] == cursor
        remove = bool(window) and (window[0][0] + window[0][2]) == cursor - width

        if i < n:
            if take:
                space_add = (
                    entries[i + 1][0] - cursor if i + 1 < n else entries[i][2]
                )
            else:
                space_add = entries[i][0] - cursor
        else:
            space_add = INF

        if remove:
            if len(window) > 1:
                nxt_until = window[1][0] + window[1][2]
            elif i < n:
                nxt_until = entries[i][0] + entries[i][2]
            else:
                nxt_until = INF
            space_rem = nxt_until - (cursor - width)
        else:
            head_until = (
                window[0][0] + window[0][2]
                if window
                else entries[i][0] + entries[i][2]
            )
            space_rem = head_until - (cursor - width)

        advance = min(space_add, space_rem)
        if i >= n:
            advance = min(advance, (window[-1][0] + window[-1][2]) - cursor)
        if advance == 0:
            return
        # --- update window + aggregator, emit ---
        if remove:
            aggregator.drop(window.popleft())
        if take:
            aggregator.add(entries[i])
            window.append(entries[i])
            i += 1
        if not (take or remove):  # pragma: no cover - invariant
            raise AssertionError("sweep invariant violated")
        yield (cursor, tuple(window), int(advance)), aggregator.current()
        cursor += int(advance)


def _rmq(vals, lo_idx, hi_idx, op):
    """Range min/max over [lo, hi) index ranges via a sparse table:
    O(n log n) build, O(1) per query, fully vectorized. ``op`` is
    np.minimum or np.maximum; empty ranges yield NaN."""
    import numpy as np

    n = vals.size
    out = np.full(lo_idx.size, np.nan)
    length = hi_idx - lo_idx
    pos = length > 0
    if not pos.any() or n == 0:
        return out
    max_len = int(length.max())
    levels = [np.asarray(vals, np.float64)]
    k = 1
    while (1 << k) <= max_len:
        half = 1 << (k - 1)
        prev = levels[-1]
        if prev.size <= half:
            break
        levels.append(op(prev[:-half], prev[half:]))
        k += 1
    j = np.zeros(lo_idx.size, np.int64)
    j[pos] = np.floor(np.log2(length[pos])).astype(np.int64)
    j = np.minimum(j, len(levels) - 1)
    for jj in range(len(levels)):
        m = pos & (j == jj)
        if not m.any():
            continue
        tbl = levels[jj]
        out[m] = op(tbl[lo_idx[m]], tbl[hi_idx[m] - (1 << jj)])
    return out


_GROUPED_AGGS = ("sum", "mean", "std", "min", "max", "integral")


def _validate_fitted(codes, ts, until):
    """The grouped kernels' searchsorted lookups need per-series monotone
    start AND end times, i.e. the fitted contract (sorted, non-overlapping
    entries). The sequential twins tolerate some malformed inputs; silently
    diverging from them is worse than failing, so raise (like
    fit_arrays_grouped does on its contract)."""
    import numpy as np

    same = codes[1:] == codes[:-1]
    if np.any(same & (ts[1:] < until[:-1])):
        raise ValueError(
            "entries must be fitted (sorted, non-overlapping) per series; "
            "run fit_entries first"
        )


def window_sweep_grouped(codes, ts, val, dur, width: int, agg: str = "sum",
                         timeunit: str = "ms"):
    """Vectorized exact sweep over MANY series at once.

    The declarative restatement of :func:`window_sweep` (the proof twin is
    the per-series sweep, pinned by tests; the SQL twin is
    ``_sliding_exact_sql`` in ``__spark_entry__``):

    - emission boundaries are every entry start plus every removal instant
      ``end + width``, clipped to each series' domain [first ts, last end);
    - during segment [lo, hi) the window holds the CONTIGUOUS entry range
      [n_removed(lo), n_added(lo)) -- additions and removals both happen in
      timestamp order for fitted non-overlapping entries -- so every
      aggregate is two searchsorted lookups plus either a prefix-sum
      difference (sum / mean / std / integral) or a sparse-table range
      min/max;
    - ``sum`` and ``integral`` emit 0.0 on empty windows (their aggregators
      never return None); mean/std/min/max leave holes.

    Offset packing (stride >= span + width + 2, so a removal probe can
    never reach the next series' region) batches all series of a salt
    bucket into single numpy calls. Inputs must be sorted by (code, ts);
    returns ``(codes_out, ts, value, validity)`` uncompressed emission
    segments, or ``None`` when the packed axis would overflow int64
    (callers fall back to the sequential per-series sweep).

    Float caveat: windowed sums come from prefix-sum differences, which
    round differently (~1e-13 relative) than the reference's incremental
    add/drop; callers comparing across engines or paths must round first
    (the driver queries do, via epsilon-floor + relational RLE).
    """
    import numpy as np

    if width <= 0:
        raise ValueError("Needs a strictly positive window size")
    if agg not in _GROUPED_AGGS:
        raise ValueError(f"unsupported grouped agg {agg!r}")
    codes = np.asarray(codes, np.int64)
    ts = np.asarray(ts, np.int64)
    val = np.asarray(val, np.float64)
    dur = np.asarray(dur, np.int64)
    n = ts.size
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             np.empty(0, np.float64), np.empty(0, np.int64))
    if n == 0:
        return empty

    until = ts + dur
    _validate_fitted(codes, ts, until)
    base = int(ts.min())
    span = int(until.max()) - base
    stride = span + width + 2
    if (int(codes.max()) + 1) * stride >= 1 << 62:
        return None
    p_ts = codes * stride + (ts - base)
    p_until = p_ts + dur

    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    ends = np.r_[starts[1:], n]
    lo0 = p_ts[starts]
    hi0 = p_until[ends - 1]  # fitted entries: until increases within a series
    sidx = np.repeat(np.arange(starts.size), ends - starts)
    hi0_per_entry = hi0[sidx]

    rem = p_until + width
    pts = np.unique(np.concatenate([p_ts, rem[rem < hi0_per_entry], hi0]))
    lo, hi = pts[:-1], pts[1:]
    seg_series = np.searchsorted(lo0, lo, side="right") - 1
    keep = lo != hi0[seg_series]  # drop the terminal/inter-region segments
    lo, hi, seg_series = lo[keep], hi[keep], seg_series[keep]

    # window contents = contiguous entry range [nr, na); entries of earlier
    # regions are past their removal instant, so they cancel out of every
    # prefix difference
    na = np.searchsorted(p_ts, lo, side="right")
    nr = np.searchsorted(rem, lo, side="right")

    def psum(x):
        c = np.concatenate(([0.0], np.cumsum(x)))
        return c[na] - c[nr]

    no_rows = na == nr
    if agg == "sum":
        value = psum(val)
        drop_empty = False
    elif agg == "integral":
        value = psum(val * dur * seconds_factor(timeunit))
        drop_empty = False
    elif agg == "mean":
        d = psum(dur.astype(np.float64))
        with np.errstate(invalid="ignore", divide="ignore"):
            value = psum(val * dur) / d
        drop_empty = True
    elif agg == "std":
        d = psum(dur.astype(np.float64))
        with np.errstate(invalid="ignore", divide="ignore"):
            m1 = psum(val * dur) / d
            m2 = psum(val * val * dur) / d
        value = np.sqrt(np.maximum(m2 - m1 * m1, 0.0))
        drop_empty = True
    else:  # min / max
        op = np.minimum if agg == "min" else np.maximum
        value = _rmq(val, nr, na, op)
        drop_empty = True

    if drop_empty:
        keep2 = ~no_rows
        lo, hi, seg_series, value = (
            lo[keep2], hi[keep2], seg_series[keep2], value[keep2]
        )
    return (codes[starts][seg_series], lo % stride + base, value, hi - lo)


def rolling(entries, aggregator, window_ms: int, compress: bool = True):
    """NumericTimeSeries.rolling (scala:49-64): for each entry, aggregate
    the VALUES of the entries overlapping ``[ts - window_ms, ts)`` plus the
    current value; the result keeps the entry's own timestamp and validity.
    ``aggregator`` is a callable over a list of values. Sequential twin of
    :func:`rolling_grouped`."""
    entries = list(entries)
    out = []
    for t, v, d in entries:
        vals = [
            pv for pt, pv, pd in entries if pt < t and pt + pd > t - window_ms
        ] + [v]
        out.append((t, aggregator(vals), d))
    from .fitter import fit

    return fit(out, compress=compress) if compress else out


def rolling_grouped(codes, ts, val, dur, window_ms: int, agg: str = "sum"):
    """Vectorized :func:`rolling` over many series (same offset-packing and
    contiguous-range argument as :func:`window_sweep_grouped`; the window of
    entry i is exactly the entry range [n_removed(ts_i), i]). ``agg``: sum |
    mean (plain mean of values) | min | max. Returns
    ``(codes, ts, value, validity)`` or None on packed-axis overflow."""
    import numpy as np

    if window_ms <= 0:
        raise ValueError("Needs a strictly positive window size")
    if agg not in ("sum", "mean", "min", "max"):
        raise ValueError(f"unsupported rolling agg {agg!r}")
    codes = np.asarray(codes, np.int64)
    ts = np.asarray(ts, np.int64)
    val = np.asarray(val, np.float64)
    dur = np.asarray(dur, np.int64)
    n = ts.size
    if n == 0:
        return codes, ts, val, dur
    _validate_fitted(codes, ts, ts + dur)
    base = int(ts.min())
    span = int((ts + dur).max()) - base
    stride = span + window_ms + 2
    if (int(codes.max()) + 1) * stride >= 1 << 62:
        return None
    p_ts = codes * stride + (ts - base)
    rem = p_ts + dur + window_ms
    # prior in-window entries for entry i: [nr_i, i); i itself is appended
    nr = np.searchsorted(rem, p_ts, side="right")
    hi = np.arange(n) + 1
    if agg in ("sum", "mean"):
        c = np.concatenate(([0.0], np.cumsum(val)))
        s = c[hi] - c[nr]
        value = s if agg == "sum" else s / (hi - nr)
    else:
        op = np.minimum if agg == "min" else np.maximum
        value = _rmq(val, nr, hi, op)
    return codes, ts, value, dur


def sliding_window(entries, width: int, aggregator: Aggregator, sample_rate=None,
                   use_closest: bool = True, compress: bool = True):
    """TimeSeries.slidingWindow (TimeSeries.scala:412-443): keep the aggregate,
    drop window contents, rebuild a fitted/compressed series."""
    out = []
    for (ts, _content, validity), agg in window_sweep(
        entries, width, aggregator, sample_rate, use_closest
    ):
        if agg is not None:
            out.append((ts, agg, validity))
    from .fitter import fit

    return fit(out, compress=compress)


def dynamic_window(entries, start_pred, stop_pred, aggregator_factory):
    """Predicate-delimited windows (WindowSlider.scala:286-319): a window
    starts at an entry where ``start and not stop`` holds and extends up to
    but not including the entry where ``stop`` holds. Emits one entry per
    window spanning its loose domain."""
    out = []
    entries = list(entries)
    i = 0
    n = len(entries)
    while i < n:
        # dropWhile !start || stop
        while i < n and (not start_pred(entries[i]) or stop_pred(entries[i])):
            i += 1
        if i >= n:
            break
        j = i
        agg = aggregator_factory()
        while j < n and not stop_pred(entries[j]):
            agg.add(entries[j])
            j += 1
        val = agg.current()
        if val is not None:
            first, last = entries[i], entries[j - 1]
            out.append((first[0], val, last[0] + last[2] - first[0]))
        i = j
    return out
