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
