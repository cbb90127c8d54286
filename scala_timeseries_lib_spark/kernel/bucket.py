"""Bucketing and rollup (bucketing/TimeBucketer.scala, TimeSeries.scala:481-508).

- ``bucket_entries``: split a series into sub-series per ``[b_i, b_i+1)``;
  straddling entries are split at bucket boundaries. The returned stream ends
  with a trailing empty bucket that marks the end of the last entry's domain
  (TimeBucketer.scala:57-85).
- ``bucket_entries_maxn``: time buckets further split by a maximum entry
  count, used for archival block sizing (TimeBucketer.scala:24-46).
- ``group_entries``: chunk into <= max_n-entry groups keyed by first ts
  (TimeSeries.scala:579-586).
- ``rollup``: one entry per bucket whose value is ``aggregator(bucket
  entries)`` and whose domain is the bucket itself (TimeSeries.scala:501-508).
"""

from __future__ import annotations

from itertools import count

__all__ = [
    "bucket_generator",
    "bucket_entries",
    "bucket_entries_maxn",
    "group_entries",
    "rollup",
    "split_at_buckets",
]


def bucket_generator(start: int, step: int):
    """The reference's ``Stream.from(start, step)`` bucket boundary stream."""
    return (start + step * i for i in count())


def _split_entry_at(entry, at: int):
    """Split one entry at ``at``; returns (left_part_or_None, right_part_or_None)."""
    ts, value, validity = entry
    until = ts + validity
    if at <= ts:
        return None, entry
    if at >= until:
        return entry, None
    return (ts, value, at - ts), (at, value, until - at)


def bucket_entries(buckets, entries):
    """Port of TimeBucketer.bucketEntries (scala:57-85). ``buckets`` is an
    iterator/generator of boundaries. Returns a list of
    ``(bucket_start, [entries...])``; the last element is an empty bucket
    marking the end of the domain."""
    entries = list(entries)
    buckets = iter(buckets)
    out = []
    cur = next(buckets)
    if not entries:
        return [(cur, [])]
    if cur > entries[0][0]:
        raise ValueError(
            f"Bucket stream must start at or before the first entry "
            f"({cur} > {entries[0][0]})"
        )
    while entries:
        nxt = next(buckets)
        within = [e for e in entries if e[0] < nxt]
        rest = entries[len(within):]
        if not within:
            out.append((cur, []))
        else:
            keep, spill = _split_entry_at(within[-1], nxt)
            bucket_list = within[:-1] + ([keep] if keep else [])
            out.append((cur, bucket_list))
            entries = ([spill] if spill else []) + rest
            cur = nxt
            continue
        entries = rest if within else entries
        cur = nxt
    out.append((cur, []))
    return out


def group_entries(entries, max_n: int):
    """Chunk into groups of <= max_n entries keyed by the first entry's ts
    (TimeSeries.scala:579-586)."""
    entries = list(entries)
    return [
        (entries[i][0], entries[i : i + max_n]) for i in range(0, len(entries), max_n)
    ]


def bucket_entries_maxn(entries, buckets, max_n: int):
    """TimeBucketer.bucketEntries with maxNumberOfEntries (scala:24-46):
    returns blocks as ``(block_start, [entries], block_validity)``; empty time
    buckets are preserved as empty blocks except the trailing marker, which
    only defines the last block's validity."""
    entries = list(entries)
    if not entries:
        raise ValueError("Can't bucket an empty stream into blocks.")
    flat = []
    tb = bucket_entries(buckets, entries)
    for i, (bstart, bentries) in enumerate(tb):
        if i == len(tb) - 1:
            flat.append((bstart, []))  # trailing marker, kept for validity calc
        elif not bentries:
            flat.append((bstart, []))
        else:
            flat.extend(group_entries(bentries, max_n))
    out = []
    for (ts, es), (nxt_ts, _) in zip(flat[:-1], flat[1:]):
        out.append((ts, es, nxt_ts - ts))
    return out


def rollup(entries, buckets, aggregator):
    """TimeSeries.rollup (scala:501-508): aggregate each bucket's sub-series;
    the output entry spans the whole bucket. ``aggregator`` takes the list of
    (already boundary-split) entries of one bucket."""
    tb = bucket_entries(buckets, entries)
    out = []
    for (bstart, bentries), (bend, _) in zip(tb[:-1], tb[1:]):
        out.append((bstart, aggregator(bentries), bend - bstart))
    from .fitter import fit

    return fit(out, compress=True)


def split_at_buckets(entries, step: int, origin: int = 0):
    """Split every entry at the bucket boundaries of width ``step`` anchored
    at ``origin``: an entry spanning k buckets becomes k entries. This is the
    pre-split that makes tumbling-window aggregation match the reference's
    bucket semantics (TimeBucketer.scala:79-84); vector-friendly and also
    implemented JVM-side in operators.rollup via sequence()/explode."""
    out = []
    for ts, value, validity in entries:
        until = ts + validity
        t = ts
        while t < until:
            bucket_end = ((t - origin) // step + 1) * step + origin
            nxt = min(bucket_end, until)
            out.append((t, value, nxt - t))
            t = nxt
    return out
