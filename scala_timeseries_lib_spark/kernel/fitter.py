"""TSEntry fitting: trim overlaps, RLE-compress equal contiguous values.

Semantics re-expressed from the reference's stateful fitter
(validation/TSEntryFitter.scala:28-53 and immutable/TSEntry.scala:173-199
``appendEntry``/``extendOrTrim``):

- input entries must be strictly increasing in ``ts`` (else ``ValueError``,
  mirroring validation/TimestampValidator.scala:89-94);
- the previous entry is trimmed to end at the next entry's ``ts`` if they
  overlap;
- with ``compress=True`` two consecutive entries with *equal* values whose
  domains touch or overlap are merged into one; note the merged entry ends at
  the *later entry's* end even if that shrinks the previous one
  (TSEntry.scala:187-199).

The vectorized form exploits a key property of the sequential algorithm: after
entry ``i`` is absorbed into a compression chain, the chain's running end is
exactly ``ts[i] + validity[i]``, so the chain-link condition is purely
pairwise: ``value[i+1] == value[i] and ts[i+1] <= ts[i] + validity[i]``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "fit",
    "fit_arrays",
    "fit_arrays_grouped",
    "is_domain_continuous",
    "validate_timestamps",
]


def validate_timestamps(ts) -> None:
    """Raise ``ValueError`` unless timestamps are strictly increasing."""
    ts = np.asarray(ts, dtype=np.int64)
    if ts.size > 1 and not np.all(np.diff(ts) > 0):
        raise ValueError("Timestamps must be strictly increasing")


def fit(entries, compress: bool = True):
    """Sequential reference fitter over ``[(ts, value, validity), ...]``.

    Works for any value type (numbers, strings, tuples). Returns a new list.
    """
    out = []
    last = None  # pending entry, may still be trimmed/extended
    for ts, value, validity in entries:
        if validity <= 0:
            raise ValueError(f"validity must be > 0, got {validity}")
        if last is None:
            last = (ts, value, validity)
            continue
        lts, lval, lvalidity = last
        if ts <= lts:
            raise ValueError(f"Timestamps must be strictly increasing ({lts} -> {ts})")
        l_until = lts + lvalidity
        if compress and ts <= l_until and value == lval:
            # merge: chain end becomes *this* entry's end (may shrink)
            last = (lts, lval, (ts + validity) - lts)
        else:
            # trim previous to this entry's start if overlapping
            out.append((lts, lval, min(lvalidity, ts - lts)))
            last = (ts, value, validity)
    if last is not None:
        out.append(last)
    return out


def fit_arrays(ts, value, validity, compress: bool = True):
    """Vectorized fitter over numpy arrays; returns ``(ts, value, validity)``.

    ``value`` may be float64 or object dtype; equality uses ``==`` per slot
    (NaN never equals NaN, matching strict equality in the reference).
    """
    ts = np.asarray(ts, dtype=np.int64)
    validity = np.asarray(validity, dtype=np.int64)
    value = np.asarray(value)
    n = ts.size
    if n == 0:
        return ts, value, validity
    if np.any(validity <= 0):
        raise ValueError("validity must be > 0")
    validate_timestamps(ts)

    if compress and n > 1:
        link = (value[1:] == value[:-1]) & (ts[1:] <= ts[:-1] + validity[:-1])
        # NaN == NaN is False already; object arrays compare elementwise
        link = np.asarray(link, dtype=bool)
        seg = np.concatenate(([0], np.cumsum(~link)))
        first = np.concatenate(([True], ~link))
        last = np.concatenate((~link, [True]))
        seg_ts = ts[first]
        seg_val = value[first]
        seg_until = (ts + validity)[last]
        ts, value, validity = seg_ts, seg_val, seg_until - seg_ts
        n = ts.size

    if n > 1:
        # trim each entry to the next entry's start when overlapping
        validity = np.concatenate(
            (np.minimum(validity[:-1], ts[1:] - ts[:-1]), validity[-1:])
        )
    return ts, value, validity


def fit_arrays_grouped(codes, ts, value, validity, compress: bool = True):
    """Vectorized fitter over MANY series at once.

    ``codes`` groups rows into series (ascending; ``ts`` ascending within
    each code). Chain links and trims never cross a code change, so one
    pass fits the whole batch -- per series this is exactly
    :func:`fit_arrays` (pinned by test). Returns ``(keep_idx, ts, value,
    validity)`` where ``keep_idx`` indexes the surviving rows of the input
    (each surviving row is the first of its compression chain), letting
    callers gather per-row payload such as key columns.
    """
    codes = np.asarray(codes, dtype=np.int64)
    ts = np.asarray(ts, dtype=np.int64)
    validity = np.asarray(validity, dtype=np.int64)
    value = np.asarray(value)
    n = ts.size
    keep_idx = np.arange(n)
    if n == 0:
        return keep_idx, ts, value, validity
    if np.any(validity <= 0):
        raise ValueError("validity must be > 0")
    same = codes[1:] == codes[:-1]
    if np.any(same & (np.diff(ts) <= 0)):
        raise ValueError("Timestamps must be strictly increasing")

    if compress and n > 1:
        link = same & (value[1:] == value[:-1]) & (ts[1:] <= ts[:-1] + validity[:-1])
        link = np.asarray(link, dtype=bool)
        first = np.concatenate(([True], ~link))
        last = np.concatenate((~link, [True]))
        seg_until = (ts + validity)[last]
        keep_idx = keep_idx[first]
        ts, value, codes = ts[first], value[first], codes[first]
        validity = seg_until - ts
        n = ts.size
        same = codes[1:] == codes[:-1]

    if n > 1:
        trimmed = np.where(
            same, np.minimum(validity[:-1], ts[1:] - ts[:-1]), validity[:-1]
        )
        validity = np.concatenate((trimmed, validity[-1:]))
    return keep_idx, ts, value, validity


def is_domain_continuous(ts, validity) -> bool:
    """True when no holes exist between consecutive fitted entries
    (TSEntryFitter.scala:38,60-63)."""
    ts = np.asarray(ts, dtype=np.int64)
    validity = np.asarray(validity, dtype=np.int64)
    if ts.size <= 1:
        return True
    return bool(np.all(ts[:-1] + validity[:-1] >= ts[1:]))
