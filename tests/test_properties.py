"""Property-based kernel tests (hypothesis).

The reference has no property testing (scalacheck is an unfulfilled TODO,
README.md:166); these properties pin the algebraic laws its golden fixtures
only sample: fitter idempotence/normalization, merge commutativity,
identity laws and pointwise semantics, fallback self-absorption, entry
splitting conservation, strict-sampling membership, Gorilla round-trips
over adversarial doubles.

Pure kernel (numpy) -- no SparkSession, so the suite runs in seconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from scala_timeseries_lib_spark.kernel import merge as kmerge
from scala_timeseries_lib_spark.kernel import sample as ksample
from scala_timeseries_lib_spark.kernel.fitter import fit
from scala_timeseries_lib_spark.kernel.gorilla import (
    compress_tuple_block,
    decompress_tuple_block,
)

def _cumsum_entries(gvd):
    """(gap, value, validity) triples -> strictly-increasing raw entries
    (the fitter enforces the reference's strictly-increasing contract,
    TimestampValidator.scala:89-94, so duplicate ts must not be generated;
    overlap/extension still occurs freely through the validities)."""
    ts, out = 0, []
    for g, v, d in gvd:
        ts += g
        out.append((ts, v, d))
    return out


# possibly-overlapping entries with strictly increasing timestamps
entries_list = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=400),
        st.sampled_from([0.0, 1.0, 2.5, -3.0, 7.0]),
        st.integers(min_value=1, max_value=500),
    ),
    min_size=0,
    max_size=40,
).map(_cumsum_entries)


def _is_fitted(es):
    for (t1, _v1, d1), (t2, _v2, _d2) in zip(es, es[1:]):
        if not (t1 < t2 and t1 + d1 <= t2):
            return False
    return all(d > 0 for _t, _v, d in es)


def _defined_at(es, t):
    for ts, v, d in es:
        if ts <= t < ts + d:
            return v
    return None


@settings(max_examples=200, deadline=None)
@given(entries_list)
def test_fit_normalizes_and_is_idempotent(raw):
    f1 = fit(raw, compress=True)
    assert _is_fitted(f1)
    assert fit(f1, compress=True) == f1


@settings(max_examples=200, deadline=None)
@given(entries_list, entries_list)
def test_merge_plus_commutes(ra, rb):
    a, b = fit(ra), fit(rb)
    ab = kmerge.merge_entries(a, b, kmerge.op_non_strict_plus)
    ba = kmerge.merge_entries(b, a, kmerge.op_non_strict_plus)
    assert ab == ba


@settings(max_examples=200, deadline=None)
@given(entries_list)
def test_merge_identities(raw):
    a = fit(raw, compress=True)
    # empty is the identity of the non-strict plus
    assert kmerge.merge_entries(a, [], kmerge.op_non_strict_plus) == a
    # fallback(a, a) == a
    assert kmerge.merge_entries(a, a, kmerge.op_fallback) == a
    # strict ops over disjoint domains are empty
    assert kmerge.merge_entries(
        a, [], kmerge.op_strict(lambda x, y: x + y)
    ) == []


@settings(max_examples=150, deadline=None)
@given(entries_list, st.integers(min_value=0, max_value=12_000))
def test_merge_pointwise_semantics(raw_a, t):
    """The merged value at any instant equals op of the operand values."""
    a = fit(raw_a)
    b = [(e[0] + 7, e[1] * 2, e[2]) for e in a[: len(a) // 2]]
    m = kmerge.merge_entries(a, b, kmerge.op_non_strict_plus, compress=False)
    va, vb = _defined_at(a, t), _defined_at(b, t)
    expect = None if va is None and vb is None else (va or 0) + (vb or 0)
    assert _defined_at(m, t) == expect


@settings(max_examples=150, deadline=None)
@given(entries_list, st.integers(min_value=1, max_value=200))
def test_split_longer_than_preserves_domain_and_values(raw, max_len):
    es = fit(raw)
    pieces = ksample.split_longer_than(es, max_len)
    assert all(0 < d <= max_len for _t, _v, d in pieces)
    assert sum(d for *_x, d in pieces) == sum(d for *_x, d in es)
    for t in range(0, 11_000, 97):
        assert _defined_at(pieces, t) == _defined_at(es, t)


@settings(max_examples=150, deadline=None)
@given(entries_list, st.integers(min_value=1, max_value=300))
def test_strict_sample_is_pointwise_lookup(raw, rate):
    es = fit(raw)
    out = ksample.sample(es, es[0][0] if es else 0, rate, use_closest=False)
    for p, v, d in out:
        assert d == rate
        assert _defined_at(es, p) == v


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2**30 - 1),
            st.floats(allow_nan=False, width=64),
            st.integers(min_value=1, max_value=2**30),
        ),
        min_size=1,
        max_size=60,
    ).map(_cumsum_entries)
)
def test_gorilla_tuple_roundtrip(raw):
    es = fit(raw, compress=False)
    if not es:
        return
    out = decompress_tuple_block(compress_tuple_block(es, compress=False))
    assert [(t, d) for t, _v, d in out] == [(t, d) for t, _v, d in es]
    got = np.array([v for _t, v, _d in out])
    want = np.array([v for _t, v, _d in es])
    assert np.array_equal(got.view(np.uint64), want.view(np.uint64))
