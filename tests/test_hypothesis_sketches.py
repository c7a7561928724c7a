"""Hypothesis property tests for the pure-python sketch implementations
(no Spark session needed — these run in milliseconds)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import NumpyBloom
from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import NumpyCMS
from bloom_filters_count_min_sketch_spark_streaming_spark.functions.hashing import (
    murmur3_hash_long,
)

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(int64s, min_size=1, max_size=200), st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_murmur3_is_deterministic_and_int32(values, seed):
    v = np.array(values, dtype=np.int64)
    a = murmur3_hash_long(v, seed)
    b = murmur3_hash_long(v, seed)
    assert a.dtype == np.int32
    assert np.array_equal(a, b)


@given(st.lists(int64s, min_size=1, max_size=500, unique=True))
@settings(max_examples=30, deadline=None)
def test_numpy_bloom_never_false_negative(values):
    bloom = NumpyBloom.from_params(expected_items=max(len(values), 10), fpp=0.01, seed=7)
    v = np.array(values, dtype=np.int64)
    bloom.add_longs(v)
    assert bloom.might_contain_longs(v).all()


@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=2000))
@settings(max_examples=30, deadline=None)
def test_numpy_cms_never_underestimates(values):
    cms = NumpyCMS.from_params(eps=0.01, confidence=0.95, seed=3)
    v = np.array(values, dtype=np.int64)
    cms.add_longs(v)
    keys, counts = np.unique(v, return_counts=True)
    est = cms.estimate_longs(keys)
    assert (est >= counts).all()
    assert cms.total == len(v)


@given(
    st.lists(st.integers(-100, 100), min_size=1, max_size=500),
    st.lists(st.integers(-100, 100), min_size=1, max_size=500),
)
@settings(max_examples=20, deadline=None)
def test_numpy_cms_merge_equals_union(a_vals, b_vals):
    kw = dict(eps=0.01, confidence=0.95, seed=5)
    a, b, u = NumpyCMS.from_params(**kw), NumpyCMS.from_params(**kw), NumpyCMS.from_params(**kw)
    a.add_longs(np.array(a_vals, dtype=np.int64))
    b.add_longs(np.array(b_vals, dtype=np.int64))
    u.add_longs(np.array(a_vals + b_vals, dtype=np.int64))
    m = a.merge(b)
    assert np.array_equal(m.table, u.table)
    assert m.total == u.total
