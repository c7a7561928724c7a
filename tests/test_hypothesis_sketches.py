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


# --- BPE apply + CU-CMS properties (pure python, no Spark) -------------------

words_st = st.text(alphabet="abcde", min_size=0, max_size=12)


@given(
    st.lists(words_st, min_size=1, max_size=30),
    st.lists(
        st.tuples(st.text("abcde", min_size=1, max_size=2),
                  st.text("abcde", min_size=1, max_size=2)),
        min_size=0,
        max_size=6,
    ),
)
@settings(max_examples=60, deadline=None)
def test_bpe_apply_roundtrip_and_monotone(words, merges):
    """Concatenating a word's BPE tokens recovers the word, and every merge
    step can only shorten (or keep) the token sequence."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.bpe import (
        apply_merges_py,
    )

    for w in words:
        toks = apply_merges_py(w, merges)
        assert "".join(toks) == w
        prev = len(w)
        for i in range(1, len(merges) + 1):
            cur = len(apply_merges_py(w, merges[:i]))
            assert cur <= prev
            prev = cur


@given(st.lists(st.integers(0, 60), min_size=1, max_size=800))
@settings(max_examples=30, deadline=None)
def test_cms_conservative_between_truth_and_standard(values):
    v = np.array(values, dtype=np.int64)
    std = NumpyCMS.from_params(eps=0.1, confidence=0.8, seed=3)
    cu = NumpyCMS.from_params(eps=0.1, confidence=0.8, seed=3)
    std.add_longs(v)
    cu.add_longs_conservative(v)
    probe = np.arange(61, dtype=np.int64)
    exact = np.bincount(v, minlength=61)
    e_std = std.estimate_longs(probe)
    e_cu = cu.estimate_longs(probe)
    assert (e_cu >= exact).all()
    assert (e_cu <= e_std).all()
