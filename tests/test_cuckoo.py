"""Property tests for the partial-key cuckoo filter (functions/cuckoo.py).

The oracle-backed query relies on three properties that are guarantees of
the construction, not fixture luck: no false negatives, delete correctness,
and partitioning-invariant deterministic builds. Plus the probabilistic
property the sizing math claims: ~zero false positives at 32-bit
fingerprints for fixture-scale key sets.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cuckoo import (
    NumpyCuckoo,
    capacity_buckets,
)


def _build(keys: np.ndarray, seed: int = 42) -> NumpyCuckoo:
    cf = NumpyCuckoo(capacity_buckets(max(len(keys), 1)), seed=seed)
    cf.insert(np.sort(keys))
    return cf


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=400, unique=True)
)
@settings(max_examples=50, deadline=None)
def test_no_false_negatives(keys):
    ks = np.array(keys, dtype=np.int64)
    cf = _build(ks)
    assert cf.contains(ks).all()


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=2, max_size=300, unique=True),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=50, deadline=None)
def test_delete_removes_and_preserves_siblings(keys, mod):
    ks = np.array(sorted(keys), dtype=np.int64)
    cf = _build(ks)
    dele = ks[ks % mod == 0]
    kept = ks[ks % mod != 0]
    found = cf.delete(np.sort(dele))
    assert found.all()  # every deleted key had been inserted
    if kept.size:
        assert cf.contains(kept).all()  # siblings survive the delete


def test_build_is_insert_order_invariant_after_sort():
    # The distributed build sorts each shard's keys, so any partitioning of
    # the same key set yields byte-identical filters.
    rng = np.random.default_rng(7)
    ks = rng.choice(10**6, size=1200, replace=False).astype(np.int64)
    a = _build(ks)
    b = _build(ks[::-1])  # same set, different arrival order
    assert a.to_bytes() == b.to_bytes()


def test_serialization_roundtrip():
    ks = np.arange(500, dtype=np.int64)
    cf = _build(ks)
    back = NumpyCuckoo.from_bytes(cf.to_bytes())
    assert back.n_items == cf.n_items
    assert (back.table == cf.table).all()
    assert back.contains(ks).all()


def test_false_positive_rate_is_negligible():
    ks = np.arange(2000, dtype=np.int64)
    cf = _build(ks)
    absent = np.arange(10**7, 10**7 + 20000, dtype=np.int64)
    # 32-bit fingerprints: expected FP ~ 20000 * 8 / 2^32 ~ 4e-5
    assert int(cf.contains(absent).sum()) == 0


def test_overfull_falls_back_to_stash_without_false_negatives():
    ks = np.arange(64, dtype=np.int64)
    cf = NumpyCuckoo(2, bucket_size=2)  # 4 table slots for 64 keys
    cf.insert(ks)
    assert len(cf.stash) >= 60
    assert cf.contains(ks).all()
    # stash entries delete and roundtrip like table slots
    assert cf.delete(ks[:10]).all()
    back = NumpyCuckoo.from_bytes(cf.to_bytes())
    assert back.contains(ks[10:]).all()
    assert back.stash == cf.stash


def test_capacity_buckets_integer_ceil():
    # exact boundary: 336 keys / (4 * 0.84) = 100.0 -> need 100 -> 128
    assert capacity_buckets(336) == 128
    assert capacity_buckets(1) == 1
    assert capacity_buckets(337) == 128
