"""XOR filter property tests: no false negatives (the structural
guarantee), FP rate at the fingerprint-width bound, build determinism,
serde, and peeling robustness across set sizes."""

from __future__ import annotations

import numpy as np

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.xorfilter import (
    XorFilter16,
)


def test_no_false_negatives_ever():
    rng = np.random.RandomState(1)
    for n in (1, 2, 17, 1000, 30000):
        keys = rng.randint(-(10**12), 10**12, size=n).astype(np.int64)
        xf = XorFilter16.build(keys)
        assert xf.contains(keys).all(), f"false negative at n={n}"


def test_fp_rate_matches_fingerprint_width():
    rng = np.random.RandomState(2)
    keys = rng.randint(0, 10**12, size=20000).astype(np.int64)
    xf = XorFilter16.build(keys)
    absent = np.setdiff1d(
        rng.randint(10**12, 2 * 10**12, size=400000).astype(np.int64), keys
    )
    fp = xf.contains(absent).mean()
    assert fp <= 3.0 * 2**-16, f"FP rate {fp:.2e} above the 2^-16 budget"


def test_deterministic_and_serde():
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 10**9, size=5000).astype(np.int64)
    a = XorFilter16.build(keys)
    b = XorFilter16.build(keys)
    assert a.seed == b.seed and np.array_equal(a.fingerprints, b.fingerprints)
    c = XorFilter16.from_bytes(a.seed, a.block_len, a.to_bytes())
    assert c.contains(keys).all()
    assert np.array_equal(
        a.contains(np.arange(10000)), c.contains(np.arange(10000))
    )


def test_space_is_1_23c_regime():
    rng = np.random.RandomState(4)
    keys = np.unique(rng.randint(0, 10**12, size=50000).astype(np.int64))
    xf = XorFilter16.build(keys)
    bits_per_key = 16.0 * len(xf.fingerprints) / len(keys)
    assert bits_per_key <= 21.0, f"{bits_per_key:.1f} bits/key exceeds 1.23c+slack"
    # duplicates in the input must not change the filter (distinct-set build)
    dup = np.concatenate([keys, keys[:100]])
    xf2 = XorFilter16.build(dup)
    assert np.array_equal(xf.fingerprints, xf2.fingerprints)
