"""t-digest property tests: error envelope, mergeability, determinism,
serde, and the saturated exact regime tdigest_saturated_exact pins."""

from __future__ import annotations

import numpy as np

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.tdigest import (
    TDigest,
)


def _rank_err(td: TDigest, sorted_values: np.ndarray, q: float) -> float:
    est = td.quantile(q)
    lo = np.searchsorted(sorted_values, est, side="left")
    hi = np.searchsorted(sorted_values, est, side="right")
    realized = (lo + hi) / 2.0 / len(sorted_values)
    return abs(realized - q)


def test_rank_error_envelope_tail_tight():
    """k1 scale function: rank error stays small everywhere and TIGHTER at
    the tails than the q(1-q)-proportional mid-range budget."""
    rng = np.random.RandomState(11)
    for dist in (rng.normal(size=8000), rng.exponential(size=8000)):
        sv = np.sort(dist)
        td = TDigest.from_values(dist, 100)
        assert len(td.means) <= 100
        for q in (0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
            budget = max(0.002, 4.0 * q * (1 - q) / 100)
            assert _rank_err(td, sv, q) <= budget, (q, _rank_err(td, sv, q))


def test_merge_matches_single_build_error():
    """Mergeable-summary algebra: digests merged from arbitrary chunkings
    keep the same error envelope as a single build (centroids differ, the
    guarantee doesn't), and size stays O(compression)."""
    rng = np.random.RandomState(7)
    v = rng.normal(size=10_000)
    sv = np.sort(v)
    merged = TDigest(100)
    for lo in range(0, len(v), 777):
        merged.merge(TDigest.from_values(v[lo : lo + 777], 100))
    assert merged.total == len(v)
    assert len(merged.means) <= 100
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert _rank_err(merged, sv, q) <= max(0.002, 4.0 * q * (1 - q) / 100)


def test_deterministic_and_serde_roundtrip():
    rng = np.random.RandomState(3)
    v = rng.uniform(size=5000)
    a = TDigest.from_values(v, 64)
    b = TDigest.from_values(v, 64)
    assert np.array_equal(a.means, b.means)
    assert np.array_equal(a.weights, b.weights)
    mb, wb = a.to_bytes()
    c = TDigest.from_bytes(64, mb, wb)
    assert np.array_equal(a.means, c.means)
    assert a.quantile(0.37) == c.quantile(0.37)


def test_saturated_regime_is_exact_interpolation():
    """delta = 4n keeps every centroid a singleton — quantile() equals
    exact midpoint interpolation between order statistics (the formula
    tdigest_saturated_exact's SQL oracle replicates), even with ties and
    through a chunked merge."""
    rng = np.random.RandomState(5)
    v = np.round(rng.uniform(0, 10, size=600), 1)  # forces ties
    td = TDigest(4 * len(v))
    for lo in range(0, len(v), 100):
        td.merge(TDigest.from_values(v[lo : lo + 100], 4 * len(v)))
    assert td.is_saturated() and td.total == len(v)
    x = np.sort(v)
    n = len(x)
    for q in (0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0):
        tgt = q * n
        if tgt <= 0.5:
            ref = x[0]
        elif tgt >= n - 0.5:
            ref = x[-1]
        else:
            i = int(np.floor(tgt - 0.5))
            ref = x[i] + (tgt - (0.5 + i)) * (x[i + 1] - x[i])
        assert td.quantile(q) == ref, (q, td.quantile(q), ref)


def test_rank_quantile_consistency():
    """rank(quantile(q)) stays near q*n for mid-range q (midpoint
    conventions on both sides)."""
    rng = np.random.RandomState(9)
    v = rng.normal(size=4000)
    td = TDigest.from_values(v, 100)
    for q in (0.1, 0.5, 0.9):
        r = td.rank(td.quantile(q))
        assert abs(r - q * td.total) <= 0.02 * td.total
