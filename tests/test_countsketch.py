"""Count-Sketch estimator contracts (functions/countsketch.py)."""

from __future__ import annotations

import numpy as np

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.countsketch import (
    NumpyCountSketch,
)


def _zipf_stream(n=20000, n_keys=500, seed=7):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n).astype(np.int64) % n_keys


def test_exact_when_wide():
    """With width >> keys, collisions are rare and the median recovers
    exact counts for the vast majority of keys."""
    v = _zipf_stream()
    cs = NumpyCountSketch.from_params(width=8192, depth=5)
    cs.add_longs(v)
    keys, counts = np.unique(v, return_counts=True)
    est = cs.estimate_longs(keys)
    assert (est == counts).mean() > 0.95


def test_error_centered_and_bounded():
    """Narrow sketch: signed collisions cancel, so errors center near 0
    (unlike CMS, which only overestimates) and stay within the
    ~sqrt(F2/w) Count-Sketch bound for most keys."""
    v = _zipf_stream()
    cs = NumpyCountSketch.from_params(width=64, depth=7)
    cs.add_longs(v)
    keys, counts = np.unique(v, return_counts=True)
    err = cs.estimate_longs(keys) - counts
    f2 = float((counts.astype(np.float64) ** 2).sum())
    bound = 3.0 * np.sqrt(f2 / 64)
    assert (np.abs(err) <= bound).mean() > 0.9
    # two-sided: a meaningful fraction of errors on each side
    assert (err < 0).any() and (err > 0).any()
    assert abs(float(np.median(err))) <= bound / 3


def test_merge_homomorphism():
    """sketch(A) + sketch(B) == sketch(A ++ B), cell for cell."""
    v = _zipf_stream()
    a, b = v[:9000], v[9000:]
    sa = NumpyCountSketch.from_params(width=128, depth=5)
    sb = NumpyCountSketch.from_params(width=128, depth=5)
    sw = NumpyCountSketch.from_params(width=128, depth=5)
    sa.add_longs(a)
    sb.add_longs(b)
    sw.add_longs(v)
    merged = sa.merge(sb)
    assert np.array_equal(merged.table, sw.table)
    assert merged.total == sw.total
