"""Property tests for the KLL quantile sketch (functions/kll.py)."""

from __future__ import annotations

import numpy as np

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.kll import KLLSketch


def _rank_errs(sk: KLLSketch, data: np.ndarray) -> list:
    n = len(data)
    out = []
    for q in np.arange(0.05, 1.0, 0.05):
        est = sk.quantile(q)
        out.append(abs(int((data <= est).sum()) - int(np.ceil(q * n))) / n)
    return out


def test_kll_exact_regime_matches_order_statistics():
    """Capacity >= n: no compaction, quantiles are EXACT order statistics
    under the ceil(q*n) rank convention."""
    rng = np.random.default_rng(2)
    data = rng.normal(0, 1, 700)
    sk = KLLSketch(k=1000, seed=1)
    sk.add_many(data)
    assert sk.stored_items() == 700
    sd = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        assert sk.quantile(q) == sd[max(1, int(np.ceil(q * 700))) - 1]


def test_kll_rank_error_bound_and_space():
    """Compacting regime: distribution-free rank error well under the
    ~1.7/k envelope, space O(k log(n/k)) not O(n)."""
    rng = np.random.default_rng(5)
    for data in (
        rng.normal(100, 25, 50_000),
        rng.exponential(3.0, 50_000),
        np.repeat(rng.integers(0, 50, 500), 100).astype(float),  # heavy ties
    ):
        sk = KLLSketch(k=200, seed=3)
        sk.add_many(data)
        assert sk.stored_items() < 1200, "space must stay O(k log n)"
        # with tied data the (data <= est) metric cannot resolve inside a
        # tie block, so the attainable floor is one block's width
        _, counts = np.unique(data, return_counts=True)
        tie_floor = counts.max() / len(data)
        assert max(_rank_errs(sk, data)) <= 0.02 + tie_floor, "rank envelope"


def test_kll_mergeability_preserves_error():
    """Merging per-chunk sketches lands in the same error envelope as a
    single-pass build — the mergeable-summaries property the sketch-table
    architecture relies on."""
    rng = np.random.default_rng(9)
    data = rng.gamma(2.0, 10.0, 60_000)
    merged = KLLSketch(k=200, seed=11)
    for i, chunk in enumerate(np.array_split(data, 13)):
        part = KLLSketch(k=200, seed=100 + i)
        part.add_many(chunk)
        merged.merge(part)
    assert merged.n == 60_000
    assert max(_rank_errs(merged, data)) <= 0.02


def test_kll_determinism_and_serialization():
    rng = np.random.default_rng(4)
    data = rng.uniform(0, 1, 20_000)
    a, b = KLLSketch(k=128, seed=7), KLLSketch(k=128, seed=7)
    a.add_many(data)
    b.add_many(data)
    assert a.compactors == b.compactors, "same data + seed -> same sketch"
    back = KLLSketch.from_bytes(a.to_bytes())
    assert back.compactors == a.compactors and back.n == a.n
    assert back.quantile(0.5) == a.quantile(0.5)
