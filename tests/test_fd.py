"""Frequent Directions property tests: the GLPW guarantees the sketch is
sold on, plus the engine's determinism discipline."""

from __future__ import annotations

import numpy as np

from bloom_filters_count_min_sketch_spark_streaming_spark.operators.fd import (
    FrequentDirections,
    fd_sketch,
    fd_spectrum,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


def _exact_gram(a: np.ndarray) -> np.ndarray:
    return a.T @ a


def test_fd_error_bound_and_psd_local():
    rng = np.random.default_rng(42)
    a = rng.normal(size=(500, 32))
    fd = FrequentDirections(ell=8, dim=32)
    fd.append(a)
    b = fd.sketch()
    deficit = _exact_gram(a) - _exact_gram(b)
    eig = np.linalg.eigvalsh(deficit)
    assert eig.min() >= -1e-6, "A^T A - B^T B must be PSD"
    bound = (np.linalg.norm(a, "fro") ** 2) / 8
    assert eig.max() <= bound + 1e-6, f"spectral error {eig.max()} > bound {bound}"


def test_fd_exact_when_rank_below_ell():
    rng = np.random.default_rng(7)
    basis = rng.normal(size=(5, 32))
    coeff = rng.normal(size=(300, 5))
    a = coeff @ basis  # rank 5
    fd = FrequentDirections(ell=16, dim=32)
    fd.append(a)
    b = fd.sketch()
    # rank < ell -> sigma_ell == 0 -> every shrink is lossless
    assert np.allclose(_exact_gram(b), _exact_gram(a), atol=1e-6)


def test_fd_merge_keeps_bound():
    rng = np.random.default_rng(3)
    a1 = rng.normal(size=(400, 16))
    a2 = rng.normal(size=(300, 16))
    f1 = FrequentDirections(ell=8, dim=16)
    f1.append(a1)
    f2 = FrequentDirections(ell=8, dim=16)
    f2.append(a2)
    merged = FrequentDirections(ell=8, dim=16)
    merged.merge(f1.sketch())
    merged.merge(f2.sketch())
    b = merged.sketch()
    a = np.vstack([a1, a2])
    deficit = _exact_gram(a) - _exact_gram(b)
    eig = np.linalg.eigvalsh(deficit)
    assert eig.min() >= -1e-6
    # merge adds one more layer of shrink error: 2x margin on the bound
    bound = 2 * (np.linalg.norm(a, "fro") ** 2) / 8
    assert eig.max() <= bound + 1e-6


def test_fd_spark_deterministic_and_bounded(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    s1 = fd_sketch(emb, ell=16, dim=64)
    s2 = fd_sketch(emb, ell=16, dim=64)
    assert np.array_equal(s1, s2), "fd_sketch must be run-to-run identical"

    pdf = emb.toPandas()
    a = np.stack(pdf["embedding"].values).astype(np.float64)
    deficit = _exact_gram(a) - _exact_gram(s1)
    eig = np.linalg.eigvalsh(deficit)
    assert eig.min() >= -1e-6
    bound = 2 * (np.linalg.norm(a, "fro") ** 2) / 16
    assert eig.max() <= bound + 1e-6
    top = fd_spectrum(s1, top=4)
    assert top[0][1] >= top[1][1] >= top[2][1] >= top[3][1] >= 0.0
