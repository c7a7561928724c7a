"""PCA operator invariants (operators/pca.py): the rows-only exactness
story for embedding_pca_variance / embedding_pca_project."""

from __future__ import annotations

import numpy as np
import pytest

from bloom_filters_count_min_sketch_spark_streaming_spark.operators import pca
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_moments_partition_invariant(spark, emb):
    one = pca.covariance_eigh(emb.repartition(1), "embedding", 64)
    many = pca.covariance_eigh(emb.repartition(13), "embedding", 64)
    # integer moment sums -> bit-identical means and spectra
    assert np.array_equal(one[0], many[0])
    assert np.array_equal(one[1], many[1])
    assert np.array_equal(one[2], many[2])
    assert one[3] == many[3]


def test_spectrum_matches_direct_numpy(spark, emb):
    mean, w, v, n = pca.covariance_eigh(emb, "embedding", 64)
    x = np.stack(
        [np.array(r[0], dtype=np.float64) for r in emb.select("embedding").collect()]
    )
    assert n == x.shape[0]
    cov = np.cov(x, rowvar=False, bias=True)
    w_direct = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(mean, x.mean(axis=0), atol=1e-7)
    assert np.allclose(w, w_direct, atol=1e-6)


def test_components_orthonormal_and_sorted(spark, emb):
    _, w, v, _ = pca.covariance_eigh(emb, "embedding", 64)
    assert np.allclose(v.T @ v, np.eye(64), atol=1e-10)
    assert all(w[i] >= w[i + 1] - 1e-12 for i in range(63))
    assert w[-1] >= -1e-9  # covariance is PSD
    # canonical sign: largest-|component| positive
    for c in range(64):
        assert v[np.argmax(np.abs(v[:, c])), c] > 0


def test_projected_variance_matches_eigenvalues(spark, emb):
    mean, w, v, n = pca.covariance_eigh(emb, "embedding", 64)
    out = pca.project(emb, mean, v[:, :2], "embedding", "pcs")
    y = np.stack([np.array(r[0]) for r in out.select("pcs").collect()])
    assert np.allclose(y.var(axis=0), w[:2], rtol=1e-5)
    # whitened projection has unit variance
    outw = pca.project(emb, mean, v[:, :2], "embedding", "pcs", whiten=True, eigvals=w[:2])
    yw = np.stack([np.array(r[0]) for r in outw.select("pcs").collect()])
    assert np.allclose(yw.var(axis=0), np.ones(2), rtol=1e-4)
