"""PCA / whitening over an embedding column (SURVEY §2.D D6 family).

The classic two-stage distributed PCA:

- **moment accumulation** (the data-sized work) runs in ``mapInPandas``:
  each Arrow batch contributes the sufficient statistics ``sum(x)`` and
  the upper triangle of ``sum(x xᵀ)``. Every per-row product is rounded
  at 1e-8 and accumulated as an **int64** — integer addition is
  associative, so the merged moments (one tiny hash agg over
  ``dim + dim(dim+1)/2`` keys) are EXACTLY partition-order invariant,
  the same determinism discipline as the k-means trainer's DECIMAL sums.
  Shuffle payload is O(dim²) per partition — kilobytes at any corpus
  size.
- **eigendecomposition** happens on the driver on the dim×dim covariance
  (64×64 here): `numpy.linalg.eigh`, deterministic for identical input
  bytes; each eigenvector's sign is canonicalized (largest-|component|
  positive), the textbook fix for eigh's sign ambiguity.
- **projection** is an embarrassingly parallel Arrow-batched matmul
  against the broadcast component matrix.

No SQL oracle: the eigendecomposition is not SQL-expressible (rows-only
for the driver); the exactness story is property-tested instead
(tests/test_pca.py: partition invariance, orthonormality, spectrum vs
direct numpy covariance, projected-variance ≈ eigenvalue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point scale for the integer moment sums: products are rounded at
# 1e-8, far below fixture noise; |sum| stays < 2^63 up to ~10^10 rows of
# unit-scale embeddings.
_MOMENT_SCALE = 1e8
_ROW_CHUNK = 512


def moment_sums(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(i, j, s) int64 moment sums: j = -1 rows carry sum(x_i); i = j = -2
    carries the row count; (i <= j) rows carry sum(round(x_i * x_j, 8))."""

    def emit(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            n = x.shape[0]
            s1 = np.rint(x * _MOMENT_SCALE).astype(np.int64).sum(axis=0)
            s2 = np.zeros((dim, dim), dtype=np.int64)
            for lo in range(0, n, _ROW_CHUNK):
                chunk = x[lo : lo + _ROW_CHUNK]
                prod = chunk[:, :, None] * chunk[:, None, :]
                s2 += np.rint(prod * _MOMENT_SCALE).astype(np.int64).sum(axis=0)
            iu, ju = np.triu_indices(dim)
            out = pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(dim), [-2]]),
                    "j": np.concatenate([ju, np.full(dim, -1), [-2]]),
                    "s": np.concatenate([s2[iu, ju], s1, [n]]),
                }
            )
            yield out

    parts = df.select(vec_col).mapInPandas(emit, "i int, j int, s long")
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def covariance_eigh(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Returns (mean, eigenvalues desc, eigenvectors as columns, n)."""
    rows = moment_sums(df, vec_col, dim).collect()
    s1 = np.zeros(dim)
    s2 = np.zeros((dim, dim))
    n = 0
    for r in rows:
        if r["i"] == -2:
            n = int(r["s"])
        elif r["j"] == -1:
            s1[r["i"]] = r["s"] / _MOMENT_SCALE
        else:
            v = r["s"] / _MOMENT_SCALE
            s2[r["i"], r["j"]] = v
            s2[r["j"], r["i"]] = v
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    # canonical sign: each eigenvector's largest-|component| is positive
    for c in range(v.shape[1]):
        m = np.argmax(np.abs(v[:, c]))
        if v[m, c] < 0:
            v[:, c] = -v[:, c]
    return mean, w, v, n


def project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pcs",
    whiten: bool = False,
    eigvals: np.ndarray | None = None,
) -> DataFrame:
    """Append ``out_col``: (x - mean) @ components[, / sqrt(eigval)]."""
    w_mat = components
    if whiten:
        if eigvals is None:
            raise ValueError("whiten=True requires eigvals")
        w_mat = components / np.sqrt(np.maximum(eigvals, 1e-12))[None, :]
    mean_b, w_b = mean, w_mat

    @F.pandas_udf("array<double>")
    def proj(vecs):
        x = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        y = (x - mean_b) @ w_b
        return pd.Series(list(y))

    return df.withColumn(out_col, proj(F.col(vec_col)))
