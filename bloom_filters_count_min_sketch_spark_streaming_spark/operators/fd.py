"""Frequent Directions matrix sketch over an embedding column.

Liberty (KDD 2013) / Ghashami-Liberty-Phillips-Woodruff (SICOMP 2016):
maintain an ell x d matrix B such that A^T A - B^T B is PSD and
||A^T A - B^T B||_2 <= ||A||_F^2 / ell  — the matrix analogue of the
Misra-Gries heavy-hitter sketch, and like it MERGEABLE: FD(concat of two
sketches) keeps the combined bound. That mergeability is the whole 100 TB
story: each partition streams its rows through a local ell x d sketch
(O(ell * d) memory, O(n * ell * d) flops), only the tiny sketches move,
and the driver folds them in deterministic partition order. Covariance /
PCA / low-rank structure over an arbitrarily large corpus then costs one
scan plus kilobytes of shuffle — where exact A^T A accumulation
(operators/pca.py) ships dim^2 sums, FD ships ell x d and additionally
caps the driver-side eigenwork at ell, so it stays cheap when d grows to
thousands.

Determinism: partitioning is hash-of-id (deterministic), rows are sorted
by id within each partition, batches feed the sketch in that order, and
the driver merges per-partition sketches in partition-id order — so the
sketch bytes are run-to-run identical (asserted in tests/test_fd.py).
SVD sign ambiguity is canonicalized the same way operators/pca.py does.

No SQL oracle (SVD is not SQL-expressible): registered rows-only; the
exactness story is property-tested instead (PSD deficit, spectral-norm
error bound, mergeability, determinism, and agreement with the exact
spectrum when ell >= rank).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FrequentDirections:
    """Streaming FD sketch: 2*ell row buffer, shrink-by-sigma_ell^2."""

    def __init__(self, ell: int, dim: int) -> None:
        self.ell = ell
        self.dim = dim
        self.buf = np.zeros((2 * ell, dim), dtype=np.float64)
        self.n_buf = 0

    def append(self, rows: np.ndarray) -> None:
        i = 0
        while i < len(rows):
            take = min(2 * self.ell - self.n_buf, len(rows) - i)
            self.buf[self.n_buf : self.n_buf + take] = rows[i : i + take]
            self.n_buf += take
            i += take
            if self.n_buf == 2 * self.ell:
                self._shrink()

    def _shrink(self) -> None:
        # SVD of the full buffer; subtract sigma_ell^2 from every retained
        # direction (the Misra-Gries "decrement all counters" step).
        _, s, vt = np.linalg.svd(self.buf[: self.n_buf], full_matrices=False)
        if len(s) > self.ell:
            delta = s[self.ell - 1] ** 2
            s2 = np.maximum(s[: self.ell] ** 2 - delta, 0.0)
            kept = np.sqrt(s2)[:, None] * vt[: self.ell]
        else:
            kept = s[:, None] * vt
        self.buf[:] = 0.0
        self.buf[: len(kept)] = kept
        self.n_buf = len(kept)

    def sketch(self) -> np.ndarray:
        """Final ell x d sketch (compacted)."""
        if self.n_buf > self.ell:
            self._shrink()
        out = np.zeros((self.ell, self.dim), dtype=np.float64)
        out[: self.n_buf] = self.buf[: self.n_buf]
        return out

    def merge(self, other_sketch: np.ndarray) -> None:
        """Fold another ell' x d sketch in (rows are just weighted
        directions — appending them is the mergeability construction)."""
        self.append(other_sketch[np.any(other_sketch != 0.0, axis=1)])


def fd_sketch(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ell: int = 16,
    dim: int = 64,
    num_partitions: int | None = None,
) -> np.ndarray:
    """Distributed FD: per-partition streaming sketches, deterministic fold.

    Shuffle volume: one hash repartition of (id, vec) + P sketches of
    ell x d doubles to the driver — independent of corpus row count.
    """
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism

    def per_partition(batches):
        fd = FrequentDirections(ell, dim)
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["pid"].iloc[0]) if pid is None else pid
            fd.append(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
        if pid is None:
            return
        yield pd.DataFrame({"pid": [pid], "sk": [fd.sketch().ravel().tolist()]})

    parts = (
        df.select(F.col(id_col).alias("id"), vec_col)
        .repartition(p, F.col("id"))
        .sortWithinPartitions("id")
        .withColumn("pid", F.spark_partition_id())
        .mapInPandas(per_partition, "pid int, sk array<double>")
        .collect()
    )
    merged = FrequentDirections(ell, dim)
    for r in sorted(parts, key=lambda r: r["pid"]):
        merged.merge(np.array(r["sk"], dtype=np.float64).reshape(ell, dim))
    return merged.sketch()


def fd_spectrum(sketch: np.ndarray, top: int = 8) -> list[tuple[int, float]]:
    """(component, singular value) of the sketch, canonical descending."""
    s = np.linalg.svd(sketch, compute_uv=False)
    return [(i + 1, float(s[i])) for i in range(min(top, len(s)))]
