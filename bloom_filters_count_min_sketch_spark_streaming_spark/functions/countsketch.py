"""Count-Sketch (Charikar, Chen & Farach-Colton 2002) — the UNBIASED
member of the frequency-sketch family next to Count-Min.

Where CMS takes min over d rows (one-sided overestimate), Count-Sketch
hashes each key to a bucket AND a ±1 sign per row and estimates by the
MEDIAN of sign-corrected cells: collisions cancel in expectation, so the
estimate is unbiased with error ~ sqrt(F2)/sqrt(w) — tighter than CMS on
heavy-tailed (Zipfian) streams, and it can go negative, which an
overestimate-only CMS never does.

Same mergeable-monoid contract as NumpyCMS: tables add cellwise, the
hash family is derived from a seed, updates are numpy-vectorized.
Rows-only for the driver (the table bits aren't SQL); the unbiasedness /
error-bound / merge-homomorphism contracts are property-tested
(tests/test_countsketch.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class NumpyCountSketch:
    depth: int
    width: int
    hash_a: np.ndarray  # int64[depth]  bucket hash
    sign_a: np.ndarray  # int64[depth]  sign hash
    table: np.ndarray  # int64[depth, width]
    total: int = field(default=0)

    @classmethod
    def from_params(
        cls, width: int = 256, depth: int = 5, seed: int = 42
    ) -> "NumpyCountSketch":
        rng = np.random.default_rng(seed)
        hash_a = rng.integers(1, 2**62, size=depth, dtype=np.int64) | np.int64(1)
        sign_a = rng.integers(1, 2**62, size=depth, dtype=np.int64) | np.int64(1)
        return cls(
            depth=depth,
            width=width,
            hash_a=hash_a,
            sign_a=sign_a,
            table=np.zeros((depth, width), dtype=np.int64),
        )

    def _buckets(self, v: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            prod = self.hash_a[:, None] * v[None, :]
            h = (prod + (prod >> np.int64(32))) & np.int64(0x7FFFFFFF)
            return (h.astype(np.int32) % np.int32(self.width)).astype(np.int64)

    def _signs(self, v: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            prod = self.sign_a[:, None] * v[None, :]
            h = (prod + (prod >> np.int64(32))) & np.int64(0x7FFFFFFF)
            return 1 - 2 * (h & np.int64(1))

    def add_longs(self, values: np.ndarray) -> None:
        v = values.astype(np.int64, copy=False)
        b = self._buckets(v)
        s = self._signs(v)
        for i in range(self.depth):
            np.add.at(self.table[i], b[i], s[i])
        self.total += len(values)

    def estimate_longs(self, values: np.ndarray) -> np.ndarray:
        v = values.astype(np.int64, copy=False)
        b = self._buckets(v)
        s = self._signs(v)
        ests = np.stack(
            [s[i] * self.table[i, b[i]] for i in range(self.depth)]
        )
        return np.median(ests, axis=0)

    def merge(self, other: "NumpyCountSketch") -> "NumpyCountSketch":
        assert self.table.shape == other.table.shape
        assert np.array_equal(self.hash_a, other.hash_a)
        assert np.array_equal(self.sign_a, other.sign_a)
        out = NumpyCountSketch(
            depth=self.depth,
            width=self.width,
            hash_a=self.hash_a,
            sign_a=self.sign_a,
            table=self.table + other.table,
            total=self.total + other.total,
        )
        return out
