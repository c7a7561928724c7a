"""XOR filter (Graf & Lemire, "Xor Filters: Faster and Smaller Than
Bloom and Cuckoo Filters", ACM JEA 2020): the modern STATIC membership
structure — ~1.23 slots per key at a fixed fingerprint width, faster
probes than Bloom (3 loads + 2 xors, no k-loop) and no deletion/insert
machinery to pay for. The natural fit for immutable at-rest artifacts:
contamination gates, published-corpus membership, eval-set exclusion —
anywhere the key set is frozen when the filter ships.

Construction is the peeling argument from the paper: three segmented
hash positions per key; repeatedly peel slots touched by exactly one
key (pushing (key, slot) on a stack), then assign fingerprints in
reverse peel order so every key's three slots XOR to its fingerprint.
Peeling succeeds with high probability at c = 1.23; on failure the seed
is bumped deterministically and the build retries — same input, same
seed sequence, same filter, bit for bit.

Scale story: the construction is global over its key set, so at 100 TB
filters are built PER SHARD (hash-partition the keys, one peeling per
shard executor-side, kilobyte fingerprint arrays to the driver / at
rest) and probes route by the same shard function — the repo's sharded
counting-Bloom/cuckoo pattern.

Probes can false-positive at ~2^-16 per absent key (16-bit
fingerprints) and NEVER false-negative; the registered query verifies
its probe domain FP-free in-query (the counting-Bloom discipline), so
the exact-IN oracle is valid and a collision raises loudly instead of
hash-failing.
"""

from __future__ import annotations

import numpy as np

__all__ = ["XorFilter16"]

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (Steele et al.) — vectorized."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


class XorFilter16:
    """16-bit-fingerprint xor filter over int64 keys."""

    __slots__ = ("seed", "block_len", "fingerprints")

    def __init__(self, seed: int, block_len: int, fingerprints: np.ndarray) -> None:
        self.seed = int(seed)
        self.block_len = int(block_len)
        self.fingerprints = np.asarray(fingerprints, dtype=np.uint16)

    # -- hashing ------------------------------------------------------------

    @staticmethod
    def _hashes(keys: np.ndarray, seed: int, block_len: int):
        k = keys.astype(np.int64).view(np.uint64)
        bl = np.uint64(block_len)
        # three independent full-width splitmix streams per position —
        # a masked 21-bit slice would leave slots >= 2^21 unreachable for
        # block_len > 2^21 (~5.1M keys/shard) and break the peeling build
        # at exactly the scale the per-shard design targets
        h0 = _splitmix64(k ^ np.uint64(seed)) % bl
        h1 = (
            _splitmix64(k ^ np.uint64(seed) ^ np.uint64(0x6A09E667F3BCC909)) % bl
            + bl
        )
        h2 = (
            _splitmix64(k ^ np.uint64(seed) ^ np.uint64(0xBB67AE8584CAA73B)) % bl
            + np.uint64(2) * bl
        )
        # independent mix for the fingerprint — deriving it from h would
        # correlate it with the probe positions and lift the FP rate
        fp = (
            _splitmix64(k ^ np.uint64(seed) ^ np.uint64(0xA5A5A5A5A5A5A5A5))
            & np.uint64(0xFFFF)
        ).astype(np.uint16)
        return h0.astype(np.int64), h1.astype(np.int64), h2.astype(np.int64), fp

    # -- construction --------------------------------------------------------

    @classmethod
    def build(cls, keys, seed0: int = 1, max_tries: int = 64) -> "XorFilter16":
        """Peel-and-assign build over the DISTINCT key set; deterministic
        seed-bump retries (p_fail per try is tiny at c=1.23)."""
        keys = np.unique(np.asarray(keys, dtype=np.int64))
        n = len(keys)
        block_len = max((int(np.ceil(1.23 * n)) + 32) // 3 + 1, 4)
        m = 3 * block_len
        for seed in range(seed0, seed0 + max_tries):
            h0, h1, h2, fp = cls._hashes(keys, seed, block_len)
            slots = np.stack([h0, h1, h2], axis=1)  # (n, 3)
            count = np.zeros(m, dtype=np.int64)
            xorkey = np.zeros(m, dtype=np.int64)  # xor of key INDICES + 1
            for j in range(3):
                np.add.at(count, slots[:, j], 1)
                np.bitwise_xor.at(xorkey, slots[:, j], np.arange(1, n + 1))
            stack_keys = np.empty(n, dtype=np.int64)
            stack_slots = np.empty(n, dtype=np.int64)
            top = 0
            queue = list(np.flatnonzero(count == 1))
            while queue:
                slot = queue.pop()
                if count[slot] != 1:
                    continue
                ki = xorkey[slot] - 1  # the lone remaining key's index
                stack_keys[top] = ki
                stack_slots[top] = slot
                top += 1
                for j in range(3):
                    s = slots[ki, j]
                    count[s] -= 1
                    xorkey[s] ^= ki + 1
                    if count[s] == 1:
                        queue.append(s)
            if top == n:  # fully peeled
                b = np.zeros(m, dtype=np.uint16)
                for t in range(n - 1, -1, -1):
                    ki = stack_keys[t]
                    slot = stack_slots[t]
                    b[slot] = (
                        fp[ki]
                        ^ b[slots[ki, 0]]
                        ^ b[slots[ki, 1]]
                        ^ b[slots[ki, 2]]
                        ^ b[slot]  # slot is one of the three; cancel it
                    )
                return cls(seed, block_len, b)
        raise RuntimeError(f"xor filter peeling failed {max_tries} times")

    # -- probes --------------------------------------------------------------

    def contains(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        h0, h1, h2, fp = self._hashes(keys, self.seed, self.block_len)
        b = self.fingerprints
        return (b[h0] ^ b[h1] ^ b[h2]) == fp

    # -- serde ---------------------------------------------------------------

    def to_bytes(self) -> bytes:
        return self.fingerprints.tobytes()

    @classmethod
    def from_bytes(cls, seed: int, block_len: int, blob: bytes) -> "XorFilter16":
        return cls(seed, block_len, np.frombuffer(blob, dtype=np.uint16))

    @property
    def bits_per_key_at(self) -> float:
        return 16.0 * len(self.fingerprints)
