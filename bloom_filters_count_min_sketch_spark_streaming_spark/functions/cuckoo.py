"""Partial-key cuckoo filter (Fan, Andersen, Kaminsky & Mitzenmacher 2014,
"Cuckoo Filter: Practically Better Than Bloom", CoNLL'14): set membership
with DELETE support and ~95% load factor — the structure that covers the
counting-Bloom use case at ~4x less space, because it stores one short
fingerprint per key instead of k counter positions.

Design for determinism (the repo's oracle gate needs bit-stable behavior):

- all hashing is splitmix64 finalizer mixing over uint64 (no Python hash(),
  no process salt), so fingerprints and bucket indices are identical across
  runs, partitionings, and machines;
- eviction "randomness" is derandomized: the victim slot for kick t of a
  key is ``mix(fp, kick_seed + t) % bucket_size`` — a counter-based choice,
  so insertion of a SORTED key batch is a pure function of the key set;
- 32-bit fingerprints: with n keys per shard and b-bucket tables the
  probability that ANY two distinct keys collide on (fingerprint, bucket
  pair) is ~ n^2 * 8 / (2^32 * n_buckets) — ~1e-8 at fixture scale — so
  lookups behave EXACTLY like set membership and delete never evicts a
  sibling; the oracle-facing queries rely on this the same way the
  generational-Bloom dedup relies on fpp 1e-9.

The distributed shape lives in the plans layer: keys shard by hash, each
shard builds its own filter (sorted insert => deterministic), the ~KB-sized
filter blobs broadcast to probes. The filter never sees raw data volume —
only distinct keys — and probes never shuffle.
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 arrays (deterministic, portable)."""
    z = (x.astype(np.uint64) + np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)) & _MASK64
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK64
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK64
    return z ^ (z >> np.uint64(31))


class NumpyCuckoo:
    """Single-shard cuckoo filter over int64 keys.

    ``n_buckets`` must be a power of two; each bucket holds ``bucket_size``
    32-bit fingerprints (0 = empty slot).
    """

    MAX_KICKS = 500

    def __init__(self, n_buckets: int, bucket_size: int = 4, seed: int = 42):
        if n_buckets & (n_buckets - 1):
            raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.seed = seed
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint32)
        self.n_items = 0
        # Overflow stash (standard cuckoo-hashing backstop): an eviction
        # walk that cycles (adversarial sets / tiny tables, where i2 == i1
        # whenever h(fp) % n_buckets == 0) parks its carried entry here
        # instead of failing. Entries are (bucket_index, fingerprint); both
        # candidate buckets are recoverable from either one (i XOR h(fp)),
        # so probes and deletes treat the stash as extra slots.
        self.stash: list[tuple[int, int]] = []

    # -- hashing ---------------------------------------------------------
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix(keys.view(np.uint64), self.seed + 1) & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        return np.where(fp == 0, np.uint32(1), fp)  # 0 marks an empty slot

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (_mix(keys.view(np.uint64), self.seed + 2) % np.uint64(self.n_buckets)).astype(
            np.int64
        )

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: i2 = i1 XOR h(fp), involutive so delete/lookup
        # can recover both candidates from either index.
        h = _mix(fp.astype(np.uint64), self.seed + 3) % np.uint64(self.n_buckets)
        return (idx.astype(np.uint64) ^ h).astype(np.int64) % self.n_buckets

    # -- operations ------------------------------------------------------
    def insert(self, keys: np.ndarray) -> None:
        """Insert keys (SORT the batch first for deterministic builds)."""
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        for fp, i1 in zip(fps.tolist(), i1s.tolist()):
            self._insert_one(np.uint32(fp), int(i1))

    def _insert_one(self, fp: np.uint32, i1: int) -> None:
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint32))[0])
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.n_items += 1
                return
        # both buckets full: deterministic eviction walk
        i, cur = i1, fp
        for kick in range(self.MAX_KICKS):
            slot = int(
                _mix(np.array([cur], dtype=np.uint64), self.seed + 4 + kick)[0]
                % np.uint64(self.bucket_size)
            )
            cur, self.table[i][slot] = self.table[i][slot], cur
            i = int(self._alt_index(np.array([i]), np.array([cur], dtype=np.uint32))[0])
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                self.n_items += 1
                return
        # cycle detected: park the carried entry in the stash (deterministic
        # given sorted batch insert), keeping insert total.
        self.stash.append((int(i), int(cur)))
        self.n_items += 1

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint copy per key; returns found-flags."""
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)
        out = np.zeros(len(keys), dtype=bool)
        for j, (fp, i1, i2) in enumerate(zip(fps.tolist(), i1s.tolist(), i2s.tolist())):
            for i in (i1, i2):
                hit = np.flatnonzero(self.table[i] == fp)
                if hit.size:
                    self.table[i][hit[0]] = 0
                    self.n_items -= 1
                    out[j] = True
                    break
            else:
                for s, (si, sfp) in enumerate(self.stash):
                    if sfp == fp and si in (i1, i2):
                        del self.stash[s]
                        self.n_items -= 1
                        out[j] = True
                        break
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe."""
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        i2s = self._alt_index(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        out = in1 | in2
        for si, sfp in self.stash:
            out |= (fps == np.uint32(sfp)) & ((i1s == si) | (i2s == si))
        return out

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array(
            [self.n_buckets, self.bucket_size, self.seed, self.n_items, len(self.stash)],
            dtype=np.int64,
        )
        stash = np.array(self.stash, dtype=np.int64).reshape(-1, 2)
        return head.tobytes() + self.table.tobytes() + stash.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "NumpyCuckoo":
        head = np.frombuffer(raw[:40], dtype=np.int64)
        obj = cls(int(head[0]), int(head[1]), int(head[2]))
        table_end = 40 + int(head[0]) * int(head[1]) * 4
        obj.table = (
            np.frombuffer(raw[40:table_end], dtype=np.uint32)
            .reshape(int(head[0]), int(head[1]))
            .copy()
        )
        obj.n_items = int(head[3])
        obj.stash = [
            (int(a), int(b))
            for a, b in np.frombuffer(raw[table_end:], dtype=np.int64).reshape(-1, 2)
        ]
        assert len(obj.stash) == int(head[4])
        return obj


def capacity_buckets(n_keys: int, bucket_size: int = 4, load_pct: int = 84) -> int:
    """Smallest power-of-two bucket count holding n_keys at <= load_pct%.

    Integer ceil (the repo's structural-length rule): a float product one
    ulp above an exact boundary must not change the allocation.
    """
    need = max(1, -(-n_keys * 100 // (bucket_size * load_pct)))
    return 1 << int(need - 1).bit_length()


# --- distributed build / probe (Spark wiring) -------------------------------


def cuckoo_build_sharded(
    insert_df,
    key_col: str,
    delete_df=None,
    n_shards: int = 32,
    seed: int = 42,
):
    """Build a SHARDED cuckoo filter: distinct keys route to shards by
    xxhash64, each shard builds its own filter from its sorted key set
    (applyInPandas), optionally applying a delete set afterwards.

    Returns a (shard, blob) DataFrame — one kilobyte-scale row per shard.
    Work and state are O(distinct keys), never O(rows): the distinct is the
    only shuffle over data, and each shard's filter is a pure function of
    its key set (sorted insert + derandomized eviction), so the build is
    insensitive to input partitioning. At 100 TB the shard count scales
    with key cardinality while blobs stay broadcastable.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    ins = insert_df.select(F.col(key_col).cast("long").alias("k")).distinct().select(
        "k", F.lit(1).alias("mult")
    )
    parts = ins
    if delete_df is not None:
        dels = (
            delete_df.select(F.col(key_col).cast("long").alias("k"))
            .distinct()
            .select("k", F.lit(-1).alias("mult"))
        )
        parts = ins.unionByName(dels)
    sharded = parts.withColumn(
        "shard", F.pmod(F.xxhash64("k"), F.lit(n_shards)).cast("int")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        ins_keys = np.sort(pdf.loc[pdf["mult"] == 1, "k"].to_numpy(np.int64))
        del_keys = np.sort(pdf.loc[pdf["mult"] == -1, "k"].to_numpy(np.int64))
        cf = NumpyCuckoo(capacity_buckets(max(len(ins_keys), 1)), seed=seed)
        cf.insert(ins_keys)
        if del_keys.size:
            cf.delete(del_keys)
        return pd.DataFrame({"shard": [shard], "blob": [cf.to_bytes()]})

    return sharded.groupBy("shard").applyInPandas(build, "shard int, blob binary")


def cuckoo_might_contain(probe_df, key_col: str, filter_table, n_shards: int = 32):
    """Probe a sharded cuckoo filter: the per-shard blobs (bounded by
    n_shards x KB) collect once and ride a real sparkContext.broadcast;
    probes compute their shard JVM-side (same xxhash64 routing as the
    build) and check membership in one vectorized Arrow batch pass — no
    shuffle of the probe stream at all."""
    import pandas as pd
    from pyspark.sql import functions as F

    filters = {
        int(r["shard"]): bytes(r["blob"]) for r in filter_table.collect()
    }
    sc = probe_df.sparkSession.sparkContext
    bc = sc.broadcast(filters)

    probes = probe_df.select(
        F.col(key_col).cast("long").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("long")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def probe(batches):
        cache: dict[int, NumpyCuckoo] = {}
        blobs = bc.value
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=bool)
            for shard, idx in pdf.groupby("shard").groups.items():
                blob = blobs.get(int(shard))
                if blob is None:
                    continue
                cf = cache.setdefault(int(shard), NumpyCuckoo.from_bytes(blob))
                sub = pdf.loc[idx, "key"].to_numpy(np.int64)
                out[pdf.index.get_indexer(idx)] = cf.contains(sub)
            yield pd.DataFrame({"key": pdf["key"], "might_contain": out})

    return probes.mapInPandas(probe, "key long, might_contain boolean")
