"""Broadcast Bloom filter for map-side semi-join pruning.

The 100 TB join pattern: when one join side is filtered to a small key
set, build a Bloom filter over its keys ONCE, ``ray.put`` the bit array
(bits, not keys — 10 bits/key at k=4 gives <2% false positives), and
drop non-matching fact rows INSIDE map_batches BEFORE the join's
all-to-all — false positives only pass extra rows into the exact join,
so results are unchanged while the exchange shrinks by the filter's
selectivity. The reference has no joins at all (SURVEY.md §2.4); this
is engine-side scale machinery, used by e.g.
``relational.regional_supplier_revenue``.

Pure numpy, vectorized: k derived hash probes per key via splitmix-style
mixing — no Python loop over keys anywhere.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    # offset computed in Python ints then masked — intended modular
    # wraparound without numpy's scalar-overflow warning
    off = np.uint64((int(_GAMMA) * (salt + 1)) & 0xFFFFFFFFFFFFFFFF)
    z = x.astype(np.uint64) + off
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


class BloomFilter:
    """Fixed-size Bloom filter over int64/uint64 keys.

    ``bits_per_key=10, num_hashes=4`` -> ~1.8% false-positive rate at
    capacity. The packed ``self.bits`` (uint8 ndarray) is what travels
    through ``ray.put`` — n/8*10 bytes per key set."""

    def __init__(
        self,
        num_keys: int = 0,
        *,
        bits_per_key: int = 10,
        num_hashes: int = 4,
        num_bits: int | None = None,
    ):
        self.m = int(num_bits) if num_bits else max(64, int(num_keys) * bits_per_key)
        self.k = num_hashes
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def add_many(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.uint64, copy=False)
        for s in range(self.k):
            idx = _mix(keys, s) % np.uint64(self.m)
            np.bitwise_or.at(self.bits, (idx >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (idx & np.uint64(7))).astype(np.uint8))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        out = np.ones(len(keys), dtype=bool)
        for s in range(self.k):
            idx = _mix(keys, s) % np.uint64(self.m)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            out &= bit.astype(bool)
        return out


def build_bloom(keys: np.ndarray, **kw) -> BloomFilter:
    bf = BloomFilter(len(keys), **kw)
    bf.add_many(keys)
    return bf


def bloom_of_dataset(ds, key_col: str, *, num_bits: int = 1 << 20, num_hashes: int = 4):
    """Distributed Bloom build: each block folds its keys into a local
    fixed-size bit array; the driver ORs the per-block arrays — it holds
    BITS (num_bits/8 bytes per block summary, then one array), never
    keys, so the build is bounded regardless of row count. Size
    ``num_bits`` ~ 10x the expected distinct keys (1 << 20 bits = 128 KB
    covers ~100k keys at <2% FP; scale it with the key estimate at
    100 TB). The source dataset is re-executed by the subsequent
    consumer — keep it a cheap scan+filter."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits=num_bits, num_hashes=num_hashes)
        bf.add_many(batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({"bits": pa.array([bf.bits.tobytes()], type=pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = BloomFilter(num_bits=num_bits, num_hashes=num_hashes)
    if "bits" in parts.columns:  # a 0-row source yields no blocks at all
        for blob in parts["bits"]:
            out.bits |= np.frombuffer(blob, dtype=np.uint8)
    return out
