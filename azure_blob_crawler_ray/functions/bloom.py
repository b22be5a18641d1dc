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
    """Distributed Bloom build, DENSE form: each block folds its keys
    into a local fixed-size bit array; the driver ORs the per-block
    arrays — it holds BITS (num_bits/8 bytes per block summary, then one
    array), never keys, so the build is bounded regardless of row count.
    Size ``num_bits`` ~ 10x the expected distinct keys (1 << 20 bits =
    128 KB covers ~100k keys at <2% FP; scale it with the key estimate
    at 100 TB). The source dataset is re-executed by the subsequent
    consumer — keep it a cheap scan+filter.

    Driver traffic is O(blocks x num_bits/8): right when blocks are few
    or batches are bit-dense. When keys-per-block x num_hashes is small
    relative to num_bits (a big filter over a thin build side), use
    ``bloom_of_dataset_sparse`` — its exchange carries only the SET
    words and its driver pull is bounded by num_bits/64 rows."""
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

_OR_BUCKETS = 256  # coarse word-hash groups for the sparse build exchange


def bloom_of_dataset_sparse(
    ds, key_col: str, *, num_bits: int = 1 << 20, num_hashes: int = 4
) -> BloomFilter:
    """Distributed Bloom build, SPARSE form: each batch OR-packs its own
    distinct bit positions into (word_idx, 64-bit word) pairs — at most
    num_bits/64 rows per batch, and typically ~keys x num_hashes / 64 —
    and ONE coarse groupby over ``word_idx % 256`` merges them with a
    segmented ``np.bitwise_or.reduceat`` per bucket.

    ~256 uniform groups keep the sort-shuffle trivial (a groupby keyed
    on raw bit positions produced millions of one-row groups and cost
    ~9 s where this costs ~1 s at 300k keys / m=2^22), and the driver
    pull is bounded by num_bits/64 word rows regardless of build size.
    num_bits must be a multiple of 64.  The filter is bit-compatible
    with ``BloomFilter`` (little-endian word view of the same bit
    layout), so ``contains_many`` works unchanged."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if num_bits % 64:
        raise ValueError("bloom_of_dataset_sparse: num_bits must be a multiple of 64")
    m = np.uint64(num_bits)
    empty = pa.table(
        {"word": pa.array([], type=pa.int64()), "val": pa.array([], type=pa.int64())}
    )

    def words_of(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        keys = (
            pc.cast(batch[key_col], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        pos = np.unique(
            np.concatenate([_mix(keys, s) % m for s in range(num_hashes)])
        )  # sorted distinct bit positions
        w = (pos >> np.uint64(6)).view(np.int64)
        v = (np.uint64(1) << (pos & np.uint64(63))).view(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(w)) + 1])
        return pa.table(
            {
                "word": pa.array(w[starts]),
                "val": pa.array(np.bitwise_or.reduceat(v, starts)),
            }
        )

    def or_bucket(group: pa.Table) -> pa.Table:
        w = group["word"].to_numpy(zero_copy_only=False)
        v = group["val"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="stable")
        w, v = w[order], v[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(w)) + 1])
        return pa.table(
            {
                "word": pa.array(w[starts]),
                "val": pa.array(np.bitwise_or.reduceat(v, starts)),
            }
        )

    agg = (
        ds.select_columns([key_col])
        .map_batches(words_of, batch_format="pyarrow", zero_copy_batch=True)
        .add_column("__bucket", lambda df: df["word"] % _OR_BUCKETS)
        .groupby("__bucket")
        .map_groups(or_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    bf = BloomFilter(num_bits=num_bits, num_hashes=num_hashes)
    if len(agg):
        words = np.zeros(num_bits // 64, dtype=np.uint64)
        words[agg["word"].to_numpy().astype(np.int64)] = (
            agg["val"].to_numpy().view(np.uint64)
        )
        # little-endian uint8 view of the same bits: bit (idx & 7) of
        # byte (idx >> 3) == bit (idx & 63) of word (idx >> 6)
        bf.bits = words.view(np.uint8).copy()
    return bf
