"""Cuckoo filter: approximate membership for the URL-seen set.

The reference's "seen" story is deterministic document ids + idempotent
index upsert (ref shared/processing/document_processor.py:328,
shared/azure_clients/search_client.py:71-121) — exact, but requires a
round-trip to the index per URL. At a 10^10-URL frontier the seen set
must be in memory and sub-exact: a cuckoo filter (Fan et al., "Cuckoo
Filter: Practically Better Than Bloom", CoNEXT 2014) gives
~1.2e-4 false positives at 16-bit fingerprints with 4-slot buckets and
supports serialization for checkpointing.

Determinism contract: callers pass SORTED, UNIQUE hash batches (the
per-wave per-shard groupby guarantees it), and eviction victims are
chosen by a deterministic counter — so the filter state after wave W is a
pure function of the crawl, independent of execution timing or
parallelism (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MAX_KICKS = 500


class CuckooFilter:
    """4-slot-bucket cuckoo filter over uint64 keys, 16-bit fingerprints."""

    def __init__(self, num_buckets: int = 1 << 16):
        assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be a power of two"
        self.nb = num_buckets
        self.table = np.zeros((num_buckets, 4), dtype=np.uint16)
        self.count = 0
        self.evictions = 0
        self._kick_counter = 0  # deterministic eviction choice

    # -- key -> (fingerprint, bucket1, bucket2), vectorized --
    def _slots(self, h: np.ndarray):
        h = h.astype(_U64, copy=False)
        fp = (h >> _U64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        mask = _U64(self.nb - 1)
        b1 = (h & mask).astype(np.int64)
        fph = ((fp.astype(_U64) * _MIX1) ^ (fp.astype(_U64) >> _U64(7))) & mask
        b2 = (b1 ^ fph.astype(np.int64)).astype(np.int64)
        return fp, b1, b2

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe -> bool array."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1, b2 = self._slots(hashes)
        fcol = fp[:, None]
        return ((self.table[b1] == fcol).any(axis=1)) | ((self.table[b2] == fcol).any(axis=1))

    def add_many(self, hashes: np.ndarray) -> np.ndarray:
        """Insert each absent key; returns per-key 'was fresh' mask.

        Callers MUST pass sorted unique hashes (determinism contract).
        The per-key insert runs on plain Python ints — numpy scalar
        extraction per key costs ~10x more than the insert itself."""
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        present = self.contains_many(hashes)
        fresh = ~present
        fp, b1, b2 = self._slots(hashes)
        idx = np.flatnonzero(fresh)
        fp_l = fp[idx].tolist()
        b1_l = b1[idx].tolist()
        b2_l = b2[idx].tolist()
        insert = self._insert
        for f, x, y in zip(fp_l, b1_l, b2_l):
            insert(f, x, y)
        self.count += len(idx)
        return fresh

    def _insert(self, fp: int, b1: int, b2: int) -> None:
        t = self.table
        for b in (b1, b2):
            row = t[b]
            for s in range(4):
                if row[s] == 0:
                    row[s] = fp
                    return
        # both buckets full: cuckoo eviction from a deterministic slot
        b = b1
        mask = self.nb - 1
        mix = int(_MIX1)
        for _ in range(_MAX_KICKS):
            slot = self._kick_counter % 4
            self._kick_counter += 1
            victim = int(t[b, slot])
            t[b, slot] = fp
            fp = victim
            # victim's alternate bucket (python ints avoid uint64 scalar overflow)
            fph = (((victim * mix) & 0xFFFFFFFFFFFFFFFF) ^ (victim >> 7)) & mask
            b = b ^ fph
            row = t[b]
            for s in range(4):
                if row[s] == 0:
                    row[s] = fp
                    return
        self.evictions += 1  # table effectively full; drop (counted)

    # -- checkpoint --
    def serialize(self) -> bytes:
        head = np.array([self.nb, self.count, self.evictions, self._kick_counter], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "CuckooFilter":
        head = np.frombuffer(blob[:32], dtype=np.int64)
        f = cls(int(head[0]))
        f.count, f.evictions, f._kick_counter = int(head[1]), int(head[2]), int(head[3])
        f.table = np.frombuffer(blob[32:], dtype=np.uint16).reshape(int(head[0]), 4).copy()
        return f

    def fingerprint_set(self) -> np.ndarray:
        """Stable digest of state for equality tests: sorted (bucket, fp)."""
        b, s = np.nonzero(self.table)
        vals = (b.astype(np.int64) << 16) | self.table[b, s].astype(np.int64)
        return np.sort(vals)
