"""Sharded URL-seen set: cuckoo-filter shard actors (T5 in SURVEY.md §2.3).

Shard = ``url_hash % NUM_SEEN_SHARDS`` (fixed count — seen-set contents
must not depend on cluster size). Per wave, each shard receives ALL of the
wave's candidate hashes for its range in ONE call, sorted and deduped —
that makes filter state a pure function of the crawl, so a run at 8 CPUs,
a run at 32 CPUs, and the single-process oracle agree bit-for-bit
(SURVEY.md §7.4). The anti-join J3 (discovered-link minus seen-set) is the
per-shard ``check_add`` returning the fresh mask.
"""

from __future__ import annotations

import hashlib

import numpy as np
import ray

from .cuckoo import CuckooFilter


@ray.remote
class SeenShard:
    def __init__(self, shard_id: int, num_buckets: int):
        self.shard_id = shard_id
        self.filter = CuckooFilter(num_buckets)
        # idempotency replay cache: Ray Data retries group tasks on worker
        # failure, and a re-issued check_add would re-probe an already-
        # mutated filter (everything looks stale -> fresh links dropped).
        # There is exactly ONE legitimate call per (wave, shard), so a
        # repeated (wave, digest) is a task retry: replay the recorded
        # response without touching the filter.
        self._replay: dict = {}

    def check_add(self, hashes: np.ndarray, wave: int = -1) -> np.ndarray:
        """Probe-and-insert; hashes MUST be sorted unique (caller contract,
        enforced by the per-wave groupby). Returns the fresh mask.
        Idempotent per (wave, request): retried tasks replay the original
        response."""
        key = (int(wave), hashlib.blake2b(hashes.tobytes(), digest_size=16).digest())
        hit = self._replay.get(key)
        if hit is not None:
            return hit
        fresh = self.filter.add_many(hashes)
        if len(self._replay) >= 8:  # bounded: only in-flight waves matter
            self._replay.pop(next(iter(self._replay)))
        self._replay[key] = fresh
        return fresh

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(hashes)

    def snapshot(self) -> bytes:
        return self.filter.serialize()

    def restore(self, blob: bytes) -> bool:
        self.filter = CuckooFilter.deserialize(blob)
        self._replay.clear()  # a restore starts a new wave epoch
        return True

    def stats(self) -> dict:
        import resource

        return {
            "shard": self.shard_id,
            "count": self.filter.count,
            "evictions": self.filter.evictions,
            "rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
            ),
        }
