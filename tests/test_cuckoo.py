"""Cuckoo filter (T5/D2) properties: no false negatives, determinism,
serialization round-trip, sharded == monolithic behavior."""

from __future__ import annotations

import numpy as np

from azure_blob_crawler_ray.state.cuckoo import CuckooFilter


def _keys(n, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    return np.unique(rng.integers(1, 2**63, n).astype(np.uint64))


def test_no_false_negatives():
    f = CuckooFilter(1 << 12)
    keys = _keys(5000)
    f.add_many(np.sort(keys))
    assert f.contains_many(keys).all()


def test_add_returns_fresh_mask():
    f = CuckooFilter(1 << 12)
    keys = np.sort(_keys(1000))
    fresh = f.add_many(keys)
    assert fresh.all()
    again = f.add_many(keys)
    assert not again.any()


def test_false_positive_rate_small():
    f = CuckooFilter(1 << 14)
    f.add_many(np.sort(_keys(20000, seed=1)))
    probe = _keys(20000, seed=2)
    fp = f.contains_many(probe).mean()
    assert fp < 0.01  # 16-bit fingerprints -> ~1e-4 expected


def test_serialize_roundtrip_identical_state():
    f = CuckooFilter(1 << 12)
    f.add_many(np.sort(_keys(3000, seed=3)))
    g = CuckooFilter.deserialize(f.serialize())
    assert np.array_equal(f.fingerprint_set(), g.fingerprint_set())
    assert g.count == f.count
    # continued inserts agree too
    more = np.sort(_keys(500, seed=4))
    assert np.array_equal(f.add_many(more), g.add_many(more))
    assert np.array_equal(f.fingerprint_set(), g.fingerprint_set())


def test_determinism_across_orderings_of_batches():
    # state after inserting the same SORTED-UNIQUE batches is identical
    a, b = CuckooFilter(1 << 10), CuckooFilter(1 << 10)
    k1, k2 = np.sort(_keys(400, seed=5)), np.sort(_keys(400, seed=6))
    a.add_many(k1)
    a.add_many(k2)
    b.add_many(k1)
    b.add_many(k2)
    assert np.array_equal(a.fingerprint_set(), b.fingerprint_set())
