"""Bloom-filter semi-join pruning: no false negatives ever, FP rate in
range, distributed build == single build, and the pruned Q5 join stays
exact."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.functions.bloom import (
    BloomFilter,
    bloom_of_dataset,
    build_bloom,
)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 62, 50_000, dtype=np.int64).astype(np.uint64)
    bf = build_bloom(keys)
    assert bf.contains_many(keys).all()


def test_bloom_false_positive_rate_bounded():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 62, 50_000, dtype=np.int64).astype(np.uint64)
    other = rng.integers(0, 1 << 62, 50_000, dtype=np.int64).astype(np.uint64)
    other = other[~np.isin(other, keys)]
    bf = build_bloom(keys)  # 10 bits/key, 4 hashes -> ~1.8% expected
    fp = bf.contains_many(other).mean()
    assert fp < 0.05


def test_distributed_build_equals_single_build():
    keys = np.arange(10_000, dtype=np.uint64) * np.uint64(2654435761)
    single = BloomFilter(num_bits=1 << 16)
    single.add_many(keys)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys.astype(np.int64))})
    ).repartition(8)
    dist = bloom_of_dataset(ds, "k", num_bits=1 << 16)
    assert np.array_equal(single.bits, dist.bits)


def test_empty_dataset_bloom_rejects_everything():
    ds = ray.data.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    bf = bloom_of_dataset(ds, "k", num_bits=1 << 10)
    probe = np.arange(100, dtype=np.uint64)
    assert not bf.contains_many(probe).any()
