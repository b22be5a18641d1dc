"""Stable 64-bit string hashing, vectorized.

The reference has no hashing at all — its dedup key is the string id
``blob_name.replace('/','_').replace('.','_')`` (ref
shared/processing/document_processor.py:328). The target architecture keys
the URL-seen set and all shuffles on a 64-bit hash of the canonical URL.

We use polars' vectorized 64-bit hash (Rust, SIMD-fast, deterministic
across processes for a fixed polars version and seed) as the primary
implementation, with a pure-Python blake2b fallback. The oracle uses the
SAME function, so engine == oracle holds by construction regardless of the
underlying hash family.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .config import HASH_SEED

try:  # polars is available in the sandbox; fallback kept for portability
    import polars as pl

    _HAS_POLARS = True
except ImportError:  # pragma: no cover
    _HAS_POLARS = False


def hash64(strings: Sequence[str] | np.ndarray | "pl.Series", seed: int = HASH_SEED) -> np.ndarray:
    """Vectorized 64-bit hash of a sequence of strings -> uint64 ndarray.
    Accepts pyarrow string arrays directly (zero-copy into polars)."""
    if _HAS_POLARS:
        import pyarrow as pa

        if isinstance(strings, pl.Series):
            s = strings
        elif isinstance(strings, (pa.Array, pa.ChunkedArray)):
            s = pl.from_arrow(strings)
        else:
            s = pl.Series(values=list(strings), dtype=pl.Utf8)
        return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
    return np.array([_blake64(x, seed) for x in strings], dtype=np.uint64)  # pragma: no cover


def hash64_one(s: str, seed: int = HASH_SEED) -> int:
    """Scalar convenience wrapper (oracle-side / tests)."""
    return int(hash64([s], seed=seed)[0])


def _blake64(s: str, seed: int) -> int:  # pragma: no cover - fallback only
    import hashlib

    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def shard_of(hashes: np.ndarray, num_shards: int) -> np.ndarray:
    """Shard id per hash (uint64 % shards) -> int32 ndarray."""
    return (hashes % np.uint64(num_shards)).astype(np.int32)
