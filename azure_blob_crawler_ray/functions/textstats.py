"""Vectorized text statistics over Arrow string columns.

The reference computes per-document token/character stats one string at a
time (ref shared/utils/chunking.py:42-56, shared/processing/
document_processor.py:321-336). Here every counter is a pyarrow.compute
kernel over the whole batch — zero-copy in, Arrow out.

Semantics are pinned to be DuckDB-expressible so the driver's SQL oracle
can verify each operator exactly:
  word_count      = #matches of \\S+            (regexp_extract_all len)
  punct_count     = #matches of [.!?,;:]
  upper_count     = #matches of [A-Z]
  occurrences(t)  = non-overlapping substring count (replace-based in SQL)
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PUNCT_PATTERN = r"[.!?,;:]"
UPPER_PATTERN = r"[A-Z]"
WORD_PATTERN = r"\S+"


def word_count(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.count_substring_regex(col, WORD_PATTERN)


def punct_count(col) -> pa.Array:
    return pc.count_substring_regex(col, PUNCT_PATTERN)


def upper_count(col) -> pa.Array:
    return pc.count_substring_regex(col, UPPER_PATTERN)


def char_count(col) -> pa.Array:
    return pc.utf8_length(col)


def occurrences(col, term: str) -> pa.Array:
    """Non-overlapping substring occurrence count (== the SQL
    (len(x)-len(replace(x,t,'')))/len(t) idiom)."""
    return pc.count_substring(col, term)


def md5_hex(texts: List[str]) -> List[str]:
    """Row-wise md5 hex digest — matches DuckDB ``md5(text)`` exactly."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


# ---- rolling-hash fingerprint (target-side; no SQL analogue) ----

_B = np.uint64(1099511628211)  # FNV-1a prime as the polynomial base


def rolling_fingerprint(texts: List[str]) -> np.ndarray:
    """64-bit polynomial rolling hash of each text's bytes — a stable
    document fingerprint for shift-tolerant chunk lineage. Vectorized per
    text over its byte array."""
    out = np.empty(len(texts), dtype=np.uint64)
    seed = np.uint64(14695981039346656037)
    pow_cache = np.ones(1, dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        n = len(b)
        if n == 0:
            out[i] = 0
            continue
        if len(pow_cache) < n + 1:  # grow B^0..B^n (mod 2^64, wrap natural)
            grow = np.empty(n + 1, dtype=np.uint64)
            grow[: len(pow_cache)] = pow_cache
            for k in range(len(pow_cache), n + 1):
                grow[k] = grow[k - 1] * _B
            pow_cache = grow
        # hash = seed*B^n + sum(b[j] * B^(n-1-j))  (mod 2^64), vectorized
        out[i] = seed * pow_cache[n] + np.sum(b * pow_cache[n - 1 :: -1], dtype=np.uint64)
    return out


def char_ngrams(text: str, n: int) -> set:
    """Character n-gram shingle set of a whitespace-normalized text."""
    s = " ".join(text.split())
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — restores avalanche on the low bits of the
    polynomial window hash (whose bit 0 alone would be a parity, useless
    for SimHash votes / LSH banding)."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


_SHINGLE_B = np.uint64(0x100000001B3)  # odd -> full-period mod 2^64


def hashed_shingles(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT hashed character-``n``-gram sets for a whole
    batch in one vectorized pass — the hot path under MinHash, SimHash,
    exact n-gram Jaccard and the source-overlap matrix.  Returns
    ``(flat, sizes)``: ``flat`` holds doc 0's distinct shingle hashes,
    then doc 1's, ...; ``sizes[i]`` is doc i's set size.

    Semantics mirror ``char_ngrams`` (whitespace collapse; a 0<len<n doc
    contributes its whole text as ONE shingle; an empty doc contributes
    nothing) with hash identity replacing string identity — the same
    concession every consumer already made by hashing the strings
    (collision odds ~ set²/2⁶⁴, and a collision only ever MERGES two
    shingles).  Mechanics: code points (utf-32, so multi-byte chars are
    one window element) are packed into one buffer with ``n``-zero gaps,
    a single ``sliding_window_view @ B-powers`` produces every window
    hash, windows straddling gaps are masked out positionally, a
    splitmix64 finalizer restores bit avalanche, and one global
    ``(doc, hash)`` lexsort dedups per doc."""
    norm = [" ".join(t.split()) for t in texts]
    cps = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in norm]
    lens = np.array([len(c) for c in cps], dtype=np.int64)
    doc_parts: list[np.ndarray] = []
    hash_parts: list[np.ndarray] = []

    long_idx = np.flatnonzero(lens >= n)
    if len(long_idx):
        gap = np.zeros(n, dtype=np.uint32)
        parts: list[np.ndarray] = []
        for i in long_idx:
            parts.append(cps[i])
            parts.append(gap)
        buf = np.concatenate(parts[:-1]).astype(np.uint64)
        weights = np.array(
            [pow(int(_SHINGLE_B), n - 1 - k, 1 << 64) for k in range(n)],
            dtype=np.uint64,
        )
        win = np.lib.stride_tricks.sliding_window_view(buf, n)
        hv = win @ weights  # uint64 wrap = the hash
        llen = lens[long_idx]
        starts = np.concatenate(([0], np.cumsum(llen + n)[:-1]))
        pos = np.arange(len(hv), dtype=np.int64)
        d = np.searchsorted(starts, pos, side="right") - 1
        valid = pos <= starts[d] + llen[d] - n
        doc_parts.append(long_idx[d[valid]])
        hash_parts.append(_mix64(hv[valid]))

    short_idx = np.flatnonzero((lens > 0) & (lens < n))
    for i in short_idx:  # rare by construction; whole-text hash
        c = cps[i].astype(np.uint64)
        w = np.array(
            [pow(int(_SHINGLE_B), len(c) - 1 - k, 1 << 64) for k in range(len(c))],
            dtype=np.uint64,
        )
        doc_parts.append(np.array([i], dtype=np.int64))
        hash_parts.append(_mix64(np.array([c @ w], dtype=np.uint64)))

    sizes = np.zeros(len(texts), dtype=np.int64)
    if not doc_parts:
        return np.empty(0, dtype=np.uint64), sizes
    docs = np.concatenate(doc_parts)
    hashes = np.concatenate(hash_parts)
    order = np.lexsort((hashes, docs))
    docs, hashes = docs[order], hashes[order]
    keep = np.r_[True, (hashes[1:] != hashes[:-1]) | (docs[1:] != docs[:-1])]
    docs, hashes = docs[keep], hashes[keep]
    sizes[: docs.max() + 1] = np.bincount(docs)
    return hashes, sizes


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
