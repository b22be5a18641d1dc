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


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
