"""Deterministic tokenizer standing in for tiktoken ``cl100k_base``.

The reference counts/encodes/decodes tokens with tiktoken (ref
shared/utils/chunking.py:29-56, shared/processing/document_processor.py:190-196).
tiktoken is not installable in this sandbox, so the engine AND the oracle
share this deterministic BPE-ish regex tokenizer; conformance is defined as
engine == oracle under the identical tokenizer (SURVEY.md §5.1).

Properties tiktoken has that the chunker semantics rely on and which this
tokenizer preserves:

- ``decode(encode(s)) == s`` exactly (tokens partition the string);
- token count grows ~len(text)/4;
- ``encode`` -> list, sliceable, ``decode`` of a prefix is a string prefix
  "rounded" to a token boundary (used by embed truncation,
  ref document_processor.py:193-196).

Token definition: each token is one regex match of, in order of precedence,
(optional leading whitespace +) a letter run, a digit triple, or a
punctuation run; pure trailing whitespace is one token.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List

import numpy as np

# Order matters: letters | up-to-3 digits | punct run, each absorbing the
# whitespace before it; a final whitespace-only tail is its own token.
_TOKEN_RE = re.compile(r"\s*(?:[^\W\d_]+|\d{1,3}|[^\w\s]+|_+)|\s+")

# ---- vectorized exact token counting ------------------------------------
# Tokens partition the string into maximal same-class character runs
# (letters / digit-triples / punct / underscores, interior whitespace
# absorbed into the following token, trailing whitespace its own token),
# so the COUNT is pure run-length arithmetic over per-char classes:
#   count = #L-runs + #P-runs + #U-runs + sum(ceil(len/3)) over D-runs
#           + (1 if the string ends in whitespace)
# This is 10-40x cheaper than the regex scan on long documents and exact
# by construction (classes are defined by the same single-char regexes;
# equality vs len(_TOKEN_RE.findall) is hypothesis+corpus-tested in
# tests/test_fast_token_count.py).
# Code assignment is load-bearing: L/P/U (the classes that count one
# token per run) are all < 3 so the run tally is ONE vector comparison.
_CLS_P, _CLS_L, _CLS_U, _CLS_D, _CLS_S = 0, 1, 2, 3, 4
_L1 = re.compile(r"[^\W\d_]\Z")
_D1 = re.compile(r"\d\Z")
_S1 = re.compile(r"\s\Z")
_HAS_DIGIT = re.compile(r"\d")


@lru_cache(maxsize=65536)
def _cls_char(ch: str) -> int:
    if _L1.match(ch):
        return _CLS_L
    if _D1.match(ch):
        return _CLS_D
    if ch == "_":
        return _CLS_U
    if _S1.match(ch):
        return _CLS_S
    return _CLS_P


_ASCII_CLS = np.array([_cls_char(chr(c)) for c in range(128)], dtype=np.uint8)

# Below this length the numpy setup costs more than the regex scan.
_FAST_MIN_CHARS = 96


def fast_token_count(text: str) -> int:
    """Exactly ``len(_TOKEN_RE.findall(text))``, vectorized for long text."""
    n = len(text)
    if n < _FAST_MIN_CHARS or n == 0:
        return len(_TOKEN_RE.findall(text))
    try:
        cls = _ASCII_CLS[np.frombuffer(text.encode("ascii"), dtype=np.uint8)]
    except UnicodeEncodeError:
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        cls = np.empty(n, dtype=np.uint8)
        lo = codes < 128
        cls[lo] = _ASCII_CLS[codes[lo]]
        hi = codes[~lo]
        uniq = np.unique(hi)
        m = np.fromiter((_cls_char(chr(int(u))) for u in uniq), dtype=np.uint8, count=len(uniq))
        cls[~lo] = m[np.searchsorted(uniq, hi)]
    # a run starts where the class changes; L/P/U runs (< _CLS_D by the
    # code assignment above) are one token each — countable with a single
    # masked count, no index materialization
    head, tail = cls[:-1], cls[1:]
    count = int(np.count_nonzero((tail != head) & (tail < _CLS_D)))
    if cls[0] < _CLS_D:
        count += 1
    if _HAS_DIGIT.search(text) is not None:
        # digit runs are ceil(len/3) tokens: extract just their extents
        d = cls == _CLS_D
        diffs = np.diff(d.astype(np.int8))
        d_starts = np.flatnonzero(diffs == 1) + 1
        d_ends = np.flatnonzero(diffs == -1) + 1
        if d[0]:
            d_starts = np.concatenate(((0,), d_starts))
        if d[-1]:
            d_ends = np.concatenate((d_ends, (n,)))
        count += int(((d_ends - d_starts + 2) // 3).sum())
    if cls[-1] == _CLS_S:
        count += 1
    return count


class Tokenizer:
    """Stateless but kept as a class so stages hold it as per-actor state
    the way the reference holds the tiktoken encoding (ref chunking.py:29-40,
    T1 in SURVEY.md §2.3)."""

    def encode(self, text: str) -> List[str]:
        return _TOKEN_RE.findall(text)

    def decode(self, tokens: List[str]) -> str:
        return "".join(tokens)

    def count_tokens(self, text: str) -> int:
        """Token count; mirrors ref chunking.py:42-56 (the ``len(text)//4``
        fallback never fires here — the regex cannot raise)."""
        return len(_TOKEN_RE.findall(text))


_DEFAULT = Tokenizer()


def count_tokens(text: str) -> int:
    return _DEFAULT.count_tokens(text)


def get_tokenizer() -> Tokenizer:
    return _DEFAULT
