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
from typing import List

# Order matters: letters | up-to-3 digits | punct run, each absorbing the
# whitespace before it; a final whitespace-only tail is its own token.
_TOKEN_RE = re.compile(r"\s*(?:[^\W\d_]+|\d{1,3}|[^\w\s]+|_+)|\s+")


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
