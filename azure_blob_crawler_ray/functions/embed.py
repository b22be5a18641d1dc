"""Deterministic hash embedder — the sandbox stand-in for the reference's
embedding HTTP call (ref shared/azure_clients/openai_client.py:44-89, S11
in SURVEY.md §2.1).

Semantics preserved from the reference's ``generate_embeddings``
(ref shared/processing/document_processor.py:171-205):

- token-limit truncation via encode -> slice -> decode (ref :190-196);
- any failure -> zero vector of the configured dimension (ref :202-205).
  The deterministic "failure" here is empty/whitespace text or the
  explicit fault-injection marker ``EMBED_FAIL`` (tests use it to cover
  the fallback path).

The vector itself is a unit-normalized Gaussian seeded by the 64-bit hash
of the (truncated) text — deterministic across runs and machines.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..config import EMBEDDING_MAX_TOKENS, EMBEDDING_VECTOR_DIMENSION
from ..hashing import hash64
from ..tokenizer import Tokenizer

FAIL_MARKER = "EMBED_FAIL"


def truncate_for_embedding(text: str, tok: Tokenizer, max_tokens: int = EMBEDDING_MAX_TOKENS) -> str:
    """ref document_processor.py:190-196"""
    if tok.count_tokens(text) > max_tokens:
        return tok.decode(tok.encode(text)[:max_tokens])
    return text


def embed_batch(
    texts: List[str],
    dim: int = EMBEDDING_VECTOR_DIMENSION,
    tok: Tokenizer | None = None,
    max_tokens: int = EMBEDDING_MAX_TOKENS,
    counts: List[int] | None = None,
) -> np.ndarray:
    """(n, dim) float32 matrix; one deterministic unit vector per text.

    ``counts`` (optional) carries already-known exact token counts for
    each text (the chunk stage computes them for its output column):
    a row whose known count is <= max_tokens provably needs no
    truncation, skipping the tokenizer rescan of the full text."""
    tok = tok or Tokenizer()
    out = np.zeros((len(texts), dim), dtype=np.float32)
    if not texts:
        return out
    if counts is None:
        truncated = [truncate_for_embedding(t, tok, max_tokens) for t in texts]
    else:
        truncated = [
            t if (c is not None and c <= max_tokens) else truncate_for_embedding(t, tok, max_tokens)
            for t, c in zip(texts, counts)
        ]
    seeds = hash64(truncated)
    for i, (t, s) in enumerate(zip(truncated, seeds)):
        if not t.strip() or FAIL_MARKER in t:
            continue  # zero-vector fallback (ref document_processor.py:202-205)
        rng = np.random.Generator(np.random.PCG64(int(s)))
        v = rng.standard_normal(dim).astype(np.float32)
        # float(sqrt(dot(v, v))) is bit-identical to np.linalg.norm(v) for
        # 1-D float32 (norm IS sqrt(dot)) without its errstate machinery
        n = float(np.sqrt(np.dot(v, v)))
        if n > 0:
            out[i] = v / n
    return out


def embed_one(text: str, dim: int = EMBEDDING_VECTOR_DIMENSION) -> List[float]:
    return embed_batch([text], dim)[0].tolist()
