"""Chunker conformance: the reference's TokenAwareChunker quirks
(SURVEY.md §2.2 O9-O13) hold in the oracle chunker, which the Ray chunk
stage uses verbatim — so these pin the semantics for both."""

from __future__ import annotations

import numpy as np
import pytest

from azure_blob_crawler_ray.oracle.ref_chunker import RefChunker
from azure_blob_crawler_ray.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def ck():
    return RefChunker()


def test_small_text_returned_unmodified(ck):
    # ref chunking.py:74-76 — fits => returned as-is, NO strip
    text = "  hello world.  "
    assert ck.chunk_text(text, max_tokens=100) == [text]


def test_sentence_split_consumes_punctuation(ck):
    # ref chunking.py:187-188 — terminal [.!?]+ runs are consumed
    s = ck.split_sentences("One. Two!! Three?? Four")
    assert s == ["One", "Two", "Three", "Four"]


def test_chunks_respect_token_cap(ck):
    rng = np.random.Generator(np.random.PCG64(7))
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    text = " ".join(
        " ".join(rng.choice(words, 12)) + "." for _ in range(200)
    )
    max_tokens, overlap = 60, 10
    chunks = ck.chunk_text(text, max_tokens=max_tokens, overlap_tokens=overlap)
    assert len(chunks) > 1
    # cap holds up to the overlap carried into each new chunk plus the
    # accumulated-vs-recount drift the reference tolerates (ref chunking.py:104,115)
    for c in chunks:
        assert ck.count_tokens(c) <= max_tokens + overlap + 2


def test_overlap_default_exceeding_cap_is_reference_behavior(ck):
    # With the reference defaults (overlap=200), a max_tokens below the
    # overlap budget yields chunks larger than max_tokens — the overlap
    # suffix is bounded by OVERLAP_TOKENS, not by max (ref chunking.py:109,247-271).
    text = " ".join(f"word{i} a b c." for i in range(200))
    chunks = ck.chunk_text(text, max_tokens=10, overlap_tokens=200)
    assert any(ck.count_tokens(c) > 10 for c in chunks)


def test_overlap_suffix_bounded(ck):
    text = "one two three four five six seven eight nine ten"
    suf = ck.overlap_suffix(text, 4)
    assert ck.count_tokens(suf) <= 4
    assert text.endswith(suf)


def test_single_giant_word_char_split(ck):
    # ref chunking.py:227-245 — word > cap is split at max_tokens*4 chars
    word = "x" * 1000
    pieces = ck.split_by_chars(word, 10)
    assert all(len(p) <= 40 for p in pieces)
    assert "".join(pieces) == word


def test_chunk_pages_oversized_page_quirk(ck):
    # ref chunking.py:159-168 — oversized page flushed via replace-strip
    small = "tiny page."
    big = " ".join(f"word{i} item." for i in range(300))
    chunks = ck.chunk_pages([small, big, small], max_tokens=50)
    assert chunks  # never empty
    joined = " ".join(chunks)
    assert "tiny page" in joined
    for c in chunks[:-1]:
        assert c.strip() == c  # flushed chunks are stripped


def test_chunk_pages_accumulates_with_separator(ck):
    pages = ["page one.", "page two.", "page three."]
    chunks = ck.chunk_pages(pages, max_tokens=1000)
    assert chunks == ["page one.\n\npage two.\n\npage three."]


def test_tokenizer_roundtrip():
    tok = Tokenizer()
    for s in ["hello world", "a.b.c!!", "  spaced   out  ", "digits 123456 end", ""]:
        assert tok.decode(tok.encode(s)) == s


def test_tokenizer_prefix_decode():
    # embed truncation depends on decode-of-prefix being a string prefix
    tok = Tokenizer()
    s = "the quick brown fox jumps over the lazy dog 12345!"
    toks = tok.encode(s)
    for k in range(len(toks)):
        assert s.startswith(tok.decode(toks[:k]))
