"""Equality proof for tokenizer.fast_token_count — the vectorized
run-length counter used by the engine's FastChunker / embed path — vs
the defining regex scan ``len(_TOKEN_RE.findall(text))`` (which the
oracle keeps using). Also pins bit-identity of the embed fast-norm and
the count-skip truncation path vs the defining forms."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from azure_blob_crawler_ray.tokenizer import _TOKEN_RE, fast_token_count


def ref_count(text: str) -> int:
    return len(_TOKEN_RE.findall(text))


EDGES = [
    "",
    " ",
    "   \t\n",
    "a",
    "1",
    "12",
    "123",
    "1234",
    "12345678901",
    "_",
    "____",
    "a_b_1_.",
    "hello, world!",
    "hello, world!   ",
    "\t  leading ws",
    "a" * 500,
    "1" * 500,
    "_" * 500,
    "." * 500,
    " " * 500,
    ("ab 12 cd!! __ " * 40),
    "mixed1234runs__of.things 99 end\n",
    "\x1c\x1d\x1e\x1f control-ish",
    "café naïve 中文 123",
    "ß" * 120 + " 4567 ",
    "".join(chr(i) for i in range(32, 127)) * 2,
    "\U0001d518nicode astral \U0001f600 run",
]


@pytest.mark.parametrize("text", EDGES)
def test_edges(text):
    assert fast_token_count(text) == ref_count(text)


@settings(max_examples=400, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
        max_size=300,
    )
)
def test_hypothesis_equality(text):
    assert fast_token_count(text) == ref_count(text)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab1 _.\t\n", min_size=90, max_size=400))
def test_hypothesis_boundary_lengths(text):
    # straddle the _FAST_MIN_CHARS switchover with dense class changes
    assert fast_token_count(text) == ref_count(text)


def test_corpus_equality():
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    for s in t["text"].to_pylist():
        assert fast_token_count(s) == ref_count(s)


def test_fast_norm_bit_identity():
    rng = np.random.Generator(np.random.PCG64(7))
    for _ in range(50):
        v = rng.standard_normal(64).astype(np.float32)
        assert float(np.sqrt(np.dot(v, v))) == float(np.linalg.norm(v))


def test_embed_count_skip_identical():
    from azure_blob_crawler_ray.functions.embed import embed_batch
    from azure_blob_crawler_ray.tokenizer import Tokenizer

    tok = Tokenizer()
    texts = ["short one", "x " * 6000, "", "EMBED_FAIL nope", "word " * 9001]
    counts = [tok.count_tokens(t) for t in texts]
    a = embed_batch(texts, dim=16, tok=tok)
    b = embed_batch(texts, dim=16, tok=tok, counts=counts)
    assert np.array_equal(a, b)
