"""FastChunker == RefChunker (the conformance oracle), byte-for-byte.

Covers the tokenizer-additivity assumptions FastChunker rests on, then
equality of every public method under hypothesis-generated adversarial
text (unicode, digit runs, punctuation runs, giant words, whitespace
noise) and on the synthetic document corpus.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from azure_blob_crawler_ray.functions.chunk_fast import FastChunker
from azure_blob_crawler_ray.oracle.ref_chunker import RefChunker
from azure_blob_crawler_ray.tokenizer import count_tokens

REF = RefChunker()
FAST = FastChunker()

# text with every token class: letter runs, digits, punct runs,
# underscores, unicode letters, mixed whitespace
_texts = st.text(
    alphabet=st.sampled_from(
        list("abcdef XYZ.!?,;:0123456789_-\t\né中 ")
    ),
    min_size=0,
    max_size=400,
)
_words = st.text(
    alphabet=st.sampled_from(list("abc012.!_é")), min_size=1, max_size=30
).filter(lambda w: w.strip() == w and " " not in w)


@given(a=_words, b=_words)
@settings(max_examples=300, deadline=None)
def test_tokenizer_space_join_additivity(a, b):
    """count(a + " " + b) == count(a) + count(b) and count(" "+a) ==
    count(a) — the two properties FastChunker's cumulative sums rely on."""
    assert count_tokens(a + " " + b) == count_tokens(a) + count_tokens(b)
    assert count_tokens(" " + a) == count_tokens(a)


@given(t=_texts)
@settings(max_examples=200, deadline=None)
def test_token_at_least_one_char(t):
    assert count_tokens(t) <= max(len(t), 0)


@given(t=_texts, mt=st.integers(min_value=1, max_value=40),
       ov=st.integers(min_value=0, max_value=10))
@settings(max_examples=400, deadline=None)
def test_chunk_text_equal(t, mt, ov):
    assert FAST.chunk_text(t, mt, ov) == REF.chunk_text(t, mt, ov)


@given(t=_texts, ov=st.integers(min_value=0, max_value=15))
@settings(max_examples=200, deadline=None)
def test_overlap_suffix_equal(t, ov):
    got, n = FAST.overlap_suffix_n(t, ov)
    assert got == REF.overlap_suffix(t, ov)
    assert n == count_tokens(got) if got else n == 0


@given(t=_texts, mt=st.integers(min_value=1, max_value=25))
@settings(max_examples=200, deadline=None)
def test_split_long_sentence_equal(t, mt):
    got, last_n = FAST.split_long_sentence_n(t, mt)
    exp = REF.split_long_sentence(t, mt)
    assert got == exp
    if got:
        assert last_n == count_tokens(got[-1])


@given(pages=st.lists(_texts, min_size=0, max_size=6),
       mt=st.integers(min_value=1, max_value=40))
@settings(max_examples=200, deadline=None)
def test_chunk_pages_equal(pages, mt):
    assert FAST.chunk_pages(pages, mt) == REF.chunk_pages(pages, mt)


@pytest.mark.parametrize("mt", [16, 64, 400, 4000])
def test_corpus_equal(mt):
    texts = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    for t in texts:
        assert FAST.chunk_text(t, mt) == REF.chunk_text(t, mt)


def test_corpus_pages_equal():
    texts = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    # synthesize multi-page docs from consecutive corpus texts
    for i in range(0, 400, 4):
        pages = texts[i : i + 4]
        for mt in (32, 120):
            assert FAST.chunk_pages(pages, mt) == REF.chunk_pages(pages, mt)
