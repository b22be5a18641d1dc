"""Property-based tests (hypothesis) for the semantic kernels the whole
engine leans on: tokenizer, chunker, cuckoo filter, URL canonicalization,
fingerprints (SURVEY.md §5.5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from azure_blob_crawler_ray.functions.textstats import char_ngrams, jaccard
from azure_blob_crawler_ray.functions.urlnorm import canonical_url
from azure_blob_crawler_ray.oracle.ref_chunker import RefChunker
from azure_blob_crawler_ray.state.cuckoo import CuckooFilter
from azure_blob_crawler_ray.tokenizer import Tokenizer

_ck = RefChunker()
_tok = Tokenizer()

text_strategy = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs")),
    max_size=400,
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokenizer_roundtrip_any_text(s):
    assert _tok.decode(_tok.encode(s)) == s


@given(text_strategy)
@settings(max_examples=100, deadline=None)
def test_tokenizer_prefix_decode_any_text(s):
    toks = _tok.encode(s)
    for k in (0, len(toks) // 2, len(toks)):
        assert s.startswith(_tok.decode(toks[:k]))


@given(text_strategy, st.integers(min_value=5, max_value=50))
@settings(max_examples=100, deadline=None)
def test_chunk_text_never_loses_nonspace_when_single_chunk(s, max_tokens):
    chunks = _ck.chunk_text(s, max_tokens=max_tokens, overlap_tokens=0)
    if not s.strip():
        assert chunks == []
    elif _ck.count_tokens(s) <= max_tokens:
        assert chunks == [s]  # unmodified-if-fits quirk
    else:
        assert chunks
        for c in chunks:
            assert c.strip() or c == chunks[-1]


@given(st.lists(st.text(alphabet="abc .!?", max_size=60), max_size=6))
@settings(max_examples=100, deadline=None)
def test_chunk_pages_never_raises_and_strips(pages):
    chunks = _ck.chunk_pages(pages, max_tokens=20)
    for c in chunks:
        assert isinstance(c, str)


@given(st.lists(st.integers(min_value=1, max_value=2**63 - 1), unique=True, max_size=300))
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives_property(keys):
    f = CuckooFilter(1 << 10)
    arr = np.sort(np.array(keys, dtype=np.uint64)) if keys else np.zeros(0, np.uint64)
    f.add_many(arr)
    if len(arr):
        assert f.contains_many(arr).all()


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=80))
@settings(max_examples=100, deadline=None)
def test_canonical_url_idempotent(path):
    url = "https://host.example.com/" + path
    c = canonical_url(url)
    assert canonical_url("https://" + c) == c


@given(text_strategy, text_strategy)
@settings(max_examples=100, deadline=None)
def test_jaccard_bounds_and_symmetry(a, b):
    sa, sb = char_ngrams(a, 3), char_ngrams(b, 3)
    j = jaccard(sa, sb)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(sb, sa)
    assert jaccard(sa, sa) == 1.0


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        ).map(lambda s: "https://" + s),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_split_canonical_arrow_equals_scalar(urls):
    """The RE2-kernel canonicalizer used on the link-explosion hot path
    must agree byte-for-byte with the scalar pair on arbitrary URLs."""
    import pyarrow as pa

    from azure_blob_crawler_ray.functions.urlnorm import (
        split_canonical_arrow,
        split_host_path,
    )

    host_a, canon_a = split_canonical_arrow(pa.array(urls, type=pa.string()))
    assert host_a.to_pylist() == [split_host_path(u)[0] for u in urls]
    assert canon_a.to_pylist() == [canonical_url(u) for u in urls]


def test_split_canonical_arrow_accepts_large_string():
    # large_string columns are routine at scale (and what polars-backed
    # exchanges emit); the join kernel must not assume `string`
    import pyarrow as pa

    from azure_blob_crawler_ray.functions.urlnorm import (
        split_canonical_arrow,
        split_host_path,
    )

    urls = ["https://h/p/x/", "http://h2/a#f", "https://bare"]
    host, canon = split_canonical_arrow(pa.array(urls, type=pa.large_string()))
    assert host.to_pylist() == [split_host_path(u)[0] for u in urls]
    assert canon.to_pylist() == [canonical_url(u) for u in urls]
