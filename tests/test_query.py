"""Query-side operators (Q1-Q5) + media stage plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_text_search_topk(docs_ds, docs_pd):
    terms = ("data", "join")
    got = query.text_search(docs_ds, terms, top=10).to_pandas()
    scores = docs_pd.assign(
        score=lambda d: sum(d["text"].str.count(t) for t in terms)
    ).sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    exp = scores.head(10)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()


def test_clamp_top():
    # ref app.py:97 + settings.py:144-145
    assert query.clamp_top(0) == 1
    assert query.clamp_top(10) == 10
    assert query.clamp_top(1000) == 100


def test_get_all_docs_cap(docs_ds):
    got = query.get_all_docs(docs_ds, cap=50).to_pandas()
    assert len(got) == 50
    assert got["doc_id"].tolist() == sorted(got["doc_id"].tolist())
    assert list(got.columns) == ["doc_id"]


def test_filter_select(docs_ds, docs_pd):
    got = query.filter_select(
        docs_ds,
        expr="lang == 'en' and n_chars >= 200",
        columns=["doc_id", "n_chars"],
        sort_by="doc_id",
    ).to_pandas()
    exp = docs_pd[(docs_pd["lang"] == "en") & (docs_pd["n_chars"] >= 200)]
    assert got["doc_id"].tolist() == sorted(exp["doc_id"].tolist())
    assert list(got.columns) == ["doc_id", "n_chars"]


def test_hybrid_search_shapes(docs_ds):
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    # default: RRF (score = 1/(60+r_text) + 1/(60+r_vec), descending)
    got = query.hybrid_search(docs_ds, emb, ("data", "join"), query_vec_id=0, top=10).to_pandas()
    assert len(got) <= 10
    expect = 1.0 / (60 + got["text_rank"].to_numpy()) + 1.0 / (60 + got["vec_rank"].to_numpy())
    assert np.allclose(got["fused"].to_numpy(), expect)
    assert got["fused"].tolist() == sorted(got["fused"].tolist(), reverse=True)
    # borda variant: integer rank sum, ascending
    got_b = query.hybrid_search(
        docs_ds, emb, ("data", "join"), query_vec_id=0, top=10, fusion="borda"
    ).to_pandas()
    assert (got_b["fused"] == got_b["text_rank"] + got_b["vec_rank"]).all()
    assert got_b["fused"].tolist() == sorted(got_b["fused"].tolist())


def test_media_feature_stage_plumbing():
    from azure_blob_crawler_ray.stages.media import (
        DeterministicFakeCodec,
        FrameSampleStage,
        media_features,
    )

    payloads = [b"abc" * 100, b"", b"\x00\x01\x02\x03" * 50]
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], type=pa.int64()),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }
    )
    out = media_features(ray.data.from_arrow(t), dim=16).to_pandas()
    assert list(out.columns) == ["media_id", "height", "width", "media_vec"]
    assert len(out) == 3
    v1 = np.asarray(out.iloc[0]["media_vec"])
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5  # unit features
    assert np.linalg.norm(np.asarray(out.iloc[1]["media_vec"])) == 0.0  # empty payload

    # determinism: same payload -> same features
    out2 = media_features(ray.data.from_arrow(t), dim=16).to_pandas()
    assert np.allclose(
        np.asarray(out.iloc[2]["media_vec"]), np.asarray(out2.iloc[2]["media_vec"])
    )

    # dims that don't divide 256 must fold cleanly (histogram is padded)
    for dim in (48, 100, 7, 300):
        v = DeterministicFakeCodec().features(b"xyz" * 33, dim)
        assert v.shape == (dim,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    # pixel decode is an explicit stub boundary
    with pytest.raises(NotImplementedError):
        DeterministicFakeCodec().pixels(b"xx")

    # frame sampling: one row per sampled frame
    vid = pa.table(
        {
            "media_id": pa.array([7], type=pa.int64()),
            "duration_s": pa.array([3.0]),
        }
    )
    frames = (
        ray.data.from_arrow(vid)
        .map_batches(
            FrameSampleStage,
            fn_constructor_kwargs={"fps": 2.0},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert len(frames) == 6
    assert frames["frame"].tolist() == list(range(6))


def test_filtered_hybrid_prefilter_binds(docs_ds):
    """The predicate must constrain BOTH rank pools: every fused result
    satisfies it, and the rank numbers are recomputed over the eligible
    set (not sliced from the unfiltered pools)."""
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    terms = ("data", "join")
    expr = "lang == 'en' and n_chars >= 200"
    got = query.filtered_hybrid(
        docs_ds, emb, terms, query_vec_id=0, expr=expr, top=10, pool=50
    ).to_pandas()
    plain = query.hybrid_search(docs_ds, emb, terms, query_vec_id=0, top=10, pool=50).to_pandas()

    eligible = set(
        docs_ds.filter(expr=expr).select_columns(["doc_id"]).to_pandas()["doc_id"]
    )
    assert len(got) > 0
    assert set(got["doc_id"]).issubset(eligible)
    # the unfiltered result must contain at least one ineligible doc for
    # the comparison to be meaningful, and the two lists must differ
    assert not set(plain["doc_id"]).issubset(eligible)
    assert got["doc_id"].tolist() != plain["doc_id"].tolist()


def test_filtered_hybrid_pre_vs_post_semantics(docs_ds):
    """preFilter assigns dense ranks over eligible vectors; postFilter
    keeps unfiltered rank positions — on a corpus where ineligible docs
    outrank eligible ones, the same doc carries a LARGER vec_rank under
    postFilter."""
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    terms = ("data", "join")
    expr = "lang == 'en' and n_chars >= 200"
    pre = query.filtered_hybrid(
        docs_ds, emb, terms, query_vec_id=0, expr=expr, top=10, pool=100,
        vector_filter_mode="preFilter",
    ).to_pandas()
    post = query.filtered_hybrid(
        docs_ds, emb, terms, query_vec_id=0, expr=expr, top=10, pool=100,
        vector_filter_mode="postFilter",
    ).to_pandas()
    both = pre.merge(post, on="doc_id", suffixes=("_pre", "_post"))
    assert len(both) > 0
    # postFilter ranks skip ineligible rows, so they are >= the dense
    # preFilter ranks, with at least one strict gap on this corpus
    assert (both["vec_rank_post"] >= both["vec_rank_pre"]).all()
    assert (both["vec_rank_post"] > both["vec_rank_pre"]).any()
