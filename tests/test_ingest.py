"""Ray ingest pipeline == oracle process_blob on synthetic blobs
(SURVEY.md §3.1 / §5.1): chunks, ids, token counts, vectors."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.ref_pipeline import process_blob
from azure_blob_crawler_ray.pipelines.ingest import ingest
from azure_blob_crawler_ray import synth

EMBED_DIM = 32


def _blob_table(n=40, seed=42):
    cfg = CrawlConfig(universe=10_000, seed=seed)
    uids = np.arange(1, n + 1, dtype=np.int64) * 37
    urls, hosts, blobs = synth.urls_for(uids, cfg)
    payloads = [synth.payload_for(int(u), cfg)[0] for u in uids]
    return cfg, pa.table(
        {
            "url": pa.array(urls),
            "blob_name": pa.array(blobs),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }
    )


def test_ingest_matches_oracle():
    cfg, blobs = _blob_table()
    ds = ray.data.from_arrow(blobs)
    out = ingest(ds, embed_dim=EMBED_DIM, max_tokens=120).to_pandas()

    expected = {}
    for bn, payload, url in zip(
        blobs["blob_name"].to_pylist(),
        blobs["payload"].to_pylist(),
        blobs["url"].to_pylist(),
    ):
        doc = process_blob(
            bn, payload, chunk_max_tokens=120, embed_dim=EMBED_DIM, media_ref=url
        )
        if doc is None:
            continue
        for cid, chunk, vec in zip(doc.index_ids, doc.chunks, doc.vectors):
            expected[cid] = (chunk, vec)

    got = {r["id"]: (r["content"], np.asarray(r["vector"])) for _, r in out.iterrows()}
    assert set(got) == set(expected)
    for cid, (chunk, vec) in expected.items():
        g_chunk, g_vec = got[cid]
        assert g_chunk == chunk, cid
        assert np.allclose(g_vec, vec, atol=0), cid


def test_zero_vector_fallback():
    # ref document_processor.py:202-205 — failure => [0.0]*dim
    t = pa.table(
        {
            "url": pa.array(["https://h/x/f.txt"]),
            "blob_name": pa.array(["x/EMBED_FAIL marker.txt"]),
            "payload": pa.array([b"EMBED_FAIL this text."], type=pa.large_binary()),
        }
    )
    out = ingest(ray.data.from_arrow(t), embed_dim=8).to_pandas()
    assert len(out) == 1
    assert np.array_equal(np.asarray(out.iloc[0]["vector"]), np.zeros(8, np.float32))


def test_fused_stage_equals_staged_pipeline():
    """chunk+embed+assemble fused into one task pool must be
    byte-identical to the three-stage actor composition."""
    import pandas as pd

    from azure_blob_crawler_ray.pipelines.ingest import ingest
    import __ray_entry__ as entry

    # materialize: limit() on a streaming read keeps whichever blocks
    # finish first, so without pinning the two paths could ingest
    # different 120-row subsets
    blobs = entry._docs_as_blobs("/root/testdata/sf0.001").limit(120).materialize()
    fused = (
        ingest(blobs, embed_dim=16, fused=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    staged = (
        ingest(blobs, embed_dim=16, fused=False)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert fused["id"].tolist() == staged["id"].tolist()
    assert fused["content"].tolist() == staged["content"].tolist()
    for a, b in zip(fused["vector"], staged["vector"]):
        assert list(a) == list(b)
