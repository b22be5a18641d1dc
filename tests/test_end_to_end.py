"""End-to-end: crawl -> ingest (chunk/embed/index) -> query the index —
the full reference lifecycle (ingest entry point A + MCP query side)
over the engine's own outputs."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.ref_pipeline import process_blob
from azure_blob_crawler_ray.pipelines.crawl import run_crawl
from azure_blob_crawler_ray.pipelines.query import get_all_docs, text_search
from azure_blob_crawler_ray.storage import read_table


@pytest.fixture(scope="module")
def crawl_with_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e"))
    cfg = CrawlConfig(
        universe=800,
        n_hosts=10,
        max_waves=2,
        wave_budget=200,
        max_fetches_per_host_per_wave=32,
        seeds_per_host=2,
        out_dir=out,
        emit_index=True,
        embed_dim=16,
    )
    res = run_crawl(cfg)
    return cfg, res


def _index_ds(cfg, res):
    import os

    parts = [
        read_table(os.path.join(cfg.out_dir, "index", f"wave-{w:04d}"))
        for w in res.waves_run
        if os.path.isdir(os.path.join(cfg.out_dir, "index", f"wave-{w:04d}"))
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def test_index_rows_match_oracle_ids_and_vectors(crawl_with_index):
    from azure_blob_crawler_ray import synth
    from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl

    cfg, res = crawl_with_index
    idx = _index_ds(cfg, res).to_pandas()
    assert len(idx) > 0
    assert set(idx.columns) == {"id", "content", "vector"}

    # oracle: process every successfully-crawled blob through the
    # reference pipeline; ids and chunk contents must match exactly
    sim = simulate_crawl(cfg)
    expected = {}
    for d in sim.documents:
        url = d["url"]
        uid = int(url.rsplit("/", 1)[1].split(".")[0])
        payload, _ = synth.payload_for(uid, cfg)
        blob_name = url.replace("https://", "").partition("/")[2]
        doc = process_blob(
            blob_name, payload, chunk_max_tokens=cfg.chunk_max_tokens,
            embed_dim=cfg.embed_dim, media_ref=url,
        )
        if doc is None:
            continue
        for cid, chunk, vec in zip(doc.index_ids, doc.chunks, doc.vectors):
            expected[cid] = (chunk, vec)

    got = {r["id"]: (r["content"], np.asarray(r["vector"])) for _, r in idx.iterrows()}
    assert set(got) == set(expected)
    for cid, (chunk, vec) in expected.items():
        assert got[cid][0] == chunk
        assert np.allclose(got[cid][1], vec, atol=0)


def test_query_layer_over_crawl_index(crawl_with_index):
    cfg, res = crawl_with_index
    idx = _index_ds(cfg, res)
    # Q1 text search over the engine's own index table
    hits = text_search(
        idx, ("crawl", "data"), top=5, id_col="id", text_col="content"
    ).to_pandas()
    assert 0 < len(hits) <= 5
    assert (hits["score"] >= hits["score"].shift(-1).fillna(0)).all()
    # Q4 get-all-docs with cap over the index
    ids = get_all_docs(idx, id_col="id", cap=7).to_pandas()
    assert len(ids) == 7
    assert ids["id"].is_monotonic_increasing
