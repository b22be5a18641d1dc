"""Incremental refresh crawl: changed-content detection vs the synth
ground truth, 304-style skip counts, and epoch determinism."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from azure_blob_crawler_ray import synth
from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.pipelines.crawl import run_crawl
from azure_blob_crawler_ray.pipelines.refresh import refresh_crawl
from azure_blob_crawler_ray.sources.fetch import uid_of_url
from azure_blob_crawler_ray.storage import read_table_arrow


@pytest.fixture(scope="module")
def crawled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("refresh") / "base")
    cfg = CrawlConfig(
        universe=2000,
        n_hosts=20,
        max_waves=2,
        wave_budget=400,
        max_fetches_per_host_per_wave=64,
        seeds_per_host=2,
        out_dir=out,
        emit_index=False,
        inject_faults=False,
        change_every=3,  # declared at crawl time; epoch 0 == base text
    )
    run_crawl(cfg)
    yield cfg
    shutil.rmtree(out, ignore_errors=True)


def test_refresh_changed_set_matches_synth_truth(crawled):
    cfg = crawled
    res = refresh_crawl(cfg, cfg.out_dir, content_epoch=1)
    # ground truth: exactly the change_mask subset of crawled doc uids
    changed_tbl = read_table_arrow(os.path.join(res.out_dir, "documents"))
    got = set(changed_tbl["url"].to_pylist())
    doc_root = os.path.join(cfg.out_dir, "documents")
    import pyarrow.compute as pc
    import pyarrow as pa

    all_urls = []
    for w in sorted(os.listdir(doc_root)):
        t = read_table_arrow(os.path.join(doc_root, w))
        all_urls += t.filter(pc.equal(t["skipped"], False))["url"].to_pylist()
    uids = np.array([uid_of_url(u) for u in all_urls], dtype=np.int64)
    # bin docs are metadata-only (ref file_extractor.py:103-106): their
    # observable content is "Binary file: name (0.00MB, bin)" which is
    # epoch-invariant, so a changed payload is NOT a changed document
    exp = {
        u
        for u, m in zip(all_urls, synth.change_mask(uids, cfg))
        if m and not u.endswith(".bin")
    }
    assert got == exp
    assert res.changed == len(exp)
    assert res.checked == len(all_urls)
    assert res.unchanged == len(all_urls) - len(exp)
    assert res.failed == 0
    assert 0 < res.changed < res.checked  # the web actually changed, partially


def test_refresh_epoch_zero_is_noop(crawled):
    cfg = crawled
    res = refresh_crawl(cfg, cfg.out_dir, content_epoch=0)
    assert res.changed == 0
    assert res.unchanged == res.checked


def test_refresh_changed_docs_have_new_spans(crawled):
    cfg = crawled
    res = refresh_crawl(cfg, cfg.out_dir, content_epoch=2)
    changed_tbl = read_table_arrow(os.path.join(res.out_dir, "documents"))
    if changed_tbl.num_rows == 0:
        pytest.skip("no changed docs in this configuration")
    # the re-parsed fingerprint must differ from the stored one for every
    # emitted row (that is the emission criterion), and spans are real
    import pyarrow.compute as pc

    assert changed_tbl.num_rows == res.changed
    assert pc.min(pc.list_value_length(changed_tbl["spans"])).as_py() >= 1


def test_refresh_static_web_all_unchanged(tmp_path):
    out = str(tmp_path / "static")
    cfg = CrawlConfig(
        universe=1000, n_hosts=10, max_waves=1, wave_budget=200,
        seeds_per_host=2, out_dir=out, emit_index=False,
        inject_faults=False,  # change_every defaults to 0: static web
    )
    run_crawl(cfg)
    res = refresh_crawl(cfg, out, content_epoch=5)
    assert res.changed == 0 and res.unchanged == res.checked and res.checked > 0
    shutil.rmtree(out, ignore_errors=True)


def test_refresh_emit_index_only_changed(crawled, tmp_path):
    cfg = crawled
    res = refresh_crawl(
        cfg, cfg.out_dir, content_epoch=3,
        out_dir=str(tmp_path / "ridx"), emit_index=True,
    )
    idx = read_table_arrow(os.path.join(res.out_dir, "index"))
    docs = read_table_arrow(os.path.join(res.out_dir, "documents"))
    assert docs.num_rows == res.changed
    # every index row belongs to a changed doc (ids are {doc_id}_chunk_{i})
    changed_ids = set(docs["doc_id"].to_pylist())
    assert idx.num_rows >= res.changed  # >= 1 chunk per changed doc
    for i in idx["id"].to_pylist()[:50]:
        assert i.rsplit("_chunk_", 1)[0] in changed_ids
