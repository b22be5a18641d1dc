"""Cross-wave content dedup (mirror detection): mirrored URLs serve
byte-identical payloads; with cfg.dedup_content the first fetch of a
fingerprint (in canonical fetch order) is the keeper, every later
carrier — same wave or later waves — is marked content_dup. Engine must
equal oracle/frontier_sim shard-for-shard (same cuckoo transitions)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from azure_blob_crawler_ray import synth
from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl
from azure_blob_crawler_ray.storage import read_table_arrow


def _cfg(out, **kw):
    base = dict(
        universe=1500,
        n_hosts=15,
        max_waves=3,
        wave_budget=300,
        max_fetches_per_host_per_wave=48,
        seeds_per_host=2,
        out_dir=out,
        emit_index=False,
        mirror_every=3,
        mirror_groups=8,
        dedup_content=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _raw_docs(out_dir, waves):
    return pa.concat_tables(
        read_table_arrow(os.path.join(out_dir, "documents", f"wave-{w:04d}"))
        for w in waves
    ).to_pandas()


@pytest.fixture(scope="module")
def run_pair():
    out = "/tmp/abc_test_content_dedup"
    shutil.rmtree(out, ignore_errors=True)
    cfg = _cfg(out)
    return cfg, run_crawl(cfg), simulate_crawl(cfg)


def test_content_dedup_conformance(run_pair):
    cfg, r, sim = run_pair
    order = read_crawl_order(cfg.out_dir, r.waves_run).to_pandas()
    assert list(zip(order["wave"], order["url"])) == [
        (w, u) for (w, _ms, u) in sim.order
    ]
    assert np.array_equal(r.seen_digest, sim.seen_digest)
    assert [m["content_dups"] for m in r.metrics] == [
        m["content_dups"] for m in sim.metrics
    ]
    assert sum(m["content_dups"] for m in r.metrics) > 0  # must actually fire


def test_content_dedup_keepers_match_sim(run_pair):
    cfg, r, sim = run_pair
    docs = _raw_docs(cfg.out_dir, r.waves_run)
    keep = docs[(~docs["skipped"]) & (~docs["content_dup"])]
    assert sorted(zip(keep["wave"], keep["doc_id"])) == sorted(
        (d["wave"], d["doc_id"]) for d in sim.documents
    )
    # every marked dup shares its fingerprint with some keeper
    dups = docs[docs["content_dup"]]
    assert len(dups) > 0
    assert set(dups["content_fp"]) <= set(keep["content_fp"])


def test_content_dedup_resume_restores_shards():
    out = "/tmp/abc_test_content_resume"
    shutil.rmtree(out, ignore_errors=True)
    run_crawl(_cfg(out, max_waves=2))
    r = run_crawl(_cfg(out, max_waves=3))  # resumes wave 2 only
    sim = simulate_crawl(_cfg(out + "_sim"))
    docs = _raw_docs(out, range(3))
    keep = docs[(~docs["skipped"]) & (~docs["content_dup"])]
    assert sorted(zip(keep["wave"], keep["doc_id"])) == sorted(
        (d["wave"], d["doc_id"]) for d in sim.documents
    )
    # a fingerprint kept in wave <2 must stay deduped after the resume
    assert [m["content_dups"] for m in r.metrics] == [
        m["content_dups"] for m in sim.metrics[2:]
    ]


def test_mirror_payloads_identical_same_group_and_ext():
    cfg = _cfg("/tmp/unused")
    uids = np.arange(cfg.universe, dtype=np.int64)
    cid = synth.content_uid_of(uids, cfg)
    mirrored = np.flatnonzero(cid != uids)
    assert len(mirrored) > cfg.universe // 6  # ~1/3 of the universe
    exts = synth.ext_for(uids, cfg)
    by_key = {}
    for i in mirrored[:400]:
        by_key.setdefault((int(cid[i]), str(exts[i])), []).append(int(i))
    pairs = [v for v in by_key.values() if len(v) >= 2]
    assert pairs, "mirror groups must collide at this universe size"
    for grp in pairs[:5]:
        payloads = {synth.payload_for(u, cfg)[0] for u in grp[:3]}
        assert len(payloads) == 1  # byte-identical
    # mirror off -> identity (default-path digests untouched)
    cfg_off = _cfg("/tmp/unused", mirror_every=0)
    assert np.array_equal(synth.content_uid_of(uids, cfg_off), uids)
