"""All crawl semantics flags ON simultaneously — redirects, max_depth,
content-mirror dedup, inlink priority, link noise, sitemaps, nofollow,
fault injection — engine vs oracle, plus a mid-crawl resume. Guards
flag INTERACTIONS (the class of bug the round-2 review found in
inlink x max_depth)."""

from __future__ import annotations

import os
import shutil

import numpy as np

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import (
    read_crawl_order,
    read_documents,
    run_crawl,
)

CFG = dict(
    universe=2500,
    n_hosts=18,
    max_waves=3,
    wave_budget=350,
    max_fetches_per_host_per_wave=48,
    seeds_per_host=2,
    emit_index=False,
    inject_faults=True,
    redirect_every=7,
    max_depth=4,
    mirror_every=9,
    dedup_content=True,
    inlink_priority=True,
    link_noise_every=5,
    sitemap_every=4,
    nofollow_every=6,
    # crawler-trap quench interacting with everything above (the low
    # ratio makes the mirror_every=9 dup share trip: 1 -> 5 hosts trap)
    trap_quench=True,
    trap_dup_ratio=0.10,
    trap_min_fetches=6,
)


def _order(out_dir, waves):
    t = read_crawl_order(out_dir, waves)
    return list(
        zip(t["wave"].to_pylist(), t["fetch_ms"].to_pylist(), t["url"].to_pylist())
    )


def test_all_flags_crawl_matches_oracle(tmp_path):
    out = str(tmp_path / "crawl")
    cfg = CrawlConfig(out_dir=out, **CFG)
    res = run_crawl(cfg, fetch_concurrency=2)
    sim = simulate_crawl(cfg)
    assert _order(out, res.waves_run) == sim.order
    assert np.array_equal(res.seen_digest, sim.seen_digest)
    # span sequences of emitted documents match per (url, wave)
    # content-dup rows stay in the engine table FLAGGED (lineage keeps
    # them); the oracle's emitted-document list excludes them
    t = read_documents(out, res.waves_run)
    rows = [d for d in t.to_pylist() if not d["content_dup"]]
    eng_docs = {(d["url"], d["wave"]): d["spans"] for d in rows}
    ora_docs = {(d["url"], d["wave"]): d["spans"] for d in sim.documents}
    assert eng_docs == ora_docs
    assert sum(1 for d in t.to_pylist() if d["content_dup"]) > 0  # flag bites
    # the flags actually bit: some fetch was a redirect, some dup, etc.
    assert len(sim.order) > 0
    assert res.metrics[-1]["trapped_hosts"] > 0  # trap fired amid all flags
    assert res.metrics[-1]["trapped_hosts"] == sim.metrics[-1]["trapped_hosts"]


def test_all_flags_resume_identical(tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    cfg_a = CrawlConfig(out_dir=out_a, **CFG)
    res_a = run_crawl(cfg_a, fetch_concurrency=2)

    cfg_b0 = CrawlConfig(out_dir=out_b, **{**CFG, "max_waves": 1})
    run_crawl(cfg_b0, fetch_concurrency=2)
    shutil.rmtree(os.path.join(out_b, "documents", "wave-0001"), ignore_errors=True)
    cfg_b = CrawlConfig(out_dir=out_b, **CFG)
    res_b = run_crawl(cfg_b, fetch_concurrency=2)

    assert res_b.waves_run == [w for w in res_a.waves_run if w >= 1]
    assert np.array_equal(res_a.seen_digest, res_b.seen_digest)
    assert _order(out_a, res_a.waves_run) == _order(
        out_b, range(max(res_a.waves_run) + 1)
    )
