"""rel=nofollow semantics: marked link targets are extracted-but-not-
followed; default-off is byte-identical; engine == oracle with it on."""

from __future__ import annotations

import numpy as np

from azure_blob_crawler_ray import synth
from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.functions.links import extract_links
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import run_crawl, read_crawl_order

CFG = dict(
    universe=1500,
    n_hosts=15,
    max_waves=2,
    wave_budget=300,
    max_fetches_per_host_per_wave=32,
    seeds_per_host=2,
    emit_index=False,
)


def test_extract_links_drops_marked_urls():
    text = (
        "intro LINK: https://h0/a.txt words\n"
        "NOFOLLOW: https://h1/b.txt\n"
        "more LINK: https://h2/c.txt and NOFOLLOW: https://h3/d.txt tail"
    )
    assert extract_links(text) == ["https://h0/a.txt", "https://h2/c.txt"]


def test_unmarked_occurrence_wins():
    text = "NOFOLLOW: https://h1/x.txt then later LINK: https://h1/x.txt"
    assert extract_links(text) == ["https://h1/x.txt"]


def test_default_off_payloads_identical():
    cfg_off = CrawlConfig(out_dir="/tmp/unused", **CFG)
    cfg_off2 = CrawlConfig(out_dir="/tmp/unused", nofollow_every=0, **CFG)
    for uid in [3, 17, 123, 999]:
        assert synth.payload_for(uid, cfg_off) == synth.payload_for(uid, cfg_off2)


def test_nofollow_reduces_discovered_links():
    cfg = CrawlConfig(out_dir="/tmp/unused", nofollow_every=2, **CFG)
    cfg_off = CrawlConfig(out_dir="/tmp/unused", **CFG)
    from azure_blob_crawler_ray.oracle.ref_extract import extract

    fewer = 0
    total_pages = 0
    for uid in range(200):
        urls, _, _ = synth.urls_for(np.array([uid]), cfg)
        name = urls[0].split("://", 1)[1]
        p_on, _ = synth.payload_for(uid, cfg)
        p_off, _ = synth.payload_for(uid, cfg_off)
        l_on = extract_links(extract(name, p_on).full_content)
        l_off = extract_links(extract(name, p_off).full_content)
        assert set(l_on) <= set(l_off)
        total_pages += 1
        if len(l_on) < len(l_off):
            fewer += 1
    assert fewer > 0  # the flag actually bites somewhere


def test_nofollow_crawl_matches_oracle(tmp_path):
    out = str(tmp_path / "crawl")
    cfg = CrawlConfig(out_dir=out, nofollow_every=3, **CFG)
    res = run_crawl(cfg, fetch_concurrency=2)
    sim = simulate_crawl(cfg)
    t = read_crawl_order(out, res.waves_run)
    eng = list(zip(t["wave"].to_pylist(), t["fetch_ms"].to_pylist(), t["url"].to_pylist()))
    assert eng == sim.order
    assert np.array_equal(res.seen_digest, sim.seen_digest)
