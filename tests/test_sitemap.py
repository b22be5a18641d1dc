"""Sitemap seeding (robots `Sitemap:` directive -> extra wave-0 seeds):
engine == oracle with the flag on, gate is the PARSED robots text, and
the default-off path is byte-identical to the pre-sitemap engine."""

from __future__ import annotations

import numpy as np
import pytest

from azure_blob_crawler_ray import synth
from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.functions.robots import parse_robots_txt, render_robots_txt
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


def test_parse_render_sitemap_roundtrip():
    rules = {
        "crawl_delay_ms": 250,
        "disallow": ["/p/3/"],
        "sitemaps": ["https://h0.example/sitemap.xml"],
    }
    back = parse_robots_txt(render_robots_txt(rules))
    assert back == rules


def test_sitemap_lines_apply_file_wide():
    text = "Sitemap: https://x/s.xml\nUser-agent: other\nDisallow: /q/\n"
    rules = parse_robots_txt(text)
    assert rules["sitemaps"] == ["https://x/s.xml"]
    assert rules["disallow"] == []  # non-* group ignored


def test_default_off_is_identity():
    cfg = CrawlConfig(out_dir="/tmp/unused", **CFG)
    robots = synth.robots_rules(cfg)
    assert np.array_equal(synth.all_seed_uids(cfg, robots), synth.seed_uids(cfg))
    assert all(not r.get("sitemaps") for r in robots.values())


def test_gate_is_the_parsed_robots_text():
    cfg = CrawlConfig(out_dir="/tmp/unused", sitemap_every=3, **CFG)
    robots = synth.robots_rules(cfg)
    advertised = {h for h, r in robots.items() if r.get("sitemaps")}
    assert advertised  # every 3rd host
    with_gate = synth.sitemap_seed_uids(cfg, robots)
    assert len(with_gate) > 0
    # strip the directive from the TEXT -> parser yields nothing -> no seeds
    stripped = {h: {**r, "sitemaps": []} for h, r in robots.items()}
    assert len(synth.sitemap_seed_uids(cfg, stripped)) == 0


def test_sitemap_crawl_matches_oracle(tmp_path):
    out = str(tmp_path / "crawl")
    cfg = CrawlConfig(out_dir=out, sitemap_every=3, **CFG)
    res = run_crawl(cfg, fetch_concurrency=2)
    sim = simulate_crawl(cfg)
    t = read_crawl_order(out, res.waves_run)
    eng = list(zip(t["wave"].to_pylist(), t["fetch_ms"].to_pylist(), t["url"].to_pylist()))
    assert eng == sim.order
    assert np.array_equal(res.seen_digest, sim.seen_digest)

    # sitemap URLs widen the wave-0 frontier vs the same cfg without
    cfg_off = CrawlConfig(out_dir=str(tmp_path / "off"), **CFG)
    sim_off = simulate_crawl(cfg_off)
    extra = synth.sitemap_seed_uids(cfg, synth.robots_rules(cfg))
    assert len(sim.order) >= len(sim_off.order)
    assert len(extra) > 0
