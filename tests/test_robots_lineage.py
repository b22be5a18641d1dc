"""robots.txt parser + typed lineage table."""

from __future__ import annotations

import numpy as np

from azure_blob_crawler_ray.functions.robots import (
    parse_robots_txt,
    render_robots_txt,
)


def test_parse_basic():
    txt = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 1.5
"""
    r = parse_robots_txt(txt)
    assert r["crawl_delay_ms"] == 1500
    assert r["disallow"] == ["/private/", "/tmp/"]


def test_parse_ignores_other_agents():
    txt = """
User-agent: badbot
Disallow: /
User-agent: *
Disallow: /x/
"""
    r = parse_robots_txt(txt)
    assert r["disallow"] == ["/x/"]


def test_empty_disallow_means_allow_all():
    r = parse_robots_txt("User-agent: *\nDisallow:\n")
    assert r["disallow"] == []


def test_render_parse_roundtrip():
    for rules in (
        {"crawl_delay_ms": 50, "disallow": [], "sitemaps": []},
        {"crawl_delay_ms": 999, "disallow": ["/p/1/", "/p/42/"], "sitemaps": []},
        {"crawl_delay_ms": 1000, "disallow": ["/a"], "sitemaps": []},
    ):
        assert parse_robots_txt(render_robots_txt(rules)) == rules


def test_synth_rules_roundtrip_through_text():
    from azure_blob_crawler_ray import synth
    from azure_blob_crawler_ray.config import CrawlConfig
    from azure_blob_crawler_ray.functions.robots import parse_all

    cfg = CrawlConfig(n_hosts=25)
    rules = synth.robots_rules(cfg)
    texts = synth.robots_txt(cfg)
    assert parse_all(texts) == rules
    assert len(rules) == 25
    delays = [r["crawl_delay_ms"] for r in rules.values()]
    assert all(50 <= d <= 1000 for d in delays)


def test_lineage_table_written(tmp_path):
    from azure_blob_crawler_ray.config import CrawlConfig
    from azure_blob_crawler_ray.pipelines.crawl import read_lineage, run_crawl
    from azure_blob_crawler_ray.schemas import LINEAGE

    cfg = CrawlConfig(
        universe=600, n_hosts=8, max_waves=2, wave_budget=150,
        seeds_per_host=2, out_dir=str(tmp_path / "c"), emit_index=False,
    )
    res = run_crawl(cfg)
    lin = read_lineage(cfg.out_dir)
    assert lin.schema.equals(LINEAGE)
    assert lin["wave"].to_pylist() == res.waves_run
    for row, m in zip(lin.to_pylist(), res.metrics):
        assert row["admitted"] == m["admitted"]
        assert row["docs"] == m["docs"]
