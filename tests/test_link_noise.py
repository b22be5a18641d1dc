"""URL-variant collapsing (clean_url / link_noise_every): engine ==
oracle under noisy links, and a noisy web crawls IDENTICALLY to the
clean web (the whole point of the cleaning pass)."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.functions.urlnorm import clean_url, clean_urls_arrow
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl


def test_clean_url_examples():
    assert clean_url("https://h/p/1/2.txt") == "https://h/p/1/2.txt"
    assert clean_url("https://h/p/1/2.txt?utm=s3") == "https://h/p/1/2.txt"
    assert clean_url("https://h/p/1/2.txt#sec4") == "https://h/p/1/2.txt"
    assert clean_url("https://h/p/1/2.txt?utm=s3#sec4") == "https://h/p/1/2.txt"
    # semantic (non-tracking) queries survive
    assert clean_url("https://h/p?page=2") == "https://h/p?page=2"
    assert clean_url("https://h/p?page=2#top") == "https://h/p?page=2"


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet="abc/?#=&_.0123456789utm",
        min_size=0,
        max_size=40,
    )
)
def test_clean_url_arrow_twin_matches_scalar(path):
    url = "https://h.example.com/" + path
    arrow = clean_urls_arrow(pa.array([url], type=pa.string()))[0].as_py()
    assert arrow == clean_url(url)


def _cfg(out_dir: str, **kw) -> CrawlConfig:
    base = dict(
        universe=2000,
        n_hosts=20,
        max_waves=3,
        wave_budget=300,
        max_fetches_per_host_per_wave=48,
        seeds_per_host=2,
        out_dir=out_dir,
        emit_index=False,
        link_noise_every=3,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _order(out_dir, waves):
    t = read_crawl_order(out_dir, waves)
    return list(
        zip(t["wave"].to_pylist(), t["fetch_ms"].to_pylist(), t["url"].to_pylist())
    )


def test_noisy_web_matches_oracle(tmp_path):
    out = str(tmp_path / "noisy")
    cfg = _cfg(out)
    res = run_crawl(cfg)
    sim = simulate_crawl(cfg)
    assert _order(out, res.waves_run) == sim.order
    assert np.array_equal(res.seen_digest, sim.seen_digest)
    shutil.rmtree(out, ignore_errors=True)


def test_noisy_crawl_equals_clean_crawl(tmp_path):
    """Cleaning makes the noise invisible: same order, same seen set."""
    noisy = simulate_crawl(_cfg(str(tmp_path / "a")))
    clean = simulate_crawl(_cfg(str(tmp_path / "b"), link_noise_every=0))
    assert noisy.order == clean.order
    assert np.array_equal(noisy.seen_digest, clean.seen_digest)
    assert noisy.final_frontier == clean.final_frontier
