"""Failure taxonomy conformance: transient retries re-enter the frontier,
permanent/exhausted failures dead-letter — identically in engine and
oracle (SURVEY.md §4.1, D3)."""

from __future__ import annotations

import numpy as np
import pytest

from azure_blob_crawler_ray import synth
from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import (
    read_crawl_order,
    read_dead_letter,
    run_crawl,
)

CFG = dict(
    universe=1500,
    n_hosts=10,
    max_waves=3,
    wave_budget=400,
    max_fetches_per_host_per_wave=64,
    seeds_per_host=4,
    emit_index=False,
)


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("faults"))
    cfg = CrawlConfig(out_dir=out, **CFG)
    res = run_crawl(cfg)
    sim = simulate_crawl(cfg)
    return cfg, res, sim


def test_faults_actually_fire(pair):
    cfg, res, sim = pair
    assert sum(m.get("retried", 0) for m in res.metrics) > 0
    assert sum(m.get("dead_lettered", 0) for m in res.metrics) >= 0
    # ~10% of URLs have a nonzero failure threshold
    k = synth.fail_threshold(np.arange(10_000, dtype=np.int64), cfg)
    assert 0.05 < (k > 0).mean() < 0.15
    assert (k == 255).mean() < 0.05


def test_retry_and_dead_letter_counts_match_oracle(pair):
    cfg, res, sim = pair
    for m_e, m_o in zip(res.metrics, sim.metrics):
        assert m_e["retried"] == m_o["retried"], (m_e, m_o)
        assert m_e["dead_lettered"] == m_o["dead_lettered"], (m_e, m_o)


def test_dead_letter_rows_match_oracle(pair):
    cfg, res, sim = pair
    dl = read_dead_letter(cfg.out_dir, res.waves_run)
    eng = sorted(
        zip(dl["wave"].to_pylist(), dl["url"].to_pylist(), dl["status"].to_pylist())
    )
    ora = sorted((w, u, s) for (w, u, s, _a) in sim.dead_letter)
    assert eng == ora


def test_transient_url_eventually_succeeds(pair):
    """A URL with threshold 1 admitted in wave w reappears (retry) and,
    once fetched successfully, produces a document."""
    cfg, res, sim = pair
    order = read_crawl_order(cfg.out_dir, res.waves_run)
    url_attempt_counts = {}
    for u in order["url"].to_pylist():
        url_attempt_counts[u] = url_attempt_counts.get(u, 0) + 1
    multi = [u for u, c in url_attempt_counts.items() if c > 1]
    assert multi, "some URL should have been fetched more than once (retry)"
    doc_urls = {d["url"] for d in sim.documents}
    # every retried-then-successful URL is in documents exactly per oracle
    for u in multi:
        uid = int(u.rsplit("/", 1)[1].split(".")[0])
        k = int(synth.fail_threshold(np.array([uid]), cfg)[0])
        if k != 255 and url_attempt_counts[u] > k:
            assert u in doc_urls


def test_no_faults_when_disabled(tmp_path):
    cfg = CrawlConfig(out_dir=str(tmp_path / "nf"), **{**CFG, "inject_faults": False})
    res = run_crawl(cfg)
    assert sum(m.get("retried", 0) for m in res.metrics) == 0
    assert sum(m.get("dead_lettered", 0) for m in res.metrics) == 0
    sim = simulate_crawl(cfg)
    assert np.array_equal(res.seen_digest, sim.seen_digest)
