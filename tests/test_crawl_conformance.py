"""Flagship conformance: the Ray crawl engine reproduces the oracle's
crawl order, seen-set digest, final frontier and span sequences under the
same seed list + politeness budget (BASELINE.json north_rule), and a
killed run resumes identically (SURVEY.md §5.3-5.4)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import run_crawl
from azure_blob_crawler_ray.storage import read_table_arrow


CFG = dict(
    universe=800,
    n_hosts=12,
    max_waves=2,
    wave_budget=200,
    max_fetches_per_host_per_wave=32,
    seeds_per_host=2,
    emit_index=False,
)


def _engine_order(out_dir, waves):
    from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order

    t = read_crawl_order(out_dir, waves)
    return list(
        zip(t["wave"].to_pylist(), t["fetch_ms"].to_pylist(), t["url"].to_pylist())
    )


def _engine_docs(out_dir, waves):
    from azure_blob_crawler_ray.pipelines.crawl import read_documents

    t = read_documents(out_dir, waves)
    return {(d["url"], d["wave"]): d["spans"] for d in t.to_pylist()}


@pytest.fixture(scope="module")
def crawl_pair(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    cfg = CrawlConfig(out_dir=out, **CFG)
    res = run_crawl(cfg, fetch_concurrency=2)
    sim = simulate_crawl(cfg)
    return cfg, res, sim


def test_crawl_order_matches_oracle(crawl_pair):
    cfg, res, sim = crawl_pair
    assert _engine_order(cfg.out_dir, res.waves_run) == sim.order


def test_seen_digest_matches_oracle(crawl_pair):
    cfg, res, sim = crawl_pair
    assert np.array_equal(res.seen_digest, sim.seen_digest)


def test_final_frontier_matches_oracle(crawl_pair):
    cfg, res, sim = crawl_pair
    last = max(res.waves_run)
    ff = read_table_arrow(os.path.join(cfg.out_dir, "ckpt", f"wave-{last:04d}", "frontier"))
    assert sorted(ff["url"].to_pylist()) == sim.final_frontier


def test_span_sequences_match_oracle(crawl_pair):
    # per-row invariant: (kind, text, media_ref, order) equality
    cfg, res, sim = crawl_pair
    eng = _engine_docs(cfg.out_dir, res.waves_run)
    ora = {(d["url"], d["wave"]): d["spans"] for d in sim.documents}
    assert set(eng) == set(ora)
    for k, spans in ora.items():
        assert eng[k] == spans, f"span mismatch for {k}"


def test_per_wave_metrics_match(crawl_pair):
    cfg, res, sim = crawl_pair
    for m_e, m_o in zip(res.metrics, sim.metrics):
        for key in ("frontier", "robots_blocked", "admitted", "docs"):
            assert m_e[key] == m_o[key], (key, m_e, m_o)


def test_resume_mid_crawl_identical(tmp_path):
    """Kill after wave 0, resume, and compare against the one-shot run."""
    out_a = str(tmp_path / "oneshot")
    out_b = str(tmp_path / "resumed")
    cfg_a = CrawlConfig(out_dir=out_a, **CFG)
    res_a = run_crawl(cfg_a, fetch_concurrency=2)

    # run only wave 0, then "crash" and resume for the remaining waves
    cfg_b0 = CrawlConfig(out_dir=out_b, **{**CFG, "max_waves": 1})
    run_crawl(cfg_b0, fetch_concurrency=2)
    # drop any partially-written non-checkpoint output of a would-be wave 1
    shutil.rmtree(os.path.join(out_b, "documents", "wave-0001"), ignore_errors=True)
    cfg_b = CrawlConfig(out_dir=out_b, **CFG)
    res_b = run_crawl(cfg_b, fetch_concurrency=2)

    assert res_b.waves_run == [w for w in res_a.waves_run if w >= 1]
    assert np.array_equal(res_a.seen_digest, res_b.seen_digest)
    assert _engine_order(out_a, res_a.waves_run) == _engine_order(
        out_b, range(max(res_a.waves_run) + 1)
    )
    assert _engine_docs(out_a, res_a.waves_run) == _engine_docs(
        out_b, range(max(res_a.waves_run) + 1)
    )


def test_scale_job_shape_matches_oracle(tmp_path):
    """A 1/100-size replica of bench.py's SCALE_KW job (same shape
    ratios: 1000->10 hosts, raised cuckoo_buckets, budget-binding
    wave_budget, high per-host cap, long wave) — the 8->32 scaling
    metric's job class must itself be oracle-conformant, not only the
    headline config."""
    out = str(tmp_path / "scale_mini")
    cfg = CrawlConfig(
        out_dir=out,
        universe=80_000,
        n_hosts=10,
        max_waves=2,
        wave_budget=12_000,
        max_fetches_per_host_per_wave=20_000,
        seeds_per_host=200,
        wave_duration_ms=3_600_000,
        emit_index=False,
        cuckoo_buckets=1 << 14,
    )
    res = run_crawl(cfg)
    sim = simulate_crawl(cfg)
    assert np.array_equal(res.seen_digest, sim.seen_digest)
    order = _engine_order(out, res.waves_run)
    assert order == sim.order
