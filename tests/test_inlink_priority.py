"""Inlink-count frontier prioritization (cfg.inlink_priority):
engine == oracle under the boosted-priority crawl order, and the
default-off path stays byte-identical to the unboosted semantics."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl
from azure_blob_crawler_ray.storage import read_table


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
        inlink_priority=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _engine_order(out_dir, waves):
    t = read_crawl_order(out_dir, waves)
    return list(
        zip(t["wave"].to_pylist(), t["fetch_ms"].to_pylist(), t["url"].to_pylist())
    )


@pytest.fixture(scope="module")
def inlink_pair(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("inlink") / "crawl")
    cfg = _cfg(out)
    res = run_crawl(cfg)
    sim = simulate_crawl(cfg)
    yield cfg, res, sim
    shutil.rmtree(out, ignore_errors=True)


def test_inlink_order_matches_oracle(inlink_pair):
    cfg, res, sim = inlink_pair
    assert _engine_order(cfg.out_dir, res.waves_run) == sim.order


def test_inlink_seen_digest_matches(inlink_pair):
    cfg, res, sim = inlink_pair
    assert np.array_equal(res.seen_digest, sim.seen_digest)


def test_inlink_final_frontier_matches(inlink_pair):
    import os

    cfg, res, sim = inlink_pair
    ff = read_table(
        os.path.join(cfg.out_dir, "ckpt", f"wave-{res.waves_run[-1]:04d}", "frontier")
    ).to_pandas()
    assert sorted(ff["url"].tolist()) == sim.final_frontier


def test_inlink_boost_changes_order(tmp_path):
    """The flag must actually matter: boosted priorities reorder the
    crawl relative to depth-only priorities on a linky web."""
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    on = simulate_crawl(_cfg(out_a))
    off = simulate_crawl(_cfg(out_b, inlink_priority=False))
    assert on.order != off.order


def test_inlink_priority_values(tmp_path):
    """Fresh frontier rows carry (1+min(inlinks,cap))/(1+depth); a
    multiply-discovered URL must outrank a singly-discovered one at the
    same depth."""
    import os

    out = str(tmp_path / "c")
    cfg = _cfg(out, max_waves=1)
    res = run_crawl(cfg)
    ff = read_table(
        os.path.join(out, "ckpt", "wave-0000", "frontier")
    ).to_pandas()
    fresh = ff[ff["discovered_at"] == 1]
    if len(fresh):
        # boosted priorities are >= the unboosted 1/(1+depth) floor and
        # integer multiples of it
        base = 1.0 / (1.0 + fresh["depth"].to_numpy().astype(np.float32))
        ratio = fresh["priority"].to_numpy() / base
        assert np.all(ratio >= 1.0 - 1e-6)
        assert np.allclose(ratio, np.round(ratio), atol=1e-4)
    shutil.rmtree(out, ignore_errors=True)


def test_inlink_with_max_depth_matches_oracle(tmp_path):
    """The two flags interact: occurrence partials of deep duplicate
    discoveries must still count when the URL's global min depth passes
    the trap guard (the guard moves to the probe router)."""
    out = str(tmp_path / "dm")
    cfg = _cfg(out, max_depth=2, max_waves=3)
    res = run_crawl(cfg)
    sim = simulate_crawl(cfg)
    assert _engine_order(cfg.out_dir, res.waves_run) == sim.order
    assert np.array_equal(res.seen_digest, sim.seen_digest)
    shutil.rmtree(out, ignore_errors=True)
