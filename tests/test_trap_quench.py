"""Crawler-trap quench: a host whose wave yields mostly content-duplicate
documents (mirror/calendar/session-id traps) is dropped from every later
frontier. Engine must equal oracle/frontier_sim: same trapped hosts, same
crawl order, same seen digest, same per-wave trap metrics — and resuming
a killed run must restore the trapped set from the checkpoint."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl


def _cfg(out, **kw):
    # mirror_every=2 / 4 groups: ~half the urls serve shared payloads,
    # so per-host dup share scatters around the 0.5 bar — a mixed
    # trapped/untrapped web (oracle probe: 2 -> 3 -> 6 of 8 hosts trap).
    base = dict(
        universe=4000,
        n_hosts=8,
        max_waves=3,
        wave_budget=600,
        max_fetches_per_host_per_wave=96,
        seeds_per_host=12,
        out_dir=out,
        emit_index=False,
        mirror_every=2,
        mirror_groups=4,
        dedup_content=True,
        trap_quench=True,
        trap_min_fetches=12,
        trap_dup_ratio=0.5,
    )
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def trap_pair():
    out = "/tmp/abc_test_trap_quench"
    shutil.rmtree(out, ignore_errors=True)
    cfg = _cfg(out)
    return cfg, run_crawl(cfg), simulate_crawl(cfg)


def test_trap_conformance(trap_pair):
    cfg, r, sim = trap_pair
    order = read_crawl_order(cfg.out_dir, r.waves_run).to_pandas()
    assert list(zip(order["wave"], order["fetch_ms"], order["url"])) == sim.order
    assert np.array_equal(r.seen_digest, sim.seen_digest)
    for m_e, m_o in zip(r.metrics, sim.metrics):
        for key in ("frontier", "admitted", "docs", "trapped_hosts"):
            assert m_e[key] == m_o[key], (key, m_e, m_o)
        # wave 0 has no trapped hosts yet -> no trap_blocked key mismatch
        assert m_e.get("trap_blocked", 0) == m_o.get("trap_blocked", 0)


def test_trap_actually_fires(trap_pair):
    cfg, r, sim = trap_pair
    assert r.metrics[-1]["trapped_hosts"] > 0
    assert sum(m.get("trap_blocked", 0) for m in r.metrics) > 0
    # quench is real: at least one host fetched in wave 0 never appears
    # in a later wave's order
    order = read_crawl_order(cfg.out_dir, r.waves_run).to_pandas()
    host_of = order["url"].str.split("/").str[2]
    w0 = set(host_of[order["wave"] == 0])
    later = set(host_of[order["wave"] > 0])
    assert w0 - later, "no host was quenched"


def test_trap_off_is_noop():
    """trap_quench=False must byte-match the pre-feature behavior — and a
    trap run differs from it (the feature changes the crawl)."""
    out_a = "/tmp/abc_test_trap_off"
    shutil.rmtree(out_a, ignore_errors=True)
    cfg_off = _cfg(out_a, trap_quench=False)
    r_off = run_crawl(cfg_off)
    sim_off = simulate_crawl(cfg_off)
    assert np.array_equal(r_off.seen_digest, sim_off.seen_digest)
    assert all("trapped_hosts" not in m for m in r_off.metrics)
    assert all("trapped_hosts" not in m for m in sim_off.metrics)


def test_trap_resume_restores_state(tmp_path):
    """Kill after wave 1 (traps already detected), resume wave 2: the
    trapped set must come back from trapped.json and the full crawl must
    equal the uninterrupted run."""
    out_a = str(tmp_path / "oneshot")
    out_b = str(tmp_path / "resumed")
    cfg_a = _cfg(out_a)
    r_a = run_crawl(cfg_a)

    run_crawl(_cfg(out_b, max_waves=2))
    # partial non-checkpoint output of a would-be wave 2 can't exist: the
    # wave marker commits last; just resume
    r_b = run_crawl(_cfg(out_b))
    assert np.array_equal(r_a.seen_digest, r_b.seen_digest)
    # waves_run only lists waves the resumed PROCESS executed; the
    # persisted output covers all of them
    order_a = read_crawl_order(out_a, r_a.waves_run).to_pandas()
    order_b = read_crawl_order(out_b, range(max(r_a.waves_run) + 1)).to_pandas()
    assert order_a.equals(order_b)
    assert [m["trapped_hosts"] for m in r_a.metrics][-1] == r_b.metrics[-1][
        "trapped_hosts"
    ]
    assert os.path.exists(os.path.join(out_b, "ckpt", "wave-0001", "trapped.json"))


def test_trap_quench_requires_dedup_content():
    """trap_quench without dedup_content would leave the engine's
    trapped_hosts wave metric unemitted while the oracle emits 0 —
    the config rejects the combination instead of diverging."""
    with pytest.raises(ValueError, match="requires dedup_content"):
        _cfg("/tmp/abc_never", dedup_content=False)
