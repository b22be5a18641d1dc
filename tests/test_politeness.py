"""Politeness semantics: per-host caps, crawl-delay spacing, robots
blocking — the invariants the admission machinery must enforce
(north_rule: per-host politeness priority queue + robots gating)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest

from azure_blob_crawler_ray import synth
from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.functions.urlnorm import split_host_path
from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl
from azure_blob_crawler_ray.state.admission import schedule_wave


@pytest.fixture(scope="module")
def crawl(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("polite"))
    cfg = CrawlConfig(
        universe=2000,
        n_hosts=12,
        max_waves=2,
        wave_budget=300,
        max_fetches_per_host_per_wave=20,
        seeds_per_host=4,
        out_dir=out,
        emit_index=False,
    )
    res = run_crawl(cfg)
    return cfg, res


def test_per_host_cap_enforced(crawl):
    cfg, res = crawl
    order = read_crawl_order(cfg.out_dir, res.waves_run)
    per = defaultdict(int)
    for w, u in zip(order["wave"].to_pylist(), order["url"].to_pylist()):
        per[(w, split_host_path(u)[0])] += 1
    assert max(per.values()) <= cfg.max_fetches_per_host_per_wave


def test_crawl_delay_spacing(crawl):
    """Within a wave, consecutive fetches of one host are spaced by at
    least the host's Crawl-delay (virtual ms)."""
    cfg, res = crawl
    robots = synth.robots_rules(cfg)
    order = read_crawl_order(cfg.out_dir, res.waves_run)
    times = defaultdict(list)
    for w, ms, u in zip(
        order["wave"].to_pylist(), order["fetch_ms"].to_pylist(), order["url"].to_pylist()
    ):
        times[(w, split_host_path(u)[0])].append(ms)
    checked = 0
    for (w, host), ts in times.items():
        delay = robots[host]["crawl_delay_ms"]
        ts = sorted(ts)
        for a, b in zip(ts, ts[1:]):
            assert b - a >= delay, (host, a, b, delay)
            checked += 1
    assert checked > 0


def test_fetches_stay_in_wave_window(crawl):
    cfg, res = crawl
    order = read_crawl_order(cfg.out_dir, res.waves_run)
    for w, ms in zip(order["wave"].to_pylist(), order["fetch_ms"].to_pylist()):
        assert w * cfg.wave_duration_ms <= ms < (w + 1) * cfg.wave_duration_ms


def test_robots_disallowed_paths_never_fetched(crawl):
    cfg, res = crawl
    robots = synth.robots_rules(cfg)
    order = read_crawl_order(cfg.out_dir, res.waves_run)
    for u in order["url"].to_pylist():
        host, path = split_host_path(u)
        for prefix in robots[host]["disallow"]:
            assert not path.startswith(prefix), (u, prefix)


def test_schedule_wave_respects_next_vtime_across_waves():
    """State carries over: a host throttled at the end of wave 0 cannot
    fetch at the start of wave 1 before its delay expires."""
    nv = {}
    delays = {"h": 40_000}  # 40s delay, 60s wave
    s0 = schedule_wave([("h", 5)], nv, delays, 0, 60_000, per_host_cap=10)
    assert s0["h"] == [0, 40_000]  # only 2 fit the window
    s1 = schedule_wave([("h", 5)], nv, delays, 60_000, 120_000, per_host_cap=10)
    assert s1["h"][0] == 80_000  # waits out the tail of wave 0's delay


def test_actor_calls_are_idempotent_under_task_retry():
    """Ray Data retries group tasks on worker loss; a re-issued admit /
    check_add must replay the original response without re-applying the
    schedule or re-probing the filter (ADVICE r1, crawl.py:131)."""
    import numpy as np
    import ray

    from azure_blob_crawler_ray.state.politeness import PolitenessShard
    from azure_blob_crawler_ray.state.seen import SeenShard

    robots = {"h0.example.com": {"crawl_delay_ms": 100, "disallow": []}}
    p = PolitenessShard.remote(0, robots, 1000, 4)
    hosts = ["h0.example.com"] * 6
    d1 = ray.get(p.admit.remote(hosts, 0))
    snap1 = ray.get(p.snapshot.remote())
    d2 = ray.get(p.admit.remote(hosts, 0))  # simulated task retry
    snap2 = ray.get(p.snapshot.remote())
    assert np.array_equal(d1["admit"], d2["admit"])
    assert np.array_equal(d1["fetch_ms"], d2["fetch_ms"])
    assert snap1 == snap2, "retried admit advanced the virtual clock"

    s = SeenShard.remote(0, 1 << 12)
    h = np.sort(np.array([11, 22, 33], dtype=np.uint64))
    f1 = ray.get(s.check_add.remote(h, 0))
    c1 = ray.get(s.stats.remote())["count"]
    f2 = ray.get(s.check_add.remote(h, 0))  # simulated task retry
    c2 = ray.get(s.stats.remote())["count"]
    assert np.array_equal(f1, f2), "retry saw an already-mutated filter"
    assert f1.all() and c1 == c2 == 3
    # a DIFFERENT wave with the same hashes is a genuine second probe
    f3 = ray.get(s.check_add.remote(h, 1))
    assert not f3.any()
    ray.kill(p)
    ray.kill(s)


def test_admit_hashed_matches_string_path():
    """The narrow-exchange admission (int64 host hashes) must produce
    byte-identical decisions to the string path — same schedule, same
    virtual-clock advance, same replay digest."""
    import numpy as np
    import ray

    from azure_blob_crawler_ray.hashing import hash64
    from azure_blob_crawler_ray.state.politeness import PolitenessShard

    robots = {
        f"h{i}.example.com": {"crawl_delay_ms": 100 + 37 * i, "disallow": []}
        for i in range(4)
    }
    hosts = [f"h{i % 4}.example.com" for i in [0, 1, 0, 2, 3, 0, 1, 2, 0, 3]]
    hh = hash64(hosts)

    p_str = PolitenessShard.remote(0, robots, 1000, 4)
    p_hash = PolitenessShard.remote(0, robots, 1000, 4)
    for wave in range(3):
        d_s = ray.get(p_str.admit.remote(hosts, wave))
        d_h = ray.get(p_hash.admit_hashed.remote(hh, wave))
        assert np.array_equal(d_s["admit"], d_h["admit"])
        assert np.array_equal(d_s["fetch_ms"], d_h["fetch_ms"])
    assert ray.get(p_str.snapshot.remote())["next_vtime"] == ray.get(
        p_hash.snapshot.remote()
    )["next_vtime"]

    # unknown hash -> loud failure, not a silent wrong decision
    import pytest as _pytest

    with _pytest.raises(Exception):
        ray.get(p_hash.admit_hashed.remote(np.array([12345], dtype=np.uint64), 9))


def test_admit_hashed_matches_string_path_large_random():
    """Property-scale twin for the vectorized admission: 5,000 rows over
    60 hosts (occurrences far beyond the per-host cap, mixed crawl
    delays, several waves so the virtual clock carries) — decisions,
    clock state, and the hashed path's own replay must all match the
    sequential string path row for row."""
    import numpy as np
    import ray

    from azure_blob_crawler_ray.hashing import hash64
    from azure_blob_crawler_ray.state.politeness import PolitenessShard

    rng = np.random.default_rng(7)
    robots = {
        f"h{i:03d}.example.com": {
            "crawl_delay_ms": int(rng.integers(50, 1000)),
            "disallow": [],
        }
        for i in range(60)
    }
    names = list(robots)
    p_str = PolitenessShard.remote(0, robots, 2000, 16)
    p_hash = PolitenessShard.remote(0, robots, 2000, 16)
    for wave in range(3):
        hosts = [names[i] for i in rng.integers(0, 60, size=5000)]
        hh = hash64(hosts)
        d_s = ray.get(p_str.admit.remote(hosts, wave))
        d_h = ray.get(p_hash.admit_hashed.remote(hh, wave))
        assert np.array_equal(d_s["admit"], d_h["admit"])
        assert np.array_equal(d_s["fetch_ms"], d_h["fetch_ms"])
        # hashed-path replay: a retried task gets the recorded decision
        d_r = ray.get(p_hash.admit_hashed.remote(hh, wave))
        assert np.array_equal(d_h["fetch_ms"], d_r["fetch_ms"])
    assert ray.get(p_str.snapshot.remote())["next_vtime"] == ray.get(
        p_hash.snapshot.remote()
    )["next_vtime"]
    ray.kill(p_str)
    ray.kill(p_hash)
