"""Host-cardinality probe (round-5 task #3): politeness/seen state at
100k+ hosts.  crawl_skew exercises 200 hosts; a 100 TB crawl has
10^7-10^8.  This probe runs the same crawl job at 1k / 10k / 100k
power-law hosts (fixed universe and budget, so the work per level is
comparable) and records, per level:

  * wall + urls/sec (does admission cost curve with host count?)
  * per-wave admission phase seconds (t_cap + t_admit — the phases that
    touch the politeness actors)
  * per-shard politeness state: hosts in the shard's sliced vocabulary
    (must be ~total/num_shards after the round-5 vocabulary slicing)
    and actor RSS (must stay flat-ish, not multiply by host count)
  * seen-shard RSS (cuckoo capacity-bound, host-independent)

plus one CONFORMANCE run at 20k hosts (100x crawl_skew's cardinality):
engine seen-digest and crawl order equal oracle/frontier_sim.

Usage: python scripts/host_probe.py [--quick]
Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def probe_level(n_hosts: int, cpus: int) -> dict:
    from azure_blob_crawler_ray.config import CrawlConfig
    from azure_blob_crawler_ray.pipelines.crawl import run_crawl

    out = os.path.join(SCRATCH, f"abc_hostprobe_{n_hosts}")
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(
        universe=1_000_000,
        n_hosts=n_hosts,
        zipf_s=1.25,  # power-law host sizes, like the skew bench
        max_waves=2,
        wave_budget=150_000,
        max_fetches_per_host_per_wave=2_000,
        seeds_per_host=max(1, 40_000 // n_hosts),
        wave_duration_ms=3_600_000,
        out_dir=out,
        emit_index=False,
    )
    t0 = time.time()
    res = run_crawl(cfg)
    wall = time.time() - t0
    fetched = sum(m["admitted"] for m in res.metrics)
    pol = res.state_stats["politeness"]
    seen = res.state_stats["seen"]
    shutil.rmtree(out, ignore_errors=True)
    return {
        "n_hosts": n_hosts,
        "wall_s": round(wall, 2),
        "fetched": fetched,
        "urls_per_sec": round(fetched / wall, 1),
        "admission_s_per_wave": [
            round(m.get("t_cap", 0.0) + m.get("t_admit", 0.0), 2)
            for m in res.metrics
        ],
        "pol_hosts_per_shard": {
            "min": min(p["hosts_known"] for p in pol),
            "max": max(p["hosts_known"] for p in pol),
            "total": sum(p["hosts_known"] for p in pol),
        },
        "pol_rss_mb": {
            "min": min(p["rss_mb"] for p in pol),
            "max": max(p["rss_mb"] for p in pol),
        },
        "seen_rss_mb_max": max(s["rss_mb"] for s in seen),
    }


def conformance(n_hosts: int = 20_000) -> dict:
    from azure_blob_crawler_ray.config import CrawlConfig
    from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
    from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl

    out = os.path.join(SCRATCH, "abc_hostprobe_conf")
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(
        universe=100_000,
        n_hosts=n_hosts,
        zipf_s=1.25,
        max_waves=2,
        wave_budget=20_000,
        max_fetches_per_host_per_wave=64,
        seeds_per_host=1,
        wave_duration_ms=3_600_000,
        out_dir=out,
        emit_index=False,
    )
    r = run_crawl(cfg)
    sim = simulate_crawl(cfg)
    digest_ok = bool(np.array_equal(r.seen_digest, sim.seen_digest))
    order = read_crawl_order(out, r.waves_run).to_pandas()
    order_ok = len(order) == len(sim.order)
    if order_ok:
        got = list(zip(order["wave"], order["fetch_ms"], order["url"]))
        order_ok = got == [(w, t, u) for (w, t, u) in sim.order]
    shutil.rmtree(out, ignore_errors=True)
    return {
        "n_hosts": n_hosts,
        "fetches": len(order),
        "seen_digest_equal": digest_ok,
        "crawl_order_equal": bool(order_ok),
    }


def main() -> None:
    quick = "--quick" in sys.argv
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    levels = [1_000, 10_000] if quick else [1_000, 10_000, 100_000]
    out = {
        "levels": [probe_level(n, cpus) for n in levels],
        "conformance": conformance(2_000 if quick else 20_000),
        "num_cpus": cpus,
    }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
