"""Continuous-crawl scale probe: per-epoch cost vs accumulated history.

The composition's 100 TB claim is that an epoch costs O(epoch delta),
not O(corpus so far): the dedup probe co-partitions against the
persisted band index (reads only its own shard dirs, never reshuffles
history) and the IVF append assigns with saved centroids (never
re-clusters). This probe runs 6 epochs of the same-sized evolving web
through one state dir and reports per-epoch wall + the index size it
ran against — flat walls over a 6x-grown index back the claim.

Usage: python scripts/continuous_probe.py
Prints one JSON line; record in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from azure_blob_crawler_ray.config import CrawlConfig
    from azure_blob_crawler_ray.pipelines import continuous

    state = os.path.join(SCRATCH, "abc_cont_probe")
    shutil.rmtree(state, ignore_errors=True)
    cfg = CrawlConfig(
        universe=60_000,
        n_hosts=50,
        max_waves=2,
        wave_budget=8_000,
        max_fetches_per_host_per_wave=400,
        seeds_per_host=4,
        out_dir="",
        emit_index=False,
        inject_faults=False,
        change_every=3,
    )
    epochs = 6
    walls, idx_bytes, docs = [], [], []
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    for e in range(epochs):
        t0 = time.time()
        res = continuous.continuous_crawl(
            cfg, state, epochs=e + 1, num_shards=16, num_centroids=16,
            compact_after=2,
        )
        walls.append(round(time.time() - t0, 2))
        idx_bytes.append(
            _dir_bytes(os.path.join(state, "dedup_index"))
            + _dir_bytes(os.path.join(state, "ivf_index"))
        )
        docs.append(res.docs_per_epoch[-1] if res.docs_per_epoch else 0)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    v = continuous.continuous_verdicts(state, epochs).to_pandas()
    shutil.rmtree(state, ignore_errors=True)
    ray.shutdown()
    print(
        json.dumps(
            {
                "epochs": epochs,
                "per_epoch_wall_s": walls,
                "per_epoch_docs": docs,
                "index_bytes_after_epoch": idx_bytes,
                "wall_last_over_first": round(walls[-1] / walls[0], 2),
                "total_verdicts": len(v),
                "total_dups": int(v["is_dup"].sum()),
                "driver_rss_mb_start": rss0,
                "driver_rss_mb_end": rss1,
                "num_cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
