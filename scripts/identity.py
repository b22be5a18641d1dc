"""Cross-parallelism output-identity evidence (BASELINE.md): run the
bench-sized crawl at two CPU counts in fresh processes and compare the
seen-set digest and crawl-order stream byte-for-byte.

Usage: python scripts/identity.py [cpus ...]   (default: 8 32)
Child mode: python scripts/identity.py --child N
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"

CRAWL_KW = dict(
    universe=2_000_000, n_hosts=1000, max_waves=2, wave_budget=300_000,
    max_fetches_per_host_per_wave=5000, seeds_per_host=50,
    wave_duration_ms=3_600_000, emit_index=False,
)


def child(num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import numpy as np

    from azure_blob_crawler_ray.config import CrawlConfig
    from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl

    out = os.path.join(SCRATCH, f"abc_ident_{num_cpus}")
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(out_dir=out, **CRAWL_KW)
    res = run_crawl(cfg)
    seen = hashlib.sha256(np.sort(res.seen_digest).tobytes()).hexdigest()
    t = read_crawl_order(out, res.waves_run)
    order = hashlib.sha256(
        ("\n".join(
            f"{w}\t{ms}\t{u}" for w, ms, u in zip(
                t["wave"].to_pylist(), t["fetch_ms"].to_pylist(), t["url"].to_pylist()
            )
        )).encode()
    ).hexdigest()
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cpus": num_cpus, "seen": seen, "order": order,
                      "fetched": t.num_rows}))
    ray.shutdown()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
        return 0
    cpus = [int(x) for x in sys.argv[1:]] or [8, 32]
    results = []
    for n in cpus:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True, cwd=REPO, timeout=3000,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    same = (
        len({r["seen"] for r in results}) == 1
        and len({r["order"] for r in results}) == 1
    )
    print(json.dumps({"identical": same, "results": results}))
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
