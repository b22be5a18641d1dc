"""10x scale probe for the incremental cross-run dedup: run the full
probe+resolve+append cycle over a 1x vs 10x document increment against
a SAME-SIZED pre-seeded index, and show the scale claims hold — wall
grows ~linearly and driver memory stays flat (the driver holds no
dup-set, no pairs, no index; only block metadata).

Documents are key-offset replicas of the sf0.1 documents table with a
per-replica text salt on 9/10 of the rows, so the replica corpus keeps
the original's near-dup density instead of turning into one giant
identical-content cluster (which would stress the mega-bucket fallback,
not the steady-state path).

Each (scale) cell runs in a FRESH subprocess with its own ray.init, so
ru_maxrss is the attributable driver high-water.

Usage: python scripts/incdedup_probe.py [--small 1] [--big 10] [--cpus 32]
Prints one JSON line with walls, rows and driver RSS at both scales.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000
ROOT = "/tmp/incdedup_probe"


def build_docs(dst: str, replicas: int, tag: str) -> int:
    t = pq.read_table(f"{SRC}/documents.parquet", columns=["doc_id", "text"])
    os.makedirs(dst, exist_ok=True)
    ids = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    for r in range(replicas):
        # 1/10 of each replica's rows stay VERBATIM (cross-run exact
        # dups -> rule-1 signal); the rest go through a (tag, replica)-
        # specific letter-permutation cipher — lengths and word
        # structure unchanged, so WITHIN-replica near-dup density is
        # exactly the corpus's own, but shingle sets across replicas
        # are disjoint (a suffix/infix salt would instead inject the
        # same substrings everywhere and inflate cross-doc Jaccard)
        rng = np.random.default_rng(abs(hash((tag, r))) % (2**32))
        letters = "abcdefghijklmnopqrstuvwxyz"
        perm = "".join(rng.permutation(list(letters)))
        cipher = str.maketrans(letters, perm)
        salted = [
            tx if (i + r) % 10 == 0 else tx.translate(cipher)
            for i, tx in enumerate(texts)
        ]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids + r * STRIDE), "text": salted}),
            os.path.join(dst, f"part-{r:04d}.parquet"),
        )
    return t.num_rows * replicas


def run_cell(scale: str, cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from azure_blob_crawler_ray.pipelines import incdedup

    ray.data.range(1000).map_batches(lambda b: b).count()  # absorb startup
    seed_dir = f"{ROOT}/docs_seed"  # 1x seed increment for BOTH scales:
    inc_dir = f"{ROOT}/docs_{scale}"  # the INDEX is same-sized, the
    uri = f"{ROOT}/idx_{scale}"  # increment is what scales
    shutil.rmtree(uri, ignore_errors=True)
    incdedup.minhash_index_append(
        uri, "seed", ray.data.read_parquet(seed_dir), num_shards=32
    )
    t0 = time.perf_counter()
    out = incdedup.incremental_minhash_dedup(
        uri, "inc", ray.data.read_parquet(inc_dir), threshold=0.6,
        num_shards=32,
    )
    df = out.to_pandas()
    wall = round(time.perf_counter() - t0, 2)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(json.dumps({
        "wall_s": wall,
        "rows": int(len(df)),
        "dups": int(df["is_dup"].sum()),
        "driver_rss_mb": rss,
    }))
    ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--big", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--cell", choices=["small", "big"])
    args = ap.parse_args()

    if args.cell:
        run_cell(args.cell, args.cpus)
        return

    shutil.rmtree(ROOT, ignore_errors=True)
    n_seed = build_docs(f"{ROOT}/docs_seed", 1, "s")
    n_small = build_docs(f"{ROOT}/docs_small", args.small, "a")
    n_big = build_docs(f"{ROOT}/docs_big", args.big, "b")
    res = {"rows_seed": n_seed, "rows_small": n_small, "rows_big": n_big}
    for cell in ("small", "big"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cell", cell,
             "--cpus", str(args.cpus)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        res[cell] = json.loads(line)
    res["wall_ratio"] = round(res["big"]["wall_s"] / res["small"]["wall_s"], 2)
    res["rss_ratio"] = round(
        res["big"]["driver_rss_mb"] / res["small"]["driver_rss_mb"], 2
    )
    print(json.dumps(res))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
