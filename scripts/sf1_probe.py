"""sf1 scale probe (VERDICT r2 #5): run the 10 most expensive pipelines
at 10x the bench scale and show the exchange-count claims hold — wall
grows ~linearly with data, driver memory stays flat.

The sandbox ships sf0.1 as the largest driver-generated table set, so
sf1 is synthesized deterministically: 10 key-offset replicas of every
sf0.1 table (foreign keys offset by the same stride, dimension tables
copied once).  Replica text is byte-identical, so the documents-based
probes (dup_ngram_coverage, triangles, pagerank) additionally stress
the duplicate-clique regime — each doc gains 9 exact copies, the
boilerplate-heavy shape real crawls produce, which is exactly what the
max_posting / max_bucket degradation knobs exist for.

Usage:  python scripts/sf1_probe.py [--build-only] [--sf1-dir /tmp/sf1]
Prints one JSON line: per-pipeline wall seconds, output rows, and the
driver's ru_maxrss before/after the suite.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000  # > every sf0.1 key; replica r adds r*STRIDE
REPLICAS = 10

# fact tables: (key columns to offset) — dimensions (nation, region,
# part, supplier attributes) keep their natural keys consistent because
# every replica offsets BOTH sides of each foreign key by the stride.
OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
COPY_ONCE = ["nation", "region"]

PROBES = [
    "regional_revenue",
    "large_volume_customers",
    "triangles",
    "dup_ngram_coverage",
    "late_shipments",
    "returned_item_revenue",
    "min_cost_supplier",
    "dormant_rich_customers",
    "clicks_before_purchase",
    "pagerank",
    "lm_perplexity",
    "dsir_select",
]


def build(sf1_dir: str) -> None:
    shutil.rmtree(sf1_dir, ignore_errors=True)
    os.makedirs(sf1_dir)
    for name in COPY_ONCE:
        shutil.copy(os.path.join(SRC, f"{name}.parquet"), sf1_dir)
    for name, keys in OFFSETS.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        out = os.path.join(sf1_dir, f"{name}.parquet")
        os.makedirs(out)
        for r in range(REPLICAS):
            cols = {}
            for c in t.column_names:
                col = t[c]
                if c in keys:
                    arr = col.to_numpy(zero_copy_only=False).astype(np.int64)
                    col = pa.array(arr + r * STRIDE)
                cols[c] = col
            pq.write_table(
                pa.table(cols), os.path.join(out, f"rep-{r:02d}.parquet")
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/sf1")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of PROBES to run")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    t0 = time.time()
    build(args.sf1_dir)
    build_s = round(time.time() - t0, 1)
    if args.build_only:
        print(json.dumps({"built": args.sf1_dir, "build_s": build_s}))
        return

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    rss0_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    out: dict = {"sf": "sf1(synth 10x)", "num_cpus": args.cpus, "build_s": build_s,
                 "driver_rss_start_mb": int(rss0_mb)}
    probes = args.only.split(",") if args.only else PROBES
    for name in probes:
        t0 = time.time()
        res = qs[name](args.sf1_dir)
        n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
        out[name] = round(time.time() - t0, 2)
        out[f"{name}_rows"] = int(n)
        out[f"{name}_rss_mb"] = int(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        )
    out["driver_rss_end_mb"] = int(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    )
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
