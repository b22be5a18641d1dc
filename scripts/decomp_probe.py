"""10x scale probe for the round-4 additions (decomp + bloom join):
run embed_covariance / pca_project / kmeans_clusters over 100k vs 1M
synthesized vectors (10x), and bloom_semi_revenue over sf0.1 vs a 10x
replica (600k -> 6M lineitem rows), and show the scale claims hold —
wall grows ~linearly (or less: fixed fit/driver cost amortizes) and
driver memory stays flat because every operator's driver state is
model-sized (d^2 moments, k x d centroids, the m-bit bitset), never
data-sized.

Each (op, scale) cell runs in a FRESH subprocess with its own
ray.init, so ru_maxrss is attributable: the driver high-water of one
operator at one scale, not the max over everything run before it.

Vectors are key-offset replicas of sf0.1 embeddings (vec_id + stride;
duplicate values are harmless — moments/centroids stress the pass
structure, not value diversity).  Fact replicas offset o_orderkey /
l_orderkey by the sf1_probe stride so the semi-join key space scales
with the data.

Usage: python scripts/decomp_probe.py [--small 50] [--big 500]
(replica counts over the 2,000-row sf0.1 embeddings table).
Prints one JSON line: per-op wall seconds and driver RSS at both
scales plus the 10x/1x ratios.
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

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000
ROOT = "/tmp/decomp_probe"
OPS = ("embed_covariance", "pca_project", "kmeans_clusters", "bloom_semi_revenue")


def build_embeddings(dst: str, replicas: int) -> int:
    t = pq.read_table(f"{SRC}/embeddings.parquet", columns=["vec_id", "embedding"])
    os.makedirs(dst, exist_ok=True)
    vid = t["vec_id"].to_numpy()
    for r in range(replicas):
        rep = pa.table(
            {"vec_id": pa.array(vid + r * STRIDE), "embedding": t["embedding"]}
        )
        pq.write_table(rep, os.path.join(dst, f"part-{r:04d}.parquet"))
    return t.num_rows * replicas


def build_facts(dst: str, replicas: int) -> int:
    li = pq.read_table(
        f"{SRC}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )
    od = pq.read_table(
        f"{SRC}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lk = li["l_orderkey"].to_numpy()
    ok = od["o_orderkey"].to_numpy()
    os.makedirs(os.path.join(dst, "lineitem"), exist_ok=True)
    os.makedirs(os.path.join(dst, "orders"), exist_ok=True)
    for r in range(replicas):
        pq.write_table(
            li.set_column(0, "l_orderkey", pa.array(lk + r * STRIDE)),
            os.path.join(dst, "lineitem", f"part-{r:04d}.parquet"),
        )
        pq.write_table(
            od.set_column(0, "o_orderkey", pa.array(ok + r * STRIDE)),
            os.path.join(dst, "orders", f"part-{r:04d}.parquet"),
        )
    return li.num_rows * replicas


def run_cell(op: str, scale: str, cpus: int) -> None:
    """Child-process body: one op at one scale, fresh Ray session."""
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from azure_blob_crawler_ray.pipelines import bloomjoin, decomp

    emb_dir = f"{ROOT}/emb_{scale}"
    fact_dir = f"{ROOT}/fact_{scale}"
    # absorb one-time worker startup (~2-3 s) so the timed wall is the
    # operator, not the session bring-up — otherwise the 1x leg's wall
    # is startup-dominated and the 10x/1x ratio reads falsely sublinear
    ray.data.range(1000).map_batches(lambda b: b).count()
    t0 = time.perf_counter()
    if op == "embed_covariance":
        out = decomp.embed_covariance(
            ray.data.read_parquet(emb_dir, columns=["vec_id", "embedding"])
        )
    elif op == "pca_project":
        out = decomp.pca_project(
            ray.data.read_parquet(emb_dir, columns=["vec_id", "embedding"]), k=4
        )
    elif op == "kmeans_clusters":
        out = decomp.kmeans_clusters(
            ray.data.read_parquet(emb_dir, columns=["vec_id", "embedding"]),
            k=8,
            iters=2,
        )
    else:
        out = bloomjoin.bloom_semi_revenue(
            ray.data.read_parquet(f"{fact_dir}/lineitem"),
            ray.data.read_parquet(f"{fact_dir}/orders"),
            m_bits=1 << 22,
        )
    rows = out.count()
    wall = round(time.perf_counter() - t0, 2)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    print(json.dumps({"wall_s": wall, "rows": rows, "driver_rss_mb": rss}))
    ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=50)
    ap.add_argument("--big", type=int, default=500)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--cell", nargs=2, metavar=("OP", "SCALE"), default=None,
                    help="internal: run one (op, scale) cell and exit")
    args = ap.parse_args()

    if args.cell:
        run_cell(args.cell[0], args.cell[1], args.cpus)
        return

    shutil.rmtree(ROOT, ignore_errors=True)
    n_small = build_embeddings(f"{ROOT}/emb_small", args.small)
    n_big = build_embeddings(f"{ROOT}/emb_big", args.big)
    nf_small = build_facts(f"{ROOT}/fact_small", 1)
    nf_big = build_facts(f"{ROOT}/fact_big", 10)

    env = dict(os.environ, PYTHONPATH=REPO)
    results: dict = {"small": {}, "big": {}}
    for scale in ("small", "big"):
        for op in OPS:
            cp = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--cell", op, scale, "--cpus", str(args.cpus)],
                capture_output=True, text=True, env=env,
            )
            line = cp.stdout.strip().splitlines()[-1] if cp.stdout.strip() else "{}"
            try:
                results[scale][op] = json.loads(line)
            except json.JSONDecodeError:
                results[scale][op] = {"error": cp.stderr[-500:]}

    ratios = {}
    for op in OPS:
        a, b = results["small"].get(op, {}), results["big"].get(op, {})
        if "wall_s" in a and "wall_s" in b:
            ratios[op] = {
                "wall": round(b["wall_s"] / max(a["wall_s"], 1e-9), 2),
                "rss": round(
                    b["driver_rss_mb"] / max(a["driver_rss_mb"], 1), 2
                ),
            }
    print(
        json.dumps(
            {
                "vectors": {"1x": n_small, "10x": n_big},
                "fact_rows": {"1x": nf_small, "10x": nf_big},
                "walls": results,
                "ratio_10x_over_1x": ratios,
                "num_cpus": args.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
