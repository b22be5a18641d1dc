"""Persisted-index scale probes (round-5 tasks #5 and #6).

Part A — persisted IVF at 10x (task #5): synthesize a deterministic
10x embedding corpus (9 perturbed replicas of sf0.1's vectors, each
re-normalized, vec_ids stride-offset), build the persisted IVF index on
it, and measure

  * recall vs brute force over the same 10x corpus (floor 0.85),
  * the PHYSICAL read fraction: bytes under the probed shard dirs vs
    total index bytes — the pruning claim in data terms.  Per-query the
    expected fraction is ~nprobe/num_centroids; the probe reports both
    the per-query mean and the multi-query union actually read.

Part B — merge_runs payoff (task #6): append 50 tiny increments to a
fresh MinHash band index (the long-lived-index fan-in regime: 50 run
dirs x 16 shards), measure probe wall + files-opened before compaction,
merge_runs, re-measure.  The probe result must be IDENTICAL before and
after (merge is a physical re-layout only).

Usage: python scripts/index_scale_probe.py
Prints one JSON line; record in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
SRC = "/root/testdata/sf0.1/embeddings.parquet"
STRIDE = 10_000_000
REPLICAS = 10
NQ, K, NC, NPROBE = 8, 10, 32, 4


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def build_10x(dst: str) -> None:
    """replica r: vec_id + r*STRIDE, vector renormalized after a small
    deterministic per-(replica, vec) Gaussian perturbation — vectors are
    DISTINCT (no degenerate ties), neighborhoods stay near the original."""
    t = pq.read_table(SRC, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    dim = len(t["embedding"][0])
    m = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(-1, dim)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    os.makedirs(dst, exist_ok=True)
    for r in range(REPLICAS):
        if r == 0:
            mr = m
        else:
            g = np.random.default_rng(1000 + r).standard_normal(m.shape)
            mr = m + 0.05 * g
            mr = mr / np.linalg.norm(mr, axis=1, keepdims=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids + r * STRIDE),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mr.ravel().astype(np.float32), type=pa.float32()), dim
                    ),
                }
            ),
            os.path.join(dst, f"rep-{r}.parquet"),
        )


def part_a() -> dict:
    import ray.data

    from azure_blob_crawler_ray.pipelines import annindex, similarity

    corpus_dir = os.path.join(SCRATCH, "abc_ivf10x_corpus")
    shutil.rmtree(corpus_dir, ignore_errors=True)
    build_10x(corpus_dir)
    emb = ray.data.read_parquet(corpus_dir).repartition(16)

    uri = os.path.join(SCRATCH, "abc_ivf10x_idx")
    shutil.rmtree(uri, ignore_errors=True)
    t0 = time.time()
    annindex.ivf_index_build(uri, emb, num_centroids=NC, train_on=emb)
    build_s = time.time() - t0

    t0 = time.time()
    got = annindex.ivf_index_search(
        uri, emb, num_queries=NQ, k=K, nprobe=NPROBE
    ).to_pandas()
    search_s = time.time() - t0
    exact = similarity.brute_force_topk(emb, num_queries=NQ, k=K).to_pandas()

    def sets(df):
        return {
            int(q): set(g.sort_values("rank")["vec_id"].astype(int))
            for q, g in df.groupby("query_id")
        }

    gs, es = sets(got), sets(exact)
    recall = sum(len(gs[q] & es[q]) for q in es) / sum(len(es[q]) for q in es)

    # physical read fraction: replicate the search's probe selection
    cm = annindex._load_centroids(uri)
    _, qm = similarity.load_queries(emb, NQ)
    probe = np.argsort(-(qm @ cm.T), axis=1, kind="stable")[:, :NPROBE]
    from azure_blob_crawler_ray.storage import committed_runs, shard_path

    total = _dir_bytes(uri)
    union_lists = sorted({int(x) for x in probe.ravel()})
    union_bytes = sum(
        _dir_bytes(shard_path(r, s))
        for r in committed_runs(uri)
        for s in union_lists
    )
    per_q = []
    for j in range(NQ):
        b = sum(
            _dir_bytes(shard_path(r, int(s)))
            for r in committed_runs(uri)
            for s in probe[j]
        )
        per_q.append(b / total)
    n_vec = emb.count()
    shutil.rmtree(corpus_dir, ignore_errors=True)
    shutil.rmtree(uri, ignore_errors=True)
    return {
        "corpus_vectors": int(n_vec),
        "num_centroids": NC,
        "nprobe": NPROBE,
        "build_s": round(build_s, 2),
        "search_s": round(search_s, 2),
        "recall_vs_brute": round(recall, 3),
        "expected_fraction": round(NPROBE / NC, 3),
        "read_fraction_per_query_mean": round(float(np.mean(per_q)), 3),
        "read_fraction_union_8q": round(union_bytes / total, 3),
    }


def part_b() -> dict:
    import ray.data

    from azure_blob_crawler_ray.pipelines import incdedup
    from azure_blob_crawler_ray.storage import merge_runs

    docs = pq.read_table(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    uri = os.path.join(SCRATCH, "abc_merge50_idx")
    shutil.rmtree(uri, ignore_errors=True)
    runs = 50
    per = len(docs) // runs
    t0 = time.time()
    for r in range(runs):
        chunk = docs.iloc[r * per : (r + 1) * per]
        incdedup.minhash_index_append(
            uri, f"{r:04d}", ray.data.from_pandas(chunk), num_shards=16
        )
    append_s = time.time() - t0

    probe_docs = ray.data.from_pandas(docs.iloc[: 5 * per])

    def run_probe():
        before = _count_open_files(uri)
        t0 = time.time()
        out = (
            incdedup.minhash_index_probe(uri, probe_docs, threshold=0.6)
            .to_pandas()
            .sort_values(["doc_id", "dup_of"])
            .reset_index(drop=True)
        )
        return time.time() - t0, out, before

    def _count_open_files(u: str) -> int:
        return sum(
            len([f for f in files if f.endswith(".parquet")])
            for _, _, files in os.walk(u)
        )

    pre_wall, pre_out, pre_files = run_probe()
    t0 = time.time()
    merged = merge_runs(uri)
    merge_s = time.time() - t0
    post_wall, post_out, post_files = run_probe()
    same = pre_out.equals(post_out)
    shutil.rmtree(uri, ignore_errors=True)
    return {
        "runs": runs,
        "append_s_total": round(append_s, 2),
        "index_parquet_files_before": pre_files,
        "index_parquet_files_after": post_files,
        "probe_wall_before_s": round(pre_wall, 2),
        "probe_wall_after_s": round(post_wall, 2),
        "speedup": round(pre_wall / max(post_wall, 1e-9), 2),
        "merge_s": round(merge_s, 2),
        "merged_runs": merged["merged"],
        "probe_results_identical": bool(same),
    }


def main() -> None:
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    out = {"ivf_10x": part_a(), "merge_payoff": part_b(), "num_cpus": cpus}
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
