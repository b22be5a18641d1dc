"""Workload-scale probe of the FUSED emit_index path (VERDICT r3 #5).

Round 3 fused chunk->embed->assemble into one task-pool stage
(`pipelines/ingest.chunk_embed_index_stage`) AFTER the r2 workload
probe ran, so the hot path changed un-probed.  This drives the fused
stage over the sf0.1 documents table at 1x and 10x (ten doc_id-suffixed
replicas — text byte-identical, the boilerplate-heavy shape real crawls
produce) and reports docs/s, output chunk rows, and driver ru_maxrss
before/after each leg.  Pass criteria (VERDICT r3 #5): wall grows
<= ~linearly with docs (docs/s at 10x >= ~0.8x of 1x) and driver RSS
stays flat (the stage is map-only; nothing doc-count-sized may reach
the driver).

Usage: python scripts/emit_index_probe.py [--docs-parquet PATH]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _docs_dataset(path: str, replicas: int):
    """documents.parquet -> the parse_stage output schema the chunker
    consumes: (doc_id, ext, full_content, spans, skipped)."""
    import ray.data

    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])

    def to_doc_schema(batch: pa.Table, rep: int) -> pa.Table:
        n = batch.num_rows
        did = [f"{d}_r{rep}" for d in batch["doc_id"].to_pylist()]
        spans = pa.array(
            [[] for _ in range(n)],
            type=pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string())])),
        )
        return pa.table(
            {
                "doc_id": pa.array(did, type=pa.string()),
                "ext": pa.array(["txt"] * n, type=pa.string()),
                "full_content": batch["text"].cast(pa.string()),
                "spans": spans,
                "skipped": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    # replicate INSIDE one map stage (each input batch emits `replicas`
    # doc_id-suffixed copies) — an N-way union would build an N-branch
    # plan that re-reads the parquet N times and drowns the executor in
    # operator bookkeeping at large N
    def replicate(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([to_doc_schema(batch, r) for r in range(replicas)])

    return ds.map_batches(replicate, batch_format="pyarrow", batch_size=1024)


def _leg(path: str, replicas: int, cpus: int) -> dict:
    from azure_blob_crawler_ray.pipelines.ingest import chunk_embed_index_stage

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    # input build (read + replicate) happens OUTSIDE the timed region —
    # the probe measures the fused stage, not parquet scan fan-out; both
    # legs get ~3 blocks/CPU so neither is starved nor task-spammed
    docs = (
        _docs_dataset(path, replicas).repartition(3 * cpus).materialize()
    )
    n_docs = docs.count()
    t0 = time.time()
    # consume as a stream: count() on the lazy plan never materializes
    # the chunk rows on the driver
    rows = chunk_embed_index_stage(docs).count()
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    return {
        "replicas": replicas,
        "docs": n_docs,
        "chunk_rows": rows,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "driver_rss_mb_before": rss0,
        "driver_rss_mb_after": rss1,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--docs-parquet", default="/root/testdata/sf0.1/documents.parquet"
    )
    ap.add_argument("--cpus", type=int, default=32)
    # sf0.1 documents is 5,000 short rows — a single copy runs in well
    # under a second at 32 CPUs, all fixed cost. The 1x leg is therefore
    # ITSELF replicated (default 20 -> 100k docs, a few seconds of real
    # stage work) and the 10x leg is 10x that.
    ap.add_argument("--base-replicas", type=int, default=20)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    one = _leg(args.docs_parquet, args.base_replicas, args.cpus)
    ten = _leg(args.docs_parquet, 10 * args.base_replicas, args.cpus)
    print(
        json.dumps(
            {
                "metric": "emit_index_scale_probe",
                "num_cpus": args.cpus,
                "x1": one,
                "x10": ten,
                "throughput_ratio_10x_over_1x": round(
                    ten["docs_per_sec"] / max(one["docs_per_sec"], 1e-9), 3
                ),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
