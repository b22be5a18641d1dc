"""Persisted incremental IVF index — ANN search whose pruning is
PHYSICAL: vectors live on disk partitioned by their inverted list
(nearest centroid), so a query reads only the ``nprobe`` probed lists'
shard directories instead of scanning the corpus.  The in-memory
``similarity.ivf_topk`` prunes logically (every block is still read and
masked); this is the layout a 100 TB vector store actually needs — the
index outlives the job, and a crawl increment appends to it without
touching history.  (Reference analog: the Azure AI Search index the
crawler upserts into — a persistent ANN structure maintained across
runs, index_definiton/index.json:44-55.)

Layout (same resumable run machinery as the MinHash dedup index —
``storage.write_sharded`` per-shard ``_SUCCESS`` + run-level
``_RUN_COMMITTED``; a crashed append is invisible until resumed):

    index_uri/_META.json          (dim, num_centroids, metric)
    index_uri/centroids.parquet   (list_id, centroid fixed list)
    index_uri/run-<run_id>/shard-<list_id>/*.parquet  (vec_id, embedding)

Semantics: centroids are fixed at build time (trained by the
deterministic sampled k-means, ``similarity.kmeans_centroids``);
appends assign new vectors with the SAVED centroids, so an append never
re-clusters and search results over (build A, append B) equal
``ivf_topk`` over A∪B with A's centroids — pytest-pinned equality, plus
the recall floor vs brute force.

Scale shape: build/append is one assignment ``map_batches`` (argmax
over a broadcast k×d matrix) + the resumable sharded write; search is
driver-side probe selection over the k-row centroid table, a
``read_parquet`` of ONLY the probed shard dirs across committed runs
(columns pruned to vec_id+embedding), per-block partial top-k, and a
bounded Q×blocks×k driver merge — identical merge shape to the
in-memory IVF."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..storage import commit_run, committed_runs, shard_path, write_json, write_sharded
from .similarity import _emb_matrix, _normalize, kmeans_centroids, load_queries

_META = "_META.json"


def _load_meta(index_uri: str) -> dict:
    with open(os.path.join(index_uri, _META)) as f:
        return json.load(f)


def _load_centroids(index_uri: str) -> np.ndarray:
    t = pq.read_table(os.path.join(index_uri, "centroids.parquet"))
    k = t.num_rows
    return np.asarray(t["centroid"].combine_chunks().flatten(), dtype=np.float64).reshape(k, -1)


def _assign_and_write(
    index_uri: str, run_id: str, emb: ray.data.Dataset, cm: np.ndarray
) -> dict:
    """Assign each vector to its nearest centroid (broadcast k×d matrix,
    one vectorized argmax per batch) and write the run via the resumable
    sharded write — one directory per inverted list."""
    k = cm.shape[0]
    c_ref = ray.put(cm.T)

    def assign(batch: pa.Table) -> pa.Table:
        ct = ray.get(c_ref)
        m = _normalize(_emb_matrix(batch))
        lst = np.argmax(m @ ct, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "list_id": pa.array(lst),
            }
        )

    run_dir = os.path.join(index_uri, f"run-{run_id}")
    if os.path.exists(os.path.join(run_dir, "_RUN_COMMITTED")):
        return {"written": [], "skipped": list(range(k))}
    rows = emb.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=65_536
    )
    res = write_sharded(rows, run_dir, shard_col="list_id", num_shards=k)
    commit_run(run_dir)
    return res


def ivf_index_build(
    index_uri: str,
    emb: ray.data.Dataset,
    *,
    num_centroids: int = 16,
    iters: int = 5,
    sample: int = 4096,
    train_on: ray.data.Dataset | None = None,
) -> dict:
    """Create the index: fit centroids on the deterministic bounded
    sample, persist them + meta, write the initial run.  Idempotent on
    a fully-built index; a crashed first build re-fits the (cheap,
    deterministic -> identical) centroids and resumes the run write.

    ``train_on``: optional representative corpus for the centroid fit
    when the FIRST increment is not representative of what the index
    will eventually hold (centroids are fixed forever at build, so
    training them on a slice of the eventual distribution costs recall
    on every later append — measured 0.762 vs 0.988 at sf0.1 when
    training on half the corpus vs a full-corpus sample)."""
    os.makedirs(index_uri, exist_ok=True)
    meta_p = os.path.join(index_uri, _META)
    cent_p = os.path.join(index_uri, "centroids.parquet")
    if os.path.exists(meta_p) and os.path.exists(cent_p):
        # mirror incdedup._ensure_meta: a re-build call whose parameters
        # differ from the saved index must fail loudly — the saved
        # centroids would silently win otherwise and the caller's
        # num_centroids/iters/sample would be ignored
        saved = _load_meta(index_uri)
        asked = {"num_centroids": int(num_centroids), "iters": int(iters),
                 "sample": int(sample)}
        mismatch = {
            kk: (saved[kk], asked[kk])
            for kk in asked
            if kk in saved and int(saved[kk]) != asked[kk]
        }
        if mismatch:
            raise ValueError(
                f"IVF index at {index_uri} was built with "
                f"{ {kk: v[0] for kk, v in mismatch.items()} }, got "
                f"{ {kk: v[1] for kk, v in mismatch.items()} }; index "
                "parameters are fixed at creation (delete the index to "
                "rebuild)"
            )
        cm = _load_centroids(index_uri)
    else:
        cm = kmeans_centroids(
            train_on if train_on is not None else emb,
            k=num_centroids,
            iters=iters,
            sample=sample,
        )
        tmp = cent_p + ".tmp"
        pq.write_table(
            pa.table(
                {
                    "list_id": pa.array(np.arange(cm.shape[0], dtype=np.int64)),
                    "centroid": pa.FixedSizeListArray.from_arrays(
                        pa.array(cm.ravel(), type=pa.float64()), cm.shape[1]
                    ),
                }
            ),
            tmp,
        )
        os.replace(tmp, cent_p)
        write_json(
            {
                "dim": int(cm.shape[1]),
                "num_centroids": int(cm.shape[0]),
                "metric": "cosine",
                "iters": int(iters),
                "sample": int(sample),
            },
            meta_p,
        )
    return _assign_and_write(index_uri, "0000", emb, cm)


def ivf_index_append(
    index_uri: str, run_id: str, emb: ray.data.Dataset
) -> dict:
    """Append an increment under ``run-<run_id>`` using the SAVED
    centroids — assignments stay consistent with every earlier run, so
    search over the grown index equals a one-shot index with the same
    centroids."""
    if run_id == "0000":
        raise ValueError("run_id 0000 is reserved for the initial build")
    return _assign_and_write(index_uri, run_id, emb, _load_centroids(index_uri))


def ivf_index_search(
    index_uri: str,
    emb_for_queries: ray.data.Dataset,
    *,
    num_queries: int = 8,
    k: int = 10,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """Top-k per query reading ONLY the probed lists: (query_id, rank,
    vec_id) — the same output contract as ``similarity.ivf_topk`` so the
    recall gates apply unchanged.  Queries are the deterministic
    ``load_queries`` subset of ``emb_for_queries`` (the same convention
    every ANN entry uses)."""
    qids, qm = load_queries(emb_for_queries, num_queries)
    cm = _load_centroids(index_uri)
    probe = np.argsort(-(qm @ cm.T), axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    lists = sorted({int(x) for x in probe.ravel()})

    def _probed_dirs() -> list:
        return [
            d
            for r in committed_runs(index_uri)
            for lst in lists
            for d in [shard_path(r, lst)]
            if os.path.isdir(d)
        ]

    empty = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
        }
    )
    q_ref = ray.put((qm.T, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qt, probe_ = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        lst = batch["list_id"].to_numpy().astype(np.int64)
        m = _normalize(_emb_matrix(batch))
        sims = m @ qt  # (n, Q)
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            mask = np.isin(lst, probe_[j])  # a shard file may serve only
            if not mask.any():  # SOME queries' probe sets
                continue
            s = sims[mask, j]
            vid = ids[mask]
            kk = min(k, len(s))
            top = np.argpartition(-s, kk - 1)[:kk] if len(s) > kk else np.arange(len(s))
            top = top[np.lexsort((vid[top], -s[top]))]
            out_q.append(np.full(len(top), j, dtype=np.int64))
            out_v.append(vid[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table(
                {
                    "qi": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    # A merge_runs racing this search can rmtree a source run between
    # the dir listing and the parquet read; re-resolve the committed-run
    # list and retry on FileNotFoundError (surfaced by Ray wrapped in a
    # task error, so match the exception chain by type name).
    def _is_missing_file(e: BaseException) -> bool:
        seen = 0
        while e is not None and seen < 8:
            if isinstance(e, FileNotFoundError) or type(e).__name__ == "FileNotFoundError":
                return True
            e = getattr(e, "cause", None) or e.__cause__
            seen += 1
        return False

    parts = None
    for attempt in range(3):
        dirs = _probed_dirs()
        if not dirs:
            return ray.data.from_arrow(empty)
        probed = ray.data.read_parquet(
            dirs,
            columns=["vec_id", "embedding", "list_id"],
            file_extensions=["parquet"],
        )
        try:
            parts = probed.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_pandas()  # bounded: Q × blocks × k rows
            break
        except Exception as e:  # pragma: no cover - merge race window
            if attempt == 2 or not _is_missing_file(e):
                raise
    rows_q, rows_r, rows_v = [], [], []
    for j, qid in enumerate(qids):
        g = parts[parts["qi"] == j]
        # drop duplicate vec_ids first (a reader racing merge_runs'
        # post-commit deletion window may see a vector twice)
        g = g.sort_values(
            ["vec_id", "score"], ascending=[True, False], kind="mergesort"
        ).drop_duplicates("vec_id", keep="first")
        order = np.lexsort((g["vec_id"].to_numpy(), -g["score"].to_numpy()))[:k]
        chosen = g.iloc[order]
        rows_q.extend([int(qid)] * len(chosen))
        rows_r.extend(range(1, len(chosen) + 1))
        rows_v.extend(chosen["vec_id"].astype(np.int64).tolist())
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "rank": pa.array(rows_r, type=pa.int64()),
                "vec_id": pa.array(rows_v, type=pa.int64()),
            }
        )
    )
