"""Continuous crawl: the composition a 100 TB crawl actually runs,
wired from the individually-tested persisted pieces —

    epoch e:  crawl the (evolving) web        pipelines/crawl.run_crawl
                -> incremental dedup          pipelines/incdedup (persisted
                   probe + append                MinHash band index)
                -> embed the epoch's docs     stages/embed (actor pool)
                -> persisted-IVF append       pipelines/annindex
    between epochs:  merge_runs compaction    storage.merge_runs
    at the end:      ANN search over the accumulated index

Reference analog: the event-driven reprocess loop — changed blobs
re-enter the queue and flow through extract/chunk/embed into the
SAME persistent search index across runs (ref
shared/services/servicebus_processor.py:83-146); here the "index" is
two persisted structures (dedup bands + IVF lists) and each epoch is
one crawl of the synthetic web at a new ``content_epoch``.

Resumability — the property the composition exists to demonstrate: every
step is idempotent or checkpointed, so a killed run re-invoked with the
same ``state_dir`` converges to BYTE-IDENTICAL final state:

  * mid-crawl: ``run_crawl`` resumes from its own wave checkpoint;
  * after the dedup append committed but before the verdict table was
    written: the probe excludes ``run-<epoch>`` from the committed-run
    list, so the rerun reproduces the original verdicts instead of
    matching the increment against itself;
  * mid-IVF-append: ``write_sharded``'s per-shard ``_SUCCESS`` markers
    resume shard by shard;
  * compaction: ``merge_runs`` is crash-safe in both windows by design.

An epoch commits with an ``_EPOCH_DONE`` marker only after all four
steps land; a resumed run skips committed epochs outright.

Doc identity across epochs: ``doc_id = (epoch << 28) | uid`` where uid
is the synthetic web's page id parsed from the URL path (synth.urls_for
layout ``/p/{bucket}/{uid}.{ext}``) — epoch-major, so the dedup min-id
rule deterministically keeps the EARLIEST crawl of any unchanged page
and flags later re-crawls as its dups (the incremental analogue of
refresh.py's 304 classification, reached through the dedup index
instead of a carried fingerprint); the ids stay under 2**32, the bound
the packed-pair dedup keys require.

Scale shape: each epoch streams its wave parquet through the dedup and
embed stages without driver materialization; the dedup index is probed
co-partitioned (history never reshuffled); the IVF append is one
assignment pass + a sharded write; compaction bounds probe fan-in of a
long-lived index. Nothing here adds a new exchange beyond the composed
operators' own.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import CrawlConfig
from ..stages.embed import EmbedStage
from ..storage import merge_runs, read_table, write_table
from . import annindex, incdedup
from .crawl import run_crawl

_EPOCH_OK = "_EPOCH_DONE"
_NS_BITS = 28  # low 28 bits: page uid; high bits: epoch (ids < 2**32
#                for <= 15 epochs — the packed-pair dedup key bound)


@dataclass
class ContinuousResult:
    state_dir: str
    epochs_run: List[int] = field(default_factory=list)
    epochs_skipped: List[int] = field(default_factory=list)
    compactions: List[dict] = field(default_factory=list)
    docs_per_epoch: List[int] = field(default_factory=list)


def _epoch_docs(crawl_out: str, waves, epoch: int) -> ray.data.Dataset:
    """One epoch's (doc_id, text) stream from the crawl's interleaved
    documents table — text spans joined in order, media spans carry no
    tokens (same projection curate_crawl uses), doc ids epoch-namespaced
    on the page uid parsed from the URL path."""
    paths: List[str] = []
    for w in waves:
        d = os.path.join(crawl_out, "documents", f"wave-{w:04d}")
        paths.extend(
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        )
    ns = np.int64(epoch << _NS_BITS)

    def proj(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["skipped"], False))
        uid = (
            pc.struct_field(
                pc.extract_regex(t["url"], r"/(?P<uid>[0-9]+)\.[a-z0-9]+$"),
                "uid",
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        texts = [
            " ".join(s["text"] for s in spans if s["kind"] == "text")
            for spans in t["spans"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(uid | ns),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    return ray.data.read_parquet(
        paths, columns=["url", "spans", "skipped"]
    ).map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def _embeddings(docs: ray.data.Dataset, dim: int) -> ray.data.Dataset:
    """(vec_id, embedding) via the actor-pool embed stage — tokenizer
    state once per actor, one vectorized call per batch."""

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": batch["doc_id"], "embedding": batch["vector"]}
        )

    import ray as _ray

    ncpu = (
        int(_ray.cluster_resources().get("CPU", 8))
        if _ray.is_initialized()
        else 8
    )
    return docs.map_batches(
        EmbedStage,
        fn_constructor_args=(dim, "text"),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, max(8, ncpu)),
    ).map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def verdicts_dir(state_dir: str, epoch: int) -> str:
    return os.path.join(state_dir, "verdicts", f"epoch-{epoch:04d}")


def continuous_crawl(
    cfg: CrawlConfig,
    state_dir: str,
    *,
    epochs: int = 3,
    threshold: float = 0.6,
    num_shards: int = 16,
    num_centroids: int = 16,
    compact_after: int | None = 1,
) -> ContinuousResult:
    """Run ``epochs`` successive crawls of the evolving synthetic web
    (``content_epoch`` = 0..epochs-1) through the persisted dedup index
    and the persisted IVF index under ``state_dir``; resumable at every
    step (module docstring).  ``compact_after``: merge_runs both indexes
    after that epoch commits (None = never), proving probes span a
    merged + fresh run mix."""
    if epochs > (1 << (32 - _NS_BITS)):
        raise ValueError(f"epoch namespace holds {1 << (32 - _NS_BITS)} epochs")
    os.makedirs(state_dir, exist_ok=True)
    dedup_uri = os.path.join(state_dir, "dedup_index")
    ivf_uri = os.path.join(state_dir, "ivf_index")
    res = ContinuousResult(state_dir=state_dir)

    for e in range(epochs):
        edir = os.path.join(state_dir, f"epoch-{e:04d}")
        marker = os.path.join(edir, _EPOCH_OK)
        if os.path.exists(marker):
            res.epochs_skipped.append(e)
            continue
        os.makedirs(edir, exist_ok=True)

        # 1. crawl this epoch's web (resumes from its own checkpoint)
        ecfg = replace(
            cfg, content_epoch=e, out_dir=os.path.join(edir, "crawl")
        )
        crawl = run_crawl(ecfg)
        waves = sorted(
            int(d.split("-")[1])
            for d in os.listdir(os.path.join(ecfg.out_dir, "documents"))
            if d.startswith("wave-")
        )
        docs = _epoch_docs(ecfg.out_dir, waves, e)

        # 2. dedup against every prior epoch (probe + append; idempotent
        #    on retry — the probe excludes this epoch's own run)
        verdicts = incdedup.incremental_minhash_dedup(
            dedup_uri,
            f"{e:04d}",
            docs,
            threshold=threshold,
            num_shards=num_shards,
        )

        def tag(batch: pa.Table, _e=e) -> pa.Table:
            return batch.append_column(
                "epoch", pa.array(np.full(batch.num_rows, _e, dtype=np.int32))
            )

        write_table(
            verdicts.map_batches(tag, batch_format="pyarrow"),
            verdicts_dir(state_dir, e),
        )

        # 3. embed + persisted-IVF append (epoch 0 trains the centroids;
        #    later epochs assign with the saved ones)
        emb = _embeddings(docs, cfg.embed_dim)
        if e == 0:
            annindex.ivf_index_build(
                ivf_uri, emb, num_centroids=num_centroids, train_on=emb
            )
        else:
            annindex.ivf_index_append(ivf_uri, f"{e:04d}", emb)

        # 4. epoch commit point
        with open(marker, "w") as f:
            f.write("{}")
        res.epochs_run.append(e)
        res.docs_per_epoch.append(
            int(
                read_table(verdicts_dir(state_dir, e)).count()
            )
        )

        if compact_after is not None and e == compact_after:
            res.compactions.append(
                {"dedup": merge_runs(dedup_uri), "ivf": merge_runs(ivf_uri)}
            )
    return res


def continuous_verdicts(state_dir: str, epochs: int) -> ray.data.Dataset:
    """All epochs' dedup verdicts: (epoch, doc_id, is_dup, dup_of,
    est_jaccard) — the composition's primary output table."""
    ds = read_table(verdicts_dir(state_dir, 0))
    for e in range(1, epochs):
        ds = ds.union(read_table(verdicts_dir(state_dir, e)))
    return ds


def continuous_search(
    cfg: CrawlConfig,
    state_dir: str,
    *,
    num_queries: int = 8,
    k: int = 10,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """ANN top-k over the accumulated IVF index, queried with the
    deterministic subset of epoch 0's embeddings (epoch 0's crawl output
    is byte-identical across resumed and uninterrupted runs, so the
    query set is too)."""
    edir = os.path.join(state_dir, "epoch-0000", "crawl")
    waves = sorted(
        int(d.split("-")[1])
        for d in os.listdir(os.path.join(edir, "documents"))
        if d.startswith("wave-")
    )
    emb = _embeddings(_epoch_docs(edir, waves, 0), cfg.embed_dim)
    return annindex.ivf_index_search(
        os.path.join(state_dir, "ivf_index"),
        emb,
        num_queries=num_queries,
        k=k,
        nprobe=nprobe,
    )
