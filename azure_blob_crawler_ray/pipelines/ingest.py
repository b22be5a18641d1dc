"""Ingest pipeline: the reference's ``process_file`` chain (ref
shared/processing/document_processor.py:281-372, SURVEY.md §3.1)
re-expressed as composable ``Dataset -> Dataset`` stages:

    blobs(blob_name, payload[, url])
      -> parse_extract (stateless map_batches)     O1-O8
      -> ChunkStage    (actor pool, tokenizer T1)  O9-O13
      -> EmbedStage    (actor pool, embedder T3)   O14
      -> assemble_index (stateless)                O15

Each function takes and returns a Dataset so callers can cut in at any
stage (the user-extension surface of SURVEY.md §2.10).
"""

from __future__ import annotations

import ray.data

from ..config import CHUNK_MAX_TOKENS
from ..stages.assemble import assemble_index
from ..stages.chunk import ChunkStage
from ..stages.embed import EmbedStage
from ..stages.parse import parse_extract


def parse_stage(blobs: ray.data.Dataset) -> ray.data.Dataset:
    return blobs.map_batches(parse_extract, batch_format="pyarrow", zero_copy_batch=True)


def _pool_size(lo: int = 1, floor: int = 8) -> tuple:
    """Actor-pool bounds sized to the cluster at call time — a fixed
    (1, 8) cap idles most of a 32-CPU node through a CPU-bound stage."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", floor)) if ray.is_initialized() else floor
    return (lo, max(floor, ncpu))


def chunk_stage(
    docs: ray.data.Dataset,
    max_tokens: int = CHUNK_MAX_TOKENS,
    concurrency: int | tuple | None = None,
    batch_size: int = 256,
) -> ray.data.Dataset:
    concurrency = concurrency or _pool_size()
    return docs.map_batches(
        ChunkStage,
        fn_constructor_args=(max_tokens,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def embed_stage(
    chunks: ray.data.Dataset,
    dim: int,
    concurrency: int | tuple | None = None,
    batch_size: int = 512,
) -> ray.data.Dataset:
    concurrency = concurrency or _pool_size()
    return chunks.map_batches(
        EmbedStage,
        fn_constructor_args=(dim,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def index_stage(embedded: ray.data.Dataset) -> ray.data.Dataset:
    return embedded.map_batches(assemble_index, batch_format="pyarrow", zero_copy_batch=True)


def chunk_embed_index_stage(
    docs: ray.data.Dataset,
    max_tokens: int = CHUNK_MAX_TOKENS,
    dim: int = 64,
    concurrency: int | tuple | None = None,
    batch_size: int = 256,
    as_actors: bool = False,
) -> ray.data.Dataset:
    """chunk -> embed -> assemble fused into ONE stage: separate pools
    pay two actor spin-ups and an object-store hop per execution (~10 s
    per crawl wave at 32 CPUs, independent of doc count); the fused
    stage composes the same per-actor state classes so semantics are
    byte-identical (tests compare it against the staged path).

    Scheduled as a TASK pool with per-worker-process state caching, not
    an actor pool: this stage's state (regex tokenizer + deterministic
    embedder) builds in microseconds, so tasks reuse the already-warm
    worker processes of the same wave instead of paying a 1->N actor
    autoscale ramp per wave (measured: the actor form ran 46.6k docs in
    5.4 s at 32 CPUs — ~10 core-seconds of actual compute — because the
    tick was pool spin-up). A stage with genuinely expensive state (a
    real tiktoken/model load) should pass ``as_actors=True``."""
    from ..stages.chunk import make_chunk_embed_index_fn

    if as_actors:
        from ..stages.chunk import ChunkEmbedIndexStage

        concurrency = concurrency or _pool_size()
        return docs.map_batches(
            ChunkEmbedIndexStage,
            fn_constructor_args=(max_tokens, dim),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    # Task pools take an int cap (max concurrent tasks); a (min, max)
    # actor-pool tuple degrades to its max so callers throttling via
    # ``concurrency`` get real throttling on this path too.
    cap = max(concurrency) if isinstance(concurrency, tuple) else concurrency
    return docs.map_batches(
        make_chunk_embed_index_fn(max_tokens, dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        **({"concurrency": int(cap)} if cap else {}),
    )


def ingest(
    blobs: ray.data.Dataset,
    *,
    embed_dim: int = 64,
    max_tokens: int = CHUNK_MAX_TOKENS,
    concurrency: int | tuple | None = None,
    fused: bool = True,
) -> ray.data.Dataset:
    """blobs -> index rows (id, content, vector); fully lazy/streaming.
    ``fused=True`` (default) runs chunk/embed/assemble in one actor
    pool; ``fused=False`` keeps the three composable stages — the
    extension surface of SURVEY.md §2.10 — with identical output."""
    docs = parse_stage(blobs)
    if fused:
        return chunk_embed_index_stage(docs, max_tokens, embed_dim, concurrency)
    chunks = chunk_stage(docs, max_tokens, concurrency)
    embedded = embed_stage(chunks, embed_dim, concurrency)
    return index_stage(embedded)
