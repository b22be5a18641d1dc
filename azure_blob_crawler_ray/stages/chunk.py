"""Chunk stage (O9-O13): token-aware chunking as an actor-pool
``map_batches`` — the tokenizer/chunker is per-actor state built once in
``__init__`` (the reference loads tiktoken once per process, ref
shared/utils/chunking.py:29-40; T1 in SURVEY.md §2.3).

Strategy selection follows ref document_processor.py:307-317: page-aware
``chunk_pages`` only when ext ∈ {pdf, docx, doc} AND the document has
more than one text span; otherwise ``chunk_text`` on full_content.
Rows are independent -> embarrassingly parallel across batches.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from ..config import CHUNK_MAX_TOKENS, SUPPORTED_DOCUMENT_EXTENSIONS
from ..functions.chunk_fast import FastChunker


class ChunkStage:
    def __init__(self, max_tokens: int = CHUNK_MAX_TOKENS):
        # FastChunker == RefChunker (the conformance oracle) byte-for-byte
        # — see functions/chunk_fast.py + tests/test_chunker_fast.py —
        # in linear rather than quadratic token-count time
        self.chunker = FastChunker()  # once per actor
        self.max_tokens = max_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        """documents -> chunks(chunk_id, doc_id, seq, content, token_count)."""
        doc_ids = batch["doc_id"].to_pylist()
        exts = batch["ext"].to_pylist()
        fulls = batch["full_content"].to_pylist()
        spans = batch["spans"].to_pylist()
        skipped = batch["skipped"].to_pylist() if "skipped" in batch.column_names else [False] * len(doc_ids)

        out_cid: List[str] = []
        out_did: List[str] = []
        out_seq: List[int] = []
        out_txt: List[str] = []
        out_tok: List[int] = []
        ck = self.chunker
        for did, ext, full, sp, skip in zip(doc_ids, exts, fulls, spans, skipped):
            if skip or not (full or "").strip():
                continue  # ref document_processor.py:300-303
            pages = [s["text"] for s in sp if s["kind"] == "text"]
            if ext in SUPPORTED_DOCUMENT_EXTENSIONS and len(pages) > 1:
                chunks = ck.chunk_pages(pages, self.max_tokens)
            else:
                chunks = ck.chunk_text(full, self.max_tokens)
            for i, c in enumerate(chunks):
                out_cid.append(f"{did}_chunk_{i}")  # ref :257
                out_did.append(did)
                out_seq.append(i)
                out_txt.append(c)
                out_tok.append(ck.count_tokens(c))
        return pa.table(
            {
                "chunk_id": pa.array(out_cid, type=pa.string()),
                "doc_id": pa.array(out_did, type=pa.string()),
                "seq": pa.array(out_seq, type=pa.int32()),
                "content": pa.array(out_txt, type=pa.string()),
                "token_count": pa.array(out_tok, type=pa.int32()),
            }
        )


class ChunkEmbedIndexStage:
    """Fused chunk -> embed -> assemble in ONE actor pool.

    The three steps are per-row independent and the middle two carry
    per-actor state (tokenizer, embedder), so running them as separate
    ``map_batches`` stages pays TWO actor-pool spin-ups plus an
    inter-stage object-store hop per wave — measured ~10 s of the
    emit_index wave wall at 32 CPUs regardless of document count
    (the cost is pool startup, not data).  Semantics are byte-identical
    by construction: __call__ literally composes the existing stages."""

    def __init__(self, max_tokens: int, dim: int):
        from ..stages.embed import EmbedStage
        from ..stages.assemble import assemble_index

        self._chunk = ChunkStage(max_tokens)
        self._embed = EmbedStage(dim)
        self._assemble = assemble_index

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._assemble(self._embed(self._chunk(batch)))


# Per-worker-process stage cache for the task-pool form of the fused
# stage (pipelines/ingest.chunk_embed_index_stage): Ray tasks reuse warm
# worker processes, so caching by config gives actor-style state reuse
# without the per-wave actor-pool autoscale ramp. Safe because workers
# are single-threaded per task and the stage holds no mutable state.
_FUSED_CACHE: dict = {}


def make_chunk_embed_index_fn(max_tokens: int, dim: int):
    key = (max_tokens, dim)

    def chunk_embed_index(batch: pa.Table) -> pa.Table:
        st = _FUSED_CACHE.get(key)
        if st is None:
            st = _FUSED_CACHE[key] = ChunkEmbedIndexStage(max_tokens, dim)
        return st(batch)

    return chunk_embed_index
