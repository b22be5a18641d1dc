"""Oracle ingest pipeline: the reference's ``process_file`` end-to-end
(ref shared/processing/document_processor.py:281-372) for one blob:
extract -> strategy-select -> chunk -> stats -> embed -> index rows.

Used by conformance tests as the golden producer; the Ray pipeline in
``pipelines/ingest.py`` must emit identical rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ..config import CHUNK_MAX_TOKENS, SUPPORTED_DOCUMENT_EXTENSIONS
from ..functions.embed import embed_batch
from ..functions.urlnorm import doc_id_of
from .ref_chunker import RefChunker
from .ref_extract import Extracted, extension_of, extract


@dataclass
class ProcessedDoc:
    doc_id: str
    blob_name: str
    extracted: Extracted
    chunks: List[str] = field(default_factory=list)
    token_counts: List[int] = field(default_factory=list)
    total_tokens: int = 0
    index_ids: List[str] = field(default_factory=list)
    vectors: Optional[object] = None  # (n_chunks, dim) float32


def process_blob(
    blob_name: str,
    payload: bytes,
    *,
    chunk_max_tokens: int = CHUNK_MAX_TOKENS,
    embed_dim: int = 64,
    media_ref: str = "",
    chunker: RefChunker | None = None,
) -> Optional[ProcessedDoc]:
    """Returns None when the reference would produce nothing: oversize
    skip (ref file_extractor.py:68-76) or empty content
    (ref document_processor.py:300-303)."""
    ck = chunker or RefChunker()
    ex = extract(blob_name, payload, media_ref=media_ref)
    if ex.skipped or not ex.full_content.strip():
        return None

    # strategy selection — ref document_processor.py:307-317: page-aware
    # only for pdf/docx/doc AND more than one page
    ext = extension_of(blob_name)
    if ext in SUPPORTED_DOCUMENT_EXTENSIONS and len(ex.pages) > 1:
        chunks = ck.chunk_pages(ex.pages, chunk_max_tokens)
    else:
        chunks = ck.chunk_text(ex.full_content, chunk_max_tokens)

    # per-doc stats — ref document_processor.py:321-324
    token_counts = [ck.count_tokens(c) for c in chunks]
    base_id = doc_id_of(blob_name)  # ref :328
    vectors = embed_batch(chunks, dim=embed_dim, tok=ck.tok)
    return ProcessedDoc(
        doc_id=base_id,
        blob_name=blob_name,
        extracted=ex,
        chunks=chunks,
        token_counts=token_counts,
        total_tokens=sum(token_counts),
        index_ids=[f"{base_id}_chunk_{i}" for i in range(len(chunks))],  # ref :257
        vectors=vectors,
    )
