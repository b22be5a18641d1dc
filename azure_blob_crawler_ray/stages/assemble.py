"""Index-document assembly (O15) + per-doc stats (A1/O16).

The sink record is exactly the reference's 3 fields
{id, content, vector} (ref shared/processing/document_processor.py:254-262,
index_definiton/index.json:4-35); the upload action marker is an HTTP
artifact and does not survive into storage.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Mean, Sum


def assemble_index(batch: pa.Table) -> pa.Table:
    """chunks(+vector) -> index(id, content, vector). chunk_id already is
    '{base_id}_chunk_{i}' (ref document_processor.py:257)."""
    return pa.table(
        {
            "id": batch["chunk_id"],
            "content": batch["content"],
            "vector": batch["vector"],
        }
    )


def doc_stats(chunks: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc rollup — ref document_processor.py:321-324,334-335:
    total_tokens, chunk_count, avg tokens (groupby shuffle on doc_id)."""
    return chunks.groupby("doc_id").aggregate(
        Sum("token_count", alias_name="total_tokens"),
        Count(alias_name="chunk_count"),
        Mean("token_count", alias_name="avg_tokens"),
    )
