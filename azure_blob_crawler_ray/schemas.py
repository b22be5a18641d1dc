"""Declared Arrow schemas for every engine table (SURVEY.md §1.3).

The reference's schemas are implicit hand-built dicts; the only declared
one is the search index JSON (ref index_definiton/index.json:4-35). Here
every table is an explicit ``pyarrow.Schema`` so blocks are typed end to
end and Lance/Parquet round-trips are stable.
"""

from __future__ import annotations

import pyarrow as pa

# Interleaved text+media span struct (BASELINE.json input_hint; generalizes
# the reference's `pages` list, ref shared/processing/file_extractor.py:86,149,195
# and its binary-metadata row :103-106).
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),       # 'text' | 'media'
        pa.field("text", pa.string()),       # '' when kind='media'
        pa.field("media_ref", pa.string()),  # '' when kind='text'
        pa.field("offset", pa.int32()),      # 0..n-1, strictly increasing
    ]
)

DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("priority", pa.float32()),
        pa.field("discovered_at", pa.int64()),  # wave index of discovery (virtual time)
        pa.field("wave", pa.int32()),
        pa.field("url_hash", pa.uint64()),
        pa.field("attempts", pa.int32()),       # failed-fetch retry count (D3)
    ]
)

DEAD_LETTER = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("wave", pa.int32()),
        pa.field("status", pa.int32()),
        pa.field("attempts", pa.int32()),
        pa.field("url_hash", pa.uint64()),
    ]
)

FETCHED = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("status", pa.int32()),
        pa.field("content_type", pa.string()),
        pa.field("payload", pa.large_binary()),
        pa.field("fetch_ms", pa.int64()),
    ]
)

CHUNKS = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("seq", pa.int32()),
        pa.field("content", pa.string()),
        pa.field("token_count", pa.int32()),
    ]
)


def index_schema(dim: int) -> pa.Schema:
    """Sink schema — exactly the reference's 3 index fields
    (ref index_definiton/index.json:4-35, document_processor.py:254-260)."""
    return pa.schema(
        [
            pa.field("id", pa.string()),
            pa.field("content", pa.string()),
            pa.field("vector", pa.list_(pa.float32(), dim)),
        ]
    )


LINEAGE = pa.schema(
    [
        pa.field("wave", pa.int32()),
        pa.field("frontier", pa.int64()),
        pa.field("robots_blocked", pa.int64()),
        pa.field("admitted", pa.int64()),
        pa.field("docs", pa.int64()),
        pa.field("fresh_plus_deferred", pa.int64()),
        pa.field("seen_total", pa.int64()),
        pa.field("wall_s", pa.float64()),
        pa.field("phase_timings", pa.string()),  # JSON {phase: seconds}
    ]
)
