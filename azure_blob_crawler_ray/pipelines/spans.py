"""Analytics over the interleaved text+media documents table — the
(doc_id, spans: list<struct<kind, text, media_ref, offset>>) payload the
engine crawls into (schemas.DOCUMENTS, BASELINE.json input_hint;
generalizes the reference's page list, ref
shared/processing/file_extractor.py:86,149,195).

Span columns are nested Arrow lists; every operator here works on the
flattened values buffer + list offsets directly (zero-copy — spans never
become Python dicts), so span volume, not document volume, is the only
cost driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def _spans_parts(batch: pa.Table):
    """(list_lengths, flat kind, flat text, flat media_ref, flat offset)
    for a documents batch — pure offset arithmetic."""
    col = batch["spans"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = col.flatten()  # StructArray of span structs
    return lens, flat.field("kind"), flat.field("text"), flat.field("media_ref"), flat.field("offset")


def flatten_spans(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Explode interleaved documents to one row per span:
    (doc_id, span_idx, kind, text, media_ref) — the long-format view
    that downstream per-span stages (media decode, chunking, packing)
    consume.  Streaming flat-map; output size = span count."""

    def fn(batch: pa.Table) -> pa.Table:
        lens, kind, text, media_ref, offset = _spans_parts(batch)
        doc_ids = np.repeat(
            np.asarray(batch["doc_id"].to_pylist(), dtype=object), lens
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids.tolist(), type=pa.string()),
                "span_idx": pc.cast(offset, pa.int32()),
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def span_kind_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-kind rollup over every span in the corpus: span count, total
    text characters, distinct-document count.  Map-side combine per batch
    (kinds are an enum — two rows per batch cross the shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        lens, kind, text, _media_ref, _offset = _spans_parts(batch)
        k = kind.to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        # docs having >=1 span of the kind: dedupe (doc, kind) locally
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        rows = {"kind": [], "n_spans": [], "total_chars": [], "n_docs": []}
        for kv in np.unique(k):
            m = k == kv
            rows["kind"].append(str(kv))
            rows["n_spans"].append(int(m.sum()))
            rows["total_chars"].append(int(chars[m].sum()))
            rows["n_docs"].append(int(np.unique(doc_idx[m]).size))
        return pa.table(
            {
                "kind": pa.array(rows["kind"], type=pa.string()),
                "n_spans": pa.array(rows["n_spans"], type=pa.int64()),
                "total_chars": pa.array(rows["total_chars"], type=pa.int64()),
                "n_docs": pa.array(rows["n_docs"], type=pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kind")
        .aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Sum("total_chars", alias_name="total_chars"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .sort("kind")
    )


def interleaved_span_stats(
    docs: ray.data.Dataset, *, span_tokens: int = 10, media_every: int = 2
) -> ray.data.Dataset:
    """Per-kind rollup over a DERIVED interleaved document: each doc's
    text splits into consecutive ``span_tokens``-word text spans, with
    one media span interleaved after every ``media_every`` text spans —
    a deterministic, SQL-reproducible instance of the engine's
    interleaved text+media layout (BASELINE.json input_hint), which
    gives the span family an exact DuckDB oracle (the crawl-produced
    variant, span_kind_stats, is rows-only by nature).

    Output (kind, n_spans, total_chars, n_docs); text-span chars count
    the single-space-joined window (sum of word lengths + gaps).
    MAP-ONLY per batch + a 2-row groupby: span boundaries are pure
    offset arithmetic over the flattened token array — nothing is
    materialized per span."""
    from .dataprep import _token_slices

    def partial(batch: pa.Table) -> pa.Table:
        vals, starts, lens = _token_slices(batch)
        G = -(-lens // span_tokens)  # ceil: text spans per doc
        total_spans = int(G.sum())
        if len(vals):
            bl = pc.binary_length(vals).to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            bl = np.zeros(0, dtype=np.int64)
        cb = np.r_[0, np.cumsum(bl)]
        # span token-boundaries, vectorized across docs
        sp_start = (
            np.repeat(starts, G)
            + span_tokens
            * (
                np.arange(total_spans, dtype=np.int64)
                - np.repeat(np.cumsum(G) - G, G)
            )
        )
        doc_end = np.repeat(starts + lens, G)
        sp_end = np.minimum(sp_start + span_tokens, doc_end)
        chars = cb[sp_end] - cb[sp_start] + (sp_end - sp_start - 1)
        m = G // media_every
        return pa.table(
            {
                "kind": pa.array(["media", "text"], type=pa.string()),
                "n_spans": pa.array(
                    [int(m.sum()), total_spans], type=pa.int64()
                ),
                "total_chars": pa.array([0, int(chars.sum())], type=pa.int64()),
                "n_docs": pa.array(
                    [int((m > 0).sum()), int((G > 0).sum())], type=pa.int64()
                ),
            }
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kind")
        .aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Sum("total_chars", alias_name="total_chars"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .sort("kind")
    )
