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
            # characters (utf8_length) to match the SQL twin's length(w)
            bl = pc.utf8_length(vals).to_numpy(zero_copy_only=False).astype(np.int64)
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


def chunk_interleaved(
    docs: ray.data.Dataset,
    *,
    max_tokens: int = 200,
    media_tokens: int = 64,
) -> ray.data.Dataset:
    """Interleaved-aware chunking: slice each document's span sequence
    into chunks of <= ``max_tokens`` where TEXT spans cost their
    whitespace token count and MEDIA spans cost ``media_tokens`` and are
    ATOMIC (never split) — the VLM-training constraint the reference's
    text-only chunker (ref shared/utils/chunking.py:58-174) has no
    notion of. Greedy in span order; a text span that alone exceeds the
    budget is word-split greedily (media_tokens <= max_tokens is
    asserted, so media spans always fit).

    Output: one row per chunk (doc_id, chunk_seq, n_spans, text_tokens,
    media_spans, total_cost) — per-row sequential by nature (chunking is
    a sequential fold, exactly like the reference chunker); parallelism
    is across documents, the only dimension that scales."""
    assert media_tokens <= max_tokens

    def fn(batch: pa.Table) -> pa.Table:
        lens, kind, text, _mref, _off = _spans_parts(batch)
        kinds = kind.to_pylist()
        texts = text.to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        out = {
            "doc_id": [],
            "chunk_seq": [],
            "n_spans": [],
            "text_tokens": [],
            "media_spans": [],
            "total_cost": [],
        }
        pos = 0
        for did, n in zip(doc_ids, lens):
            seq = 0
            cur = [0, 0, 0, 0]  # n_spans, text_tokens, media_spans, cost

            def flush():
                nonlocal seq, cur
                if cur[0]:
                    out["doc_id"].append(did)
                    out["chunk_seq"].append(seq)
                    out["n_spans"].append(cur[0])
                    out["text_tokens"].append(cur[1])
                    out["media_spans"].append(cur[2])
                    out["total_cost"].append(cur[3])
                    seq += 1
                    cur = [0, 0, 0, 0]

            for i in range(pos, pos + int(n)):
                if kinds[i] == "media":
                    if cur[3] + media_tokens > max_tokens:
                        flush()
                    cur[0] += 1
                    cur[2] += 1
                    cur[3] += media_tokens
                    continue
                t = (texts[i] or "").split()
                cost = len(t)
                if cost == 0:
                    continue
                if cur[3] + cost <= max_tokens:
                    cur[0] += 1
                    cur[1] += cost
                    cur[3] += cost
                    continue
                # split the text span greedily: fill the current chunk,
                # then whole chunks, remainder stays open
                rest = cost
                while rest:
                    room = max_tokens - cur[3]
                    if room == 0:
                        flush()
                        room = max_tokens
                    take = min(room, rest)
                    cur[0] += 1
                    cur[1] += take
                    cur[3] += take
                    rest -= take
                    if cur[3] == max_tokens and rest:
                        flush()
            flush()
            pos += int(n)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.string()),
                "chunk_seq": pa.array(out["chunk_seq"], type=pa.int32()),
                "n_spans": pa.array(out["n_spans"], type=pa.int32()),
                "text_tokens": pa.array(out["text_tokens"], type=pa.int64()),
                "media_spans": pa.array(out["media_spans"], type=pa.int32()),
                "total_cost": pa.array(out["total_cost"], type=pa.int64()),
            }
        )

    return docs.select_columns(["doc_id", "spans"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def derive_interleaved(
    docs: ray.data.Dataset, *, span_tokens: int = 10, media_every: int = 2
) -> ray.data.Dataset:
    """Materialize the derived interleaved layout (the numeric twin of
    ``interleaved_span_stats``) as a real (doc_id, spans list<struct>)
    dataset: consecutive ``span_tokens``-word text spans, one media span
    after every ``media_every`` text spans, media_ref keyed by
    (doc_id, ordinal). Gives span-consuming stages (chunk_interleaved,
    media pipeline) a deterministic sf-table-driven input."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dids = batch["doc_id"].to_pylist()
        span_col = []
        for did, text in zip(dids, texts):
            words = (text or "").split()
            spans = [
                {
                    "kind": "text",
                    "text": " ".join(words[k : k + span_tokens]),
                    "media_ref": "",
                    "offset": 0,  # rewritten below once media interleaves
                }
                for k in range(0, len(words), span_tokens)
            ]
            # media spans after every `media_every` text spans
            out = []
            t_seen = 0
            off = 0
            for s in spans:
                s = dict(s)
                s["offset"] = off
                out.append(s)
                off += 1
                t_seen += 1
                if t_seen % media_every == 0:
                    out.append(
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": f"media://{did}/{off}",
                            "offset": off,
                        }
                    )
                    off += 1
            span_col.append(out)
        return pa.table(
            {
                "doc_id": pa.array([str(d) for d in dids], type=pa.string()),
                "spans": pa.array(
                    span_col,
                    type=pa.list_(
                        pa.struct(
                            [
                                ("kind", pa.string()),
                                ("text", pa.string()),
                                ("media_ref", pa.string()),
                                ("offset", pa.int32()),
                            ]
                        )
                    ),
                ),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
