"""Incremental refresh crawl: re-fetch previously-crawled documents,
detect changed content by fingerprint, re-emit ONLY the changed ones.

The reference's refresh story is delete-then-reprocess per blob event
(ref shared/azure_clients/search_client.py:167-197 update = delete +
upload; re-uploads arrive as new queue events) — every re-upload pays
full extract/chunk/embed cost. At 100 TB a crawler re-visits billions
of pages where almost nothing changed, so the engine adds the
HTTP-conditional-GET shape (If-None-Match/304): the previous crawl's
content fingerprint travels WITH the refetch row, and the comparison is
a map-side equality — the whole refresh is a straight streaming
pipeline with ZERO shuffles and no driver materialization:

  read prev documents (url, prev_fp)   # columns pruned at the scan
    -> fetch at content_epoch e        # task-pool map_batches
    -> parse/span-extraction           # same stage as the crawl
    -> classify changed/unchanged/failed  (map-side fp equality)
    -> changed docs written, counters from one narrow pass

Unchanged rows are the analogue of a 304 Not Modified: counted, never
re-parsed downstream, never re-indexed. Fault injection applies to the
refetch like any fetch; failed rows are counted and written to the
refresh dead-letter for a later pass (single-pass semantics — a refresh
is retried by re-running it, not by intra-run redelivery).
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
from ..sources.fetch import make_fetcher
from ..storage import read_table_arrow, write_json, write_table
from .ingest import chunk_stage, embed_stage, index_stage, parse_stage


@dataclass
class RefreshResult:
    out_dir: str
    checked: int = 0
    changed: int = 0
    unchanged: int = 0
    failed: int = 0
    waves_read: List[int] = field(default_factory=list)


def _prev_documents(prev_out_dir: str) -> tuple[ray.data.Dataset, List[int]]:
    """(previous crawl's document rows, wave numbers read). Skipped
    fetches excluded; projected to exactly what the refresh needs."""
    doc_root = os.path.join(prev_out_dir, "documents")
    waves = sorted(d for d in os.listdir(doc_root) if d.startswith("wave-"))
    tables = []
    for w in waves:
        t = read_table_arrow(os.path.join(doc_root, w))
        t = t.filter(pc.equal(t["skipped"], False))
        tables.append(t.select(["url", "url_hash", "content_fp"]))
    full = pa.concat_tables(tables)
    return ray.data.from_arrow(
        full.rename_columns(["url", "url_hash", "prev_fp"])
    ), [int(w.split("-")[1]) for w in waves]


def refresh_crawl(
    cfg: CrawlConfig,
    prev_out_dir: str,
    *,
    content_epoch: int = 1,
    out_dir: str | None = None,
    emit_index: bool = False,
) -> RefreshResult:
    """One refresh pass over ``prev_out_dir``'s documents at
    ``content_epoch``. Writes changed documents (and optionally their
    re-chunked/re-embedded index rows) under ``out_dir`` plus a metrics
    json; returns the counters."""
    out_dir = out_dir or os.path.join(prev_out_dir, f"refresh-{content_epoch:04d}")
    os.makedirs(out_dir, exist_ok=True)
    ecfg = replace(cfg, content_epoch=content_epoch)

    prev, waves = _prev_documents(prev_out_dir)

    def add_fetch_cols(batch: pa.Table) -> pa.Table:
        # the fetcher consumes (url, attempts); a refresh is attempt 0
        return batch.append_column(
            "attempts", pa.array(np.zeros(batch.num_rows, dtype=np.int32))
        )

    fetched = prev.map_batches(
        add_fetch_cols, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(make_fetcher(ecfg), batch_format="pyarrow", batch_size=256)
    parsed = parse_stage(fetched)

    def classify(batch: pa.Table) -> pa.Table:
        skipped = batch["skipped"].to_numpy(zero_copy_only=False)
        new_fp = batch["content_fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        old_fp = batch["prev_fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        changed = ~skipped & (new_fp != old_fp)
        state = np.where(skipped, "failed", np.where(changed, "changed", "unchanged"))
        out = batch.append_column(
            "refresh_state", pa.array(state.tolist(), type=pa.string())
        )
        # the 304 semantics applied to MEMORY too: unchanged/failed rows
        # blank their heavy payload columns (full_content, spans, links)
        # before materialization, so the pinned footprint is the changed
        # DELTA plus narrow rows — not the whole refetched corpus
        keep = pa.array(changed)
        empty_text = pa.array([""] * batch.num_rows, type=pa.string())
        fc = out.schema.get_field_index("full_content")
        out = out.set_column(
            fc, "full_content",
            pc.if_else(keep, out["full_content"].combine_chunks()
                       if isinstance(out["full_content"], pa.ChunkedArray)
                       else out["full_content"], empty_text),
        )
        sp = out.schema.get_field_index("spans")
        spans_col = out["spans"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        # if_else lacks a list<struct> kernel: take-based select instead
        sel = np.where(
            changed, np.arange(batch.num_rows), batch.num_rows
        )
        spans_with_empty = pa.concat_arrays(
            [spans_col, pa.array([[]], type=spans_col.type)]
        )
        out = out.set_column(sp, "spans", spans_with_empty.take(pa.array(sel)))
        lk = out.schema.get_field_index("links")
        links_col = out["links"]
        if isinstance(links_col, pa.ChunkedArray):
            links_col = links_col.combine_chunks()
        links_with_empty = pa.concat_arrays(
            [links_col, pa.array([[]], type=links_col.type)]
        )
        out = out.set_column(lk, "links", links_with_empty.take(pa.array(sel)))
        return out

    classified = parsed.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    changed_docs = classified.filter(expr="refresh_state == 'changed'").drop_columns(
        ["links", "prev_fp", "refresh_state"]
        if emit_index
        else ["links", "full_content", "prev_fp", "refresh_state"]
    )
    write_table(changed_docs, os.path.join(out_dir, "documents"))
    failed = classified.filter(expr="refresh_state == 'failed'").select_columns(
        ["url", "url_hash", "status"]
    )
    write_table(failed, os.path.join(out_dir, "dead_letter"))

    if emit_index:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        pool = (1, max(8, ncpu))
        chunks = chunk_stage(
            changed_docs.select_columns(["doc_id", "ext", "full_content", "spans"]),
            cfg.chunk_max_tokens,
            concurrency=pool,
        )
        index = index_stage(embed_stage(chunks, cfg.embed_dim, concurrency=pool))
        write_table(index, os.path.join(out_dir, "index"))

    # counters in ONE narrow pass over the materialized classification
    def counters(batch: pa.Table) -> pa.Table:
        st = batch["refresh_state"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "checked": pa.array([batch.num_rows], type=pa.int64()),
                "changed": pa.array([int((st == "changed").sum())], type=pa.int64()),
                "unchanged": pa.array([int((st == "unchanged").sum())], type=pa.int64()),
                "failed": pa.array([int((st == "failed").sum())], type=pa.int64()),
            }
        )

    cnt = (
        classified.map_batches(
            counters, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        .to_pandas()
        .sum()
    )
    res = RefreshResult(
        out_dir=out_dir,
        checked=int(cnt["checked"]),
        changed=int(cnt["changed"]),
        unchanged=int(cnt["unchanged"]),
        failed=int(cnt["failed"]),
        waves_read=waves,
    )
    write_json(
        {
            "content_epoch": content_epoch,
            "checked": res.checked,
            "changed": res.changed,
            "unchanged": res.unchanged,
            "failed": res.failed,
        },
        os.path.join(out_dir, "metrics.json"),
    )
    return res
