"""Parse / span-extraction stage (O1-O8 in SURVEY.md §2.2).

One ``map_batches`` stage: fetched payload bytes -> interleaved span rows
+ discovered links. The per-row extraction dispatch (extension routing,
decode, JSON flatten, page/section markers, binary fallback) is the
shared oracle code in ``oracle/ref_extract.py`` — identical semantics by
construction (ref shared/processing/file_extractor.py:44-106). Recursion
and per-format branching don't vectorize; parallelism comes from Ray
running many Arrow batches concurrently, and the payload column is
DROPPED here so only spans/links flow further (SURVEY.md §7.4 "very wide
rows").
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..functions.links import extract_links
from ..functions.urlnorm import doc_id_of
from ..hashing import hash64
from ..oracle.ref_extract import extract, extension_of
from ..schemas import SPAN_STRUCT


def parse_extract(batch: pa.Table) -> pa.Table:
    """fetched(url, host, depth, wave, fetch_ms, blob_name, payload,
    status, ...) -> documents(doc_id, url, host, depth, wave, fetch_ms,
    ext, full_content, spans, links, skipped). Rows whose fetch failed
    (status != 200) are marked skipped without extraction — the failure
    taxonomy downstream decides retry vs dead-letter (SURVEY.md §4.1)."""
    blob_names = batch["blob_name"].to_pylist()
    payloads = batch["payload"].to_pylist()
    urls = batch["url"].to_pylist()
    statuses = (
        batch["status"].to_pylist()
        if "status" in batch.column_names
        else [200] * batch.num_rows
    )
    redirects = (
        batch["redirect_to"].to_pylist()
        if "redirect_to" in batch.column_names
        else [""] * batch.num_rows
    )

    doc_ids: List[str] = []
    exts: List[str] = []
    fulls: List[str] = []
    spans_col: List[list] = []
    links_col: List[list] = []
    skipped: List[bool] = []
    for bn, payload, url, st, rt in zip(blob_names, payloads, urls, statuses, redirects):
        if st != 200:
            doc_ids.append(doc_id_of(bn))
            exts.append(extension_of(bn))
            fulls.append("")
            spans_col.append([])
            # a 301 is not a document but IS a link discovery: its
            # Location target enters the frontier at depth+1 through the
            # same explode -> seen anti-join path as in-content links
            links_col.append([rt] if st == 301 and rt else [])
            skipped.append(True)
            continue
        ex = extract(bn, payload or b"", media_ref=url)
        doc_ids.append(doc_id_of(bn))
        exts.append(extension_of(bn))
        fulls.append(ex.full_content)
        spans_col.append(ex.spans())
        links_col.append([] if ex.skipped else extract_links(ex.full_content))
        skipped.append(ex.skipped or not ex.full_content.strip())

    keep = [
        c
        for c in (
            "url", "host", "depth", "wave", "fetch_ms", "url_hash", "priority",
            "discovered_at", "attempts", "status", "prev_fp",
        )
        if c in batch.column_names
    ]
    out = batch.select(keep)
    out = out.append_column("doc_id", pa.array(doc_ids, type=pa.string()))
    out = out.append_column("ext", pa.array(exts, type=pa.string()))
    out = out.append_column("full_content", pa.array(fulls, type=pa.string()))
    out = out.append_column("spans", pa.array(spans_col, type=pa.list_(SPAN_STRUCT)))
    out = out.append_column("links", pa.array(links_col, type=pa.list_(pa.string())))
    out = out.append_column("skipped", pa.array(skipped, type=pa.bool_()))
    # content fingerprint for mirror/syndication dedup (0 for skipped
    # rows — they never enter the content-seen probe); content_dup is
    # overwritten by the crawl loop's probe when cfg.dedup_content is on
    fp = np.where(
        np.array(skipped, dtype=bool),
        np.uint64(0),
        hash64(pa.array(fulls, type=pa.string())),  # read-only view — don't mutate
    )
    out = out.append_column("content_fp", pa.array(fp, type=pa.uint64()))
    out = out.append_column(
        "content_dup", pa.array(np.zeros(len(fp), dtype=bool))
    )
    return out
