"""End-to-end corpus curation over the crawl engine's OWN output — the
composition a training-data team actually runs, as one pipeline:

    crawl (interleaved documents table)
      -> quality gate        gopher verdict fused in place, map-only
      -> exact dedup         content-hash groupby, min-id keeper
      -> keeper semi-join    ONE doc_id-bucket union shuffle
      -> sequence packing    hierarchical prefix-sum (pack_sequences)

Every stage is an existing operator; this module is the glue that
demonstrates they compose Dataset-to-Dataset without driver-side
materialization (the only driver data are wave metadata and the pack
offsets pack_sequences already bounds).  Output: one row per kept,
deduplicated document with its training-sequence bin assignment."""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import CrawlConfig
from .crawl import run_crawl
from .dataprep import exact_dedup, gopher_filter_docs, pack_sequences

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket(ids: np.ndarray, n: int = 64) -> np.ndarray:
    return ((ids.astype(np.uint64) * _MIX) % np.uint64(n)).astype(np.int32)


def _semi_join_docs(
    docs: ray.data.Dataset, keep_ids: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """docs rows whose doc_id appears in keep_ids — the coarse-bucket
    union pattern (tag both sides, one doc_id-bucket shuffle, vectorized
    np.isin per bucket); neither side is pulled to the driver."""

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": ids,
                "text": batch["text"],
                "is_mark": np.zeros(len(ids), dtype=np.int8),
                "bucket": _bucket(ids),
            }
        )

    def tag_marks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        return pa.table(
            {
                "doc_id": ids,
                "text": pa.nulls(n, type=pa.string()),
                "is_mark": np.ones(n, dtype=np.int8),
                "bucket": _bucket(ids),
            }
        )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        mark = df["is_mark"].to_numpy() == 1
        ids = df["doc_id"].to_numpy(np.int64)
        rows = df[~mark & np.isin(ids, ids[mark])]
        return pd.DataFrame(
            {"doc_id": rows["doc_id"].to_numpy(np.int64), "text": rows["text"]}
        )

    return (
        docs.map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
        .union(keep_ids.map_batches(tag_marks, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(keep, batch_format="pandas")
    )


def curate_documents(
    docs: ray.data.Dataset, *, capacity: int = 800, quality_kw: dict | None = None
) -> ray.data.Dataset:
    """(doc_id, text) -> quality-kept, deduplicated, packed sequences:
    one row per surviving document with its bin assignment.
    ``quality_kw`` tunes the Gopher gate to the corpus vocabulary (the
    defaults are calibrated for English prose)."""
    # quality gate fused in place (same kernel as gopher_quality; saves
    # the doc_id-bucket shuffle the verdict->text semi-join would cost)
    kept_docs = gopher_filter_docs(docs, **(quality_kw or {}))
    keepers = exact_dedup(kept_docs).select_columns(["doc_id"])
    unique_docs = _semi_join_docs(kept_docs, keepers, "doc_id")
    return pack_sequences(unique_docs, capacity=capacity)


def curate_crawl(cfg: CrawlConfig, *, capacity: int = 800) -> ray.data.Dataset:
    """Crawl the synthetic web, then run the full curation composition
    over the crawl's own interleaved documents table (streaming read of
    the per-wave parquet, never a driver pull)."""
    res = run_crawl(cfg)
    paths: List[str] = []
    for w in res.waves_run:
        d = os.path.join(cfg.out_dir, "documents", f"wave-{w:04d}")
        paths.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )

    def proj(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["skipped"], False))
        ids = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        # document text = its text spans in order (media spans carry no
        # tokens); per-doc string assembly is the chunker-class per-row
        # cost, bounded by the batch
        texts = [
            " ".join(s["text"] for s in spans if s["kind"] == "text")
            for spans in t["spans"].to_pylist()
        ]
        return pa.table(
            {"doc_id": ids, "text": pa.array(texts, type=pa.string())}
        )

    docs = ray.data.read_parquet(
        paths, columns=["url_hash", "spans", "skipped"]
    ).map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
    # gate calibrated to the synthetic-web vocabulary (engine words,
    # mean length ~7, no English stopwords)
    quality_kw = dict(
        min_words=40,
        mean_len_lo_x10=40,
        mean_len_hi_x10=95,
        stopwords=("crawl", "fetch", "host", "link", "wave"),
        min_stop_hits=1,
        min_distinct_x10=2,
    )
    return curate_documents(docs, capacity=capacity, quality_kw=quality_kw)
