"""The end-to-end curation composition (quality gate -> semi-join ->
exact dedup -> semi-join -> packing) — property-checked against a
sequential pandas twin on the sf0.001 documents table."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep
from azure_blob_crawler_ray.pipelines.curate import curate_documents

SF = "/root/testdata/sf0.001"


def test_curate_documents_matches_sequential_twin():
    docs_pd = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = curate_documents(ds, capacity=500).to_pandas().sort_values("doc_id")

    # sequential twin of the survivor set
    q = dataprep.gopher_quality(ds).to_pandas()
    kept_ids = set(q[q["kept"] == 1]["doc_id"])
    kept = docs_pd[docs_pd["doc_id"].isin(kept_ids)]
    fp = kept["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    keepers = kept.assign(fp=fp).groupby("fp")["doc_id"].min()
    survivors = sorted(keepers.tolist())
    assert out["doc_id"].tolist() == survivors

    # packing twin: bins from the cumulative whitespace token counts in
    # doc_id order (pack_sequences' contract)
    surv = docs_pd[docs_pd["doc_id"].isin(survivors)].sort_values("doc_id")
    toks = surv["text"].str.split().map(len).to_numpy()
    cum = np.cumsum(toks) - toks
    want_bins = (cum // 500).astype(np.int64)
    assert out["bin"].to_numpy().tolist() == want_bins.tolist()
    assert out["tokens"].to_numpy().tolist() == toks.tolist()


def test_gopher_filter_docs_equals_composed_form():
    """The fused in-place gopher filter keeps exactly the docs the
    signal-table form marks kept==1 (shared kernel, zero drift)."""
    import ray.data

    from azure_blob_crawler_ray.pipelines.dataprep import (
        gopher_filter_docs,
        gopher_quality,
    )

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    fused = sorted(
        gopher_filter_docs(docs).select_columns(["doc_id"]).to_pandas()["doc_id"]
    )
    composed = sorted(
        gopher_quality(docs)
        .filter(expr="kept == 1")
        .select_columns(["doc_id"])
        .to_pandas()["doc_id"]
    )
    assert fused == composed and len(fused) > 0
