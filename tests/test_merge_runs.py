"""merge_runs: compacting an incremental index's run directories must
not change probe/search results, must be crash-safe in both windows
(before the merged run's commit marker, and after it during source
deletion), and must bound the directory fan-in."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow.compute as pc
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import annindex, incdedup
from azure_blob_crawler_ray.storage import RUN_MARKER, committed_runs, merge_runs

SF = "/root/testdata/sf0.001"
P = dict(ngram=5, num_perm=64, bands=16, num_shards=8)


def _docs(lo, hi):
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(
        lambda b, lo=lo, hi=hi: b.filter(
            pc.and_(
                pc.greater_equal(b["doc_id"], lo), pc.less(b["doc_id"], hi)
            )
        ),
        batch_format="pyarrow",
    )


def _emb(par=None):
    ds = ray.data.read_parquet(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    if par is None:
        return ds
    return ds.map_batches(
        lambda b, par=par: b.filter(
            pc.equal(pc.bit_wise_and(b["vec_id"], 1), par)
        ),
        batch_format="pyarrow",
    )


def _probe(uri):
    return (
        incdedup.minhash_index_probe(uri, _docs(300, 500), threshold=0.5, **P)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _mk_minhash_index(uri):
    incdedup.minhash_index_append(uri, "0001", _docs(0, 100), **P)
    incdedup.minhash_index_append(uri, "0002", _docs(100, 200), **P)
    incdedup.minhash_index_append(uri, "0003", _docs(200, 300), **P)


def test_minhash_probe_unchanged_by_merge(tmp_path):
    uri = str(tmp_path / "idx")
    _mk_minhash_index(uri)
    before = _probe(uri)
    assert len(before) > 0  # the probe actually matches something
    res = merge_runs(uri)
    assert res["merged"] == 3
    assert len(committed_runs(uri)) == 1
    after = _probe(uri)
    pd.testing.assert_frame_equal(before, after)
    # idempotent: a second merge is a no-op
    assert merge_runs(uri)["merged"] == 0


def test_ivf_search_unchanged_by_merge(tmp_path):
    uri = str(tmp_path / "ivf")
    annindex.ivf_index_build(uri, _emb(0), num_centroids=8)
    annindex.ivf_index_append(uri, "0001", _emb(1))
    before = annindex.ivf_index_search(
        uri, _emb(), num_queries=5, k=8, nprobe=3
    ).to_pandas()
    assert merge_runs(uri)["merged"] == 2
    after = annindex.ivf_index_search(
        uri, _emb(), num_queries=5, k=8, nprobe=3
    ).to_pandas()
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )


def test_crash_before_commit_keeps_sources(tmp_path, monkeypatch):
    """A merge that dies before the marker leaves sources authoritative;
    the retry redoes the partial dir and converges."""
    uri = str(tmp_path / "idx")
    _mk_minhash_index(uri)
    before = _probe(uri)

    from azure_blob_crawler_ray import storage as st

    def boom(run_dir):
        raise RuntimeError("crash before commit")

    monkeypatch.setattr(st, "commit_run", boom)
    with pytest.raises(RuntimeError, match="crash before commit"):
        merge_runs(uri)
    # sources untouched, merged dir uncommitted -> probes unchanged
    assert len(committed_runs(uri)) == 3
    pd.testing.assert_frame_equal(before, _probe(uri))
    monkeypatch.undo()
    assert merge_runs(uri)["merged"] == 3
    pd.testing.assert_frame_equal(before, _probe(uri))


def test_crash_after_commit_tolerates_duplicates(tmp_path, monkeypatch):
    """A merge that dies mid-source-deletion leaves the merged run AND
    some sources visible: probes must still be correct (duplicate rows
    collapse), and the next merge_runs finishes the deletion."""
    uri = str(tmp_path / "ivf")
    annindex.ivf_index_build(uri, _emb(0), num_centroids=8)
    annindex.ivf_index_append(uri, "0001", _emb(1))
    before = annindex.ivf_index_search(
        uri, _emb(), num_queries=5, k=8, nprobe=3
    ).to_pandas()

    from azure_blob_crawler_ray import storage as st

    real_rmtree = shutil.rmtree

    def no_delete(path, **kw):
        if "/run-" in str(path) and "merged" not in str(path):
            return  # simulate dying before the sources are removed
        real_rmtree(path, **kw)

    monkeypatch.setattr(st.shutil, "rmtree", no_delete)
    merge_runs(uri)
    monkeypatch.undo()
    # both merged run and sources visible -> duplicates everywhere
    assert len(committed_runs(uri)) == 3
    dup_view = annindex.ivf_index_search(
        uri, _emb(), num_queries=5, k=8, nprobe=3
    ).to_pandas()
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), dup_view.reset_index(drop=True)
    )
    # recovery pass deletes the listed sources
    merge_runs(uri)
    assert len(committed_runs(uri)) == 1
    after = annindex.ivf_index_search(
        uri, _emb(), num_queries=5, k=8, nprobe=3
    ).to_pandas()
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )


def test_probe_with_stale_run_list_after_merge(tmp_path):
    """A probe dataset built BEFORE a merge_runs (capturing the
    pre-merge run list) and executed AFTER it must still see every
    indexed row: the captured source runs are gone, so each probe task
    detects the dead run markers and re-resolves the committed-run list
    (which now holds the merged run). Without the liveness re-check the
    vanished sources would be silently skipped and candidates lost."""
    import pandas as pd

    uri = str(tmp_path / "idx")
    incdedup.minhash_index_append(uri, "a", _docs(0, 150), **P)
    incdedup.minhash_index_append(uri, "b", _docs(150, 300), **P)

    probe_docs = _docs(0, 300)
    # lazy: captures the pre-merge run list [run-a, run-b]
    stale = incdedup.minhash_index_probe(uri, probe_docs, threshold=0.5, **P)
    res = merge_runs(uri)
    assert res["merged"] == 2
    got = (
        stale.to_pandas()
        .sort_values(["doc_id", "dup_of"])
        .reset_index(drop=True)
    )
    fresh = (
        incdedup.minhash_index_probe(uri, probe_docs, threshold=0.5, **P)
        .to_pandas()
        .sort_values(["doc_id", "dup_of"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, fresh)
