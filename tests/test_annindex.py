"""Persisted incremental IVF index: recall vs brute force, agreement
with the in-memory IVF over the same centroids, run-accumulation
invariance (one append vs two), crash-resume, and physical pruning
(search touches only probed list dirs).  Agreement floors (not strict
equality) because BLAS scores are shape-dependent in the last ulp —
the same concession decomp's _det_scores documents."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import annindex, similarity

SF = "/root/testdata/sf0.001"
NQ, K, NC, NPROBE = 6, 10, 16, 4


def _emb():
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return ray.data.from_arrow(t).repartition(6)


def _as_lists(df: pd.DataFrame) -> dict:
    out = {}
    for qid, g in df.groupby("query_id"):
        out[int(qid)] = [int(v) for v in g.sort_values("rank")["vec_id"]]
    return out


def _agreement(a: pd.DataFrame, b: pd.DataFrame) -> float:
    la, lb = _as_lists(a), _as_lists(b)
    assert la.keys() == lb.keys()
    inter = sum(len(set(la[q]) & set(lb[q])) for q in la)
    total = sum(len(la[q]) for q in la)
    return inter / total


@pytest.fixture(scope="module")
def index_uri(tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("ivf") / "idx")
    annindex.ivf_index_build(uri, _emb(), num_centroids=NC)
    return uri


def test_search_recall_vs_brute(index_uri):
    got = annindex.ivf_index_search(
        index_uri, _emb(), num_queries=NQ, k=K, nprobe=NPROBE
    ).to_pandas()
    exact = similarity.brute_force_topk(_emb(), num_queries=NQ, k=K).to_pandas()
    rec = _agreement(got, exact)
    assert rec >= 0.85, f"persisted IVF recall {rec:.3f} < 0.85"


def test_agreement_with_in_memory_ivf(index_uri):
    cm = annindex._load_centroids(index_uri)
    got = annindex.ivf_index_search(
        index_uri, _emb(), num_queries=NQ, k=K, nprobe=NPROBE
    ).to_pandas()
    mem = similarity.ivf_topk(
        _emb(),
        num_queries=NQ,
        k=K,
        num_centroids=NC,
        nprobe=NPROBE,
        centroids=cm,
    ).to_pandas()
    agree = _agreement(got, mem)
    assert agree >= 0.95, f"persisted-vs-memory agreement {agree:.3f}"


def test_build_is_idempotent(index_uri):
    res = annindex.ivf_index_build(index_uri, _emb(), num_centroids=NC)
    assert res["written"] == [] and len(res["skipped"]) == NC


def test_rebuild_with_different_params_raises(index_uri):
    """A re-build whose parameters differ from the saved index must fail
    loudly (mirrors incdedup's _ensure_meta) — saved centroids would
    otherwise silently win over the caller's num_centroids/iters."""
    with pytest.raises(ValueError, match="fixed at creation"):
        annindex.ivf_index_build(index_uri, _emb(), num_centroids=NC * 2)
    with pytest.raises(ValueError, match="fixed at creation"):
        annindex.ivf_index_build(index_uri, _emb(), num_centroids=NC, iters=9)


def test_append_run_split_invariance(tmp_path):
    """build(half1) + append(half2 in ONE run) vs build(half1) +
    append(half2 in TWO runs): search results agree."""
    import pyarrow.compute as pc

    full = _emb()
    half1 = full.map_batches(
        lambda b: b.filter(pc.less(pc.bit_wise_and(b["vec_id"], 1), 1)),
        batch_format="pyarrow",
    )
    half2 = full.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["vec_id"], 1), 1)),
        batch_format="pyarrow",
    )
    q2a = half2.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["vec_id"], 3), 1)),
        batch_format="pyarrow",
    )
    q2b = half2.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["vec_id"], 3), 3)),
        batch_format="pyarrow",
    )
    uri_one = str(tmp_path / "one")
    annindex.ivf_index_build(uri_one, half1, num_centroids=NC)
    annindex.ivf_index_append(uri_one, "0001", half2)
    uri_two = str(tmp_path / "two")
    annindex.ivf_index_build(uri_two, half1, num_centroids=NC)
    annindex.ivf_index_append(uri_two, "0001", q2a)
    annindex.ivf_index_append(uri_two, "0002", q2b)
    a = annindex.ivf_index_search(uri_one, _emb(), num_queries=NQ, k=K, nprobe=NPROBE).to_pandas()
    b = annindex.ivf_index_search(uri_two, _emb(), num_queries=NQ, k=K, nprobe=NPROBE).to_pandas()
    assert _agreement(a, b) >= 0.95


def test_append_resume_after_crash(tmp_path):
    import pyarrow.compute as pc

    full = _emb()
    half1 = full.map_batches(
        lambda b: b.filter(pc.less(pc.bit_wise_and(b["vec_id"], 1), 1)),
        batch_format="pyarrow",
    )
    half2 = full.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["vec_id"], 1), 1)),
        batch_format="pyarrow",
    )
    clean = str(tmp_path / "clean")
    annindex.ivf_index_build(clean, half1, num_centroids=NC)
    annindex.ivf_index_append(clean, "0001", half2)

    crashed = str(tmp_path / "crashed")
    annindex.ivf_index_build(crashed, half1, num_centroids=NC)
    annindex.ivf_index_append(crashed, "0001", half2)
    run_dir = os.path.join(crashed, "run-0001")
    os.remove(os.path.join(run_dir, "_RUN_COMMITTED"))
    # uncommitted run is invisible to search
    from azure_blob_crawler_ray.storage import committed_runs

    assert len(committed_runs(crashed)) == 1  # only run-0000
    shutil.rmtree(os.path.join(run_dir, "shard-0003"), ignore_errors=True)
    res = annindex.ivf_index_append(crashed, "0001", half2)
    assert res["written"] == [3]
    a = annindex.ivf_index_search(clean, _emb(), num_queries=NQ, k=K, nprobe=NPROBE).to_pandas()
    b = annindex.ivf_index_search(crashed, _emb(), num_queries=NQ, k=K, nprobe=NPROBE).to_pandas()
    assert _agreement(a, b) >= 0.95


def test_search_reads_only_probed_lists(index_uri, monkeypatch):
    """Physical pruning: the parquet dirs handed to read_parquet are
    exactly the probed lists' shard dirs (nprobe × runs at most)."""
    seen = {}
    orig = ray.data.read_parquet

    def spy(paths, **kw):
        seen["paths"] = list(paths) if isinstance(paths, list) else [paths]
        return orig(paths, **kw)

    monkeypatch.setattr(annindex.ray.data, "read_parquet", spy)
    annindex.ivf_index_search(
        index_uri, _emb(), num_queries=NQ, k=K, nprobe=NPROBE
    ).to_pandas()
    assert 0 < len(seen["paths"]) <= NQ * NPROBE  # dedup across queries
    # every dir is a shard dir of a committed run, none outside
    for p in seen["paths"]:
        assert "/run-" in p and "/shard-" in p
    # strictly fewer dirs than the full index holds
    from azure_blob_crawler_ray.storage import committed_runs

    total = sum(
        1
        for r in committed_runs(index_uri)
        for d in os.listdir(r)
        if d.startswith("shard-")
    )
    assert len(seen["paths"]) < total
