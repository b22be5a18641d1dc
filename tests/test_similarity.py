"""ANN / near-dup over embeddings vs numpy brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def emb_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy().astype(np.int64)
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def _brute_topk(ids, m, num_queries, k):
    order = np.argsort(ids, kind="stable")
    qidx = order[:num_queries]
    out = {}
    for qi in qidx:
        sims = m @ m[qi]
        top = np.lexsort((ids, -sims))[:k]
        out[int(ids[qi])] = [int(ids[t]) for t in top]
    return out


def test_brute_force_topk_exact(emb_ds, emb_np):
    ids, m = emb_np
    got = similarity.brute_force_topk(emb_ds, num_queries=5, k=7).to_pandas()
    exp = _brute_topk(ids, m, 5, 7)
    for qid, expected in exp.items():
        g = got[got["query_id"] == qid].sort_values("rank")
        assert g["vec_id"].tolist() == expected


def test_ivf_topk_recall(emb_ds, emb_np):
    ids, m = emb_np
    got = similarity.ivf_topk(emb_ds, num_queries=5, k=10, num_centroids=16, nprobe=8).to_pandas()
    exp = _brute_topk(ids, m, 5, 10)
    recalls = []
    for qid, expected in exp.items():
        g = set(got[got["query_id"] == qid]["vec_id"].tolist())
        recalls.append(len(g & set(expected)) / len(expected))
    assert np.mean(recalls) >= 0.5  # nprobe=8/16 -> decent recall
    # rank 1 must be the query itself (cos=1), always in its own probe set
    for qid in exp:
        g = got[(got["query_id"] == qid) & (got["rank"] == 1)]
        assert g["vec_id"].iloc[0] == qid


def test_cosine_near_dup_exact(emb_ds, emb_np):
    ids, m = emb_np
    th = 0.4
    got = similarity.cosine_near_dup_pairs(emb_ds, threshold=th).to_pandas()
    sims = m @ m.T
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = sims[ia, ib] >= th
    exp = set(zip(ids[ia[keep]], ids[ib[keep]]))
    assert set(zip(got["vec_a"], got["vec_b"])) == exp
    assert len(got) > 0


def test_lsh_near_dup_on_planted_dups():
    # random corpus + planted near-identical vectors: LSH must find them
    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal((300, 32))
    planted = base[:20] + rng.standard_normal((20, 32)) * 0.03  # cos ~ 0.999
    m = np.vstack([base, planted])
    ids = np.arange(len(m), dtype=np.int64)
    flat = m.astype(np.float32).ravel()
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, type=pa.float32()), 32
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    got = similarity.lsh_near_dup_pairs(ds, threshold=0.95).to_pandas()
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    expected = {(i, 300 + i) for i in range(20)}
    found = len(expected & got_pairs) / len(expected)
    assert found >= 0.9, f"LSH recall {found}"


def test_quantized_topk_recall_and_invariance(emb_ds, emb_np):
    ids, m = emb_np
    got = similarity.quantized_topk(emb_ds, num_queries=5, k=10).to_pandas()
    exp = _brute_topk(ids, m, 5, 10)
    recalls = []
    for qid, expected in exp.items():
        g = got[got["query_id"] == qid].sort_values("rank")
        recalls.append(len(set(g["vec_id"]) & set(expected)) / len(expected))
        # the query itself survives quantization at rank 1 (cos ~ 1,
        # next-best is far below for random vectors)
        assert g["vec_id"].iloc[0] == qid
    assert np.mean(recalls) >= 0.9  # int8 error only flips near-ties
    # block layout must not change the result
    again = similarity.quantized_topk(
        emb_ds.repartition(7), num_queries=5, k=10
    ).to_pandas()
    assert got.equals(again)


def test_mmr_topk_matches_sequential_and_diversifies():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines import similarity

    # query vec_id=0 (= e1); ids 1..3 a tight cluster at rel 0.9 along
    # e2; ids 4,5 at rel 0.85 along DIFFERENT axes e3/e4: pure top-k
    # takes the whole cluster (0.9 > 0.85), MMR must break to the
    # diverse candidates once one cluster member is in (its mutual
    # sim 1.0 drags the cluster's marginal score below 0)
    c2, c3 = np.sqrt(1 - 0.81), np.sqrt(1 - 0.7225)
    vecs = [
        np.array([1.0, 0.0, 0.0, 0.0, 0.0]),
        np.array([0.9, c2, 0.0, 0.0, 0.0]),
        np.array([0.9, c2, 0.0, 0.0, 0.0]),
        np.array([0.9, c2, 0.0, 0.0, 0.0]),
        np.array([0.85, 0.0, c3, 0.0, 0.0]),
        np.array([0.85, 0.0, 0.0, c3, 0.0]),
    ]
    V = np.stack(vecs).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(6), type=pa.int64()),
                  "embedding": pa.array(list(V))})
    ).repartition(3)
    out = similarity.mmr_topk(ds, num_queries=1, k=4, pool=6, lam=0.5).to_pandas()
    picked = out.sort_values("rank")["vec_id"].tolist()

    # pure top-4 by relevance would be {0, 1, 2, 3} — the cluster
    assert set(np.argsort(-(V / np.linalg.norm(V, axis=1, keepdims=True))
                          .astype(np.float64) @ (V[0] / np.linalg.norm(V[0])))[:4]) == {0, 1, 2, 3}

    # sequential twin over all candidates
    Vn = V.astype(np.float64)
    Vn = Vn / np.linalg.norm(Vn, axis=1, keepdims=True)
    q = Vn[0]
    rel = Vn @ q
    ids = np.arange(6)
    avail = np.ones(6, bool)
    max_sim = np.full(6, -np.inf)
    want = []
    for step in range(4):
        mmr = rel.copy() if not want else 0.5 * rel - 0.5 * max_sim
        mmr[~avail] = -np.inf
        cand = np.flatnonzero(mmr == mmr.max())
        i = cand[np.argmin(ids[cand])]
        want.append(int(i))
        avail[i] = False
        max_sim = np.maximum(max_sim, Vn @ Vn[i])
    assert picked == want
    # diversity: the two orthogonal vectors appear in the MMR top-4
    assert {4, 5} <= set(picked)


def test_mmr_topk_layout_invariant():
    import pyarrow.parquet as pq
    import ray.data

    from azure_blob_crawler_ray.pipelines import similarity

    path = "/root/testdata/sf0.001/embeddings.parquet"
    a = similarity.mmr_topk(
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ).to_pandas()
    b = similarity.mmr_topk(
        ray.data.read_parquet(path, columns=["vec_id", "embedding"]).repartition(13)
    ).to_pandas()
    assert a.equals(b)
    assert len(a) == 8 * 10


@pytest.fixture(scope="module")
def emb_lab_ds():
    return ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )


@pytest.fixture(scope="module")
def emb_lab_np():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy().astype(np.int64)
    lab = t["label"].to_numpy()
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m, lab


def test_filtered_topk_pre_vs_post_semantics(emb_lab_ds, emb_lab_np):
    """preFilter: k results all inside the slice, dense ranks 1..k.
    postFilter: subset of the UNfiltered top-k with ORIGINAL ranks —
    possibly < k rows (ref search_client.py:199-296 vectorFilterMode)."""
    ids, m, lab = emb_lab_np
    q, k, v = 4, 6, 1
    pre = similarity.filtered_topk(
        emb_lab_ds, num_queries=q, k=k, filter_value=v, mode="preFilter"
    ).to_pandas()
    post = similarity.filtered_topk(
        emb_lab_ds, num_queries=q, k=k, filter_value=v, mode="postFilter"
    ).to_pandas()

    order = np.argsort(ids, kind="stable")[:q]
    lab_of = dict(zip(ids.tolist(), lab.tolist()))
    for qi in order:
        qid = int(ids[qi])
        sims = m @ m[qi]
        full_top = np.lexsort((ids, -sims))[:k]
        # postFilter twin: unfiltered top-k, then predicate, ranks kept
        exp_post = [
            (r + 1, int(ids[t]))
            for r, t in enumerate(full_top)
            if lab[t] == v
        ]
        g = post[post["query_id"] == qid].sort_values("rank")
        assert list(zip(g["rank"].tolist(), g["vec_id"].tolist())) == exp_post
        # preFilter twin: predicate first, then top-k, dense ranks
        keep = lab == v
        sids, ssims = ids[keep], sims[keep]
        sl_top = np.lexsort((sids, -ssims))[: k]
        exp_pre = [(r + 1, int(sids[t])) for r, t in enumerate(sl_top)]
        g = pre[pre["query_id"] == qid].sort_values("rank")
        assert list(zip(g["rank"].tolist(), g["vec_id"].tolist())) == exp_pre
        # every preFilter hit is in-slice
        assert all(lab_of[vv] == v for vv in g["vec_id"].tolist())


def test_ivf_topk_prefilter_in_slice(emb_lab_ds, emb_lab_np):
    """IVF preFilter: every returned hit satisfies the predicate, and
    per-query results equal IVF over the pre-sliced corpus (the mask is
    fused into the bucket scan, same centroids either way)."""
    ids, m, lab = emb_lab_np
    got = similarity.ivf_topk(
        emb_lab_ds,
        num_queries=4,
        k=5,
        num_centroids=8,
        nprobe=8,  # probe all buckets -> exact within the slice
        filter_column="label",
        filter_value=0,
    ).to_pandas()
    lab_of = dict(zip(ids.tolist(), lab.tolist()))
    assert len(got) > 0
    assert all(lab_of[vv] == 0 for vv in got["vec_id"].tolist())
    # nprobe == num_centroids scans every bucket: equals exact slice top-k
    order = np.argsort(ids, kind="stable")[:4]
    for qi in order:
        qid = int(ids[qi])
        sims = m @ m[qi]
        keep = lab == 0
        sids, ssims = ids[keep], sims[keep]
        exp = [int(sids[t]) for t in np.lexsort((sids, -ssims))[:5]]
        g = got[got["query_id"] == qid].sort_values("rank")
        assert g["vec_id"].tolist() == exp


def test_hnsw_topk_recall_and_determinism():
    """HNSW-class graph ANN (the reference index's declared semantic):
    recall floor vs brute force on the sf0.01 embeddings, byte-equal
    across runs and across shard counts (graph build is deterministic
    in vec_id order, no RNG)."""
    emb = ray.data.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = similarity.hnsw_topk(emb, num_queries=5, k=10).to_pandas()
    brute = similarity.brute_force_topk(emb, num_queries=5, k=10).to_pandas()
    b_sets = brute.groupby("query_id")["vec_id"].apply(set)
    g_sets = got.groupby("query_id")["vec_id"].apply(set)
    hits = sum(len(b_sets[q] & g_sets.get(q, set())) for q in b_sets.index)
    recall = hits / sum(len(s) for s in b_sets)
    assert recall >= 0.85, f"hnsw recall {recall:.3f}"
    again = similarity.hnsw_topk(emb, num_queries=5, k=10).to_pandas()
    assert got.equals(again)
    other_shards = similarity.hnsw_topk(
        emb, num_queries=5, k=10, num_shards=3
    ).to_pandas()
    o_sets = other_shards.groupby("query_id")["vec_id"].apply(set)
    hits3 = sum(len(b_sets[q] & o_sets.get(q, set())) for q in b_sets.index)
    assert hits3 / sum(len(s) for s in b_sets) >= 0.85
