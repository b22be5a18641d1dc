"""Decomposition family (exact-integer covariance / PCA / distributed
k-means) vs single-process numpy twins and the DuckDB oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import decomp

SF = "/root/testdata/sf0.001"
BITS = 20
SCALE = float(1 << BITS)


@pytest.fixture(scope="module")
def emb_ds():
    return ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


@pytest.fixture(scope="module")
def emb_np():
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy().astype(np.int64)
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    return ids, X


def _q(X):
    return np.floor(X * SCALE).astype(np.int64)


def test_moments_twin(emb_ds, emb_np):
    _, X = emb_np
    q = _q(X)
    n, s, S, mq = decomp.embed_moments(emb_ds)
    assert n == len(q)
    assert np.array_equal(s, q.sum(axis=0))
    assert np.array_equal(S, q.T @ q)
    assert mq == int(np.abs(q).max())


def test_covariance_vs_duckdb_oracle(emb_ds):
    import __ray_entry__ as entrymod

    eng = decomp.embed_covariance(emb_ds).to_pandas().sort_values(["i", "j"])
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    sql = entrymod.oracle_sql()["embed_covariance"]
    ora = con.execute(sql).fetchdf()
    assert len(eng) == len(ora)
    assert np.array_equal(eng["i"].to_numpy(), ora["i"].to_numpy())
    assert np.array_equal(eng["j"].to_numpy(), ora["j"].to_numpy())
    assert np.array_equal(eng["n"].to_numpy(), ora["n"].to_numpy())
    # identical integer moments + identical IEEE double formula
    assert np.array_equal(eng["cov"].to_numpy(), ora["cov"].to_numpy())


def test_covariance_layout_invariance(emb_ds):
    a = (
        decomp.embed_covariance(emb_ds.repartition(2))
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    b = (
        decomp.embed_covariance(emb_ds.repartition(13))
        .to_pandas()
        .sort_values(["i", "j"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_overflow_guard():
    decomp._check_overflow(10, 100, "x", 20)  # fine
    with pytest.raises(ValueError, match="scale_bits"):
        decomp._check_overflow(1 << 40, 1 << 20, "x", 20)


def test_pca_fit_properties(emb_ds, emb_np):
    _, X = emb_np
    mean, W, vals, total, n = decomp.pca_fit(emb_ds, k=8)
    # orthonormal basis, variance-descending spectrum
    assert np.allclose(W @ W.T, np.eye(len(W)), atol=1e-9)
    assert np.all(np.diff(vals) <= 1e-12)
    assert vals.sum() <= total + 1e-12
    # twin: same quantized covariance -> same spectrum
    q = _q(X)
    cov = decomp._cov_from_moments(len(q), q.sum(axis=0), q.T @ q, BITS)
    tvals = np.linalg.eigvalsh(cov)[::-1][:8]
    assert np.allclose(vals, tvals, atol=1e-12)
    assert np.allclose(mean, q.sum(axis=0) / len(q) / SCALE, atol=1e-12)
    assert n == len(q)


def test_pca_project_variance_matches_eigenvalues(emb_ds):
    k = 4
    _, _, vals, _, n = decomp.pca_fit(emb_ds, k=k)
    proj = decomp.pca_project(emb_ds, k=k).to_pandas()
    assert len(proj) == n * k
    for c in range(1, k + 1):
        v = proj.loc[proj["component"] == c, "value"].to_numpy()
        assert abs(v.mean()) < 1e-9  # centered
        assert abs(np.mean(v**2) - vals[c - 1]) < 1e-9  # pop var == eigenvalue


def test_pca_project_layout_invariance(emb_ds):
    a = (
        decomp.pca_project(emb_ds.repartition(2), k=3)
        .to_pandas()
        .sort_values(["vec_id", "component"])
        .reset_index(drop=True)
    )
    b = (
        decomp.pca_project(emb_ds.repartition(9), k=3)
        .to_pandas()
        .sort_values(["vec_id", "component"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_pca_whiten_unit_variance_zero_crosscov(emb_ds):
    k = 4
    w = decomp.pca_whiten(emb_ds, k=k).to_pandas()
    wide = w.pivot(index="vec_id", columns="component", values="value").to_numpy()
    n = wide.shape[0]
    cov = (wide - wide.mean(axis=0)).T @ (wide - wide.mean(axis=0)) / n
    assert np.allclose(np.diag(cov), 1.0, atol=1e-6)
    off = cov - np.diag(np.diag(cov))
    assert np.all(np.abs(off) < 1e-6)


def test_pca_whiten_layout_invariance(emb_ds):
    a = (
        decomp.pca_whiten(emb_ds.repartition(2), k=3)
        .to_pandas()
        .sort_values(["vec_id", "component"])
        .reset_index(drop=True)
    )
    b = (
        decomp.pca_whiten(emb_ds.repartition(9), k=3)
        .to_pandas()
        .sort_values(["vec_id", "component"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def _kmeans_replica(ids, X, k, iters):
    q = _q(X)
    order = np.argsort(ids, kind="stable")
    C = decomp._normalize(q[order[:k]] / SCALE)
    xn = decomp._normalize(q / SCALE)
    for _ in range(iters):
        a = np.argmax(decomp._det_scores(xn, C), axis=1)
        sums = np.zeros((k, q.shape[1]), dtype=np.int64)
        np.add.at(sums, a, q)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        newC = C.copy()
        ne = counts > 0
        newC[ne] = sums[ne].astype(np.float64) / counts[ne, None].astype(
            np.float64
        ) / SCALE
        C = decomp._normalize(newC)
    return C, np.argmax(decomp._det_scores(xn, C), axis=1)


def test_kmeans_twin(emb_ds, emb_np):
    ids, X = emb_np
    k, iters = 5, 3
    C_t, assign_t = _kmeans_replica(ids, X, k, iters)
    C_e = decomp.kmeans_fit_full(emb_ds, k=k, iters=iters)
    assert np.array_equal(C_e, C_t)
    out = (
        decomp.kmeans_clusters(emb_ds, k=k, iters=iters)
        .to_pandas()
        .sort_values("vec_id")
    )
    twin = dict(zip(ids.tolist(), assign_t.tolist()))
    eng = dict(zip(out["vec_id"].tolist(), out["cluster"].tolist()))
    assert eng == twin


def test_kmeans_layout_invariance(emb_ds):
    a = (
        decomp.kmeans_clusters(emb_ds.repartition(3), k=6, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        decomp.kmeans_clusters(emb_ds.repartition(11), k=6, iters=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_kmeans_objective_non_decreasing(emb_ds):
    o0 = (
        decomp.kmeans_clusters(emb_ds, k=6, iters=0)
        .to_pandas()["sim"]
        .sum()
    )
    o3 = (
        decomp.kmeans_clusters(emb_ds, k=6, iters=3)
        .to_pandas()["sim"]
        .sum()
    )
    assert o3 >= o0 - 1e-9
