"""Embedding decomposition statistics — exact-integer covariance, a
single-pass PCA fit, and a fully distributed Lloyd k-means over an
embedding column (vec_id, embedding: list<float>).

These are the embedding-curation primitives a 100 TB training-data
pipeline runs BEFORE the ANN / SemDeDup family in similarity.py:
whitening / dimensionality reduction (PCA) and corpus clustering
(k-means over ALL vectors, not the bounded driver sample that
``similarity.kmeans_centroids`` trains on).

Scale + determinism shape (shared by every operator here):

* **One streaming pass per statistic.** Each batch is reduced to a
  fixed-size integer partial — d(d+1)/2 + d + 1 moment rows, or
  k x (d+1) cluster-sum rows — keyed by one packed int64, then a
  groupby-sum over that TINY uniform key space. No raw vectors ever
  enter an exchange; the driver holds O(d^2) / O(k*d), never O(n).
* **Exact integer moments** (the ``similarity.label_centroids``
  trick, floor(v * 2**scale_bits) as int64): sums are
  association-order independent, so results are byte-identical at any
  CPU count / block layout, and the covariance hashes exactly against
  a SQL engine running the same integer formula. float32 -> float64
  and the power-of-two scale keep the quantization bit-reproducible
  everywhere.
* **Overflow is guarded, not assumed**: every partial carries the
  batch max |q|; after aggregation the driver checks
  n * max_q^2 < 2**62 in arbitrary-precision Python ints and raises
  with the scale_bits remedy. With the default scale_bits=20 and
  unit-range values the bound allows ~4e6 rows per fit; drop
  scale_bits (precision for range) for corpus-scale fits — at
  scale_bits=12 the bound is ~5e11 rows.

The reference has no decomposition surface (its vectors go straight to
the Azure HNSW index, ref shared/azure_clients/search_client.py:249-296);
this module is part of the beyond-reference training-data family the
engine adds (SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max as _Max
from ray.data.aggregate import Sum as _Sum

from .similarity import _emb_matrix, _normalize

_PACK = 4096  # packed-key stride; assumes dim < 4095 (checked)


def _quantize(m: np.ndarray, scale_bits: int) -> np.ndarray:
    """floor(v * 2**scale_bits) as int64 — exact for float32 inputs
    (power-of-two scale), association-order independent under sums."""
    return np.floor(m.astype(np.float64) * np.float64(1 << scale_bits)).astype(np.int64)


def _det_scores(x: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Batch-shape-independent dot products x @ C.T: one pairwise-summed
    reduction over the FEATURE axis per centroid row, so a given input
    row's scores depend only on d — never on how many rows share its
    batch.  (BLAS gemm picks kernels by matrix shape and differs in the
    last ulp between block layouts, which would break the byte-identity
    the fit and the assignment guarantee.)"""
    out = np.empty((x.shape[0], C.shape[0]), dtype=np.float64)
    for c in range(C.shape[0]):
        out[:, c] = (x * C[c]).sum(axis=1)
    return out


def _check_overflow(n: int, max_q: int, what: str, scale_bits: int) -> None:
    # Python ints: the CHECK itself cannot overflow.
    if int(n) * int(max_q) * int(max_q) >= (1 << 62):
        raise ValueError(
            f"{what}: n={n} rows at max|q|={max_q} can overflow int64 second "
            f"moments; lower scale_bits (currently {scale_bits}) so that "
            "n * max_q**2 < 2**62"
        )


def embed_moments(
    emb: ray.data.Dataset, *, scale_bits: int = 20
) -> Tuple[int, np.ndarray, np.ndarray, int]:
    """Exact quantized first+second moments in ONE streaming pass:
    returns (n, s[d], S[d, d], max_q) where q = floor(v * 2**scale_bits),
    s = sum(q) and S = sum(q q^T) over all rows.

    Per batch: one int64 matmul (Q^T Q) reduces the batch to
    d(d+1)/2 + d + 1 rows keyed by a packed int64 (second moment
    (i+1)*4096+(j+1) for i<=j, first moment -(i+1), count 0); a
    groupby-sum over that fixed key space is the only exchange, and the
    driver pulls exactly those ~d^2/2 rows."""
    bits = scale_bits
    empty = pa.table(
        {
            "key": pa.array([], type=pa.int64()),
            "val": pa.array([], type=pa.int64()),
            "mq": pa.array([], type=pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        m = _emb_matrix(batch)
        q = _quantize(m, bits)
        n, d = q.shape
        if d >= _PACK - 1:
            raise ValueError("packed key assumes dim < 4095")
        iu = np.triu_indices(d)
        keys = ((iu[0] + 1) * _PACK + (iu[1] + 1)).astype(np.int64)
        vals = (q.T @ q)[iu]
        keys = np.concatenate([keys, -np.arange(1, d + 1, dtype=np.int64), [0]])
        vals = np.concatenate([vals, q.sum(axis=0), [n]]).astype(np.int64)
        mq = int(np.abs(q).max()) if n else 0
        return pa.table(
            {
                "key": keys,
                "val": vals,
                "mq": np.full(len(keys), mq, dtype=np.int64),
            }
        )

    agg = (
        emb.select_columns(["embedding"])
        .map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65_536,
        )
        .groupby("key")
        .aggregate(_Sum("val", alias_name="val"), _Max("mq", alias_name="mq"))
        .to_pandas()
    )
    if len(agg) == 0:
        raise ValueError("embed_moments: empty embedding dataset")
    key = agg["key"].to_numpy()
    val = agg["val"].to_numpy()
    n = int(val[key == 0][0])
    max_q = int(agg["mq"].max()) if len(agg) else 0
    _check_overflow(n, max_q, "embed_moments", bits)
    first = key < 0
    d = int(first.sum())
    s = np.zeros(d, dtype=np.int64)
    s[(-key[first]) - 1] = val[first]
    S = np.zeros((d, d), dtype=np.int64)
    second = key > 0
    i = key[second] // _PACK - 1
    j = key[second] % _PACK - 1
    S[i, j] = val[second]
    S[j, i] = val[second]
    return n, s, S, max_q


def _cov_from_moments(
    n: int, s: np.ndarray, S: np.ndarray, scale_bits: int
) -> np.ndarray:
    """Population covariance with the SQL-identical double formula:
    (S_ij - s_i * s_j / n) / n / 2**(2*scale_bits) — the same IEEE op
    sequence the DuckDB oracle evaluates, so values hash exactly."""
    sf = s.astype(np.float64)
    return (S.astype(np.float64) - np.outer(sf, sf) / n) / n / float(
        1 << (2 * scale_bits)
    )


def embed_covariance(
    emb: ray.data.Dataset, *, scale_bits: int = 20
) -> ray.data.Dataset:
    """Upper-triangle population covariance of the quantized embedding
    matrix — one row per (i, j), i <= j, 1-based positions: (i, j, n,
    cov).  The operator is DEFINED over q = floor(v * 2**scale_bits)
    (not the raw floats) precisely so the distributed sums are exact
    integers and the double formula matches any engine bit-for-bit;
    quantization bias is ~2**-scale_bits per value, documented, and the
    6-decimal conformance rounding sits far above fp noise."""
    n, s, S, _ = embed_moments(emb, scale_bits=scale_bits)
    d = len(s)
    cov = _cov_from_moments(n, s, S, scale_bits)
    iu = np.triu_indices(d)
    return ray.data.from_arrow(
        pa.table(
            {
                "i": pa.array((iu[0] + 1).astype(np.int64)),
                "j": pa.array((iu[1] + 1).astype(np.int64)),
                "n": pa.array(np.full(len(iu[0]), n, dtype=np.int64)),
                "cov": pa.array(cov[iu], type=pa.float64()),
            }
        )
    )


def pca_fit(
    emb: ray.data.Dataset, *, k: int = 8, scale_bits: int = 20
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float, int]:
    """PCA from the single-pass exact moments: returns (mean[d], W[k, d],
    eigvals[k], total_var, n) in QUANTIZED-value units (q / 2**scale_bits).

    The covariance eigendecomposition runs on the driver over the d x d
    matrix (d**2 floats — model-sized, never data-sized).  Eigenvectors
    are sign-fixed (largest-|component| element made positive) so the
    basis is deterministic; ties in eigenvalues keep eigh's ascending
    order, reversed to variance-descending."""
    n, s, S, _ = embed_moments(emb, scale_bits=scale_bits)
    d = len(s)
    cov = _cov_from_moments(n, s, S, scale_bits)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.arange(d - 1, d - 1 - min(k, d), -1)
    vals = eigvals[order].copy()
    W = eigvecs[:, order].T.copy()
    for r in range(W.shape[0]):
        lead = int(np.argmax(np.abs(W[r])))
        if W[r, lead] < 0:
            W[r] = -W[r]
    mean = s.astype(np.float64) / n / float(1 << scale_bits)
    return mean, W, vals, float(np.trace(cov)), n


def pca_variance(
    emb: ray.data.Dataset, *, k: int = 8, scale_bits: int = 20
) -> ray.data.Dataset:
    """Explained-variance table: (component 1..k, eigenvalue,
    explained_ratio) — the spectrum a curation pipeline reads before
    choosing a projection rank / whitening cut."""
    _, _, vals, total, _ = pca_fit(emb, k=k, scale_bits=scale_bits)
    ratio = vals / total if total > 0 else np.zeros_like(vals)
    return ray.data.from_arrow(
        pa.table(
            {
                "component": pa.array(
                    np.arange(1, len(vals) + 1, dtype=np.int64)
                ),
                "eigenvalue": pa.array(vals, type=pa.float64()),
                "explained_ratio": pa.array(ratio, type=pa.float64()),
            }
        )
    )


def _project_dataset(
    emb: ray.data.Dataset, mean: np.ndarray, W: np.ndarray, scale_bits: int
) -> ray.data.Dataset:
    """Shared projection map: broadcast (mean, W) once via ``ray.put``,
    one centered layout-independent multiply per batch, long-form
    (vec_id, component, value) output."""
    ref = ray.put((mean, W, scale_bits))

    def project(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "component": pa.array([], type=pa.int64()),
                    "value": pa.array([], type=pa.float64()),
                }
            )
        mean_, W_, bits_ = ray.get(ref)
        x = _quantize(_emb_matrix(batch), bits_) / float(1 << bits_)
        proj = _det_scores(x - mean_, W_)  # (n, k), layout-independent
        n, kk = proj.shape
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": np.repeat(vids, kk),
                "component": np.tile(
                    np.arange(1, kk + 1, dtype=np.int64), n
                ),
                "value": pa.array(proj.reshape(-1), type=pa.float64()),
            }
        )

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def pca_project(
    emb: ray.data.Dataset, *, k: int = 4, scale_bits: int = 20
) -> ray.data.Dataset:
    """Project every vector onto the top-k principal axes — long-form
    (vec_id, component, value) rows.  The fit is the driver-small
    single-pass moments; the (mean, W) pair is broadcast ONCE via
    ``ray.put`` and each batch does one centered matmul.  Projection
    uses the same quantized values the fit saw, so per-component
    population variance equals the eigenvalue exactly (tested)."""
    mean, W, _, _, _ = pca_fit(emb, k=k, scale_bits=scale_bits)
    return _project_dataset(emb, mean, W, scale_bits)


def pca_whiten(
    emb: ray.data.Dataset,
    *,
    k: int = 4,
    scale_bits: int = 20,
    eps: float = 1e-12,
) -> ray.data.Dataset:
    """PCA whitening: project onto the top-k axes AND rescale each by
    1/sqrt(eigenvalue), so every output component has population
    variance exactly 1 and zero cross-covariance (tested) — the
    decorrelated unit-variance input that SemDeDup-style cosine
    thresholds and product quantizers assume.

    Same scale shape as ``pca_project`` (driver-small fit, one
    broadcast, map-only projection).  Eigenvalues below ``eps`` x the
    leading eigenvalue are degenerate directions; their rows are scaled
    by 0 (dropped to constant 0) rather than exploding noise."""
    mean, W, vals, _, _ = pca_fit(emb, k=k, scale_bits=scale_bits)
    lead = float(vals[0]) if len(vals) else 0.0
    inv = np.where(
        vals > eps * max(lead, eps), 1.0 / np.sqrt(np.maximum(vals, eps)), 0.0
    )
    return _project_dataset(emb, mean, inv[:, None] * W, scale_bits)


def kmeans_fit_full(
    emb: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 4,
    scale_bits: int = 20,
    init: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Distributed spherical Lloyd over ALL vectors — the full-data
    refinement of ``similarity.kmeans_centroids``'s bounded-sample fit
    (train-on-sample, REFINE-distributed is the 100 TB shape: each
    iteration is one streaming assignment pass whose per-batch output is
    k x (d+1) integer partial rows, one tiny groupby-sum, and a k x d
    driver update — centroids are model-sized, assignments never leave
    the cluster).

    Determinism: assignment reads quantized values, cluster sums are
    exact int64 (order-independent), argmax ties break to the lowest
    cluster, empty clusters keep their previous centroid — so the fit is
    byte-identical at any CPU count / block layout.  Init = the k
    lowest-vec_id vectors (engine-independent)."""
    bits = scale_bits
    scale = float(1 << bits)
    if init is None:
        sm = emb.sort("vec_id").limit(k).to_pandas()
        q0 = _quantize(np.stack(sm["embedding"].to_numpy()), bits)
        C = _normalize(q0 / scale)
    else:
        C = _normalize(init.astype(np.float64))
    k = len(C)

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "key": pa.array([], type=pa.int64()),
                        "val": pa.array([], type=pa.int64()),
                        "mq": pa.array([], type=pa.int64()),
                    }
                )
            C_ = ray.get(ref)
            q = _quantize(_emb_matrix(batch), bits)
            n, d = q.shape
            if d >= _PACK - 1:
                raise ValueError("packed key assumes dim < 4095")
            xn = _normalize(q / scale)
            # first max = lowest cluster; _det_scores keeps the argmax
            # byte-identical across block layouts
            assign = np.argmax(_det_scores(xn, C_), axis=1)
            uniq, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(uniq), d), dtype=np.int64)
            np.add.at(sums, inv, q)
            counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            keys = ((uniq[:, None] + 1) * _PACK + np.arange(1, d + 1)).reshape(-1)
            keys = np.concatenate([keys, -(uniq + 1)]).astype(np.int64)
            vals = np.concatenate([sums.reshape(-1), counts]).astype(np.int64)
            mq = int(np.abs(q).max()) if n else 0
            return pa.table(
                {
                    "key": keys,
                    "val": vals,
                    "mq": np.full(len(keys), mq, dtype=np.int64),
                }
            )

        agg = (
            emb.select_columns(["embedding"])
            .map_batches(
            partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=65_536,
        )
            .groupby("key")
            .aggregate(_Sum("val", alias_name="val"), _Max("mq", alias_name="mq"))
            .to_pandas()
        )
        if len(agg) == 0:  # empty dataset: nothing to refine
            break
        key = agg["key"].to_numpy()
        val = agg["val"].to_numpy()
        counts = np.zeros(k, dtype=np.int64)
        neg = key < 0
        counts[(-key[neg]) - 1] = val[neg]
        _check_overflow(int(counts.sum()), int(agg["mq"].max()), "kmeans_fit_full", bits)
        d = C.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        pos = key > 0
        ci = key[pos] // _PACK - 1
        pi = key[pos] % _PACK - 1
        sums[ci, pi] = val[pos]
        nonempty = counts > 0
        newC = C.copy()
        newC[nonempty] = (
            sums[nonempty].astype(np.float64)
            / counts[nonempty, None].astype(np.float64)
            / scale
        )
        C = _normalize(newC)
    return C


def kmeans_clusters(
    emb: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 4,
    scale_bits: int = 20,
) -> ray.data.Dataset:
    """Final cluster assignment after the distributed fit: (vec_id,
    cluster, sim) — one broadcast + one matmul pass, the same map shape
    SemDeDup / IVF consume."""
    C = kmeans_fit_full(emb, k=k, iters=iters, scale_bits=scale_bits)
    bits = scale_bits
    scale = float(1 << bits)
    ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        C_ = ray.get(ref)
        q = _quantize(_emb_matrix(batch), bits)
        xn = _normalize(q / scale)
        scores = _det_scores(xn, C_)
        best = np.argmax(scores, axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(best.astype(np.int64)),
                "sim": pa.array(
                    scores[np.arange(len(best)), best], type=pa.float64()
                ),
            }
        )

    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
