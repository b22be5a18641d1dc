"""SemDeDup-style semantic dedup: keeper rule, threshold boundary, and
cross-parallelism determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.pipelines import similarity


def _emb(vectors):
    arr = np.asarray(vectors, dtype=np.float32)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(arr)), type=pa.int64()),
                "embedding": pa.array(
                    [v for v in arr.tolist()], type=pa.list_(pa.float32())
                ),
            }
        )
    )


def test_semdedup_marks_near_duplicates():
    base = np.eye(4, dtype=np.float32)
    # vec 4 ~ vec 0 (cos ~ 0.9987), vec 5 ~ vec 1
    dups = np.array(
        [[1.0, 0.05, 0, 0], [0.05, 1.0, 0, 0]], dtype=np.float32
    )
    ds = _emb(np.vstack([base, dups]))
    out = similarity.semdedup(ds, num_centroids=2, threshold=0.95).to_pandas()
    got = dict(zip(out["vec_id"], out["is_dup"]))
    # originals (lowest ids of their groups) are keepers
    assert not got[0] and not got[1]
    assert got[4] and got[5]
    assert len(out) == 6


def test_semdedup_threshold_excludes_dissimilar():
    ds = _emb(np.eye(5, dtype=np.float32))  # orthogonal: no dups at all
    out = similarity.semdedup(ds, num_centroids=2, threshold=0.95).to_pandas()
    assert not out["is_dup"].any()


def test_semdedup_deterministic_from_table(sf_dir="/root/testdata/sf0.001"):
    a = similarity.semdedup(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
    ).to_pandas()
    b = similarity.semdedup(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).repartition(13)
    ).to_pandas()
    assert a.equals(b)
    assert len(a) > 0
