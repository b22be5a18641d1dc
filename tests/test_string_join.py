"""String-keyed bucket_hash_join: DuckDB parity, direct-join equality
vs a pandas merge, layout invariance, and the dtype-mismatch guard."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    )


def test_source_count_join_vs_duckdb(docs):
    import __ray_entry__ as entrymod

    eng = (
        relational.source_count_join(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(entrymod.oracle_sql()["source_count_join"]).fetchdf()
    assert eng["doc_id"].tolist() == ora["doc_id"].tolist()
    assert eng["source"].tolist() == ora["source"].tolist()
    assert np.array_equal(eng["n_docs"].to_numpy(), ora["n_docs"].to_numpy())


def test_string_bucket_join_direct():
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "b", "b", "c", "zz", "a"]),
                "v": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["b", "c", "d"]),
                "w": pa.array([10, 20, 30], type=pa.int64()),
            }
        )
    )
    out = (
        relational.bucket_hash_join(
            left,
            right,
            left_on="k",
            right_on="k",
            left_schema=pa.schema([("k", pa.string()), ("v", pa.int64())]),
            right_schema=pa.schema([("k", pa.string()), ("w", pa.int64())]),
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": ["a", "b", "b", "c", "zz", "a"], "v": [1, 2, 3, 4, 5, 6]})
        .merge(pd.DataFrame({"k": ["b", "c", "d"], "w": [10, 20, 30]}), on="k")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == want["k"].tolist()
    assert out["v"].tolist() == want["v"].tolist()
    assert out["w"].tolist() == want["w"].tolist()


def test_source_count_join_layout_invariance(docs):
    a = (
        relational.source_count_join(docs.repartition(2))
        .to_pandas()
        .reset_index(drop=True)
    )
    b = (
        relational.source_count_join(docs.repartition(7))
        .to_pandas()
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_mixed_key_dtypes_rejected():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(["a"]), "v": pa.array([1], type=pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"j": pa.array([1], type=pa.int64()), "w": pa.array([2], type=pa.int64())})
    )
    with pytest.raises(ValueError, match="dtypes disagree"):
        relational.bucket_hash_join(
            left,
            right,
            left_on="k",
            right_on="j",
            left_schema=pa.schema([("k", pa.string()), ("v", pa.int64())]),
            right_schema=pa.schema([("j", pa.int64()), ("w", pa.int64())]),
        )


def test_salted_join_identical_under_hot_key():
    """salt>1 splits a Zipf-hot bucket without changing the join output
    (placement-only salting; build side replicated into sub-buckets)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines.relational import bucket_hash_join

    rng = np.random.default_rng(7)
    n = 50_000
    keys = np.where(rng.random(n) < 0.5, 1, rng.integers(1, 500, n)).astype(np.int64)
    left = ray.data.from_arrow(
        pa.table({"k": keys, "v": np.arange(n, dtype=np.int64)})
    ).repartition(8)
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": np.arange(1, 500, dtype=np.int64),
                "name": [f"n{i}" for i in range(1, 500)],
            }
        )
    )
    ls = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    rs = pa.schema([("rk", pa.int64()), ("name", pa.string())])
    kw = dict(left_on="k", right_on="rk", left_schema=ls, right_schema=rs,
              num_buckets=8)
    a = bucket_hash_join(left, right, **kw).to_pandas()
    b = bucket_hash_join(left, right, salt=4, **kw).to_pandas()
    a = a.sort_values(["k", "v"]).reset_index(drop=True)
    b = b.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == n  # every probe row matched exactly once


def test_salted_join_string_keys_and_bad_salt():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data

    from azure_blob_crawler_ray.pipelines.relational import bucket_hash_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array(["a.com"] * 100 + ["b.com", "c.com"] * 10),
                "n": pa.array(np.arange(120, dtype=np.int64)),
            }
        )
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table({"h": ["a.com", "b.com", "c.com"], "rank": [1, 2, 3]})
    )
    ls = pa.schema([("host", pa.string()), ("n", pa.int64())])
    rs = pa.schema([("h", pa.string()), ("rank", pa.int64())])
    kw = dict(left_on="host", right_on="h", left_schema=ls, right_schema=rs,
              num_buckets=4)
    a = bucket_hash_join(left, right, **kw).to_pandas()
    b = bucket_hash_join(left, right, salt=3, **kw).to_pandas()
    a = a.sort_values(["host", "n"]).reset_index(drop=True)
    b = b.sort_values(["host", "n"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="salt"):
        bucket_hash_join(left, right, salt=0, **kw)


def test_suggest_salt_zipf_vs_uniform():
    """The skew probe recommends salt>1 exactly when one key dominates,
    and its arithmetic matches the exact per-key counts."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines.relational import suggest_salt

    rng = np.random.default_rng(3)
    n = 40_000
    hot = np.where(rng.random(n) < 0.5, 7, rng.integers(100, 2000, n)).astype(np.int64)
    zipf = ray.data.from_arrow(pa.table({"k": hot})).repartition(8)
    rec = suggest_salt(zipf, "k", num_buckets=16)
    assert rec["hot_key"] == 7 and rec["total"] == n
    assert rec["hot_n"] == int((hot == 7).sum())  # exact count; share is rounded
    assert rec["salt"] > 1

    uni = ray.data.from_arrow(
        pa.table({"k": rng.integers(0, 10_000, n).astype(np.int64)})
    ).repartition(8)
    rec_u = suggest_salt(uni, "k", num_buckets=16)
    assert rec_u["salt"] == 1

    empty = ray.data.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    assert suggest_salt(empty, "k")["salt"] == 1
