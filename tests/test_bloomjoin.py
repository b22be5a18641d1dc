"""Bloom semi-join: exactness vs DuckDB, soundness of the prefilter,
false-positive removal under a deliberately tiny filter, layout
invariance, and the analytic sizing helper."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import bloomjoin

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables():
    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )
    od = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    return li, od


def _oracle():
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(entrymod.oracle_sql()["bloom_semi_revenue"]).fetchdf()


def test_bloom_semi_revenue_vs_duckdb(tables):
    li, od = tables
    eng = (
        bloomjoin.bloom_semi_revenue(li, od)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    ora = _oracle()
    assert eng["l_returnflag"].tolist() == ora["l_returnflag"].tolist()
    for c in ("n_rows", "sum_qty", "revenue_cents"):
        assert np.array_equal(eng[c].to_numpy(), ora[c].to_numpy()), c


def test_tiny_filter_still_exact(tables):
    """m_bits=64 forces a large false-positive rate through the
    prefilter; the bucketed exact verify must still remove every one."""
    li, od = tables
    eng = (
        bloomjoin.bloom_semi_revenue(li, od, m_bits=64, k=1)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    ora = _oracle()
    for c in ("n_rows", "sum_qty", "revenue_cents"):
        assert np.array_equal(eng[c].to_numpy(), ora[c].to_numpy()), c


def test_layout_invariance(tables):
    li, od = tables
    a = (
        bloomjoin.bloom_semi_revenue(li.repartition(2), od.repartition(3))
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    b = (
        bloomjoin.bloom_semi_revenue(li.repartition(9), od.repartition(1))
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_prefilter_sound_and_selective(tables):
    """No false negatives (every true member survives) and the filter
    actually cuts: survivors ~= members + fp_rate of non-members."""
    li, od = tables
    build = od.filter(expr="o_orderpriority == '1-URGENT'")
    got = bloomjoin.bloom_prefilter(
        li, build, probe_on="l_orderkey", build_on="o_orderkey"
    ).to_pandas()
    truth = duckdb.sql(
        f"""SELECT * FROM read_parquet('{SF}/lineitem.parquet')
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM read_parquet('{SF}/orders.parquet')
                WHERE o_orderpriority = '1-URGENT')"""
    ).df()
    n_total = li.count()
    assert set(truth["l_orderkey"]) <= set(got["l_orderkey"])  # sound
    assert len(got) >= len(truth)
    # at m=2^20 / k=7 over ~300 keys the fp rate is ~0: expect a real cut
    assert len(got) < 0.5 * n_total
    # default params admit ~zero false positives at this scale
    assert len(got) <= len(truth) + 0.01 * n_total


def test_empty_build_keeps_schema(tables):
    """No matching build keys -> 0 rows but the DECLARED columns (the
    empty-groupby schema-loss pitfall, guarded driver-side)."""
    li, od = tables
    ds = bloomjoin.bloom_semi_revenue(li, od, priority="9-NONE")
    assert ds.count() == 0
    # Dataset.to_pandas() drops columns on an empty dataset (Ray quirk);
    # the schema is the operator's contract and must survive
    assert ds.schema().names == ["l_returnflag", "n_rows", "sum_qty", "revenue_cents"]


def test_bloom_params_for():
    m, k = bloomjoin.bloom_params_for(1_000_000, 0.01)
    assert m % 64 == 0
    # ~9.6 bits/key, k ~ 7 at 1% fp
    assert 9_000_000 <= m <= 10_500_000
    assert 6 <= k <= 8
    m2, k2 = bloomjoin.bloom_params_for(0, 0.01)
    assert m2 >= 64 and k2 >= 1


def test_sparse_build_matches_dense(tables):
    """The sparse distributed build must produce the SAME filter as the
    dense per-block fold and the single-process add_many — and contain
    every build key (no false negatives by construction)."""
    from azure_blob_crawler_ray.functions import bloom as fbloom

    _, od = tables
    build = od.filter(expr="o_orderpriority == '1-URGENT'")
    m_bits, k = 1 << 16, 5
    sparse = fbloom.bloom_of_dataset_sparse(
        build.select_columns(["o_orderkey"]), "o_orderkey",
        num_bits=m_bits, num_hashes=k,
    )
    dense = fbloom.bloom_of_dataset(
        build.select_columns(["o_orderkey"]), "o_orderkey",
        num_bits=m_bits, num_hashes=k,
    )
    keys = build.to_pandas()["o_orderkey"].to_numpy().astype(np.uint64)
    local = fbloom.BloomFilter(num_bits=m_bits, num_hashes=k)
    local.add_many(keys)
    assert np.array_equal(sparse.bits, dense.bits)
    assert np.array_equal(sparse.bits, local.bits)
    assert sparse.contains_many(keys).all()
