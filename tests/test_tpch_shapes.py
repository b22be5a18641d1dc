"""Q2/Q18/Q14-shaped operators and the empty-partition-safe
bucket_hash_join (regression: ray.data's native join fails when a hash
partition is empty on either side — sparse survivor keys trigger it)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.pipelines import relational


def test_bucket_hash_join_sparse_keys():
    # 3 left keys over 64 buckets: almost every bucket is one-sided —
    # the exact shape that crashes Dataset.join with empty partitions
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([5, 900, 12345], type=pa.int64()),
                "v": pa.array([50, 51, 52], type=pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(list(range(1000)), type=pa.int64()),
                "name": pa.array([f"n{i}" for i in range(1000)]),
            }
        )
    )
    out = relational.bucket_hash_join(
        left,
        right,
        left_on="k",
        right_on="rk",
        left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        right_schema=pa.schema([("rk", pa.int64()), ("name", pa.string())]),
    ).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [5, 900]  # 12345 has no right match
    assert out["v"].tolist() == [50, 51]
    assert out["name"].tolist() == ["n5", "n900"]
    assert out["v"].dtype == np.int64  # typed-null padding must not widen


def test_bucket_hash_join_many_to_many():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1], type=pa.int64()), "v": pa.array([10, 11], type=pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, 1], type=pa.int64()), "w": pa.array([20, 21], type=pa.int64())})
    )
    out = relational.bucket_hash_join(
        left, right, left_on="k", right_on="rk",
        left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
        right_schema=pa.schema([("rk", pa.int64()), ("w", pa.int64())]),
    ).to_pandas()
    assert len(out) == 4  # full cross product within the key
    assert sorted(zip(out["v"], out["w"])) == [(10, 20), (10, 21), (11, 20), (11, 21)]


def _li(orderkeys, qtys, partkeys=None, prices=None, suppkeys=None):
    n = len(orderkeys)
    return ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(orderkeys, type=pa.int64()),
                "l_quantity": pa.array([float(q) for q in qtys]),
                "l_partkey": pa.array(partkeys or [0] * n, type=pa.int64()),
                "l_extendedprice": pa.array([float(p) for p in (prices or [1.0] * n)]),
                "l_suppkey": pa.array(suppkeys or [0] * n, type=pa.int64()),
            }
        )
    )


def test_min_cost_supplier_argmin_and_ties():
    lineitem = _li(
        [1, 2, 3, 4],
        [1, 1, 1, 1],
        partkeys=[7, 7, 7, 8],
        prices=[5.0, 5.0, 4.0, 9.0],
        suppkeys=[3, 1, 2, 1],
    )
    supplier = ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                "s_name": pa.array(["s-one", "s-two", "s-three"]),
                "s_nationkey": pa.array([0, 1, 0], type=pa.int64()),
            }
        )
    )
    nation = ray.data.from_arrow(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], type=pa.int64()),
                "n_name": pa.array(["ALPHA", "BETA"]),
            }
        )
    )
    out = relational.min_cost_supplier(lineitem, supplier, nation).to_pandas()
    got = out.set_index("p_partkey")
    # part 7: min price 4.0 -> supplier 2 (the 5.0 tie between supp 3
    # and 1 never surfaces because 4.0 wins outright)
    assert got.loc[7]["s_suppkey"] == 2
    assert got.loc[7]["min_price_cents"] == 400
    assert got.loc[7]["n_name"] == "BETA"
    assert got.loc[8]["s_suppkey"] == 1


def test_large_volume_customers_threshold():
    lineitem = _li([1, 1, 2, 2, 2], [100, 250, 100, 100, 50])
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], type=pa.int64()),
                "o_custkey": pa.array([10, 11], type=pa.int64()),
                "o_orderdate": pa.array(
                    [np.datetime64("2001-02-03", "us")] * 2,
                    type=pa.timestamp("us"),
                ),
                "o_totalprice": pa.array([12.34, 56.78]),
            }
        )
    )
    customer = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([10, 11], type=pa.int64()),
                "c_name": pa.array(["alice", "bob"]),
            }
        )
    )
    out = relational.large_volume_customers(
        lineitem, orders, customer, min_qty=300
    ).to_pandas()
    # order 1: qty 350 > 300 kept; order 2: qty 250 dropped
    assert out["o_orderkey"].tolist() == [1]
    assert out["c_name"].tolist() == ["alice"]
    assert out["price_cents"].tolist() == [1234]
    assert out["o_orderdate"].tolist() == ["2001-02-03"]


def test_promo_revenue_monthly_split():
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 1], type=pa.int64()),
                "l_shipdate": pa.array(
                    [
                        np.datetime64("2001-01-05", "us"),
                        np.datetime64("2001-01-20", "us"),
                        np.datetime64("2001-02-01", "us"),
                    ],
                    type=pa.timestamp("us"),
                ),
                "l_extendedprice": pa.array([100.0, 200.0, 50.0]),
                "l_discount": pa.array([0.0, 0.5, 0.0]),
            }
        )
    )
    part = ray.data.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], type=pa.int64()),
                "p_type": pa.array(["ECONOMY", "STANDARD"]),
            }
        )
    )
    out = relational.promo_revenue_monthly(lineitem, part).to_pandas()
    got = out.set_index("month")
    assert got.loc["2001-01"]["promo_cents"] == 10000  # part 1 only
    assert got.loc["2001-01"]["total_cents"] == 20000  # + 200*(1-.5)
    assert got.loc["2001-02"]["promo_cents"] == 5000
    assert got.loc["2001-02"]["total_cents"] == 5000
