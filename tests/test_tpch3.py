"""Q6/Q7/Q8/Q9/Q11/Q12/Q16/Q17/Q20/Q21-shaped operators
(pipelines/tpch3.py), each checked against its own oracle_sql() twin on
the sf0.001 tables — a pytest replica of the driver's parity gate for
the new family (the external gate re-checks them at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"

NEW_TPCH = [
    "forecast_revenue",
    "nation_trade_volume",
    "market_share",
    "product_profit",
    "nation_part_value",
    "returnflag_priority_counts",
    "supplier_part_counts",
    "small_qty_revenue",
    "bulk_part_suppliers",
    "sole_return_suppliers",
]


def _duck():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", NEW_TPCH)
def test_matches_oracle(name):
    got = _canon(entry.queries()[name](SF).to_pandas())
    want = _canon(_duck().execute(entry.oracle_sql()[name]).df())
    assert len(got) > 0, f"{name} empty at sf0.001 — constants too selective"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_join_fallback_paths_match_broadcast():
    """Forcing max_broadcast_rows=0 routes market_share / product_profit /
    supplier_part_counts through the distributed bucket_hash_join part
    attach instead of the dense positional-array broadcast; output must
    be identical — the scale path and the bench path are the same
    operator."""
    import ray.data
    from azure_blob_crawler_ray.pipelines import tpch3

    def rd(t, cols):
        return ray.data.read_parquet(f"{SF}/{t}.parquet", columns=cols)

    cases = [
        (
            lambda **kw: tpch3.market_share(
                rd("lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                                "l_extendedprice", "l_discount"]),
                rd("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
                rd("customer", ["c_custkey", "c_nationkey"]),
                rd("supplier", ["s_suppkey", "s_nationkey"]),
                rd("nation", ["n_nationkey", "n_name", "n_regionkey"]),
                rd("region", ["r_regionkey", "r_name"]),
                rd("part", ["p_partkey", "p_type"]),
                **kw,
            )
        ),
        (
            lambda **kw: tpch3.product_profit(
                rd("lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                                "l_quantity", "l_extendedprice", "l_discount"]),
                rd("orders", ["o_orderkey", "o_orderdate"]),
                rd("supplier", ["s_suppkey", "s_nationkey"]),
                rd("part", ["p_partkey", "p_name", "p_retailprice"]),
                rd("nation", ["n_nationkey", "n_name"]),
                **kw,
            )
        ),
        (
            lambda **kw: tpch3.supplier_part_counts(
                rd("lineitem", ["l_partkey", "l_suppkey"]),
                rd("part", ["p_partkey", "p_brand", "p_type", "p_size"]),
                rd("supplier", ["s_suppkey", "s_acctbal"]),
                **kw,
            )
        ),
    ]
    for build in cases:
        broad = _canon(build().to_pandas())
        joined = _canon(build(max_broadcast_rows=0).to_pandas())
        assert len(broad) > 0
        pd.testing.assert_frame_equal(joined, broad, check_dtype=False)
