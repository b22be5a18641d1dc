"""Outer-join family: customer_order_distribution (TPC-H Q13, filtered
LEFT OUTER JOIN with zero-count preservation) and user_activity_full
(FULL OUTER JOIN of two derived aggregates with typed NULLs). Oracle
parity at sf0.001 plus the semantic edges SQL parity can't isolate:
the fk_assumed=False orphan-key path and the NULL-side invariants."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

import __ray_entry__ as entry
from azure_blob_crawler_ray.pipelines import relational, tpch3

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _duck():
    con = duckdb.connect()
    for t in ("customer", "orders", "events", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "name",
    ["customer_order_distribution", "user_activity_full", "party_nations"],
)
def test_matches_oracle(name):
    got = _canon(entry.queries()[name](SF).to_pandas())
    want = _canon(_duck().execute(entry.oracle_sql()[name]).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q13_zero_bucket_present():
    """Customers with no qualifying order must appear as c_count=0."""
    got = entry.queries()["customer_order_distribution"](SF).to_pandas()
    con = _duck()
    n_cust = con.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    n_active = con.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders WHERE o_orderpriority <> '5-LOW'"
    ).fetchone()[0]
    zero_expected = n_cust - n_active
    zero_rows = got[got["c_count"] == 0]
    if zero_expected > 0:
        assert int(zero_rows["custdist"].iloc[0]) == zero_expected
    else:
        assert zero_rows.empty
    # histogram masses add back to the customer count (left-outer totality)
    assert int(got["custdist"].sum()) == n_cust


def test_q13_orphan_custkey_paths():
    """fk_assumed=True counts an orphan o_custkey as a phantom customer;
    fk_assumed=False semi-joins it away — on FK-clean data both paths
    are identical, and on dirty data only the exact path matches SQL."""
    customer = ray.data.from_arrow(
        pa.table({"c_custkey": pa.array([1, 2, 3], type=pa.int64())})
    )
    orders = ray.data.from_arrow(
        pa.table(
            {
                # custkey 99 exists in orders but not in customer (orphan);
                # custkey 3 has only excluded-priority orders -> c_count 0
                "o_custkey": pa.array([1, 1, 2, 99, 3], type=pa.int64()),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "2-HIGH", "1-URGENT", "1-URGENT", "5-LOW"]
                ),
            }
        )
    )
    exact = tpch3.customer_order_distribution(
        customer, orders, fk_assumed=False, num_buckets=4
    ).to_pandas()
    # SQL truth: c1 -> 2 orders, c2 -> 1, c3 -> 0 (its only order excluded)
    want = pd.DataFrame(
        {"c_count": [0, 1, 2], "custdist": [1, 1, 1]}, dtype="int64"
    )
    pd.testing.assert_frame_equal(_canon(exact), _canon(want), check_dtype=False)
    # the assumed path counts the orphan's 1-order group and deflates zero
    assumed = tpch3.customer_order_distribution(
        customer, orders, fk_assumed=True, num_buckets=4
    ).to_pandas()
    assert int(assumed.loc[assumed["c_count"] == 1, "custdist"].iloc[0]) == 2
    assert (assumed["c_count"] == 0).sum() == 0  # zero bucket eaten by orphan


def test_q13_both_paths_agree_on_fk_clean_data():
    a = _canon(
        tpch3.customer_order_distribution(
            ray.data.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"]),
            ray.data.read_parquet(
                f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
            ),
            fk_assumed=False,
        ).to_pandas()
    )
    b = _canon(entry.queries()["customer_order_distribution"](SF).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_full_outer_null_sides():
    """A user with only clicks carries NULL n_purchase and vice versa;
    a user with both carries two non-NULLs; users with neither type are
    absent even when they have other event types."""
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2, 3, 3, 4], type=pa.int64()),
                "event_type": pa.array(
                    ["click", "purchase", "click", "purchase", "purchase", "view"]
                ),
            }
        )
    )
    got = relational.user_activity_full(events).to_pandas()
    got = got.set_index("user_id")
    assert list(got.index) == [1, 2, 3]  # user 4 (view-only) absent
    assert got.loc[1, "n_click"] == 1 and got.loc[1, "n_purchase"] == 1
    assert got.loc[2, "n_click"] == 1 and pd.isna(got.loc[2, "n_purchase"])
    assert pd.isna(got.loc[3, "n_click"]) and got.loc[3, "n_purchase"] == 2


def test_q13_empty_orders_keeps_schema():
    """Zero qualifying orders must yield the single zero bucket, not a
    schema-less empty aggregate (the empty-groupby pitfall)."""
    customer = ray.data.from_arrow(
        pa.table({"c_custkey": pa.array([1, 2], type=pa.int64())})
    )
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_custkey": pa.array([1], type=pa.int64()),
                "o_orderpriority": pa.array(["5-LOW"]),  # all excluded
            }
        )
    )
    got = tpch3.customer_order_distribution(customer, orders).to_pandas()
    assert list(got.columns) == ["c_count", "custdist"]
    assert got.to_dict("list") == {"c_count": [0], "custdist": [2]}
