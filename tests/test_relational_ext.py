"""Window / pivot / distinct / rollup / quantile / anti-join / BM25 ops
vs brute-force pandas oracles at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import relational
from azure_blob_crawler_ray.pipelines.query import bm25_search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def events_ds():
    return ray.data.read_parquet(f"{SF}/events.parquet")


def test_user_running_totals(events_ds, events_pd):
    got = relational.user_running_totals(events_ds).to_pandas()
    df = events_pd.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    for uid, g in df.assign(cents=cents).groupby("user_id"):
        sub = got[got["user_id"] == uid].sort_values("running_count")
        assert sub["event_id"].tolist() == g["event_id"].tolist()
        assert sub["running_cents"].tolist() == g["cents"].cumsum().tolist()
        ts = g["ts"].astype("int64").to_numpy()
        want = np.r_[np.int64(-1), np.diff(ts)]
        assert sub["since_prev_us"].tolist() == want.tolist()


def test_pivot_matches_crosstab(events_ds, events_pd):
    cats = ("click", "error", "purchase", "signup", "view")
    got = relational.pivot_counts(events_ds, categories=cats).to_pandas()
    day = events_pd["ts"].dt.strftime("%Y-%m-%d")
    ct = pd.crosstab(day, events_pd["event_type"]).reindex(columns=list(cats), fill_value=0)
    got = got.set_index("day").sort_index()
    assert (got[list(cats)].to_numpy() == ct.sort_index().to_numpy()).all()


def test_distinct_users(events_ds, events_pd):
    got = relational.distinct_users_per_type(events_ds).to_pandas()
    want = events_pd.groupby("event_type")["user_id"].nunique()
    assert dict(zip(got["event_type"], got["distinct_users"])) == want.to_dict()


def test_rollup_levels(events_ds, events_pd):
    got = relational.events_rollup(events_ds).to_pandas()
    total = got[(got["day"] == "ALL") & (got["event_type"] == "ALL")]
    assert total["event_count"].tolist() == [len(events_pd)]
    day_rows = got[(got["day"] != "ALL") & (got["event_type"] == "ALL")]
    assert day_rows["event_count"].sum() == len(events_pd)
    fine = got[(got["day"] != "ALL") & (got["event_type"] != "ALL")]
    assert fine["event_count"].sum() == len(events_pd)


@pytest.mark.parametrize("num_value_buckets", [4, 64])
def test_group_quantiles_exact(num_value_buckets):
    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    got = relational.group_quantiles(
        li,
        value_col="l_extendedprice",
        group_col="l_returnflag",
        qs=(0.5, 0.9, 0.99),
        num_value_buckets=num_value_buckets,
    ).to_pandas()
    pdf = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    for (g, q), sub in got.groupby(["l_returnflag", "q"]):
        vals = np.sort(pdf.loc[pdf["l_returnflag"] == g, "l_extendedprice"].to_numpy())
        want = vals[int(np.ceil(q * len(vals))) - 1]  # percentile_disc
        assert sub["value"].tolist() == [want], (g, q)


def test_anti_join_native():
    cust = ray.data.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    got = relational.customers_without_orders(cust, orders, min_total=300_000.0).to_pandas()
    cpd = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    opd = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    big = set(opd.loc[opd["o_totalprice"] >= 300_000.0, "o_custkey"])
    want = sorted(set(cpd["c_custkey"]) - big)
    assert got["c_custkey"].tolist() == want


def test_approx_distinct_within_error(events_ds, events_pd):
    got = relational.approx_distinct_users_per_type(events_ds).to_pandas()
    exact = events_pd.groupby("event_type")["user_id"].nunique()
    for et, est in zip(got["event_type"], got["approx_users"]):
        # p=12 -> ~1.6% stderr; small cardinalities use linear counting.
        # allow 5% or +-3 absolute, whichever is larger
        tol = max(3, 0.05 * exact[et])
        assert abs(est - exact[et]) <= tol, (et, est, exact[et])


def test_approx_distinct_partitioning_invariant(events_ds):
    a = relational.approx_distinct_users_per_type(events_ds).to_pandas()
    b = relational.approx_distinct_users_per_type(
        events_ds.repartition(7)
    ).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_orders_above_customer_avg():
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    got = relational.orders_above_customer_avg(orders).to_pandas()
    opd = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    mean = opd.groupby("o_custkey")["o_totalprice"].transform("mean")
    want = opd.loc[opd["o_totalprice"] > 2.0 * mean, "o_orderkey"].sort_values()
    assert got["o_orderkey"].tolist() == want.tolist()


def test_bm25_ranks_term_docs_first():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = bm25_search(docs, ("data", "join"), top=10).to_pandas()
    assert len(got) == 10
    assert (got["score_e6"] > 0).all()
    # returned docs must actually contain a query term
    pdf = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id")
    for d in got["doc_id"]:
        t = pdf.loc[d, "text"]
        assert "data" in t or "join" in t
    # scores are descending
    assert (np.diff(got["score_e6"].to_numpy()) <= 0).all()


def test_grouped_topk_hot_key_prune():
    # one pathological customer holds 90% of all orders, split across
    # many small blocks — the map-side head-k combiner must still yield
    # exactly the global top-k per key
    n_hot, n_cold = 9000, 1000
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "o_custkey": np.r_[np.zeros(n_hot, np.int64),
                               rng.randint(1, 200, n_cold).astype(np.int64)],
            "o_orderkey": np.arange(n_hot + n_cold, dtype=np.int64),
            "o_totalprice": rng.uniform(1, 1e6, n_hot + n_cold).round(2),
        }
    )
    ds = ray.data.from_pandas(df).repartition(40)
    got = relational.top_orders_per_customer(ds, k=3).to_pandas()
    want = (
        df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                       ascending=[True, False, True])
        .groupby("o_custkey")
        .head(3)
    )
    want = want.assign(
        rank=want.groupby("o_custkey").cumcount() + 1
    )[["o_custkey", "rank", "o_orderkey", "o_totalprice"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
