"""Round-2 additions — TPC-H Q3-style 3-table join, set ops, frame
window, histogram, grouped z-score, TF-IDF — vs brute-force pandas
oracles at sf0.001 (the DuckDB oracle twin runs in scripts/parity.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep, relational

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def events_ds():
    return ray.data.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_shipping_priority():
    cust = ray.data.read_parquet(f"{SF}/customer.parquet")
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    got = relational.shipping_priority(cust, orders, li, k=10).to_pandas()

    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    l = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    cutoff = pd.Timestamp("1998-06-01")
    keys = set(c.loc[c["c_mktsegment"] == "BUILDING", "c_custkey"])
    oo = o[(o["o_orderdate"] < cutoff) & o["o_custkey"].isin(keys)]
    ll = l[l["l_shipdate"] > cutoff].copy()
    ll["rev"] = ll["l_extendedprice"] * (1 - ll["l_discount"])
    j = ll.merge(oo, left_on="l_orderkey", right_on="o_orderkey")
    agg = (
        j.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"], as_index=False)[
            "rev"
        ]
        .sum()
        .assign(revenue=lambda d: d["rev"].round(2))
        .sort_values(["revenue", "o_orderkey"], ascending=[False, True])
        .head(10)
    )
    assert got["o_orderkey"].tolist() == agg["o_orderkey"].tolist()
    assert got["revenue"].tolist() == agg["revenue"].tolist()
    assert (
        got["o_orderdate"].tolist()
        == agg["o_orderdate"].dt.strftime("%Y-%m-%d").tolist()
    )


def test_user_type_sets(events_ds, events_pd):
    got = relational.user_type_sets(events_ds).to_pandas()
    f = events_pd.assign(
        has_a=(events_pd["event_type"] == "purchase").astype(int),
        has_b=(events_pd["event_type"] == "click").astype(int),
    ).groupby("user_id")[["has_a", "has_b"]].max()
    f = f[f["has_a"] == 1]
    want = pd.DataFrame(
        {
            "user_id": f.index,
            "membership": np.where(f["has_b"] == 1, "both", "a_only"),
        }
    ).sort_values("user_id")
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["membership"].tolist() == want["membership"].tolist()


def test_moving_avg(events_ds, events_pd):
    got = relational.moving_avg_per_user(events_ds, window=5).to_pandas()
    df = events_pd.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    want = (
        df.groupby("user_id")["value"]
        .rolling(5, min_periods=1)
        .mean()
        .reset_index(level=0)
    )
    want["event_id"] = df["event_id"].to_numpy()
    want = want.sort_values(["user_id", "event_id"])
    got = got.sort_values(["user_id", "event_id"])
    np.testing.assert_allclose(
        got["mavg"].to_numpy(), want["value"].round(6).to_numpy(), atol=1e-6
    )


def test_length_histogram(docs_ds, docs_pd):
    got = dataprep.length_histogram(docs_ds, bin_width=200).to_pandas()
    b = docs_pd["n_chars"] // 200 * 200
    want = (
        docs_pd.assign(bucket_lo=b)
        .groupby("bucket_lo")["n_chars"]
        .agg(n_docs="size", min_chars="min", max_chars="max")
        .reset_index()
        .sort_values("bucket_lo")
    )
    assert got["bucket_lo"].tolist() == want["bucket_lo"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["min_chars"].tolist() == want["min_chars"].tolist()
    assert got["max_chars"].tolist() == want["max_chars"].tolist()


def test_group_zscore(docs_ds, docs_pd):
    got = dataprep.group_zscore(docs_ds).to_pandas()
    g = docs_pd.groupby("lang")["n_chars"]
    mean = docs_pd["lang"].map(g.mean())
    sd = docs_pd["lang"].map(g.std(ddof=0))
    z = ((docs_pd["n_chars"] - mean) / sd).where(sd > 0, 0.0)
    want = docs_pd.assign(z=z.round(6)).sort_values("doc_id")
    got = got.sort_values("doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["zscore"].to_numpy(), want["z"].to_numpy(), atol=1e-6
    )


def test_tfidf_top_terms(docs_ds, docs_pd):
    k = 5
    got = dataprep.tfidf_top_terms(docs_ds, k=k).to_pandas()
    rows = []
    n_docs = float(len(docs_pd))
    df_counts: dict[str, int] = {}
    per_doc = {}
    for did, txt in zip(docs_pd["doc_id"], docs_pd["text"]):
        terms, counts = np.unique(txt.split(), return_counts=True)
        per_doc[did] = dict(zip(terms.tolist(), counts.tolist()))
        for t in terms.tolist():
            df_counts[t] = df_counts.get(t, 0) + 1
    for did, tfs in per_doc.items():
        scored = sorted(
            (
                (round(tf * np.log(n_docs / df_counts[t]), 6), t)
                for t, tf in tfs.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        rows.extend((did, t, s) for s, t in scored)
    want = pd.DataFrame(rows, columns=["doc_id", "term", "tfidf"]).sort_values(
        ["doc_id", "term"]
    )
    got = got.sort_values(["doc_id", "term"])
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    np.testing.assert_allclose(
        got["tfidf"].to_numpy(), want["tfidf"].to_numpy(), atol=1e-6
    )
