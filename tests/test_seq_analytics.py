"""Funnel stages, per-user mode, exact-moment Pearson corr, MoM growth
and type co-occurrence vs brute-force pandas oracles at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def events_ds():
    return ray.data.read_parquet(f"{SF}/events.parquet")


def _funnel_oracle(events_pd, steps=("view", "click", "purchase")):
    out = {}
    for uid, g in events_pd.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        v = g[g["event_type"] == steps[0]]["ts"]
        if v.empty:
            continue
        stage, t = 1, v.min()
        c = g[(g["event_type"] == steps[1]) & (g["ts"] > t)]["ts"]
        if not c.empty:
            stage, t = 2, c.min()
            p = g[(g["event_type"] == steps[2]) & (g["ts"] > t)]["ts"]
            if not p.empty:
                stage = 3

        out[uid] = stage
    return out


def test_funnel_stage(events_ds, events_pd):
    got = relational.funnel_stage(events_ds).to_pandas()
    want = _funnel_oracle(events_pd)
    assert dict(zip(got["user_id"], got["funnel_stage"])) == want


def test_funnel_partitioning_invariant(events_ds):
    a = relational.funnel_stage(events_ds).to_pandas()
    b = relational.funnel_stage(events_ds.repartition(7), num_buckets=5).to_pandas()
    assert a.equals(b)


def test_mode_event_type(events_ds, events_pd):
    got = relational.mode_event_type(events_ds).to_pandas()
    cnt = (
        events_pd.groupby(["user_id", "event_type"]).size().reset_index(name="cnt")
    )
    cnt = cnt.sort_values(
        ["user_id", "cnt", "event_type"], ascending=[True, False, True]
    )
    want = cnt.groupby("user_id").first()
    assert dict(zip(got["user_id"], got["mode_type"])) == want["event_type"].to_dict()
    assert dict(zip(got["user_id"], got["mode_cnt"])) == want["cnt"].to_dict()


def test_corr_qty_discount():
    li = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    got = relational.corr_qty_discount(li).to_pandas()
    pdf = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    for _, row in got.iterrows():
        g = pdf[pdf["l_returnflag"] == row["l_returnflag"]]
        want = np.corrcoef(g["l_quantity"], g["l_discount"])[0, 1]
        assert abs(row["corr_qd"] - want) < 1e-5
        assert row["n_rows"] == len(g)


def test_monthly_growth():
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = relational.monthly_growth(orders)
    pdf = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    pdf["cents"] = np.floor(pdf["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    m = (
        pdf.groupby([pdf["o_orderdate"].dt.year, pdf["o_orderdate"].dt.month])["cents"]
        .sum()
        .sort_index()
    )
    assert len(got) == len(m) - 1
    assert got["revenue_cents"].tolist() == m.tolist()[1:]
    cents = m.to_numpy()
    growth = (cents[1:] - cents[:-1]) / cents[:-1]
    assert np.allclose(got["growth"].to_numpy(), np.round(growth, 6), atol=1e-9)


def test_type_cooccurrence(events_ds, events_pd):
    got = relational.type_cooccurrence(events_ds).to_pandas()
    d = events_pd[["user_id", "event_type"]].drop_duplicates()
    pairs = d.merge(d, on="user_id")
    pairs = pairs[pairs["event_type_x"] < pairs["event_type_y"]]
    want = (
        pairs.groupby(["event_type_x", "event_type_y"]).size().to_dict()
    )
    gotd = {
        (a, b): n for a, b, n in zip(got["type_a"], got["type_b"], got["n_users"])
    }
    assert gotd == want


def test_cooccurrence_partitioning_invariant(events_ds):
    a = relational.type_cooccurrence(events_ds).to_pandas()
    b = relational.type_cooccurrence(
        events_ds.repartition(7), num_buckets=5
    ).to_pandas()
    assert a.equals(b)


def test_global_rank():
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = relational.global_rank(orders).to_pandas()
    pdf = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    pdf["cents"] = np.floor(pdf["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    pdf = pdf.sort_values(["cents", "o_orderkey"], ascending=[False, True])
    pdf["rank"] = np.arange(1, len(pdf) + 1)
    want = pdf.set_index("o_orderkey")["rank"].to_dict()
    assert dict(zip(got["o_orderkey"], got["price_rank"])) == want
    # NTILE semantics: first n%4 tiles take one extra row
    n = len(pdf)
    q, r = divmod(n, 4)
    sizes = got["quartile"].value_counts().sort_index().tolist()
    assert sizes == [q + 1] * r + [q] * (4 - r)


def test_global_rank_partitioning_invariant():
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    a = relational.global_rank(orders).to_pandas()
    b = relational.global_rank(orders.repartition(7)).to_pandas()
    assert a.equals(b)


def test_source_entropy():
    from azure_blob_crawler_ray.pipelines import dataprep

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = dataprep.source_entropy(docs).to_pandas()
    pdf = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, row in got.iterrows():
        g = pdf[pdf["lang"] == row["lang"]]
        c = g.groupby("source").size().to_numpy().astype(np.float64)
        p = c / c.sum()
        assert abs(row["entropy"] - (-(p * np.log2(p)).sum())) < 1e-6
        assert row["n_docs"] == len(g)
        assert row["n_sources"] == len(c)


def test_json_prop_stats(events_ds, events_pd):
    got = relational.json_prop_stats(events_ds).to_pandas()
    k = events_pd["props"].str.extract(r'"k":\s*(-?\d+)')[0].astype("Int64")
    df = pd.DataFrame({"event_type": events_pd["event_type"], "k": k}).dropna()
    want = df.groupby("event_type")["k"].agg(["count", "sum", "min", "max"])
    for _, row in got.iterrows():
        w = want.loc[row["event_type"]]
        assert (row["n"], row["sum_k"], row["min_k"], row["max_k"]) == (
            w["count"], w["sum"], w["min"], w["max"],
        )


def test_revenue_share():
    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = relational.revenue_share(orders)
    assert abs(got["share"].sum() - 1.0) < 1e-4
    pdf = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    pdf["cents"] = np.floor(pdf["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    want = pdf.groupby("o_orderpriority")["cents"].sum()
    assert dict(zip(got["o_orderpriority"], got["revenue_cents"])) == want.to_dict()


def test_cohort_retention(events_ds, events_pd):
    got = relational.cohort_retention(events_ds).to_pandas()
    wk = (events_pd["ts"].astype("int64") // 604_800_000_000).astype(np.int64)
    a = pd.DataFrame({"user_id": events_pd["user_id"], "week": wk}).drop_duplicates()
    cw = a.groupby("user_id")["week"].transform("min")
    cell = pd.DataFrame({"cohort_week": cw, "week_offset": a["week"] - cw})
    want = cell.groupby(["cohort_week", "week_offset"]).size().to_dict()
    gotd = {
        (c, o): n
        for c, o, n in zip(got["cohort_week"], got["week_offset"], got["n_users"])
    }
    assert gotd == want


def test_cohort_partitioning_invariant(events_ds):
    a = relational.cohort_retention(events_ds).to_pandas()
    b = relational.cohort_retention(
        events_ds.repartition(7), num_buckets=5
    ).to_pandas()
    assert a.equals(b)


def test_rolling_active_users(events_ds, events_pd):
    got = relational.rolling_active_users(events_ds).to_pandas()
    day = (events_pd["ts"].astype("int64") // 86_400_000_000).astype(np.int64)
    du = pd.DataFrame({"user_id": events_pd["user_id"], "day": day}).drop_duplicates()
    for _, row in got.iterrows():
        d = row["day"]
        want = du[(du["day"] >= d - 6) & (du["day"] <= d)]["user_id"].nunique()
        assert row["active_users"] == want
    assert sorted(got["day"]) == sorted(du["day"].unique())


def test_rolling_active_partitioning_invariant(events_ds):
    a = relational.rolling_active_users(events_ds).to_pandas()
    b = relational.rolling_active_users(
        events_ds.repartition(7), num_buckets=5
    ).to_pandas()
    assert a.equals(b)


def test_unpivot_daily_roundtrip(events_ds, events_pd):
    got = relational.unpivot_daily(events_ds).to_pandas()
    day = events_pd["ts"].dt.strftime("%Y-%m-%d")
    want = (
        pd.DataFrame({"day": day, "event_type": events_pd["event_type"]})
        .groupby(["day", "event_type"])
        .size()
        .to_dict()
    )
    gotd = {(d, t): n for d, t, n in zip(got["day"], got["event_type"], got["n"])}
    assert gotd == want


def test_lang_sources():
    from azure_blob_crawler_ray.pipelines import dataprep

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = dataprep.lang_sources(docs).to_pandas()
    pdf = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, row in got.iterrows():
        want = sorted(pdf[pdf["lang"] == row["lang"]]["source"].unique())
        assert row["sources"] == ",".join(want)
        assert row["n_sources"] == len(want)
