"""Q10/Q15/Q19/Q22-shaped operators (pipelines/tpch2.py) plus the
scrub / centroid-outlier curation ops — each checked against a
driver-side pandas/duckdb twin on the sf0.001 tables (the external
parity gate re-checks them against oracle_sql() at sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep, similarity, tpch2

SF = "/root/testdata/sf0.001"


def _rd(table: str, cols=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{SF}/{table}.parquet", columns=cols)


def _duck():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "supplier", "part", "events", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_returned_item_revenue_matches_sql():
    got = tpch2.returned_item_revenue(
        _rd("lineitem"), _rd("orders"), _rd("customer"), k=10
    ).to_pandas()
    want = _duck().execute(
        """
        WITH li AS (
            SELECT l_orderkey,
                   SUM(CAST(FLOOR(l_extendedprice*(1.0-l_discount)*100.0+0.5)
                       AS BIGINT)) AS cents
            FROM lineitem WHERE l_returnflag='R' GROUP BY l_orderkey)
        SELECT c.c_custkey, c.c_name, ROUND(SUM(li.cents)/100.0, 2) AS revenue
        FROM li JOIN orders o ON li.l_orderkey=o.o_orderkey
        JOIN customer c ON o.o_custkey=c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY SUM(li.cents) DESC, c.c_custkey LIMIT 10
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_top_revenue_supplier_is_global_argmax():
    got = tpch2.top_revenue_supplier(_rd("lineitem"), _rd("supplier")).to_pandas()
    want = _duck().execute(
        """
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(FLOOR(l_extendedprice*(1.0-l_discount)*100.0+0.5)
                       AS BIGINT)) AS cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, ROUND(rev.cents/100.0,2) AS total_revenue
        FROM rev JOIN supplier s ON rev.l_suppkey=s.s_suppkey
        WHERE rev.cents = (SELECT MAX(cents) FROM rev) ORDER BY s.s_suppkey
        """
    ).df()
    assert len(got) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_disjunctive_revenue_multi_clause_counting():
    # overlapping clauses on the SAME brand: a row in both quantity
    # ranges must count toward each clause
    clauses = [("Brand#12", 1, 50, 1.0, 30.0), ("Brand#12", 1, 50, 20.0, 50.0)]
    got = tpch2.disjunctive_revenue(
        _rd("lineitem"), _rd("part"), clauses=clauses
    ).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    pt = pq.read_table(f"{SF}/part.parquet").to_pandas()
    m = li.merge(pt[["p_partkey", "p_brand", "p_size"]], left_on="l_partkey",
                 right_on="p_partkey")
    m["cents"] = np.floor(
        m["l_extendedprice"] * (1.0 - m["l_discount"]) * 100.0 + 0.5
    ).astype(np.int64)
    for cid, (b, smin, smax, qmin, qmax) in enumerate(clauses):
        sel = m[(m["p_brand"] == b) & m["p_size"].between(smin, smax)
                & m["l_quantity"].between(qmin, qmax)]
        row = got[got["clause_id"] == cid]
        assert int(row["n_items"].iloc[0]) == len(sel)
        assert abs(float(row["revenue"].iloc[0]) - round(sel["cents"].sum() / 100.0, 2)) < 1e-9


def test_dormant_rich_customers_threshold_and_antijoin():
    got = tpch2.dormant_rich_customers(_rd("customer"), _rd("orders")).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cents = np.floor(cust["c_acctbal"] * 100.0 + 0.5).astype(np.int64)
    pos = cents[cents > 0]
    rich = cust[(cents * len(pos)) > pos.sum()].copy()
    rich["bal_cents"] = cents[(cents * len(pos)) > pos.sum()]
    recent = set(orders[orders["o_orderdate"] >= pd.Timestamp("2001-01-01")]["o_custkey"])
    dormant = rich[~rich["c_custkey"].isin(recent)]
    want = (
        dormant.groupby("c_nationkey")
        .agg(numcust=("c_custkey", "size"), cents=("bal_cents", "sum"))
        .reset_index()
        .sort_values("c_nationkey")
    )
    assert got["c_nationkey"].tolist() == want["c_nationkey"].tolist()
    assert got["numcust"].tolist() == want["numcust"].tolist()
    assert np.allclose(got["totacctbal"], (want["cents"] / 100.0).round(2))


def test_scrub_values_redacts_all_digits():
    got = dataprep.scrub_values(_rd("events")).to_pandas()
    assert not got["scrubbed"].str.contains(r"[0-9]").any()
    # redaction count equals the digit-run count of the original
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    merged = got.merge(ev[["event_id", "props"]], on="event_id")
    runs = merged["props"].str.count(r"[0-9]+")
    assert (merged["n_redacted"] == runs).all()


def test_centroid_outliers_flags_below_threshold_rows():
    out = similarity.centroid_outliers(_rd("embeddings"), threshold=-0.05).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    from azure_blob_crawler_ray.pipelines.similarity import _emb_matrix, _normalize

    m = _emb_matrix(emb).astype(np.float64)
    lab = emb["label"].to_numpy().astype(np.int64)
    q = np.floor(m * (1 << 20)).astype(np.int64)
    uniq = np.unique(lab)
    C = np.zeros((len(uniq), q.shape[1]))
    for i, l in enumerate(uniq):
        sel = lab == l
        C[i] = q[sel].sum(axis=0) / sel.sum()
    C = _normalize(C)
    row = {int(l): i for i, l in enumerate(uniq)}
    own = np.einsum(
        "ij,ij->i", _normalize(m), C[np.array([row[int(x)] for x in lab])]
    )
    want = set(emb["vec_id"].to_numpy()[own < -0.05].tolist())
    assert set(out["vec_id"].tolist()) == want
    assert len(out) > 0


def test_pareto_front_ties_and_layout():
    from azure_blob_crawler_ray.pipelines import relational

    # (price, size): A(1.0, 5) and B(1.0, 5) tie on both axes -> both
    # survive; C(1.0, 4) dominated by A; D(0.5, 1) survives (cheapest);
    # E(2.0, 9) survives (biggest); F(2.0, 8) dominated by E
    tbl = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "p_retailprice": pa.array([1.0, 1.0, 1.0, 0.5, 2.0, 2.0]),
            "p_size": pa.array([5, 5, 4, 1, 9, 8], type=pa.int32()),
        }
    )
    for parts in (1, 4):
        out = relational.pareto_front(
            ray.data.from_arrow(tbl).repartition(parts)
        ).to_pandas()
        assert out["p_partkey"].tolist() == [1, 2, 4, 5]
