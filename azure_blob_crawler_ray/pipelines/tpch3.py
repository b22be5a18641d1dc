"""The remaining TPC-H-shaped distributed patterns (SURVEY.md §2.4-2.6
generic shapes; reference analog = the wide lookup/aggregate steps its
indexer delegates to Azure services, shared/azure_clients/
search_client.py:214-259).  The synthetic star schema has no partsupp
table and no shipmode/commitdate columns, so the spec constants are
adapted to the available columns — the SHAPES (the interesting
distributed plans) are preserved exactly:

  * Q6  scan-heavy single-pass filter aggregate (zero exchange);
  * Q7  two-fact join with a symmetric nation-pair predicate evaluated
        map-side from broadcast dimension maps;
  * Q8  market share: conditional/total ratio per year, the flag column
        riding through the joins instead of a second pass;
  * Q9  profit rollup with a per-part cost lookup broadcast as dense
        positional arrays (partsupp's supplycost -> retailprice proxy);
  * Q11 grouped value share against a GLOBAL scalar computed from the
        same (materialized-once, still distributed) aggregate;
  * Q12 fact-fact join + conditional counts (shipmode -> returnflag);
  * Q16 distinct-count per group via suppkey-bucketed exact dedup (a
        supplier lives in exactly ONE bucket, so per-bucket distinct
        partials ADD — no double counting without a global dedup);
  * Q17 correlated per-group average threshold (0.2*avg qty), the
        comparison held in exact integers so no float drift;
  * Q20 semi-join through a HAVING-filtered pair aggregate;
  * Q21 per-order multi-supplier exists/not-exists (sole returning
        supplier), computed vectorized inside orderkey buckets.

Money stays exact int64 cents (floor(x*100+0.5)) until the boundary;
ratio outputs divide int64/int64 in float64 — bit-identical to DuckDB's
BIGINT/BIGINT `/`."""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.bloom import bloom_of_dataset
from .relational import bucket_hash_join
from .tpch2 import _cents, _names_for_keys, _ts

MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((ids.astype(np.uint64) * MIX) % np.uint64(num_buckets)).astype(np.int32)


def _nation_key(nation: ray.data.Dataset, name: str) -> int:
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    return int(nat[nat["n_name"] == name]["n_nationkey"].iloc[0])


def _supplier_nation_map(supplier: ray.data.Dataset) -> pd.Series:
    """suppkey -> nationkey (suppliers are fact/10,000 in TPC-H — a
    dense int map even at 100 TB)."""
    sup = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    return pd.Series(
        sup["s_nationkey"].astype(np.int64).to_numpy(),
        index=sup["s_suppkey"].astype(np.int64),
    )


def forecast_revenue(
    lineitem: ray.data.Dataset,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> ray.data.Dataset:
    """TPC-H Q6 shape: revenue gained by dropping the discount on a
    filtered slice — the pure scan-aggregate (zero exchange beyond the
    final one-row reduce; the 100 TB plan is read -> filter -> two
    int64 partials per block).  Revenue = sum(extendedprice * discount)
    in exact cents."""
    lo, hi = _ts(date_from), _ts(date_to)

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(disc_lo)),
                    pc.less_equal(batch["l_discount"], pa.scalar(disc_hi)),
                ),
                pc.less(batch["l_quantity"], pa.scalar(max_qty)),
            ),
        )
        t = batch.filter(m)
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(t["l_extendedprice"], t["l_discount"]), 100.0
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "one": pa.array([1], type=pa.int64()),
                "cents": pa.array([pc.sum(cents).as_py() or 0], type=pa.int64()),
                "n": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    agg = (
        lineitem.select_columns(
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("one")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    cents = int(agg["cents"].iloc[0]) if len(agg) else 0
    n = int(agg["n"].iloc[0]) if len(agg) else 0
    return ray.data.from_arrow(
        pa.table(
            {
                "revenue": pa.array([round(cents / 100.0, 2)], type=pa.float64()),
                "n_items": pa.array([n], type=pa.int64()),
            }
        )
    )


def nation_trade_volume(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
    *,
    nation_a: str = "NATION_2",
    nation_b: str = "NATION_3",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q7 shape: shipping volume between two nations by direction
    and year.

    Scale shape: supplier->nation and the two nation keys broadcast
    (ray.put once); customer is projected+filtered to the two nations
    MAP-SIDE; orders are Bloom-pruned by the surviving custkeys before
    the first ``bucket_hash_join``; lineitem is shipdate-filtered,
    supplier-nation-tagged and pair-filtered map-side, Bloom-pruned on
    orderkey, then joined; the final exchange is a tiny
    (supp, cust, year) groupby of per-block partial sums."""
    ka = np.int64(_nation_key(nation, nation_a))
    kb = np.int64(_nation_key(nation, nation_b))
    names = {int(ka): nation_a, int(kb): nation_b}
    smap = _supplier_nation_map(supplier)
    bc = ray.put((ka, kb, smap))
    lo, hi = _ts(date_from), _ts(date_to)

    def cust_proj(batch: pa.Table) -> pa.Table:
        a, b, _ = ray.get(bc)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (nk == a) | (nk == b)
        return pa.table(
            {
                "c_custkey": pc.cast(batch["c_custkey"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "c_nationkey": pa.array(nk[keep]),
            }
        )

    cust = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        cust_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    cbloom_ref = ray.put(bloom_of_dataset(cust.select_columns(["c_custkey"]), "c_custkey"))

    def ord_proj(batch: pa.Table) -> pa.Table:
        bf = ray.get(cbloom_ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = batch.filter(pa.array(bf.contains_many(keys)))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        )

    ordy = orders.select_columns(["o_orderkey", "o_custkey"]).map_batches(
        ord_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    ord_cust = bucket_hash_join(
        ordy,
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        num_buckets=num_buckets,
    )
    obloom_ref = ray.put(
        bloom_of_dataset(ord_cust.select_columns(["o_orderkey"]), "o_orderkey")
    )

    def li_proj(batch: pa.Table) -> pa.Table:
        a, b, sm = ray.get(bc)
        bf = ray.get(obloom_ref)
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi),
        )
        t = batch.filter(m)
        sk = pd.Series(t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        s_nat = sk.map(sm).to_numpy()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((s_nat == a) | (s_nat == b)) & bf.contains_many(ok.astype(np.uint64))
        t = t.filter(pa.array(keep))
        year = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        return pa.table(
            {
                "l_orderkey": pa.array(ok[keep]),
                "supp_nat": pa.array(s_nat[keep]),
                "l_year": year,
                "cents": _cents(t["l_extendedprice"], t["l_discount"]),
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
    joined = bucket_hash_join(
        li,
        ord_cust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("supp_nat", pa.int64()),
                ("l_year", pa.int64()),
                ("cents", pa.int64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
            ]
        ),
        num_buckets=num_buckets,
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        a, b, _ = ray.get(bc)
        s = batch["supp_nat"].to_numpy(zero_copy_only=False)
        c = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = ((s == a) & (c == b)) | ((s == b) & (c == a))
        t = batch.filter(pa.array(keep))
        g = (
            t.select(["supp_nat", "c_nationkey", "l_year", "cents"])
            .group_by(["supp_nat", "c_nationkey", "l_year"])
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["supp_nat", "cust_nat", "l_year", "cents"])

    # the final aggregate is 2 directions x #years rows by construction —
    # finish driver-side with an explicit schema so an EMPTY slice still
    # returns the declared columns (an empty groupby loses its schema)
    agg = (
        joined.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["supp_nat", "cust_nat", "l_year"])
        .aggregate(Sum("cents"))
        .to_pandas()
    )
    if len(agg):
        agg = agg.assign(
            __sn=agg["supp_nat"].map(lambda x: names[int(x)]),
            __cn=agg["cust_nat"].map(lambda x: names[int(x)]),
        ).sort_values(["__sn", "__cn", "l_year"], kind="mergesort")
    out = pa.table(
        {
            "supp_nation": pa.array(
                [names[int(x)] for x in agg.get("supp_nat", [])], type=pa.string()
            ),
            "cust_nation": pa.array(
                [names[int(x)] for x in agg.get("cust_nat", [])], type=pa.string()
            ),
            "l_year": pa.array(
                np.asarray(agg.get("l_year", []), dtype=np.int64)
            ),
            "revenue": pa.array(
                np.round(
                    np.asarray(agg.get("sum(cents)", []), dtype=np.int64) / 100.0, 2
                ),
                type=pa.float64(),
            ),
        }
    )
    return ray.data.from_arrow(out)


def market_share(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
    region: ray.data.Dataset,
    part: ray.data.Dataset,
    *,
    supp_nation: str = "NATION_3",
    region_name: str = "ASIA",
    part_type: str = "PROMO",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
    num_buckets: int = 64,
    max_broadcast_rows: int = 30_000_000,
) -> ray.data.Dataset:
    """TPC-H Q8 shape: one nation's share of the revenue for one part
    type sold into one region, by order year.

    Scale shape: the type filter is broadcast as a DENSE boolean
    positional array over partkey (the Q19 trick — one bit per part, so
    the filter is a numpy gather with zero join) WHEN the part table
    fits a driver broadcast (<= ``max_broadcast_rows``); above that —
    part is fact/30, so at 100 TB it does not — the type filter becomes
    a distributed semi-join via ``bucket_hash_join`` on partkey, same
    output bit-for-bit (forced-low-threshold pytest asserts equality);
    supplier->nation is a broadcast map that tags each row with an
    ``is_nat`` flag which RIDES THROUGH the join, so share needs no
    second pass; orders are year-filtered and the region-filtered
    customers Bloom-prune them; the final exchange is a #years-row
    groupby.  Share divides exact int64 cents in float64 —
    bit-identical to the SQL oracle."""
    import pandas as _pd

    nat = nation.select_columns(["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg[reg["r_name"] == region_name]["r_regionkey"].iloc[0])
    region_nset = np.sort(
        nat[nat["n_regionkey"] == rkey]["n_nationkey"].to_numpy().astype(np.int64)
    )
    skey = np.int64(_nation_key(nation, supp_nation))
    smap = _supplier_nation_map(supplier)

    broadcast_parts = int(part.count()) <= max_broadcast_rows
    if broadcast_parts:
        pt = part.select_columns(["p_partkey", "p_type"]).to_pandas()
        pk = pt["p_partkey"].astype(np.int64).to_numpy()
        type_mask = np.zeros(int(pk.max()) + 1, dtype=bool)
        type_mask[pk[(pt["p_type"] == part_type).to_numpy()]] = True
    else:
        type_mask = None
    bc = ray.put((region_nset, skey, smap, type_mask))
    lo, hi = _ts(date_from), _ts(date_to)

    def cust_proj(batch: pa.Table) -> pa.Table:
        ns, _, _, _ = ray.get(bc)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, ns)
        return pa.table(
            {"c_custkey": pc.cast(batch["c_custkey"], pa.int64()).filter(pa.array(keep))}
        )

    cust = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        cust_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    cbloom_ref = ray.put(bloom_of_dataset(cust, "c_custkey"))

    def ord_proj(batch: pa.Table) -> pa.Table:
        bf = ray.get(cbloom_ref)
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo),
            pc.less(batch["o_orderdate"], hi),
        )
        t = batch.filter(m)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = t.filter(pa.array(bf.contains_many(keys)))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    ordy = orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ord_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    # exact semi-join: Bloom passes false positives, the bucket join
    # against the real custkey set removes them
    ord_cust = bucket_hash_join(
        ordy,
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("o_year", pa.int64())]
        ),
        right_schema=pa.schema([("c_custkey", pa.int64())]),
        num_buckets=num_buckets,
    )
    obloom_ref = ray.put(
        bloom_of_dataset(ord_cust.select_columns(["o_orderkey"]), "o_orderkey")
    )

    def li_proj(batch: pa.Table) -> pa.Table:
        _, sk, sm, mask = ray.get(bc)
        bf = ray.get(obloom_ref)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if mask is not None:
            keep = np.zeros(len(p), dtype=bool)
            in_range = p < len(mask)
            keep[in_range] = mask[p[in_range]]
        else:  # join path: the part filter happens in the semi-join below
            keep = np.ones(len(p), dtype=bool)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep &= bf.contains_many(ok.astype(np.uint64))
        t = batch.filter(pa.array(keep))
        sup = _pd.Series(
            t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        is_nat = (sup.map(sm).to_numpy() == sk).astype(np.int64)
        cents = _cents(t["l_extendedprice"], t["l_discount"])
        cols = {
            "l_orderkey": pa.array(ok[keep]),
            "cents": cents,
            "nat_cents": pc.multiply(cents, pa.array(is_nat)),
        }
        if mask is None:
            cols["l_partkey"] = pa.array(p[keep])
        return pa.table(cols)

    li = lineitem.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
    if not broadcast_parts:
        def part_keys_proj(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["p_type"], part_type))
            return pa.table({"p_partkey": pc.cast(t["p_partkey"], pa.int64())})

        part_keys = part.select_columns(["p_partkey", "p_type"]).map_batches(
            part_keys_proj, batch_format="pyarrow", zero_copy_batch=True
        )
        li = bucket_hash_join(
            li,
            part_keys,
            left_on="l_partkey",
            right_on="p_partkey",
            left_schema=pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("cents", pa.int64()),
                    ("nat_cents", pa.int64()),
                    ("l_partkey", pa.int64()),
                ]
            ),
            right_schema=pa.schema([("p_partkey", pa.int64())]),
            num_buckets=num_buckets,
        ).select_columns(["l_orderkey", "cents", "nat_cents"])
    joined = bucket_hash_join(
        li,
        ord_cust.select_columns(["o_orderkey", "o_year"]),
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("cents", pa.int64()), ("nat_cents", pa.int64())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
        num_buckets=num_buckets,
    )

    def year_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["o_year", "cents", "nat_cents"])
            .group_by(["o_year"])
            .aggregate([("cents", "sum"), ("nat_cents", "sum")])
        )
        return g.rename_columns(["o_year", "cents", "nat_cents"])

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch["sum(cents)"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat_c = batch["sum(nat_cents)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_year": batch["o_year"],
                "mkt_share": pa.array(nat_c / tot, type=pa.float64()),
                "total_revenue": pa.array(np.round(tot / 100.0, 2)),
            }
        )

    return (
        joined.map_batches(year_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_year")
        .aggregate(Sum("cents"), Sum("nat_cents"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("o_year")
    )


def product_profit(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    supplier: ray.data.Dataset,
    part: ray.data.Dataset,
    nation: ray.data.Dataset,
    *,
    name_contains: str = "red",
    num_buckets: int = 64,
    max_broadcast_rows: int = 30_000_000,
) -> ray.data.Dataset:
    """TPC-H Q9 shape: profit per supplier nation per order year for
    parts whose name matches.  No partsupp table exists, so unit cost
    is proxied as 10% of p_retailprice — the plan is identical to the
    spec's (per-part cost lookup joined into the fact): profit_cents =
    cents(extprice, disc) - floor(retail*10+0.5) * qty, all exact ints.

    Scale shape: the name-filtered part dimension is broadcast as TWO
    dense positional arrays (match bit + unit-cost cents) so the cost
    join is a numpy gather — WHEN part fits a driver broadcast (<=
    ``max_broadcast_rows``); above that (part is fact/30 — at 100 TB
    the dense array does not fit) the cost lookup becomes a distributed
    ``bucket_hash_join`` on partkey with identical output
    (forced-low-threshold pytest asserts equality); supplier->nation
    broadcast map; orders are Bloom-pruned by surviving lineitem
    orderkeys, then ONE ``bucket_hash_join`` attaches the year; final
    exchange is a (#nations x #years)-row groupby."""
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    nname = pd.Series(
        nat["n_name"].to_numpy(), index=nat["n_nationkey"].astype(np.int64)
    )
    smap = _supplier_nation_map(supplier)
    broadcast_parts = int(part.count()) <= max_broadcast_rows
    if broadcast_parts:
        pt = part.select_columns(["p_partkey", "p_name", "p_retailprice"]).to_pandas()
        pk = pt["p_partkey"].astype(np.int64).to_numpy()
        hit = pt["p_name"].str.contains(name_contains, regex=False).to_numpy()
        size = int(pk.max()) + 1
        mask = np.zeros(size, dtype=bool)
        mask[pk[hit]] = True
        cost = np.zeros(size, dtype=np.int64)
        cost[pk] = np.floor(pt["p_retailprice"].to_numpy() * 10.0 + 0.5).astype(
            np.int64
        )
        bc = ray.put((smap, mask, cost))
    else:
        bc = ray.put((smap, None, None))

    def li_proj(batch: pa.Table) -> pa.Table:
        sm, msk, cst = ray.get(bc)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if msk is not None:
            keep = np.zeros(len(p), dtype=bool)
            in_range = p < len(msk)
            keep[in_range] = msk[p[in_range]]
            t = batch.filter(pa.array(keep))
            p = p[keep]
        else:  # join path: filter + cost attach happen in the join below
            t = batch
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _cents(t["l_extendedprice"], t["l_discount"]).to_numpy(
            zero_copy_only=False
        )
        sup = pd.Series(t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        s_nat = sup.map(sm).to_numpy().astype(np.int64)
        cols = {
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "s_nat": pa.array(s_nat),
        }
        if msk is not None:
            cols["amount"] = pa.array(rev - cst[p] * qty)
        else:
            cols["l_partkey"] = pa.array(p)
            cols["qty"] = pa.array(qty)
            cols["rev"] = pa.array(rev)
        return pa.table(cols)

    li = lineitem.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
    if not broadcast_parts:
        def part_cost_proj(batch: pa.Table) -> pa.Table:
            t = batch.filter(
                pc.match_substring(batch["p_name"], name_contains)
            )
            cost10 = np.floor(
                t["p_retailprice"].to_numpy(zero_copy_only=False) * 10.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                    "cost10": pa.array(cost10),
                }
            )

        part_cost = part.select_columns(
            ["p_partkey", "p_name", "p_retailprice"]
        ).map_batches(part_cost_proj, batch_format="pyarrow", zero_copy_batch=True)
        with_cost = bucket_hash_join(
            li,
            part_cost,
            left_on="l_partkey",
            right_on="p_partkey",
            left_schema=pa.schema(
                [
                    ("l_orderkey", pa.int64()),
                    ("s_nat", pa.int64()),
                    ("l_partkey", pa.int64()),
                    ("qty", pa.int64()),
                    ("rev", pa.int64()),
                ]
            ),
            right_schema=pa.schema(
                [("p_partkey", pa.int64()), ("cost10", pa.int64())]
            ),
            num_buckets=num_buckets,
        )

        def amount_proj(batch: pa.Table) -> pa.Table:
            qty = batch["qty"].to_numpy(zero_copy_only=False)
            rev = batch["rev"].to_numpy(zero_copy_only=False)
            cst = batch["cost10"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": batch["l_orderkey"],
                    "s_nat": batch["s_nat"],
                    "amount": pa.array(rev - cst * qty),
                }
            )

        li = with_cost.map_batches(
            amount_proj, batch_format="pyarrow", zero_copy_batch=True
        )
    obloom_ref = ray.put(
        bloom_of_dataset(li.select_columns(["l_orderkey"]), "l_orderkey")
    )

    def ord_proj(batch: pa.Table) -> pa.Table:
        bf = ray.get(obloom_ref)
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = batch.filter(pa.array(bf.contains_many(keys)))
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    ordy = orders.select_columns(["o_orderkey", "o_orderdate"]).map_batches(
        ord_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = bucket_hash_join(
        li,
        ordy,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("s_nat", pa.int64()), ("amount", pa.int64())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
        num_buckets=num_buckets,
    )

    def nat_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["s_nat", "o_year", "amount"])
            .group_by(["s_nat", "o_year"])
            .aggregate([("amount", "sum")])
        )
        return g.rename_columns(["s_nat", "o_year", "amount"])

    def finish(batch: pa.Table) -> pa.Table:
        nk = pd.Series(batch["s_nat"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "n_name": pa.array(nk.map(nname).to_numpy(), type=pa.string()),
                "o_year": batch["o_year"],
                "profit": pc.round(
                    pc.divide(pc.cast(batch["sum(amount)"], pa.float64()), 100.0),
                    ndigits=2,
                ),
            }
        )

    return (
        joined.map_batches(nat_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["s_nat", "o_year"])
        .aggregate(Sum("amount"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["n_name", "o_year"], descending=[False, True])
    )


def nation_part_value(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
    *,
    nation_name: str = "NATION_3",
    mult: int = 2,
) -> ray.data.Dataset:
    """TPC-H Q11 shape: parts whose shipped value from one nation's
    suppliers exceeds ``mult`` x the nation's AVERAGE part value
    (partsupp value -> lineitem revenue proxy; the spec's fixed fraction
    is 0.0001/SF — i.e. it scales with table size — so the scale-free
    form value > mult*avg keeps the HAVING selective at every sf; the
    plan — grouped aggregate filtered against a GLOBAL scalar of the
    same aggregate — is the spec's).

    Scale shape: the nation filter is a broadcast supplier-set test
    map-side (fact rows never shuffle unless they survive); ONE partkey
    groupby of per-block partials produces the value table, which is
    materialized ONCE in the object store (it is #parts rows — bounded,
    but distributed, never a driver pull); the global total reduces from
    it, then the HAVING filter is the exact-integer comparison
    value*frac_denom > total broadcast as one scalar."""
    nk = np.int64(_nation_key(nation, nation_name))
    smap = _supplier_nation_map(supplier)
    skeys = np.sort(smap.index.to_numpy()[smap.to_numpy() == nk]).astype(np.int64)
    skeys_ref = ray.put(skeys)

    def li_partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(skeys_ref)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(np.isin(s, ks)))
        part = pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "cents": _cents(t["l_extendedprice"], t["l_discount"]),
            }
        )
        g = part.group_by(["l_partkey"]).aggregate([("cents", "sum")])
        return g.rename_columns(["l_partkey", "cents"])

    values = (
        lineitem.select_columns(
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .materialize()  # #parts rows — small aggregate, reused twice below
    )
    total = int(values.sum("cents") or 0)
    n_parts = values.count()
    # value > mult * avg  <=>  value * n_parts > mult * total (exact int64)
    thresh = pa.scalar(mult * total, type=pa.int64())
    denom = pa.scalar(max(n_parts, 1), type=pa.int64())

    def having(batch: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(batch["cents"], denom), thresh)
        t = batch.filter(keep)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "value": pc.round(
                    pc.divide(pc.cast(t["cents"], pa.float64()), 100.0), ndigits=2
                ),
            }
        )

    return values.map_batches(having, batch_format="pyarrow").sort(
        ["value", "l_partkey"], descending=[True, False]
    )


def returnflag_priority_counts(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q12 shape: per category (shipmode -> l_returnflag), how
    many order lines came from high-priority vs other orders, for one
    shipping year.

    Scale shape: lineitem filters+projects to (orderkey, returnflag)
    map-side; orders project to (orderkey, is_high int8); ONE
    ``bucket_hash_join``; the conditional counts partial-aggregate per
    block into a 3-row groupby."""
    lo, hi = _ts(date_from), _ts(date_to)

    def li_proj(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi),
        )
        t = batch.filter(m)
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_returnflag": t["l_returnflag"],
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_shipdate", "l_returnflag"]
    ).map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
    lbloom_ref = ray.put(
        bloom_of_dataset(li.select_columns(["l_orderkey"]), "l_orderkey")
    )

    def ord_proj(batch: pa.Table) -> pa.Table:
        bf = ray.get(lbloom_ref)
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = batch.filter(pa.array(bf.contains_many(keys)))
        hi_flag = pc.or_(
            pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT")),
            pc.equal(t["o_orderpriority"], pa.scalar("2-HIGH")),
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "is_high": pc.cast(hi_flag, pa.int64()),
            }
        )

    ordy = orders.select_columns(["o_orderkey", "o_orderpriority"]).map_batches(
        ord_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = bucket_hash_join(
        li,
        ordy,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_returnflag", pa.string())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64()), ("is_high", pa.int64())]),
        num_buckets=num_buckets,
    )

    def cnt_partial(batch: pa.Table) -> pa.Table:
        low = pc.subtract(pa.scalar(1, type=pa.int64()), batch["is_high"])
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "high_cnt": batch["is_high"],
                "low_cnt": low,
            }
        )
        g = t.group_by(["l_returnflag"]).aggregate(
            [("high_cnt", "sum"), ("low_cnt", "sum")]
        )
        return g.rename_columns(["l_returnflag", "high_cnt", "low_cnt"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "high_line_count": batch["sum(high_cnt)"],
                "low_line_count": batch["sum(low_cnt)"],
            }
        )

    return (
        joined.map_batches(cnt_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(Sum("high_cnt"), Sum("low_cnt"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("l_returnflag")
    )


def _supplier_part_counts_joined(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    bad: np.ndarray,
    *,
    exclude_brand: str,
    exclude_type: str,
    sizes: List[int],
    num_buckets: int,
) -> ray.data.Dataset:
    """``supplier_part_counts`` scale path (part > max_broadcast_rows):
    the part attributes attach via a distributed ``bucket_hash_join`` on
    partkey instead of a driver-built dense positional array.  Same
    suppkey-bucket exact-distinct downstream, with the string attributes
    riding through the join instead of dictionary codes."""
    bad_ref = ray.put(np.asarray(bad, dtype=np.int64))

    def pair_proj(batch: pa.Table) -> pa.Table:
        badk = ray.get(bad_ref)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(s, badk)
        t = pa.table(
            {"l_partkey": pa.array(p[keep]), "l_suppkey": pa.array(s[keep])}
        )
        # map-side dedup shrinks the join input; exactness comes from
        # the bucket-side dedup below
        return t.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    pairs = lineitem.select_columns(["l_partkey", "l_suppkey"]).map_batches(
        pair_proj, batch_format="pyarrow", zero_copy_batch=True
    )

    size_set = pa.array(np.asarray(sizes, dtype=np.int64))

    def part_proj(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.not_equal(batch["p_brand"], exclude_brand),
                pc.not_equal(batch["p_type"], exclude_type),
            ),
            pc.is_in(pc.cast(batch["p_size"], pa.int64()), value_set=size_set),
        )
        t = batch.filter(m)
        return pa.table(
            {
                "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                "p_brand": t["p_brand"],
                "p_type": t["p_type"],
                "p_size": pc.cast(t["p_size"], pa.int64()),
            }
        )

    part_attrs = part.select_columns(
        ["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(part_proj, batch_format="pyarrow", zero_copy_batch=True)

    joined = bucket_hash_join(
        pairs,
        part_attrs,
        left_on="l_partkey",
        right_on="p_partkey",
        left_schema=pa.schema(
            [("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int64()),
            ]
        ),
        num_buckets=num_buckets,
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.append_column("bucket", pa.array(_bucket_of(s, num_buckets)))
        return t.select(
            ["bucket", "l_suppkey", "p_brand", "p_type", "p_size"]
        ).group_by(["bucket", "l_suppkey", "p_brand", "p_type", "p_size"]).aggregate([])

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_suppkey", "p_brand", "p_type", "p_size"])
        g = (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)["l_suppkey"]
            .nunique()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": batch["p_brand"],
                "p_type": batch["p_type"],
                "p_size": pc.cast(batch["p_size"], pa.int64()),
                "supplier_cnt": pc.cast(batch["sum(cnt)"], pa.int64()),
            }
        )

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_count, batch_format="pandas")
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("cnt"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            descending=[True, False, False, False],
        )
    )


def supplier_part_counts(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    supplier: ray.data.Dataset,
    *,
    exclude_brand: str = "Brand#5",
    exclude_type: str = "PROMO",
    sizes: List[int] = (1, 4, 9, 14, 19, 23, 36, 45),
    num_buckets: int = 64,
    max_broadcast_rows: int = 30_000_000,
) -> ray.data.Dataset:
    """TPC-H Q16 shape: how many DISTINCT suppliers ship each surviving
    (brand, type, size) combination, excluding complaint suppliers (no
    partsupp table — the observed lineitem (partkey, suppkey) pairs ARE
    the supplier-part relation; the complaint predicate adapts to
    s_acctbal < 0).

    Scale shape: part attributes broadcast as dense positional arrays
    (brand/type dictionary codes + size + survive-bit) so the filter and
    the group key attach map-side with zero join — WHEN part fits a
    driver broadcast (<= ``max_broadcast_rows``); above that (part is
    fact/30, the dense arrays don't fit at 100 TB) the attribute attach
    becomes a distributed ``bucket_hash_join`` on partkey with
    identical output (forced-low-threshold pytest asserts equality);
    excluded suppliers broadcast as a sorted key array; pairs dedupe
    per batch, then ONE exchange on a coarse SUPPKEY bucket — a
    supplier lives in exactly one bucket, so per-bucket distinct counts
    are disjoint and the final #combo-row groupby just ADDS them (exact
    distinct with no global dedup pass)."""
    sup = supplier.select_columns(["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(
        sup[sup["s_acctbal"] < 0]["s_suppkey"].astype(np.int64).to_numpy()
    )
    if int(part.count()) > max_broadcast_rows:
        return _supplier_part_counts_joined(
            lineitem,
            part,
            bad,
            exclude_brand=exclude_brand,
            exclude_type=exclude_type,
            sizes=sizes,
            num_buckets=num_buckets,
        )
    pt = part.select_columns(["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    pk = pt["p_partkey"].astype(np.int64).to_numpy()
    size_arr = pt["p_size"].astype(np.int64).to_numpy()
    ok = (
        (pt["p_brand"] != exclude_brand).to_numpy()
        & (pt["p_type"] != exclude_type).to_numpy()
        & np.isin(size_arr, np.asarray(sizes, dtype=np.int64))
    )
    brands = pt["p_brand"].astype("category")
    types = pt["p_type"].astype("category")
    n = int(pk.max()) + 1
    survive = np.zeros(n, dtype=bool)
    survive[pk[ok]] = True
    brand_code = np.zeros(n, dtype=np.int32)
    brand_code[pk] = brands.cat.codes.to_numpy().astype(np.int32)
    type_code = np.zeros(n, dtype=np.int32)
    type_code[pk] = types.cat.codes.to_numpy().astype(np.int32)
    size_of = np.zeros(n, dtype=np.int64)
    size_of[pk] = size_arr
    brand_names = list(brands.cat.categories)
    type_names = list(types.cat.categories)
    bc = ray.put((survive, brand_code, type_code, size_of, bad))

    def pair_proj(batch: pa.Table) -> pa.Table:
        sv, bcode, tcode, sz, badk = ray.get(bc)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(p), dtype=bool)
        in_range = p < len(sv)
        keep[in_range] = sv[p[in_range]]
        keep &= ~np.isin(s, badk)
        p, s = p[keep], s[keep]
        t = pa.table(
            {
                "bucket": pa.array(_bucket_of(s, num_buckets)),
                "l_suppkey": pa.array(s),
                "brand_code": pa.array(bcode[p]),
                "type_code": pa.array(tcode[p]),
                "p_size": pa.array(sz[p]),
            }
        )
        # map-side dedup shrinks the exchange; exactness comes from the
        # bucket-side dedup below
        return t.group_by(
            ["bucket", "l_suppkey", "brand_code", "type_code", "p_size"]
        ).aggregate([])

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(
            ["l_suppkey", "brand_code", "type_code", "p_size"]
        )
        g = (
            d.groupby(["brand_code", "type_code", "p_size"], sort=False)["l_suppkey"]
            .nunique()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    def finish(batch: pa.Table) -> pa.Table:
        b = batch["brand_code"].to_numpy(zero_copy_only=False)
        t = batch["type_code"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_brand": pa.array([brand_names[i] for i in b], type=pa.string()),
                "p_type": pa.array([type_names[i] for i in t], type=pa.string()),
                "p_size": batch["p_size"],
                "supplier_cnt": batch["sum(cnt)"],
            }
        )

    return (
        lineitem.select_columns(["l_partkey", "l_suppkey"])
        .map_batches(pair_proj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_count, batch_format="pandas")
        .groupby(["brand_code", "type_code", "p_size"])
        .aggregate(Sum("cnt"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            descending=[True, False, False, False],
        )
    )


def small_qty_revenue(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    *,
    brand: str = "Brand#13",
    max_size: int = 10,
) -> ray.data.Dataset:
    """TPC-H Q17 shape: revenue from order lines whose quantity is
    below 20% of the part's average quantity, for one brand/size band
    (p_container -> p_size band).

    Scale shape: the brand keyset broadcasts (1/25 of parts); pass 1
    reduces the filtered fact to per-part (sum_qty, cnt) — partials
    combine per block, then ONE small groupby whose result (bounded by
    the brand's part count) broadcasts back as dense positional arrays;
    pass 2 re-filters map-side with the EXACT integer test
    5*qty*cnt < sum_qty (no float average, no drift) and reduces to one
    row.  Two passes over the filtered slice instead of a self-join —
    the fact never shuffles."""
    pt = part.select_columns(["p_partkey", "p_brand", "p_size"]).to_pandas()
    sel = (pt["p_brand"] == brand).to_numpy() & (
        pt["p_size"].to_numpy() <= max_size
    )
    keys = np.sort(pt["p_partkey"].astype(np.int64).to_numpy()[sel])
    keys_ref = ray.put(keys)

    def agg_partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.filter(pa.array(np.isin(p, ks)))
        qty = pc.cast(t["l_quantity"], pa.int64())
        part_t = pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "sq": qty,
                "c": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        g = part_t.group_by(["l_partkey"]).aggregate([("sq", "sum"), ("c", "sum")])
        return g.rename_columns(["l_partkey", "sq", "c"])

    stats = (
        lineitem.select_columns(["l_partkey", "l_quantity"])
        .map_batches(agg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sq"), Sum("c", alias_name="c"))
        .to_pandas()  # bounded: one row per part of the brand/size band
    )
    if len(stats):
        idx = stats["l_partkey"].to_numpy().astype(np.int64)
        size = int(idx.max()) + 1
        sq_arr = np.zeros(size, dtype=np.int64)
        c_arr = np.zeros(size, dtype=np.int64)
        sq_arr[idx] = stats["sq"].to_numpy().astype(np.int64)
        c_arr[idx] = stats["c"].to_numpy().astype(np.int64)
    else:
        sq_arr = np.zeros(1, dtype=np.int64)
        c_arr = np.zeros(1, dtype=np.int64)
    stats_ref = ray.put((sq_arr, c_arr))

    def low_partial(batch: pa.Table) -> pa.Table:
        sq, c = ray.get(stats_ref)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(p), dtype=bool)
        in_range = p < len(sq)
        pi = p[in_range]
        # qty < 0.2*avg  <=>  5*qty*cnt < sum_qty (exact int64)
        keep[in_range] = (c[pi] > 0) & (5 * qty[in_range] * c[pi] < sq[pi])
        t = batch.filter(pa.array(keep))
        cents = _cents(t["l_extendedprice"], t["l_discount"])
        return pa.table(
            {
                "one": pa.array([1], type=pa.int64()),
                "cents": pa.array([pc.sum(cents).as_py() or 0], type=pa.int64()),
                "n": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    agg = (
        lineitem.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
        )
        .map_batches(low_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("one")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    cents = int(agg["cents"].iloc[0]) if len(agg) else 0
    n = int(agg["n"].iloc[0]) if len(agg) else 0
    return ray.data.from_arrow(
        pa.table(
            {
                "revenue": pa.array([round(cents / 100.0, 2)], type=pa.float64()),
                "n_items": pa.array([n], type=pa.int64()),
            }
        )
    )


def bulk_part_suppliers(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    supplier: ray.data.Dataset,
    *,
    name_prefix: str = "small",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    qty_threshold: int = 60,
) -> ray.data.Dataset:
    """TPC-H Q20 shape: suppliers who shipped more than a threshold
    quantity of any name-matched part in one year (availqty semi-join
    -> shipped-quantity HAVING; same plan: fact -> pair aggregate ->
    HAVING -> distinct supplier semi-join -> name decoration).

    Scale shape: the name-filtered partkey set broadcasts; the fact
    filters map-side and partial-aggregates (suppkey, partkey, qty) per
    block; ONE pair groupby, then the HAVING filter and the distinct
    suppkey projection are map-side; winners decorate via the
    key-pushdown dimension scan (never the whole supplier table)."""
    pt = part.select_columns(["p_partkey", "p_name"]).to_pandas()
    sel = pt["p_name"].str.startswith(name_prefix).to_numpy()
    keys = np.sort(pt["p_partkey"].astype(np.int64).to_numpy()[sel])
    keys_ref = ray.put(keys)
    lo, hi = _ts(date_from), _ts(date_to)

    def pair_partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo),
            pc.less(batch["l_shipdate"], hi),
        )
        t = batch.filter(m)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(np.isin(p, ks)))
        pt_t = pa.table(
            {
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "q": pc.cast(t["l_quantity"], pa.int64()),
            }
        )
        g = pt_t.group_by(["l_suppkey", "l_partkey"]).aggregate([("q", "sum")])
        return g.rename_columns(["l_suppkey", "l_partkey", "q"])

    thr = pa.scalar(int(qty_threshold), type=pa.int64())

    def having(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["sum(q)"], thr))
        return pa.table({"s_suppkey": pc.unique(t["l_suppkey"])})

    winners = (
        lineitem.select_columns(
            ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"]
        )
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_suppkey", "l_partkey"])
        .aggregate(Sum("q"))
        .map_batches(having, batch_format="pyarrow")
        .to_pandas()  # distinct winners — bounded by #suppliers
    )
    keys_out = sorted(set(int(x) for x in winners["s_suppkey"]))
    nmap = _names_for_keys(supplier, "s_suppkey", "s_name", keys_out)
    return ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array(np.asarray(keys_out, dtype=np.int64)),
                "s_name": pa.array(
                    [nmap.get(k, "") for k in keys_out], type=pa.string()
                ),
            }
        )
    )


def sole_return_suppliers(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    supplier: ray.data.Dataset,
    *,
    k: int = 20,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q21 shape: on finished multi-supplier orders, the supplier
    who was the ONLY one to return lines (commit/receipt lateness ->
    l_returnflag='R'; the exists/not-exists pair over other suppliers
    of the same order is the spec's plan, evaluated as per-order
    aggregates).

    Scale shape: lineitem pre-aggregates (orderkey, suppkey, had_r)
    per block; orders filter to status 'F' map-side and ONE
    ``bucket_hash_join`` aligns them; per-order logic runs vectorized
    inside coarse ORDERKEY buckets (all rows of an order co-locate, so
    cross-block pair duplicates dedup exactly there); the final
    exchange is a suppkey groupby of per-bucket partial counts, then a
    bounded top-k + name decoration."""

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
                "had_r": pc.cast(
                    pc.equal(batch["l_returnflag"], pa.scalar("R")), pa.int64()
                ),
            }
        )
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("had_r", "max")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "had_r"])

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_returnflag"]
    ).map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)

    def ord_proj(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["o_orderstatus"], pa.scalar("F")))
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"], pa.int64())})

    ordf = orders.select_columns(["o_orderkey", "o_orderstatus"]).map_batches(
        ord_proj, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = bucket_hash_join(
        li,
        ordf,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()), ("had_r", pa.int64())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64())]),
        num_buckets=num_buckets,
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("bucket", pa.array(_bucket_of(ids, num_buckets)))

    def order_logic(df: pd.DataFrame) -> pd.DataFrame:
        # exact pair dedup (cross-block partials merge by max)
        d = (
            df.groupby(["l_orderkey", "l_suppkey"], sort=False)["had_r"]
            .max()
            .reset_index()
        )
        per_ord = d.groupby("l_orderkey", sort=False).agg(
            nsupp=("l_suppkey", "size"), nr=("had_r", "sum")
        )
        good = per_ord[(per_ord["nsupp"] > 1) & (per_ord["nr"] == 1)].index
        w = d[(d["had_r"] == 1) & d["l_orderkey"].isin(good)]
        g = w.groupby("l_suppkey", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    top = (
        joined.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(order_logic, batch_format="pandas")
        .groupby("l_suppkey")
        .aggregate(Sum("cnt", alias_name="numwait"))
        .sort(["numwait", "l_suppkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    keys = [int(x) for x in top["l_suppkey"]]
    nmap = _names_for_keys(supplier, "s_suppkey", "s_name", keys)
    return ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array(np.asarray(keys, dtype=np.int64)),
                "s_name": pa.array([nmap.get(s, "") for s in keys], type=pa.string()),
                "numwait": pa.array(top["numwait"].to_numpy().astype(np.int64)),
            }
        )
    )


def customer_order_distribution(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    *,
    exclude_priority: str = "5-LOW",
    fk_assumed: bool = True,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q13: customer LEFT OUTER JOIN orders (with a filter on the
    JOIN side, so unmatched customers keep c_count = 0), count qualifying
    orders per customer, then the distribution of those counts —
    (c_count, custdist) ordered by custdist DESC, c_count DESC.

    This is the one join family the repo lacked a first-class entry for:
    an OUTER join whose unmatched-left rows must survive into the
    aggregate. The reference's search surface has no outer join; the
    shape comes from the curation side (documents joined to an optional
    per-doc annotation table where "no annotation" is a real category).

    Scale shape: NO row-level outer join is ever materialized. The
    filtered fact side pre-aggregates map-side (one Arrow group_by per
    block) and shuffles one narrow (custkey, n) row per customer×block;
    the per-customer counts then collapse to a histogram whose second
    exchange is distribution-sized. The LEFT-outer zero bucket is pure
    arithmetic: |customer| − |customers with ≥1 qualifying order| — two
    O(1) driver scalars, appended as one row. ``fk_assumed=True``
    (TPC-H/DuckDB FK integrity: every o_custkey exists in customer)
    skips the semi-join of the count table against customer keys; with
    ``fk_assumed=False`` the counts are exact-semi-joined to customer
    via ``bucket_hash_join`` first, so orphan o_custkeys neither enter
    the histogram nor deflate the zero bucket."""

    def ord_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.not_equal(batch["o_orderpriority"], pa.scalar(exclude_priority))
        )
        g = pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ).group_by(["o_custkey"]).aggregate([("n", "sum")])
        return pa.table({"o_custkey": g["o_custkey"], "n": g["n_sum"]})

    cnt = (
        orders.select_columns(["o_custkey", "o_orderpriority"])
        .map_batches(ord_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    if not fk_assumed:
        def cust_keys(batch: pa.Table) -> pa.Table:
            return pa.table({"c_custkey": pc.cast(batch["c_custkey"], pa.int64())})

        cnt = bucket_hash_join(
            cnt,
            customer.select_columns(["c_custkey"]).map_batches(
                cust_keys, batch_format="pyarrow", zero_copy_batch=True
            ),
            left_on="o_custkey",
            right_on="c_custkey",
            left_schema=pa.schema([("o_custkey", pa.int64()), ("c_count", pa.int64())]),
            right_schema=pa.schema([("c_custkey", pa.int64())]),
            num_buckets=num_buckets,
        ).select_columns(["o_custkey", "c_count"])

    cnt = cnt.materialize()
    n_cust = customer.select_columns(["c_custkey"]).count()
    n_active = cnt.count()
    if n_active == 0:
        # empty aggregates lose their schema in ray.data (the
        # nation_trade_volume pitfall) — return the zero bucket (or a
        # typed empty table when there are no customers either) directly
        rows = ([0], [n_cust]) if n_cust > 0 else ([], [])
        return ray.data.from_arrow(
            pa.table(
                {
                    "c_count": pa.array(rows[0], type=pa.int64()),
                    "custdist": pa.array(rows[1], type=pa.int64()),
                }
            )
        )

    def hist_partial(batch: pa.Table) -> pa.Table:
        col = batch["c_count"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        return pa.table(
            {
                "c_count": pc.cast(vc.field("values"), pa.int64()),
                "custdist": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    hist = (
        cnt.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    )
    zero = n_cust - n_active
    if zero > 0:
        hist = hist.union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "c_count": pa.array([0], type=pa.int64()),
                        "custdist": pa.array([zero], type=pa.int64()),
                    }
                )
            )
        )
    return hist.sort(["custdist", "c_count"], descending=[True, True])
