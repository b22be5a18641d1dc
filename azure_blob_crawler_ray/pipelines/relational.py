"""Relational operator coverage over the TPC-H-ish test tables —
broadcast joins, partial aggregation, sort/top-k — the generic shapes the
crawl engine's wide steps are built from (SURVEY.md §2.4-2.6).

Scale idioms demonstrated here and reused by the crawl pipeline:
  * small-side broadcast join: dimension table read once, ``ray.put``,
    dict-lookup inside map_batches — no shuffle;
  * partial aggregation: per-batch combine BEFORE the groupby shuffle so
    only (groups × batches) rows move, not raw rows;
  * top-k: aggregate first, sort the tiny aggregate, never the fact table.

Money sums are rounded to 2 decimals at the boundary (matching the SQL
oracle's ROUND(SUM(x), 2)) — the only float columns that cross the
conformance boundary."""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _round2(col: pa.Array) -> pa.Array:
    return pc.round(col, ndigits=2)


def lineitem_agg(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1 shape: groupby(returnflag, linestatus) over lineitem with
    per-batch partial aggregation — the shuffle moves one row per
    (group × batch), not 6M rows."""

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"]
        price = batch["l_extendedprice"]
        disc = batch["l_discount"]
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": qty,
                "price": price,
                "disc_price": disc_price,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc_price", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "price", "disc_price", "cnt"]
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": _round2(batch["sum(qty)"]),
                "sum_base_price": _round2(batch["sum(price)"]),
                "sum_disc_price": _round2(batch["sum(disc_price)"]),
                "count_order": batch["sum(cnt)"],
            }
        )

    return (
        lineitem.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty"), Sum("price"), Sum("disc_price"), Sum("cnt"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["l_returnflag", "l_linestatus"])
    )


def lineitem_agg_view(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """UNROUNDED partial form of the Q1 aggregate — the stored
    'materialized view': one row per (returnflag, linestatus) carrying
    raw sums + count, mergeable with any later delta by plain addition
    (rounding happens only at the read boundary, so the maintained view
    stays exactly refreshable)."""

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"]
        price = batch["l_extendedprice"]
        disc = batch["l_discount"]
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": qty,
                "price": price,
                "disc_price": disc_price,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("disc_price", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "qty", "price", "disc_price", "cnt"]
        )

    return (
        lineitem.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty"), Sum("price"), Sum("disc_price"), Sum("cnt"))
    )


def lineitem_agg_refresh(
    view: ray.data.Dataset, delta: ray.data.Dataset
) -> ray.data.Dataset:
    """Incremental materialized-view maintenance (the Q1 aggregate under
    appends): merge the STORED view with the delta's partial aggregate
    by summation — the base fact rows are never rescanned, which at
    100 TB is the difference between an O(delta) refresh and a full
    recompute.  Output schema and rounding match ``lineitem_agg``, so a
    view maintained through any append sequence equals the from-scratch
    aggregate (same SQL oracle)."""
    delta_agg = lineitem_agg_view(delta)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": _round2(batch["sum(sum(qty))"]),
                "sum_base_price": _round2(batch["sum(sum(price))"]),
                "sum_disc_price": _round2(batch["sum(sum(disc_price))"]),
                "count_order": batch["sum(sum(cnt))"],
            }
        )

    return (
        view.union(delta_agg)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum(qty)"), Sum("sum(price)"), Sum("sum(disc_price)"), Sum("sum(cnt)")
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort(["l_returnflag", "l_linestatus"])
    )


def top_customers(
    orders: ray.data.Dataset, customer: ray.data.Dataset, *, k: int = 10
) -> ray.data.Dataset:
    """Revenue top-k: aggregate orders by custkey (shuffle on the key),
    take the k winners, then decorate ONLY those k rows with names via a
    key-pushdown scan of the customer dimension — at 100 TB the customer
    table is fact/10, so a whole-dimension name broadcast would be a
    multi-GB driver object; only k names ever return here."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "revenue": _round2(batch["sum(o_totalprice)"]),
                "order_count": batch["count()"],
            }
        )

    top = (
        orders.groupby("o_custkey")
        .aggregate(Sum("o_totalprice"), Count())
        .map_batches(project, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )  # k rows by construction
    keys = [int(x) for x in top["c_custkey"]]
    kset = pa.array(keys or [-1], type=pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        m = pc.is_in(pc.cast(batch["c_custkey"], pa.int64()), value_set=kset)
        t = batch.filter(m)
        return pa.table(
            {"c_custkey": pc.cast(t["c_custkey"], pa.int64()), "c_name": t["c_name"]}
        )

    names = (
        customer.select_columns(["c_custkey", "c_name"])
        .map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    nmap = dict(zip(names["c_custkey"].astype(int), names["c_name"]))
    out = pa.table(
        {
            "c_custkey": pa.array(top["c_custkey"].astype(np.int64)),
            "c_name": pa.array([nmap.get(c, "") for c in keys], type=pa.string()),
            "revenue": pa.array(top["revenue"].astype(np.float64)),
            "order_count": pa.array(top["order_count"].astype(np.int64)),
        }
    )
    return ray.data.from_arrow(out)


def customers_per_region(
    customer: ray.data.Dataset,
    nation: ray.data.Dataset,
    region: ray.data.Dataset,
) -> ray.data.Dataset:
    """Two-hop broadcast join chain (customer -> nation -> region) +
    count per region. Both dimension tables are tiny: one driver read,
    one ray.put, map-side lookup."""
    n = nation.to_pandas()
    r = region.to_pandas()
    nation_to_region = dict(zip(n["n_nationkey"].astype(int), n["n_regionkey"].astype(int)))
    region_name = dict(zip(r["r_regionkey"].astype(int), r["r_name"]))
    ref = ray.put((nation_to_region, region_name))

    def tag(batch: pa.Table) -> pa.Table:
        n2r, rname = ray.get(ref)
        nk = batch["c_nationkey"].to_numpy()
        names = [rname.get(n2r.get(int(x), -1), "") for x in nk]
        return pa.table({"r_name": pa.array(names, type=pa.string())})

    return (
        customer.select_columns(["c_nationkey"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("r_name")
        .aggregate(Count(alias_name="customer_count"))
        .sort("r_name")
    )


def events_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    """Stream-table rollup: count + value sum per event_type."""

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "event_count": batch["count()"],
                "value_sum": _round2(batch["sum(value)"]),
            }
        )

    return (
        events.groupby("event_type")
        .aggregate(Count(), Sum("value"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("event_type")
    )


def events_daily(events: ray.data.Dataset) -> ray.data.Dataset:
    """Windowed aggregate: per-day event counts — the timestamp truncation
    happens vectorized inside map_batches, then a groupby on the (small)
    day key."""

    def day(batch: pa.Table) -> pa.Table:
        d = pc.strftime(batch["ts"], format="%Y-%m-%d")
        return pa.table({"day": d, "event_type": batch["event_type"]})

    return (
        events.map_batches(day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="event_count"))
        .sort(["day", "event_type"])
    )


def order_priority_counts(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Filter + groupby count (TPC-H Q4 shape, predicate applied at scan)."""
    return (
        orders.filter(expr="o_orderstatus == 'F'")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
        .sort("o_orderpriority")
    )


def parts_by_brand(part: ray.data.Dataset) -> ray.data.Dataset:
    """Groupby brand: count + min/max retail price (rounded)."""
    from ray.data.aggregate import Max, Min

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": batch["p_brand"],
                "part_count": batch["count()"],
                "min_price": _round2(batch["min(p_retailprice)"]),
                "max_price": _round2(batch["max(p_retailprice)"]),
            }
        )

    return (
        part.groupby("p_brand")
        .aggregate(Count(), Min("p_retailprice"), Max("p_retailprice"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("p_brand")
    )


def order_customer_join(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    *,
    min_total: float = 400_000.0,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Native distributed hash join (``Dataset.join``) — the shuffle-join
    path for when neither side fits a broadcast (contrast
    ``top_customers``' broadcast-dict join). Both sides hash-partition on
    the key; high-value orders only, so the probe side is pre-filtered
    at the scan."""
    joined = orders.filter(expr=f"o_totalprice >= {min_total}").join(
        customer,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return joined.select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]
    ).sort("o_orderkey")


def sessionize(
    events: ray.data.Dataset,
    *,
    gap_minutes: int = 30,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Gap-based session windows per user (the streaming-window operator
    the reference lacks, SURVEY.md §2.9): consecutive events of a user
    belong to one session until the inter-event gap exceeds
    ``gap_minutes``. Returns (user_id, session_idx, event_count).

    Shape: the shuffle groups a COARSE hash bucket of user_id (~64
    groups), not user_id itself — one Python map_groups call per bucket
    instead of one per user (millions of users would otherwise pay
    per-group task overhead). Inside the bucket everything is vectorized
    numpy over the (user_id, ts, event_id)-sorted frame: user-boundary +
    gap detection in one pass, cumsum session ids, run-length counts.
    Ties on ts break by event_id — ordering comes from data, never
    execution timing."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return batch.append_column("bucket", pa.array(b))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].astype("int64").to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[False, np.diff(ts) > gap_us]
        new_sess = new_user | gap
        sess_global = np.cumsum(new_sess)  # 1-based, unique per session
        # per-user 0-based session index = global id - global id at user start
        first_user_row = np.flatnonzero(new_user)
        run_len = np.diff(np.r_[first_user_row, len(uid)])
        sess_idx = sess_global - np.repeat(sess_global[first_user_row], run_len)
        sess_first = np.flatnonzero(new_sess)
        counts = np.diff(np.r_[sess_first, len(uid)])
        return pd.DataFrame(
            {
                "user_id": uid[sess_first],
                "session_idx": sess_idx[sess_first].astype(np.int64),
                "event_count": counts.astype(np.int64),
            }
        )

    return (
        events.select_columns(["user_id", "event_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fn, batch_format="pandas")
        .sort(["user_id", "session_idx"])
    )


def user_running_totals(
    events: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Per-key window functions (ROW_NUMBER / running SUM / LAG) — the
    ordered-window family Ray Data has no primitive for.  For each event,
    ordered by (ts, event_id) within its user: the 1-based running event
    count, the running sum of the event value in integer cents, and the
    microseconds since the user's previous event (-1 for the first).

    All outputs are integers (cents / microseconds) so the conformance
    hash is exact — float running sums would accumulate association-order
    differences against any other engine.

    Shape: one shuffle on a coarse hash bucket of user_id, then a single
    vectorized pass per bucket — segmented cumsum via subtracting the
    per-segment prefix at each user's first row.  Same partitioning
    assumption as ``sessionize``: one bucket fits a task."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        # floor(x*100 + 0.5): engine-independent (pc.round is half-to-even,
        # SQL ROUND half-away; this is identical everywhere for x >= 0)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["value"], 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": pc.cast(batch["ts"], pa.int64()),
                "cents": cents,
                "bucket": pa.array(b),
            }
        )

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype(np.int64)
        cents = df["cents"].to_numpy().astype(np.int64)
        n = len(df)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        first = np.flatnonzero(new_user)
        run_len = np.diff(np.r_[first, n])
        idx = np.arange(n, dtype=np.int64)
        running_count = idx - np.repeat(first, run_len) + 1
        cum = np.cumsum(cents)
        base = np.repeat(cum[first] - cents[first], run_len)
        running_cents = cum - base
        prev_ts = np.r_[np.int64(0), ts[:-1]]
        since = ts - prev_ts
        since[new_user] = -1
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": uid,
                "running_count": running_count,
                "running_cents": running_cents,
                "since_prev_us": since,
            }
        )

    return (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(window, batch_format="pandas")
        .sort(["user_id", "running_count"])
    )


def top_orders_per_customer(
    orders: ray.data.Dataset, *, k: int = 2, num_buckets: int = 64
) -> ray.data.Dataset:
    """Grouped top-k (window-rank shape): each customer's k highest-value
    orders. A map-side per-key head-k combiner (any row ranked > k
    within one block is > k globally — same skew bound as the crawl's
    ``_local_host_cap``) caps the shuffle at k rows per (customer,
    block), so a hot key costs k x num_blocks rows in the exchange, not
    its full row count. Then ONE coarse-bucket shuffle (one map_groups
    call per bucket, not per customer); inside the bucket the rank is
    one vectorized pass over the (custkey, -price, orderkey)-sorted
    frame. Ties break by orderkey ascending."""

    def _rank_sorted(df: pd.DataFrame) -> np.ndarray:
        ck = df["o_custkey"].to_numpy().astype(np.int64)
        new = np.r_[True, ck[1:] != ck[:-1]]
        first = np.flatnonzero(new)
        run_len = np.diff(np.r_[first, len(ck)])
        return np.arange(len(ck), dtype=np.int64) - np.repeat(first, run_len) + 1

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        if len(df) == 0:
            return batch
        keep = _rank_sorted(df) <= k
        return pa.Table.from_pandas(df.iloc[keep, :], preserve_index=False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy().astype(np.uint64)
        b = ((ck * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return batch.append_column("bucket", pa.array(b))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rank = _rank_sorted(df)
        keep = rank <= k
        out = df.iloc[keep, :].copy()
        out["rank"] = rank[keep]
        return out[["o_custkey", "rank", "o_orderkey", "o_totalprice"]]

    return (
        orders.select_columns(["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(topk, batch_format="pandas")
        .sort(["o_custkey", "rank"])
    )


def customers_without_orders(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    *,
    min_total: float = 300_000.0,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """ANTI join via the native hash-partitioned ``Dataset.join`` —
    customers with no order above ``min_total``.  The probe side is
    filtered at the scan and projected to its key column only before the
    exchange (anti semantics ignore right duplicates, so nothing wider
    moves)."""
    missing = customer.join(
        orders.filter(expr=f"o_totalprice >= {min_total}").select_columns(
            ["o_custkey"]
        ),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return missing.select_columns(["c_custkey", "c_name"]).sort("c_custkey")


def customers_with_big_orders(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    *,
    min_total: float = 450_000.0,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SEMI join (``left_semi``), the EXISTS counterpart of
    ``customers_without_orders``: customers with at least one order above
    ``min_total``.  Same projected/filtered probe side — semi semantics
    also ignore right-side duplicates."""
    hit = customer.join(
        orders.filter(expr=f"o_totalprice >= {min_total}").select_columns(
            ["o_custkey"]
        ),
        join_type="left_semi",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return hit.select_columns(["c_custkey", "c_name"]).sort("c_custkey")


def pivot_counts(
    events: ray.data.Dataset,
    *,
    categories: tuple[str, ...],
    pivot_col: str = "event_type",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """PIVOT: per-day event counts spread into one column per category.
    The category list is an explicit argument — at corpus scale the
    output schema must be known up front, not discovered by a scan (a
    tiny ``groupby(pivot_col).count()`` can feed it when unknown).
    Shape: indicator columns are summed per batch BEFORE the day-keyed
    shuffle, so the exchange carries (days x batches) rows."""

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch[ts_col], format="%Y-%m-%d")
        cols = {"day": day}
        for cat in categories:
            cols[cat] = pc.cast(pc.equal(batch[pivot_col], cat), pa.int64())
        t = pa.table(cols)
        return t.group_by("day").aggregate([(c, "sum") for c in categories])

    def finish(batch: pa.Table) -> pa.Table:
        out = {"day": batch["day"]}
        for cat in categories:
            out[cat] = batch[f"sum({cat})"]
        return pa.table(out)

    from ray.data.aggregate import Sum as _Sum

    agg = (
        events.select_columns([ts_col, pivot_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .rename_columns({f"{c}_sum": c for c in categories})
        .groupby("day")
        .aggregate(*[_Sum(c) for c in categories])
    )
    return agg.map_batches(finish, batch_format="pyarrow").sort("day")


def distinct_users_per_type(
    events: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT user_id) per event_type.  Each (type, user)
    pair is deduped locally per batch, then shuffled on a coarse hash
    bucket of user_id; because a user lands in exactly one bucket, the
    per-bucket distinct counts sum to the exact global answer — no
    corpus-wide dedup materialization, and the exchange carries only
    locally-unique pairs."""

    def local_pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch["event_type"], "user_id": batch["user_id"]})
        t = t.group_by(["event_type", "user_id"]).aggregate([])
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return t.append_column("bucket", pa.array(b))

    def bucket_distinct(group: pa.Table) -> pa.Table:
        t = pa.table(
            {"event_type": group["event_type"], "user_id": group["user_id"]}
        )
        t = t.group_by(["event_type", "user_id"]).aggregate([])
        g = t.group_by("event_type").aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "partial"])

    return (
        events.select_columns(["event_type", "user_id"])
        .map_batches(local_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_distinct, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("partial", alias_name="distinct_users"))
        .sort("event_type")
    )


def approx_distinct_users_per_type(
    events: ray.data.Dataset, *, precision: int = 12
) -> ray.data.Dataset:
    """APPROXIMATE count-distinct per event_type via a HyperLogLog sketch
    (Flajolet et al. 2007, with the standard linear-counting small-range
    correction) — the scale path next to the exact
    ``distinct_users_per_type``: the shuffle moves at most
    (types x 2^precision) register rows per batch instead of every
    locally-unique (type, user) pair, so its cost is INDEPENDENT of user
    cardinality.  Deterministic: registers come from a fixed splitmix64
    mix of user_id, so every run and any partitioning yields the same
    estimate.  Standard error ~1.04/sqrt(2^precision) (~1.6% at p=12)."""
    m = 1 << precision
    shift = np.uint64(64 - precision)

    def local_regs(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy().astype(np.uint64)
        # splitmix64 finalizer
        h = uid + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        reg = (h >> shift).astype(np.int64)
        rest = (h << np.uint64(precision)) | np.uint64((1 << precision) - 1)
        # rho = leading zeros of the remaining bits + 1, computed via
        # bit-length: 64 - floor(log2(rest)) (rest has the low bits set,
        # so it is never 0)
        rho = np.zeros(len(h), dtype=np.int64)
        x = rest.copy()
        for b in (32, 16, 8, 4, 2, 1):  # vectorized bit-length, 6 steps
            big = x >= (np.uint64(1) << np.uint64(b))
            rho[big] += b
            x[big] >>= np.uint64(b)
        rho = 64 - rho  # leading zeros + 1 over the 64-bit shifted value
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "reg": pa.array(reg),
                "rho": pa.array(rho),
            }
        )
        g = t.group_by(["event_type", "reg"]).aggregate([("rho", "max")])
        return g.rename_columns(["event_type", "reg", "rho"])

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].iloc[0]
        regs = np.zeros(m, dtype=np.int64)
        regs[df["reg"].to_numpy()] = df["rho"].to_numpy()
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        if raw <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting
        else:
            est = raw
        return pd.DataFrame({"event_type": [et], "approx_users": [int(round(est))]})

    from ray.data.aggregate import Max as _Max

    return (
        events.select_columns(["event_type", "user_id"])
        .map_batches(local_regs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "reg"])
        .aggregate(_Max("rho", alias_name="rho"))
        .groupby("event_type")
        .map_groups(estimate, batch_format="pandas")
        .sort("event_type")
    )


def orders_above_customer_avg(
    orders: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Correlated-subquery shape (TPC-H Q17 family): orders whose total
    exceeds twice their customer's average order value.  One aggregate
    pass builds the per-customer means; the fact table then probes them.
    Means are integer-free floats, so the FILTER uses them but the
    OUTPUT carries only copied columns — hash-exact.

    Shape: the per-customer aggregate is shuffled once; the probe is the
    coarse-bucket co-group pattern (aggregate rows + fact rows in one
    bucket shuffle, vectorized searchsorted inside) — no broadcast, so an
    unbounded customer dimension still streams."""

    def tag(kind: int):
        def fn(batch: pa.Table) -> pa.Table:
            ck = batch["o_custkey"].to_numpy().astype(np.uint64)
            b = ((ck * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
                np.int32
            )
            if kind == 0:  # aggregate side: (custkey, sum, cnt)
                return pa.table(
                    {
                        "o_custkey": batch["o_custkey"],
                        "o_orderkey": pa.array(
                            np.full(batch.num_rows, -1, dtype=np.int64)
                        ),
                        "total": batch["sum(o_totalprice)"],
                        "cnt": batch["count()"],
                        "bucket": pa.array(b),
                    }
                )
            return pa.table(
                {
                    "o_custkey": batch["o_custkey"],
                    "o_orderkey": batch["o_orderkey"],
                    "total": batch["o_totalprice"],
                    "cnt": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
                    "bucket": pa.array(b),
                }
            )

        return fn

    sums = (
        orders.groupby("o_custkey")
        .aggregate(Sum("o_totalprice"), Count())
        .map_batches(tag(0), batch_format="pyarrow")
    )
    facts = orders.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        agg = df[df["o_orderkey"] < 0]
        fact = df[df["o_orderkey"] >= 0]
        ck = agg["o_custkey"].to_numpy()
        order = np.argsort(ck, kind="stable")
        ck = ck[order]
        mean = (agg["total"].to_numpy() / agg["cnt"].to_numpy())[order]
        pos = np.searchsorted(ck, fact["o_custkey"].to_numpy())
        keep = fact["total"].to_numpy() > 2.0 * mean[pos]
        out = fact.iloc[keep, :]
        return pd.DataFrame(
            {
                "o_orderkey": out["o_orderkey"].to_numpy(),
                "o_custkey": out["o_custkey"].to_numpy(),
                "o_totalprice": out["total"].to_numpy(),
            }
        )

    return (
        sums.union(facts)
        .groupby("bucket")
        .map_groups(probe, batch_format="pandas")
        .sort("o_orderkey")
    )


def events_rollup(events: ray.data.Dataset) -> ray.data.Dataset:
    """ROLLUP / GROUPING SETS: event counts at (day, event_type), (day)
    and grand-total levels in one output, coarser levels labeled 'ALL'.
    Only the finest aggregate touches the raw table; the coarser levels
    re-aggregate the (days x types)-sized result."""
    fine = (
        events.map_batches(
            lambda b: pa.table(
                {
                    "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
                    "event_type": b["event_type"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="event_count"))
        .materialize()  # (days x types) rows; feeds all three levels
    )
    per_day = (
        fine.groupby("day")
        .aggregate(Sum("event_count", alias_name="event_count"))
        .map_batches(
            lambda b: pa.table(
                {
                    "day": b["day"],
                    "event_type": pa.array(["ALL"] * b.num_rows),
                    "event_count": b["event_count"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    tot = fine.aggregate(Sum("event_count"))  # tiny: (days x types) input
    total = ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(["ALL"]),
                "event_type": pa.array(["ALL"]),
                "event_count": pa.array([int(tot["sum(event_count)"])]),
            }
        )
    )
    return fine.union(per_day, total).sort(["day", "event_type"])


def group_quantiles(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    num_value_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT per-group percentile_disc (value at rank ceil(q*n), 1-based)
    without a global sort: the two-pass order-statistics scheme.

      pass 0  per-group counts + global value range (tiny aggregates);
      pass 1  (group, value-bucket) histogram over uniform range splits,
              combined per batch before the shuffle — the driver sees
              only (groups x buckets) rows, prefix-sums them, and finds
              for each (group, q) the bucket holding the target rank and
              the residual rank inside it;
      pass 2  only rows of hit buckets (~n/num_value_buckets per group,
              range-skew caveat documented) are gathered, sorted per
              (group, bucket) and the residual index picked.

    The output value is SELECTED, never recomputed, so it hash-matches
    any engine bit-for-bit.  Skewed value ranges only inflate pass-2
    gather size, never correctness; sampled splits are the refinement."""
    from ray.data.aggregate import Max as _Max, Min as _Min

    rng = ds.aggregate(_Min(value_col), _Max(value_col))
    lo, hi = float(rng[f"min({value_col})"]), float(rng[f"max({value_col})"])
    splits = np.linspace(lo, hi, num_value_buckets + 1)[1:-1]  # interior edges

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        vb = np.searchsorted(splits, v, side="right").astype(np.int32)
        t = pa.table({"g": batch[group_col], "vb": pa.array(vb)})
        g = t.group_by(["g", "vb"]).aggregate([("vb", "count")])
        return g.rename_columns(["g", "vb", "n"])

    hist_rows = (
        ds.select_columns([group_col, value_col])
        # batch_size coalesces small scan blocks so the per-batch
        # combine emits few fat partial blocks — the groupby
        # sort-shuffle costs ~linearly in input block count
        .map_batches(
            hist,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby(["g", "vb"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    # driver-side prefix sum over (groups x buckets) rows — bounded small;
    # per-group totals fall out of the histogram, no separate count pass
    by_group: dict = {}
    for r in hist_rows:
        by_group.setdefault(r["g"], []).append((int(r["vb"]), int(r["n"])))
    targets: dict = {}  # (g, vb) -> list of (q, residual 0-based rank)
    for g, buckets in by_group.items():
        buckets.sort()
        n = sum(cnt for _, cnt in buckets)
        cum = 0
        ranks = sorted(
            (int(np.ceil(q * n)) - 1, q) for q in qs
        )  # 0-based percentile_disc rank
        it = iter(ranks)
        want = next(it, None)
        for vb, cnt in buckets:
            while want is not None and want[0] < cum + cnt:
                targets.setdefault((g, vb), []).append((want[1], want[0] - cum))
                want = next(it, None)
            cum += cnt
    ref = ray.put(targets)

    def gather(batch: pa.Table) -> pa.Table:
        tg = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        vb = np.searchsorted(splits, v, side="right").astype(np.int32)
        keep = np.zeros(len(v), dtype=bool)
        for g, b in tg:  # few (group, bucket) targets; inner test vectorized
            gm = pc.equal(batch[group_col], g).to_numpy(zero_copy_only=False)
            keep |= gm & (vb == b)
        return pa.table(
            {
                "g": batch[group_col].filter(pa.array(keep)),
                "vb": pa.array(vb[keep]),
                "v": pa.array(v[keep]),
            }
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        tg = ray.get(ref)
        g = df["g"].iloc[0]
        vb = int(df["vb"].iloc[0])
        vals = np.sort(df["v"].to_numpy())
        rows = [(q, vals[r]) for q, r in tg[(g, vb)]]
        return pd.DataFrame(
            {
                group_col: [g] * len(rows),
                "q": [q for q, _ in rows],
                "value": [v for _, v in rows],
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(
            gather,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby(["g", "vb"])
        .map_groups(pick, batch_format="pandas")
        .sort([group_col, "q"])
    )


def group_quantiles_cont(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    num_value_buckets: int = 64,
) -> ray.data.Dataset:
    """INTERPOLATED per-group percentile_cont — the continuous twin of
    ``group_quantiles``: value = v[r0] + frac·(v[r1]−v[r0]) where
    h = (n−1)·q, r0 = floor(h), r1 = min(r0+1, n−1), frac = h−r0
    (0-based order statistics; the formula is pinned to DuckDB's
    ``quantile_cont`` so doubles hash-match).

    Same two-pass order-statistics scheme as the exact operator —
    histogram over uniform value splits, driver prefix-sum of the
    (groups × buckets) matrix, residual-rank gather of hit buckets —
    except each q registers BOTH bracketing ranks (which may land in
    different buckets); the gathered rows carry (q, which, frac) and a
    final groups×qs-sized reduce blends them."""
    from ray.data.aggregate import Max as _Max, Min as _Min

    rng = ds.aggregate(_Min(value_col), _Max(value_col))
    lo, hi = float(rng[f"min({value_col})"]), float(rng[f"max({value_col})"])
    splits = np.linspace(lo, hi, num_value_buckets + 1)[1:-1]

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        vb = np.searchsorted(splits, v, side="right").astype(np.int32)
        t = pa.table({"g": batch[group_col], "vb": pa.array(vb)})
        g = t.group_by(["g", "vb"]).aggregate([("vb", "count")])
        return g.rename_columns(["g", "vb", "n"])

    hist_rows = (
        ds.select_columns([group_col, value_col])
        # batch_size coalesces small scan blocks so the per-batch
        # combine emits few fat partial blocks — the groupby
        # sort-shuffle costs ~linearly in input block count
        .map_batches(
            hist,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby(["g", "vb"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    by_group: dict = {}
    for r in hist_rows:
        by_group.setdefault(r["g"], []).append((int(r["vb"]), int(r["n"])))
    # (g, vb) -> list of (q, residual 0-based rank, frac-weight role)
    targets: dict = {}
    for g, buckets in by_group.items():
        buckets.sort()
        n = sum(cnt for _, cnt in buckets)
        wanted = []  # (rank, q, which, frac)
        for q in qs:
            h = (n - 1) * q
            r0 = int(np.floor(h))
            r1 = min(r0 + 1, n - 1)
            frac = h - r0
            wanted.append((r0, q, 0, frac))
            if r1 != r0:
                wanted.append((r1, q, 1, frac))
        wanted.sort()
        it = iter(wanted)
        want = next(it, None)
        cum = 0
        for vb, cnt in buckets:
            while want is not None and want[0] < cum + cnt:
                targets.setdefault((g, vb), []).append(
                    (want[1], want[0] - cum, want[2], want[3])
                )
                want = next(it, None)
            cum += cnt
    ref = ray.put(targets)

    def gather(batch: pa.Table) -> pa.Table:
        tg = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        vb = np.searchsorted(splits, v, side="right").astype(np.int32)
        keep = np.zeros(len(v), dtype=bool)
        for g, b in tg:
            gm = pc.equal(batch[group_col], g).to_numpy(zero_copy_only=False)
            keep |= gm & (vb == b)
        return pa.table(
            {
                "g": batch[group_col].filter(pa.array(keep)),
                "vb": pa.array(vb[keep]),
                "v": pa.array(v[keep]),
            }
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        tg = ray.get(ref)
        g = df["g"].iloc[0]
        vb = int(df["vb"].iloc[0])
        vals = np.sort(df["v"].to_numpy())
        rows = [(q, which, frac, vals[r]) for q, r, which, frac in tg[(g, vb)]]
        return pd.DataFrame(
            {
                group_col: [g] * len(rows),
                "q": [q for q, _, _, _ in rows],
                "frac": [f for _, _, f, _ in rows],
                "v": [v for _, _, _, v in rows],
            }
        )

    def blend(batch: pa.Table) -> pa.Table:
        # v0 = min, v1 = max of the (<=2) bracketing order stats;
        # pinned formula v0 + frac*(v1-v0)
        v0 = batch[f"min(v)"].to_numpy(zero_copy_only=False)
        v1 = batch[f"max(v)"].to_numpy(zero_copy_only=False)
        frac = batch[f"max(frac)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: batch[group_col],
                "q": batch["q"],
                "value": pa.array(v0 + frac * (v1 - v0), type=pa.float64()),
            }
        )

    from ray.data.aggregate import Max as _Max2, Min as _Min2

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(
            gather,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby(["g", "vb"])
        .map_groups(pick, batch_format="pandas")
        .groupby([group_col, "q"])
        .aggregate(_Min2("v"), _Max2("v"), _Max2("frac"))
        .map_batches(blend, batch_format="pyarrow")
        .sort([group_col, "q"])
    )


def group_weighted_median(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    weight_col: str,
    group_col: str,
    num_value_buckets: int = 64,
) -> ray.data.Dataset:
    """LOWER weighted median per group — the smallest value v such that
    the cumulative INTEGER weight of values <= v reaches half the
    group's total (2·cumw >= total).  The robust-center statistic when
    rows carry multiplicities (median price weighted by quantity,
    median length weighted by tokens).

    Same no-global-sort order-statistics scheme as ``group_quantiles``,
    but ranks live in WEIGHT space: pass 1 histograms per-(group,
    value-bucket) WEIGHT sums (map-side combine); the driver prefix-sums
    the (groups x buckets) matrix and finds each group's hit bucket plus
    the residual weight needed inside it; pass 2 gathers only hit-bucket
    rows and selects the answer with a per-bucket value-sorted cumsum.
    Values and weights are exact integers end to end, so the selected
    median hash-matches any engine."""
    rng = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(rng[f"min({value_col})"]), float(rng[f"max({value_col})"])
    splits = np.linspace(lo, hi, num_value_buckets + 1)[1:-1]

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vb = np.searchsorted(splits, v, side="right").astype(np.int32)
        t = pa.table({"g": batch[group_col], "vb": pa.array(vb), "w": pa.array(w)})
        agg = t.group_by(["g", "vb"]).aggregate([("w", "sum")])
        return agg.rename_columns(["g", "vb", "w"])

    hist_rows = (
        ds.select_columns([group_col, value_col, weight_col])
        .map_batches(
            hist,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby(["g", "vb"])
        .aggregate(Sum("w", alias_name="w"))
        .take_all()
    )
    by_group: dict = {}
    for r in hist_rows:
        by_group.setdefault(r["g"], []).append((int(r["vb"]), int(r["w"])))
    targets: dict = {}  # (g, vb) -> residual weight needed inside the bucket
    for g, buckets in by_group.items():
        buckets.sort()
        tot = sum(w for _, w in buckets)
        cum = 0
        for vb, w in buckets:
            if 2 * (cum + w) >= tot:
                targets[(g, vb)] = (tot - 2 * cum + 1) // 2  # smallest cw with 2(cum+cw)>=tot
                break
            cum += w
    ref = ray.put(targets)

    def gather(batch: pa.Table) -> pa.Table:
        tg = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vb = np.searchsorted(splits, v, side="right").astype(np.int32)
        keep = np.zeros(len(v), dtype=bool)
        for g, b in tg:
            gm = pc.equal(batch[group_col], g).to_numpy(zero_copy_only=False)
            keep |= gm & (vb == b)
        return pa.table(
            {
                "g": batch[group_col].filter(pa.array(keep)),
                "vb": pa.array(vb[keep]),
                "v": pa.array(v[keep]),
                "w": pa.array(w[keep]),
            }
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        tg = ray.get(ref)
        g = df["g"].iloc[0]
        need = tg[(g, int(df["vb"].iloc[0]))]
        agg = df.groupby("v", sort=True)["w"].sum()
        cw = agg.cumsum().to_numpy()
        vals = agg.index.to_numpy()
        i = int(np.searchsorted(cw, need, side="left"))
        return pd.DataFrame({group_col: [g], "weighted_median": [vals[i]]})

    return (
        ds.select_columns([group_col, value_col, weight_col])
        .map_batches(
            gather,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby(["g", "vb"])
        .map_groups(pick, batch_format="pandas")
        .sort(group_col)
    )


def group_trimmed_mean(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    group_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    num_value_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group TRIMMED mean — the robust center that drops the value
    tails outside the exact interpolated [lo_q, hi_q] percentile band
    before averaging (outlier-resistant price/length/latency centers; a
    heavy-tail corpus statistic that a plain AVG cannot give).

    Two composed passes, both already scale-shaped:

      1. exact percentile_cont bounds per group via
         ``group_quantiles_cont`` (order-statistics scheme — histogram
         exchange of (groups x value-buckets) rows, residual-rank
         gather; nothing corpus-scale on the driver); the resulting
         per-group (lo, hi) map is GROUP-COUNT sized and broadcast once
         with ``ray.put``;
      2. one filtered aggregate: rows with lo <= v <= hi contribute
         FLOOR(v*100+0.5) integer cents to a per-batch (map-side
         combined) sum/count partial, then a group-count-sized global
         groupby.  Integer cents make the sum order-independent, so the
         result hash-matches the SQL twin exactly.

    Output: (group_col, lo, hi, trimmed_avg, n_kept) sorted by group.
    trimmed_avg = ROUND(sum_cents / 100 / n, 2) — pinned to the oracle
    formula term for term."""
    from ray.data.aggregate import Sum as _Sum

    bounds = group_quantiles_cont(
        ds,
        value_col=value_col,
        group_col=group_col,
        qs=(lo_q, hi_q),
        num_value_buckets=num_value_buckets,
    ).take_all()  # 2 rows per group — group-count sized by construction
    lohimap: dict = {}
    for r in bounds:
        lo, hi = lohimap.setdefault(r[group_col], [np.nan, np.nan])
        if abs(r["q"] - lo_q) < 1e-12:
            lohimap[r[group_col]][0] = r["value"]
        else:
            lohimap[r[group_col]][1] = r["value"]
    ref = ray.put({g: (v[0], v[1]) for g, v in lohimap.items()})

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        g = pd.Series(batch[group_col].to_numpy(zero_copy_only=False))
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = g.map({k: b[0] for k, b in m.items()}).to_numpy(np.float64)
        hi = g.map({k: b[1] for k, b in m.items()}).to_numpy(np.float64)
        keep = (v >= lo) & (v <= hi)
        cents = np.floor(v[keep] * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "g": pa.array(g[keep].to_numpy(object), type=pa.string()),
                "cents": pa.array(cents),
            }
        )
        p = t.group_by("g").aggregate([("cents", "sum"), ("cents", "count")])
        return p.rename_columns(["g", "sum_cents", "n_kept"])

    OUT_SCHEMA = pa.schema(
        [
            (group_col, pa.string()),
            ("lo", pa.float64()),
            ("hi", pa.float64()),
            ("trimmed_avg", pa.float64()),
            ("n_kept", pa.int64()),
        ]
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty aggregate block loses columns
            return OUT_SCHEMA.empty_table()
        m = ray.get(ref)
        gs = batch["g"].to_pylist()
        sc = batch["sum(sum_cents)"].to_numpy(zero_copy_only=False)
        n = batch["sum(n_kept)"].to_numpy(zero_copy_only=False)
        avg = np.round(sc.astype(np.float64) / 100.0 / n, 2)
        return pa.table(
            {
                group_col: pa.array(gs, type=pa.string()),
                "lo": pa.array([m[g][0] for g in gs], type=pa.float64()),
                "hi": pa.array([m[g][1] for g in gs], type=pa.float64()),
                "trimmed_avg": pa.array(avg, type=pa.float64()),
                "n_kept": pc.cast(batch["sum(n_kept)"], pa.int64()),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(_Sum("sum_cents"), _Sum("n_kept"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(group_col)
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    left_out: str = "left_id",
    right_out: str = "right_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """AS-OF join (an operator Ray Data lacks): for each left row, the
    right row of the same ``on`` key with the greatest ts <= left.ts —
    ties at equal ts break to the greatest right id. Inner semantics
    (left rows with no prior right row are dropped). Output:
    (on, left_id, right_id) integer columns.

    Shape: both sides project to (key, ts, id, side) — nothing wider
    crosses the exchange — then ONE shuffle on a coarse hash bucket of
    the key co-locates each key's rows; inside the bucket a single
    vectorized pass over the (key, ts, side, id)-sorted frame computes
    a per-key forward-max of right-row positions (right rows sort before
    left rows at equal ts, making the match inclusive). No per-key
    Python, no per-row loop; the partitioning assumption is only that
    one KEY's rows fit a task (same as any keyed window)."""

    def tag(side: int, id_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[on].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = ((k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
                np.int32
            )
            return pa.table(
                {
                    on: batch[on],
                    "ts": pc.cast(batch[ts_col], pa.int64()),
                    "rid": pc.cast(batch[id_col], pa.int64()),
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8)
                    ),
                    "bucket": pa.array(b),
                }
            )

        return fn

    both = right.map_batches(
        tag(0, right_id), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        left.map_batches(tag(1, left_id), batch_format="pyarrow", zero_copy_batch=True)
    )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([on, "ts", "side", "rid"], kind="mergesort")
        k = df[on].to_numpy()
        side = df["side"].to_numpy()
        rid = df["rid"].to_numpy().astype(np.int64)
        n = len(df)
        pos = np.arange(n, dtype=np.int64)
        seg = np.cumsum(np.r_[True, k[1:] != k[:-1]]).astype(np.int64)
        # forward-max of right-row positions, segment-guarded: encode
        # (segment, position) into one ordinal so a previous key's right
        # row can never satisfy the current key's validity check
        val = np.where(side == 0, seg * (n + 1) + pos, -1)
        acc = np.maximum.accumulate(val)
        valid = (side == 1) & (acc >= 0) & (acc // (n + 1) == seg)
        rpos = (acc % (n + 1))[valid]
        return pd.DataFrame(
            {
                on: k[valid],
                left_out: rid[valid],
                right_out: rid[rpos],
            }
        )

    return (
        both.groupby("bucket")
        .map_groups(match, batch_format="pandas")
        .sort([on, left_out])
    )


def range_join(
    facts: ray.data.Dataset,
    ranges: "pa.Table",
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    id_col: str = "band_id",
) -> ray.data.Dataset:
    """Range (interval) join — another operator Ray Data lacks: assign
    each fact row the range whose [lo, hi) contains its value. The range
    table must be SMALL (it is broadcast via ray.put), sorted by lo and
    non-overlapping — the standard banding/bucketing join; the per-batch
    probe is one np.searchsorted, no shuffle at all. Rows matching no
    range are dropped (inner semantics)."""
    import pandas as pd  # noqa: F401 (parity of imports with module)

    lo = np.asarray(ranges[lo_col].to_numpy(zero_copy_only=False), dtype=np.float64)
    hi = np.asarray(ranges[hi_col].to_numpy(zero_copy_only=False), dtype=np.float64)
    ids = np.asarray(ranges[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.argsort(lo)
    lo, hi, ids = lo[order], hi[order], ids[order]
    if (lo[1:] < hi[:-1]).any():
        raise ValueError("range_join requires non-overlapping ranges")
    ref = ray.put((lo, hi, ids))

    def probe(batch: pa.Table) -> pa.Table:
        lo_, hi_, ids_ = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(lo_, v, side="right") - 1
        ok = (pos >= 0) & (v < hi_[np.maximum(pos, 0)])
        out = batch.filter(pa.array(ok))
        return out.append_column(id_col, pa.array(ids_[pos[ok]]))

    return facts.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def latest_event_per_user(
    events: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Keep-newest dedup by key — the "latest version wins" operator a
    100 TB ingest loop runs constantly (re-crawled URL supersedes the old
    row; reference upserts achieve this via the search index, SURVEY.md
    §2.3).  For each user: the event with the greatest (ts, event_id).

    Shape: per-batch combine first (one candidate row per user per
    batch), then ONE shuffle on a coarse hash bucket of user_id and a
    vectorized take-last per user inside the bucket — never a per-user
    ``map_groups`` call, never raw rows through the exchange.  Ties on
    ts break by event_id, so the result is execution-order independent."""

    def local_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        last = np.r_[uid[1:] != uid[:-1], True]
        return df[last]

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                "ts": batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            }
        )
        df = local_latest(df)
        uid = df["user_id"].to_numpy().astype(np.uint64)
        df["bucket"] = (
            (uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = local_latest(df)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "last_event_id": df["event_id"].to_numpy(),
                "last_ts_us": df["ts"].to_numpy(),
            }
        )

    return (
        events.select_columns(["user_id", "event_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
        .sort("user_id")
    )


def nation_balance(
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
) -> ray.data.Dataset:
    """FULL OUTER join of two aggregates — customer and supplier account
    totals side by side per nation, nations missing from either side
    showing zero.  Expressed shuffle-free as aggregate-union-aggregate:
    each side pre-aggregates to (nationkey, n, cents) per batch, the two
    tiny keyed aggregates union and re-aggregate (sum treats the missing
    side as 0 — exactly outer-join-with-COALESCE semantics), and the
    25-row nation dim is a broadcast lookup.  No row table ever moves."""

    def side(ds, key, bal, n_out, cents_out):
        def partial(batch: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(batch[bal], 100.0), 0.5)), pa.int64()
            )
            t = pa.table(
                {
                    "n_nationkey": pc.cast(batch[key], pa.int32()),
                    n_out: pa.array(np.ones(len(batch), dtype=np.int64)),
                    cents_out: cents,
                    # the other side's columns, zero-filled so the union aligns
                    **{
                        c: pa.array(np.zeros(len(batch), dtype=np.int64))
                        for c in ALL
                        if c not in (n_out, cents_out)
                    },
                }
            )
            return t.group_by("n_nationkey").aggregate([(c, "sum") for c in ALL])

        return ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).rename_columns({f"{c}_sum": c for c in ALL})

    ALL = ("n_customers", "cust_cents", "n_suppliers", "supp_cents")
    cust = side(customer, "c_nationkey", "c_acctbal", "n_customers", "cust_cents")
    supp = side(supplier, "s_nationkey", "s_acctbal", "n_suppliers", "supp_cents")

    names = {
        int(k): v
        for k, v in zip(
            *(
                nation.to_pandas()[c].tolist()
                for c in ("n_nationkey", "n_name")
            )
        )
    }
    ref = ray.put(names)

    def finish(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        keys = batch["n_nationkey"].to_pylist()
        out = {"n_name": pa.array([lut[k] for k in keys])}
        for c in ALL:
            out[c] = batch[f"sum({c})"]
        return pa.table(out)

    return (
        cust.union(supp)
        .groupby("n_nationkey")
        .aggregate(*[Sum(c) for c in ALL])
        .map_batches(finish, batch_format="pyarrow")
        .sort("n_name")
    )


def events_hopping(
    events: ray.data.Dataset,
    *,
    size_days: int = 2,
    hop_days: int = 1,
) -> ray.data.Dataset:
    """Hopping (sliding) time windows — each event lands in
    ``size/hop`` overlapping windows; emitted per window: event count and
    value total in integer cents.  The streaming-window shape Ray Data
    has no primitive for: replicate each row to its windows inside
    ``map_batches`` (numpy tile, no Python loop), pre-aggregate per
    batch, then one tiny day-keyed shuffle.  Window key is the epoch-day
    of the window start — integer, so conformance hashes exactly."""
    if size_days % hop_days:
        raise ValueError("size_days must be a multiple of hop_days")
    n_win = size_days // hop_days
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // day_us
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        wd = np.repeat(day, n_win) - np.tile(
            np.arange(n_win, dtype=np.int64) * hop_days, len(day)
        )
        t = pa.table(
            {
                "window_day": wd,
                "n_events": np.ones(len(wd), dtype=np.int64),
                "cents": np.tile(cents.reshape(-1, 1), (1, n_win)).reshape(-1),
            }
        )
        return t.group_by("window_day").aggregate(
            [("n_events", "sum"), ("cents", "sum")]
        )

    return (
        events.select_columns(["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .rename_columns({"n_events_sum": "n_events", "cents_sum": "cents"})
        .groupby("window_day")
        .aggregate(Sum("n_events"), Sum("cents"))
        .map_batches(
            lambda b: pa.table(
                {
                    "window_day": b["window_day"],
                    "n_events": b["sum(n_events)"],
                    "cents": b["sum(cents)"],
                }
            ),
            batch_format="pyarrow",
        )
        .sort("window_day")
    )


def events_cube(events: ray.data.Dataset) -> ray.data.Dataset:
    """CUBE(day, event_type): all four grouping sets — (day, type),
    (day), (type) and grand total — coarser levels labeled 'ALL'.  Same
    shape as ``events_rollup``: one shuffle of the raw table into the
    finest aggregate, every coarser level re-aggregated from the tiny
    (days × types) result."""
    fine = (
        events.map_batches(
            lambda b: pa.table(
                {
                    "day": pc.strftime(b["ts"], format="%Y-%m-%d"),
                    "event_type": b["event_type"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="event_count"))
        .materialize()  # (days x types) rows; feeds all four levels
    )
    per_day = (
        fine.groupby("day")
        .aggregate(Sum("event_count", alias_name="event_count"))
        .map_batches(
            lambda b: pa.table(
                {
                    "day": b["day"],
                    "event_type": pa.array(["ALL"] * b.num_rows),
                    "event_count": b["event_count"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    per_type = (
        fine.groupby("event_type")
        .aggregate(Sum("event_count", alias_name="event_count"))
        .map_batches(
            lambda b: pa.table(
                {
                    "day": pa.array(["ALL"] * b.num_rows),
                    "event_type": b["event_type"],
                    "event_count": b["event_count"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    tot = fine.aggregate(Sum("event_count"))
    total = ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(["ALL"]),
                "event_type": pa.array(["ALL"]),
                "event_count": pa.array([int(tot["sum(event_count)"])]),
            }
        )
    )
    return fine.union(per_day, per_type, total).sort(["day", "event_type"])


def shipping_priority(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """TPC-H Q3-shaped three-table pipeline: customers of one market
    segment, their orders placed before ``cutoff``, revenue from line
    items shipped after ``cutoff``; top-k open orders by revenue.

    Scale shape: the dimension hop (customer -> orders) is a broadcast
    SEMI-join — only the custkey set of one segment (1/5 of a dimension
    table) ships via ``ray.put``, never the fact table.  The fact-fact
    hop (orders -> lineitem) is the native distributed hash join on
    o_orderkey, with BOTH sides pre-filtered at the scan (date predicates
    prune before any shuffle) and lineitem projected to 3 columns.  The
    top-k sorts the post-aggregate (one row per surviving order), never
    raw line items."""
    seg_keys = customer.filter(
        expr=f"c_mktsegment == '{segment}'"
    ).select_columns(["c_custkey"]).to_pandas()
    keyset = frozenset(seg_keys["c_custkey"].astype(int).tolist())
    ref = ray.put(keyset)

    def in_segment(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        keep = np.fromiter(
            (int(c) in ks for c in batch["o_custkey"].to_numpy()),
            dtype=bool,
            count=batch.num_rows,
        )
        return batch.filter(pa.array(keep))

    cutoff_ts = pa.scalar(np.datetime64(cutoff, "us"), type=pa.timestamp("us"))

    def before_cutoff(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["o_orderdate"], cutoff_ts))

    def after_cutoff(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["l_shipdate"], cutoff_ts)).drop_columns(
            ["l_shipdate"]
        )

    open_orders = (
        orders.select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        )
        .map_batches(before_cutoff, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(in_segment, batch_format="pyarrow", zero_copy_batch=True)
    )
    shipped_late = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(after_cutoff, batch_format="pyarrow", zero_copy_batch=True)

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table(
            {
                "key": batch["l_orderkey"],
                "o_orderdate": pc.strftime(batch["o_orderdate"], format="%Y-%m-%d"),
                "o_orderpriority": batch["o_orderpriority"],
                "part_rev": rev,
            }
        )

    joined = shipped_late.join(
        open_orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    # SINGLE-key groupby on purpose: o_orderdate / o_orderpriority are
    # functionally dependent on the order key, so they ride along as Max
    # aggregates instead of widening the exchange key (the multi-key
    # aggregate path is measurably slower at scale).
    agg = (
        joined.map_batches(revenue, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Sum("part_rev", alias_name="revenue_raw"),
            Max("o_orderdate", alias_name="o_orderdate"),
            Max("o_orderpriority", alias_name="o_orderpriority"),
        )
    )
    return (
        agg.map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b["key"],
                    "o_orderdate": b["o_orderdate"],
                    "o_orderpriority": b["o_orderpriority"],
                    "revenue": _round2(b["revenue_raw"]),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def user_type_sets(
    events: ray.data.Dataset,
    *,
    type_a: str = "purchase",
    type_b: str = "click",
) -> ray.data.Dataset:
    """Distinct-set INTERSECT / EXCEPT over derived sets — users who did
    ``type_a`` AND ``type_b`` vs users who did ``type_a`` but never
    ``type_b``.  Returns (user_id, membership) with membership in
    {'both', 'a_only'}.

    Scale shape: one pass tags each event with two 0/1 flags, a
    per-batch combiner collapses to one row per (user × batch), and a
    single groupby(user_id) MAX-reduces the flags — the set algebra then
    runs on the one-row-per-user aggregate.  No self-join, no second
    shuffle, no distinct pass per side (the naive INTERSECT plan would
    shuffle the fact table twice)."""

    def flags(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        a = pc.cast(pc.equal(et, type_a), pa.int64())
        b = pc.cast(pc.equal(et, type_b), pa.int64())
        t = pa.table({"user_id": batch["user_id"], "has_a": a, "has_b": b})
        # map-side combine: one row per user per batch
        df = t.to_pandas().groupby("user_id", as_index=False).max()
        return pa.Table.from_pandas(df, preserve_index=False)

    per_user = (
        events.select_columns(["user_id", "event_type"])
        .map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Max("has_a", alias_name="has_a"), Max("has_b", alias_name="has_b"))
    )

    def classify(batch: pa.Table) -> pa.Table:
        a = batch["has_a"].to_numpy().astype(bool)
        b = batch["has_b"].to_numpy().astype(bool)
        keep = a  # rows with type_a at all
        member = np.where(b, "both", "a_only")
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "membership": pa.array(member, type=pa.string()),
            }
        )
        return t.filter(pa.array(keep))

    return per_user.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["user_id"])


def moving_avg_per_user(
    events: ray.data.Dataset,
    *,
    window: int = 5,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Frame-based window aggregate — per-event moving average of
    ``value`` over the last ``window`` events of the same user, ordered
    by (ts, event_id): SQL's AVG(value) OVER (PARTITION BY user ORDER BY
    ts ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW).  Completes the
    window-function family next to the cumulative (``user_running_totals``)
    and hopping (``events_hopping``) variants.

    Shape: same coarse-bucket idiom as ``sessionize`` — shuffle on
    hash(user) % num_buckets, then ONE vectorized pass per bucket: the
    window sum is ``window`` shifted-array adds (vectorized over ALL
    rows, never a Python loop per user or row).  Direct small sums, not
    cumsum differences, on purpose: a cumsum over a large bucket carries
    ~1e-10 absolute float error into every difference, enough to flip
    the 6-decimal rounding the conformance hash uses; summing <=window
    doubles keeps the error at machine epsilon."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return batch.append_column("bucket", pa.array(b))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy().astype(np.int64)
        val = df["value"].to_numpy().astype(np.float64)
        n = len(uid)
        new_user = np.r_[True, uid[1:] != uid[:-1]] if n else np.zeros(0, bool)
        first_user_row = np.flatnonzero(new_user)
        run_len = np.diff(np.r_[first_user_row, n])
        row_in_user = np.arange(n) - np.repeat(first_user_row, run_len)
        s = np.zeros(n, dtype=np.float64)
        rows = np.arange(n)
        for j in range(window):  # `window` shifted adds, each over all rows
            valid = row_in_user >= j
            s[valid] += val[rows[valid] - j]
        cnt = np.minimum(row_in_user + 1, window)
        mavg = s / cnt
        return pd.DataFrame(
            {
                "user_id": uid,
                "event_id": df["event_id"].to_numpy(),
                "mavg": np.round(mavg, 6),
            }
        )

    return (
        events.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fn, batch_format="pandas")
        .sort(["user_id", "event_id"])
    )


def funnel_stage(
    events: ray.data.Dataset,
    *,
    steps: tuple = ("view", "click", "purchase"),
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Ordered funnel analysis — for each user who performed ``steps[0]``,
    the deepest step reached where each step strictly FOLLOWS the
    previous one in time: stage 1 = viewed, 2 = clicked after first view,
    3 = purchased after that click.  The standard conversion query a
    behavioral dataset runs (reference has no funnel; this extends the
    windowed-analytics family of SURVEY.md §2.6).

    Semantics pinned for the oracle: step k's timestamp is the MINIMUM
    event ts of that type strictly greater than step k-1's timestamp
    (first-touch attribution); ties in ts cannot demote a user because
    the comparison is strict on ts only.

    Shape: one shuffle on a coarse hash bucket of user_id, then a fully
    vectorized per-bucket pass — three pandas groupby-mins and two
    merges, never a per-user Python loop.  Per-batch pre-filter drops
    event types outside the funnel before the exchange."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"], value_set=pa.array(list(steps)))
        batch = batch.filter(mask)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_type": batch["event_type"],
                "ts": pc.cast(batch["ts"], pa.int64()),
                "bucket": pa.array(b),
            }
        )

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t1 = (
            df[df["event_type"] == steps[0]]
            .groupby("user_id", sort=False)["ts"]
            .min()
            .rename("t1")
        )
        if t1.empty:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "funnel_stage": pd.Series([], dtype=np.int64)}
            )
        s2 = df[df["event_type"] == steps[1]].merge(t1, on="user_id")
        t2 = s2[s2["ts"] > s2["t1"]].groupby("user_id", sort=False)["ts"].min().rename("t2")
        s3 = df[df["event_type"] == steps[2]].merge(t2, on="user_id")
        t3 = s3[s3["ts"] > s3["t2"]].groupby("user_id", sort=False)["ts"].min().rename("t3")
        out = t1.reset_index()
        stage = np.ones(len(out), dtype=np.int64)
        stage[out["user_id"].isin(t2.index).to_numpy()] = 2
        stage[out["user_id"].isin(t3.index).to_numpy()] = 3
        return pd.DataFrame(
            {"user_id": out["user_id"].to_numpy(np.int64), "funnel_stage": stage}
        )

    return (
        events.select_columns(["user_id", "event_type", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fn, batch_format="pandas")
        .sort("user_id")
    )


def mode_event_type(
    events: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Per-group MODE — each user's most frequent event type, ties broken
    by the lexicographically smallest type so the answer is unique and
    execution-order independent (SQL: ROW_NUMBER() OVER (PARTITION BY
    user ORDER BY cnt DESC, type) = 1).

    Shape: per-batch partial count on (user_id, event_type) collapses raw
    events to at most users x |types| rows BEFORE the exchange, one
    shuffle on a coarse hash bucket of user_id, then a vectorized
    sum + take-first per bucket."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_pandas(),
            }
        )
        g = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        uid = g["user_id"].to_numpy().astype(np.uint64)
        g["bucket"] = (
            (uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["user_id", "event_type"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            ["user_id", "cnt", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        uid = g["user_id"].to_numpy()
        keep = np.r_[True, uid[1:] != uid[:-1]]
        g = g[keep]
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "mode_type": g["event_type"].to_numpy(),
                "mode_cnt": g["cnt"].to_numpy(np.int64),
            }
        )

    return (
        events.select_columns(["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
        .sort("user_id")
    )


def nation_share_in_region(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    nation: ray.data.Dataset,
    region: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Hierarchical percent-of-parent: each nation's share of its
    REGION's order revenue (the nested ratio_to_report shape — share
    within the parent level, not of the grand total).

    Scale shape: orders reduce map-side to (custkey, cents) partials;
    ONE ``bucket_hash_join`` pairs them with the customer projection
    (custkey -> nationkey); nation/region are 25/5-row dimension
    broadcasts; the final exchange is a #nations-row groupby, and the
    region totals that normalize the shares are computed FROM that tiny
    aggregate on the driver."""
    nat = nation.select_columns(["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    nkey_to_region = dict(
        zip(nat["n_nationkey"].astype(int), nat["n_regionkey"].astype(int))
    )
    nkey_to_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    rkey_to_name = dict(zip(reg["r_regionkey"].astype(int), reg["r_name"]))

    def ord_partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        )
        t = pa.table({"o_custkey": pc.cast(batch["o_custkey"], pa.int64()), "cents": cents})
        g = t.group_by(["o_custkey"]).aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    def cust_proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
            }
        )

    joined = bucket_hash_join(
        orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
            ord_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
            cust_proj, batch_format="pyarrow", zero_copy_batch=True
        ),
        left_on="o_custkey",
        right_on="c_custkey",
        left_schema=pa.schema([("o_custkey", pa.int64()), ("cents", pa.int64())]),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        num_buckets=num_buckets,
    )

    def nat_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["c_nationkey", "cents"])
            .group_by(["c_nationkey"])
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["c_nationkey", "cents"])

    per_nation = (
        joined.map_batches(nat_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_nationkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()  # #nations rows — aggregate-sized by construction
    )
    per_nation["rkey"] = per_nation["c_nationkey"].astype(int).map(nkey_to_region)
    region_tot = per_nation.groupby("rkey")["cents"].sum()
    out = pd.DataFrame(
        {
            "r_name": per_nation["rkey"].map(rkey_to_name),
            "n_name": per_nation["c_nationkey"].astype(int).map(nkey_to_name),
            "revenue": (per_nation["cents"].astype(np.int64) / 100.0).round(2),
            "share_in_region": np.round(
                per_nation["cents"].to_numpy(np.float64)
                / per_nation["rkey"].map(region_tot).to_numpy(np.float64),
                6,
            ),
        }
    ).sort_values(["r_name", "n_name"])
    return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def group_gini(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    group_col: str,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-group Gini coefficient over an integer value column — the
    inequality profile of a corpus dimension (how concentrated document
    length / host traffic / source volume is).  Formula over the
    ascending-sorted values x_1..x_n (ties in any order — the formula is
    tie-invariant):

        G = (2 * Σ i·x_i) / (n * Σ x_i) − (n + 1) / n

    Scale shape: ONE shuffle on a coarse hash bucket of the GROUP (all
    rows of a group co-locate; the partitioning assumption is the usual
    one-group-fits-a-task of any per-group sort) and a vectorized sort +
    cumsum per group; Σ i·x_i and Σ x_i are exact int64, the division
    happens once per group, rounded to 6 decimals."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        g = batch[group_col].to_pandas()
        codes = _pd.util.hash_array(g.to_numpy(dtype=object)).astype(np.uint64)
        return pa.table(
            {
                "g": batch[group_col],
                "v": pc.cast(batch[value_col], pa.int64()),
                "bucket": pa.array(
                    (codes % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby("g", sort=False):
            x = np.sort(sub["v"].to_numpy(np.int64))
            n = len(x)
            tot = int(x.sum())
            if n == 0 or tot == 0:
                continue
            ranked = int((np.arange(1, n + 1, dtype=np.int64) * x).sum())
            gini_val = (2.0 * ranked) / (float(n) * float(tot)) - (n + 1) / float(n)
            rows.append((g, n, round(gini_val, 6)))
        return pd.DataFrame(
            {
                "lang": [r[0] for r in rows],
                "n_docs": pd.Series([r[1] for r in rows], dtype=np.int64),
                "gini": pd.Series([r[2] for r in rows], dtype=np.float64),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(gini, batch_format="pandas")
        .sort("lang")
    )


def daily_ohlc(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Per-day OPEN/HIGH/LOW/CLOSE of order prices — the time-bucketed
    first/last/min/max rollup (ordered-aggregate semantics: open/close
    are the prices of the day's first/last order by (orderdate ts,
    orderkey), a DETERMINISTIC total order).

    Scale shape: first/last are argmin/argmax over a packed (ts-rank,
    orderkey) key, so each batch reduces to ONE row per (day × block)
    carrying candidate open/close keys and min/max cents — all four
    aggregates combine associatively and the exchange is day-keyed and
    tiny.  Prices ride as exact int64 cents."""

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch["o_orderdate"], format="%Y-%m-%d")
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        ts = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"day": day.to_pandas(), "ts": ts, "okey": okey, "cents": cents}
        )
        # deterministic total order inside the day: (ts, orderkey)
        df = df.sort_values(["day", "ts", "okey"], kind="mergesort")
        g = df.groupby("day", sort=False)
        out = pd.DataFrame(
            {
                "day": g.size().index,
                "open_ts": g["ts"].first().to_numpy(np.int64),
                "open_key": g["okey"].first().to_numpy(np.int64),
                "open_cents": g["cents"].first().to_numpy(np.int64),
                "close_ts": g["ts"].last().to_numpy(np.int64),
                "close_key": g["okey"].last().to_numpy(np.int64),
                "close_cents": g["cents"].last().to_numpy(np.int64),
                "high": g["cents"].max().to_numpy(np.int64),
                "low": g["cents"].min().to_numpy(np.int64),
                "n": g.size().to_numpy().astype(np.int64),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["day", "open_ts", "open_key"], kind="mergesort"
        )  # earliest candidate first
        g = df.groupby("day", sort=False)
        first = g.first()
        last_sorted = df.sort_values(["day", "close_ts", "close_key"], kind="mergesort")
        last = last_sorted.groupby("day", sort=False).last()
        out = pd.DataFrame(
            {
                "day": first.index,
                "open": first["open_cents"].to_numpy(np.int64) / 100.0,
                "high": g["high"].max().to_numpy(np.int64) / 100.0,
                "low": g["low"].min().to_numpy(np.int64) / 100.0,
                "close": last["close_cents"].to_numpy(np.int64) / 100.0,
                "n_orders": g["n"].sum().to_numpy().astype(np.int64),
            }
        )
        return out

    return (
        orders.select_columns(["o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .map_groups(combine, batch_format="pandas")
        .sort("day")
    )


def regr_price_qty(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """Grouped OLS regression (slope + intercept of price-cents on
    quantity per returnflag) from EXACT integer moment sums — the
    distributed model-fitting shape: each batch contributes one int64
    moment row per flag (map-side combine), the exchange moves
    flags × batches rows, and the closed-form fit runs once per flag.

    Bit-reproducibility: the five sums are exact int64 (qty ≤ 50 ×
    cents ≤ ~1e7 per row keeps sxy far from overflow through sf100);
    the finish casts each aggregate to float64 FIRST and then applies
    scalar IEEE ops in a pinned order (n·sxy − sx·sy, etc.), which the
    SQL oracle mirrors term for term, so both engines produce the same
    doubles before the 6-decimal round."""

    def partial(batch: pa.Table) -> pa.Table:
        flags = batch["l_returnflag"].to_pandas()
        x = batch["l_quantity"].to_numpy().astype(np.int64)
        y = np.floor(batch["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "l_returnflag": flags,
                "n": np.ones(len(x), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "sxy": x * y,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("l_returnflag", sort=False).sum().reset_index(),
            preserve_index=False,
        )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["n"].to_numpy().astype(np.float64)
        sx = df["sx"].to_numpy().astype(np.float64)
        sy = df["sy"].to_numpy().astype(np.float64)
        sxx = df["sxx"].to_numpy().astype(np.float64)
        sxy = df["sxy"].to_numpy().astype(np.float64)
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        slope = np.where(vx > 0, cov / vx, 0.0)
        intercept = (sy - slope * sx) / n
        return pa.table(
            {
                "l_returnflag": pa.array(df["l_returnflag"]),
                "n_rows": pa.array(df["n"].to_numpy(np.int64)),
                "slope_cents": pa.array(np.round(slope, 6)),
                "intercept_cents": pa.array(np.round(intercept, 6)),
            }
        )

    return (
        lineitem.select_columns(["l_returnflag", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort("l_returnflag")
    )


def corr_qty_discount(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """Per-returnflag Pearson correlation of quantity vs discount from
    EXACT integer moment sums — the grouped-statistics shape
    (mean/stddev/corr) done scale-correctly: each batch contributes one
    partial row of int64 moments per flag, the exchange moves
    flags x batches rows, and the float formula runs once per flag on
    exact integers so any engine reproduces it bit-for-bit (same trick
    as ``group_zscore``; values are integer quantities and 2-decimal
    discounts so x and y=100*discount are exactly representable).

    r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2)),
    rounded to 6 decimals; scale-invariance of r makes the x100 on the
    discount axis vanish."""

    def partial(batch: pa.Table) -> pa.Table:
        flags = batch["l_returnflag"].to_pandas()
        x = batch["l_quantity"].to_numpy().astype(np.int64)
        y = np.floor(batch["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": flags,
                "n": np.ones(len(x), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("l_returnflag", sort=False).sum().reset_index(),
            preserve_index=False,
        )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["n"].to_numpy().astype(np.float64)
        sx = df["sx"].to_numpy().astype(np.float64)
        sy = df["sy"].to_numpy().astype(np.float64)
        cov = n * df["sxy"].to_numpy().astype(np.float64) - sx * sy
        vx = np.maximum(n * df["sxx"].to_numpy().astype(np.float64) - sx * sx, 0.0)
        vy = np.maximum(n * df["syy"].to_numpy().astype(np.float64) - sy * sy, 0.0)
        denom = np.sqrt(vx) * np.sqrt(vy)
        r = np.where(denom > 0, cov / denom, 0.0)
        return pa.table(
            {
                "l_returnflag": pa.array(df["l_returnflag"]),
                "n_rows": pa.array(df["n"].to_numpy(np.int64)),
                "corr_qd": pa.array(np.round(r, 6)),
            }
        )

    return (
        lineitem.select_columns(["l_returnflag", "l_quantity", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
        .map_batches(
            lambda b: finish(
                b.rename_columns(
                    ["l_returnflag", "n", "sx", "sy", "sxx", "syy", "sxy"]
                )
            ),
            batch_format="pyarrow",
        )
        .sort("l_returnflag")
    )


def monthly_growth(orders: ray.data.Dataset) -> pd.DataFrame:
    """Month-over-month revenue growth — monthly SUM(o_totalprice) in
    exact integer cents plus the LAG-based percent change, the classic
    time-series rollup + window over an aggregate.  The heavy part (fact
    scan + monthly aggregate) is distributed with per-batch partial
    combine; only the ~#months aggregate rows reach the driver for the
    trivially small lag pass — driver-side compute on an aggregate this
    size is the intended scale shape, not a shortcut.

    growth = ROUND((cur - prev) / prev, 6) computed from exact int64
    cents on both engines; the first month is excluded (SQL LAG is
    NULL)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        months = ts.astype("datetime64[M]")
        ym = (months.astype(np.int64) + 12 * 1970).astype(np.int64)  # months since 0000
        cents = np.floor(
            batch["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"ym": ym, "cents": cents})
        g = df.groupby("ym", sort=False)["cents"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        orders.select_columns(["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .sum("cents")
        .sort("ym")
        .to_pandas()
    )
    cents = agg["sum(cents)"].to_numpy().astype(np.int64)
    ym = agg["ym"].to_numpy().astype(np.int64)
    prev = np.r_[np.int64(0), cents[:-1]]
    out = pd.DataFrame(
        {
            "year": ym // 12,
            "month": ym % 12 + 1,
            "revenue_cents": cents,
            "growth": np.round(
                (cents.astype(np.float64) - prev) / np.where(prev == 0, 1, prev), 6
            ),
        }
    )
    return out.iloc[1:].reset_index(drop=True)


def type_cooccurrence(
    events: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Co-occurrence counts — for every unordered pair of event types
    (a < b), how many users performed BOTH.  The market-basket /
    co-click analysis shape: naive SQL is a distinct self-join (quadratic
    in a user's history); here each user collapses to one bitmask row in
    a single shuffle, and pair counts are popcount algebra on the tiny
    type space.

    Shape: a metadata-sized distinct pre-pass pins the global type -> bit
    order (closed set, handfuls of types); per-batch flag aggregation
    folds raw events to one uint64 mask row per user per batch; ONE
    shuffle on a coarse user bucket ORs the masks; pair counts per bucket
    are bit algebra over <=64x64; the final aggregate is #pairs rows."""

    types = sorted(events.select_columns(["event_type"]).unique("event_type"))
    order = {t: np.uint64(i) for i, t in enumerate(types)}

    def stage1(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_pandas()
        bit = et.map(order).to_numpy().astype(np.uint64)
        df2 = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "mask": np.uint64(1) << bit,
            }
        )
        g = df2.groupby("user_id", sort=False)["mask"].agg(np.bitwise_or.reduce)
        g = g.reset_index()
        uid = g["user_id"].to_numpy().astype(np.uint64)
        g["bucket"] = (
            (uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("user_id", sort=False)["mask"].agg(np.bitwise_or.reduce)
        masks = m.to_numpy().astype(np.uint64)
        k = len(types)
        rows = []
        for a in range(k):
            ha = (masks >> np.uint64(a)) & np.uint64(1)
            if not ha.any():
                continue
            for b in range(a + 1, k):
                c = int((ha & (masks >> np.uint64(b))).sum())
                if c:
                    rows.append((a, b, c))
        if not rows:
            return pd.DataFrame(
                {"bit_a": pd.Series([], dtype=np.int64),
                 "bit_b": pd.Series([], dtype=np.int64),
                 "n_users": pd.Series([], dtype=np.int64)}
            )
        arr = np.array(rows, dtype=np.int64)
        return pd.DataFrame({"bit_a": arr[:, 0], "bit_b": arr[:, 1], "n_users": arr[:, 2]})

    ds = (
        events.select_columns(["user_id", "event_type"])
        .map_batches(stage1, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["bit_a", "bit_b"])
        .sum("n_users")
    )

    def name_pairs(batch: pa.Table) -> pa.Table:
        a = batch["bit_a"].to_numpy()
        b = batch["bit_b"].to_numpy()
        return pa.table(
            {
                "type_a": pa.array([types[i] for i in a]),
                "type_b": pa.array([types[i] for i in b]),
                "n_users": pc.cast(batch["sum(n_users)"], pa.int64()),
            }
        )

    return ds.map_batches(name_pairs, batch_format="pyarrow").sort(
        ["type_a", "type_b"]
    )


def global_rank(orders: ray.data.Dataset, *, ntile: int = 4) -> ray.data.Dataset:
    """Distributed exact ROW_NUMBER + NTILE over a TOTAL order — rank of
    every order by (o_totalprice DESC, o_orderkey ASC) plus its NTILE
    quartile, with no per-partition trick available: the rank is global.
    SQL: ROW_NUMBER() / NTILE(n) OVER (ORDER BY price DESC, key).

    Scale shape (same hierarchical two-pass as ``pack_sequences``):
    distributed sort on exact integer cents, MATERIALIZE the narrow
    2-column projection, pass 1 pulls one (first-row key, row count)
    summary per block to the driver, which computes exclusive prefix
    offsets and the global total; pass 2 broadcasts the tiny offset map
    and each block assigns rank = offset + local position — nothing
    row-scale ever reaches the driver.

    NTILE semantics pinned to SQL's: with q, r = divmod(n, k), the first
    r tiles take q+1 rows each.  Unique o_orderkey makes the total order
    strict, so ranks are execution-order independent."""

    def project(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"o_orderkey": batch["o_orderkey"], "cents": cents})

    ordered = (
        orders.select_columns(["o_orderkey", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cents", "o_orderkey"], descending=[True, False])
        .materialize()
    )

    def block_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_cents": pa.array([], type=pa.int64()),
                             "first_key": pa.array([], type=pa.int64()),
                             "rows": pa.array([], type=pa.int64())})
        return pa.table(
            {
                "first_cents": pa.array([int(batch["cents"][0].as_py())], type=pa.int64()),
                "first_key": pa.array([int(batch["o_orderkey"][0].as_py())], type=pa.int64()),
                "rows": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    summaries = ordered.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    # block order = sort order: cents DESC, key ASC
    summaries = summaries.sort_values(
        ["first_cents", "first_key"], ascending=[False, True], kind="mergesort"
    )
    rows = summaries["rows"].to_numpy().astype(np.int64)
    n_total = int(rows.sum())
    offs = dict(
        zip(
            zip(
                summaries["first_cents"].to_numpy().astype(np.int64).tolist(),
                summaries["first_key"].to_numpy().astype(np.int64).tolist(),
            ),
            (np.cumsum(rows) - rows).tolist(),
        )
    )
    offs_ref = ray.put(offs)
    q, r = divmod(n_total, ntile)
    boundary = (q + 1) * r

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], type=pa.int64()),
                             "price_rank": pa.array([], type=pa.int64()),
                             "quartile": pa.array([], type=pa.int64())})
        o = ray.get(offs_ref)
        start = o[(int(batch["cents"][0].as_py()), int(batch["o_orderkey"][0].as_py()))]
        rank = start + np.arange(1, batch.num_rows + 1, dtype=np.int64)
        if q > 0:
            tile = np.where(
                rank <= boundary,
                -(-rank // (q + 1)),
                r + -(-(rank - boundary) // q),
            ).astype(np.int64)
        else:
            tile = rank
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "price_rank": pa.array(rank),
                "quartile": pa.array(tile),
            }
        )

    return ordered.map_batches(
        assign, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).sort("o_orderkey")


def json_prop_stats(events: ray.data.Dataset) -> ray.data.Dataset:
    """Semi-structured extraction + aggregate — pull the integer ``k``
    property out of the JSON ``props`` column and roll up per event
    type.  The reference flattens JSON payloads row-by-row in Python
    (ref extractor's flatten_json); here extraction is ONE vectorized
    regex over the Arrow column (the schema of a pinned property is a
    regex, not a parser) and the aggregate is the usual map-side
    combine: one partial row per (type, batch) crosses the exchange.

    Rows whose props carry no integer ``k`` are dropped (count reflects
    matches), matching SQL's IS NOT NULL filter."""

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        valid = pc.is_valid(ext)
        k = pc.cast(pc.struct_field(ext.filter(valid), "k"), pa.int64()).to_numpy()
        et = batch["event_type"].filter(valid).to_pandas()
        df = pd.DataFrame({"event_type": et, "k": k})
        g = df.groupby("event_type", sort=False)["k"].agg(
            n="count", sum_k="sum", min_k="min", max_k="max"
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=True).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"), max_k=("max_k", "max"),
        )
        return g.reset_index().astype(
            {"n": np.int64, "sum_k": np.int64, "min_k": np.int64, "max_k": np.int64}
        )

    return (
        events.select_columns(["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(finish, batch_format="pandas")
        .sort("event_type")
    )


def revenue_share(orders: ray.data.Dataset) -> pd.DataFrame:
    """Percent-of-total (SQL ratio_to_report) — each order priority's
    revenue and its share of the grand total.  Distributed part: fact
    scan with per-batch partial combine into exact integer cents; the
    share division runs driver-side over the #priorities-row aggregate
    (the intended scale shape for a grand-total window — a second pass
    over the fact table would buy nothing)."""

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {"o_orderpriority": batch["o_orderpriority"].to_pandas(), "cents": cents}
        )
        g = df.groupby("o_orderpriority", sort=False)["cents"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        orders.select_columns(["o_orderpriority", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .sum("cents")
        .sort("o_orderpriority")
        .to_pandas()
    )
    cents = agg["sum(cents)"].to_numpy().astype(np.int64)
    tot = float(cents.sum())
    return pd.DataFrame(
        {
            "o_orderpriority": agg["o_orderpriority"],
            "revenue_cents": cents,
            "share": np.round(cents / tot, 6),
        }
    )


def cohort_retention(
    events: ray.data.Dataset, *, week_us: int = 604_800_000_000, num_buckets: int = 64
) -> ray.data.Dataset:
    """Cohort retention — users grouped by first-activity week, counted
    distinct per (cohort week, weeks-since-cohort offset).  The
    engagement matrix every behavioral dataset reports; SQL needs a
    min-per-user CTE joined back to a distinct activity set.

    Shape: per-batch partial distinct on (user, week) folds raw events
    before the exchange; ONE shuffle on a coarse user bucket — a user's
    whole history lands in one task, so the cohort week and every offset
    are decided locally and the bucket emits exact (cohort, offset,
    n_users) partials (each user counted once globally because users
    don't span buckets); the final aggregate is matrix-sized."""

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wk = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // week_us
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "week": wk}).drop_duplicates()
        u = df["user_id"].to_numpy().astype(np.uint64)
        df["bucket"] = (
            (u * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "week"])
        cw = df.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_week": cw.to_numpy(np.int64),
                "week_offset": (df["week"] - cw).to_numpy(np.int64),
            }
        )
        g = out.groupby(["cohort_week", "week_offset"]).size().reset_index(
            name="n_users"
        )
        return g

    return (
        events.select_columns(["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .sum("n_users")
        .map_batches(
            lambda b: b.rename_columns(["cohort_week", "week_offset", "n_users"]),
            batch_format="pyarrow",
        )
        .sort(["cohort_week", "week_offset"])
    )


def rolling_active_users(
    events: ray.data.Dataset,
    *,
    window_days: int = 7,
    day_us: int = 86_400_000_000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Windowed COUNT DISTINCT — trailing-``window_days`` active users
    for every activity day (the DAU/WAU engagement metric).  SQL needs a
    day×activity range join plus COUNT DISTINCT; a naive engine shuffles
    raw events per day of the window.

    Shape: per-batch distinct (user, day) folds events before the ONE
    user-bucket shuffle; inside a bucket each (user, day) explodes to
    its ``window_days`` target days (offset arithmetic over a tiled
    array, no Python loop), is deduped, filtered to the tiny broadcast
    set of real activity days, and counted — users never span buckets,
    so per-bucket counts sum to exact global distinct counts at the
    final matrix-sized aggregate."""

    day_col = (
        events.select_columns(["ts"])
        .map_batches(
            lambda b: pa.table(
                {"day": pc.unique(pc.divide(pc.cast(b["ts"], pa.int64()), day_us))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .unique("day")
    )
    valid_days = np.sort(np.array(sorted(day_col), dtype=np.int64))
    valid_ref = ray.put(valid_days)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // day_us
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        u = df["user_id"].to_numpy().astype(np.uint64)
        df["bucket"] = (
            (u * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"])
        uid = np.repeat(df["user_id"].to_numpy(np.int64), window_days)
        tgt = np.repeat(df["day"].to_numpy(np.int64), window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(df)
        )
        vd = ray.get(valid_ref)
        pairs = pd.DataFrame({"user_id": uid, "day": tgt}).drop_duplicates()
        pairs = pairs[pairs["day"].isin(vd)]
        g = pairs.groupby("day").size().reset_index(name="n_users")
        return g

    return (
        events.select_columns(["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("day")
        .sum("n_users")
        .map_batches(
            lambda b: pa.table(
                {
                    "day": pc.cast(b["day"], pa.int64()),
                    "active_users": pc.cast(b["sum(n_users)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("day")
    )


def unpivot_daily(
    events: ray.data.Dataset,
    *,
    categories: tuple = ("click", "error", "purchase", "signup", "view"),
) -> ray.data.Dataset:
    """UNPIVOT (melt) — the inverse of the ``pivot_counts`` reshape: the
    wide day x event-type count matrix back to long (day, event_type, n)
    rows, dropping absent combinations (count 0), which makes
    pivot -> unpivot a lossless round trip of the daily aggregate.

    Shape: the pivot's own distributed aggregate does the heavy work;
    the melt is a pure per-batch Arrow/numpy transform over the
    matrix-sized wide result — no extra exchange."""

    wide = pivot_counts(events, categories=categories)

    def melt(batch: pa.Table) -> pa.Table:
        day = np.asarray(batch["day"].to_pylist(), dtype=object)
        days, types, counts = [], [], []
        for c in categories:
            n = batch[c].to_numpy()
            keep = n > 0
            days.append(day[keep])
            types.append(np.repeat(c, int(keep.sum())).astype(object))
            counts.append(n[keep])
        return pa.table(
            {
                "day": pa.array(np.concatenate(days), type=pa.string()),
                "event_type": pa.array(np.concatenate(types), type=pa.string()),
                "n": pa.array(np.concatenate(counts).astype(np.int64)),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow").sort(["day", "event_type"])


def pareto_front(
    part: ray.data.Dataset,
    *,
    price_col: str = "p_retailprice",
    size_col: str = "p_size",
) -> ray.data.Dataset:
    """Skyline / Pareto-front operator: rows not dominated under
    (minimize price, maximize size) — b dominates a iff b.price <=
    a.price, b.size >= a.size, and strictly better in at least one.
    Ties on BOTH axes survive together (no strict domination).  SQL's
    formulation is a correlated NOT EXISTS self-join (quadratic); the
    distributed form exploits that the global front is a subset of the
    union of per-block fronts:

      map    per-block vectorized front (sort by price asc / size desc;
             dominated iff the strictly-cheaper prefix's running max
             size >= own size, or a same-price row has strictly more
             size) — each block reduces to its own front;
      reduce the union of partial fronts (front-sized, not data-sized)
             through the SAME kernel once — front-of-fronts equals the
             global front.

    The final pass is a single task over the unioned partial fronts;
    its input is bounded by sum of block-front sizes (worst case the
    whole data is mutually non-dominated — the standard skyline caveat,
    at which point the 'front' IS the answer and no operator can shrink
    it)."""

    def local_front(batch: pa.Table) -> pa.Table:
        price = batch[price_col].to_numpy(zero_copy_only=False).astype(np.float64)
        size = batch[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _front_mask(price, size)
        return pa.table(
            {
                "p_partkey": ids[keep],
                "price": price[keep],
                "p_size": size[keep],
            }
        )

    def global_front(df: pd.DataFrame) -> pd.DataFrame:
        price = df["price"].to_numpy(np.float64)
        size = df["p_size"].to_numpy(np.int64)
        keep = _front_mask(price, size)
        out = df[keep]
        return pd.DataFrame(
            {
                "p_partkey": out["p_partkey"].to_numpy(np.int64),
                "price": out["price"].to_numpy(np.float64),
                "p_size": out["p_size"].to_numpy(np.int64),
            }
        )

    fronts = part.select_columns(["p_partkey", price_col, size_col]).map_batches(
        local_front, batch_format="pyarrow", zero_copy_batch=True
    )
    one = fronts.map_batches(
        lambda b: b.append_column("k", pa.array(np.zeros(b.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
    )
    return (
        one.groupby("k")
        .map_groups(global_front, batch_format="pandas")
        .sort("p_partkey")
    )


def _front_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Vectorized Pareto mask under (min price, max size): sort by
    (price asc), take per-distinct-price max sizes, prefix-cummax of the
    STRICTLY cheaper prices, then a row is dominated iff that prefix max
    >= its size, or its own price group holds a strictly larger size."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((size, price))
    p = price[order]
    s = size[order]
    newgrp = np.r_[True, p[1:] != p[:-1]]
    gid = np.cumsum(newgrp) - 1
    ngroups = gid[-1] + 1
    gmax = np.full(ngroups, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.at(gmax, gid, s)
    run = np.maximum.accumulate(gmax)
    prefix = np.full(ngroups, np.iinfo(np.int64).min, dtype=np.int64)
    prefix[1:] = run[:-1]  # max size among strictly cheaper groups
    dominated_sorted = (prefix[gid] >= s) | (gmax[gid] > s)
    keep = np.empty(n, dtype=bool)
    keep[order] = ~dominated_sorted
    return keep


def window_count_join(
    events: ray.data.Dataset,
    *,
    probe_type: str = "purchase",
    count_type: str = "click",
    window_us: int = 3_600_000_000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Temporal INTERVAL-COUNT join — for every ``probe_type`` event,
    how many ``count_type`` events the same user produced in the
    preceding ``window_us`` microseconds (exclusive lower bound,
    inclusive upper: ts in (p.ts - W, p.ts]).  The attribution /
    burst-detection shape: SQL is a banded self-join, which explodes
    quadratically per user; here it is ONE coarse user-bucket shuffle
    and a single union-sort pass per bucket.

    Vectorization (no per-user Python, no composite-key overflow): tag
    count rows kind=0 and, per probe, TWO virtual probe rows kind=1 at
    ts and ts-W; lexsort the union by (user, ts, kind) — count rows sort
    before probes at equal ts, making the upper bound inclusive — then a
    cumulative count of kind=0 rows evaluated at the two probe positions
    differences into the in-window count.  The per-user segment base
    cancels in the subtraction, so no segment bookkeeping is needed.
    Probes with no counts in window emit 0 (LEFT JOIN semantics)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.or_(pc.equal(et, probe_type), pc.equal(et, count_type))
        t = batch.filter(keep)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": pc.cast(t["ts"], pa.int64()),
                "is_probe": pc.equal(t["event_type"], probe_type),
                "bucket": pa.array(b),
            }
        )

    W = int(window_us)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "purchase_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "n_in_window": pd.Series([], dtype=np.int64),
            }
        )
        probes = df[df["is_probe"]]
        if len(probes) == 0:
            return empty
        counts = df[~df["is_probe"]]
        pu = probes["user_id"].to_numpy(np.int64)
        pt = probes["ts"].to_numpy(np.int64)
        pid = probes["event_id"].to_numpy(np.int64)
        cu = counts["user_id"].to_numpy(np.int64)
        ct = counts["ts"].to_numpy(np.int64)
        np_, nc = len(pu), len(cu)
        u = np.concatenate([cu, pu, pu])
        ts = np.concatenate([ct, pt, pt - W])
        kind = np.concatenate(
            [np.zeros(nc, np.int8), np.ones(2 * np_, np.int8)]
        )
        ordx = np.lexsort((kind, ts, u))
        cum = np.cumsum(kind[ordx] == 0)
        pos = np.empty(nc + 2 * np_, dtype=np.int64)
        pos[ordx] = np.arange(nc + 2 * np_)
        hi = cum[pos[nc : nc + np_]]
        lo = cum[pos[nc + np_ :]]
        return pd.DataFrame(
            {
                "purchase_id": pid,
                "user_id": pu,
                "n_in_window": (hi - lo).astype(np.int64),
            }
        )

    return (
        events.select_columns(["user_id", "event_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fn, batch_format="pandas")
        .sort("purchase_id")
    )


def inter_event_gaps(
    events: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """LAG window — per-user statistics of the time gap between
    consecutive events ordered by (ts, event_id): SQL's
    ``epoch - LAG(epoch) OVER (PARTITION BY user ORDER BY ts, event_id)``
    aggregated to (n_gaps, avg_gap_us, max_gap_us) per user.  The
    inter-arrival distribution is the standard sessionization /
    politeness-tuning input (the crawl engine's per-host min-heap keys
    on exactly this quantity); completes the window family next to the
    frame (``moving_avg_per_user``) and cumulative variants.

    Users with fewer than two events produce no gaps and are absent —
    same as SQL's ``WHERE gap IS NOT NULL``.

    Shape: one shuffle on hash(user) % num_buckets, then ONE vectorized
    pass per bucket — sort, int64 diff, mask first-row-per-user, pandas
    groupby sum/count/max.  Gaps stay exact int64 microseconds until the
    single final divide, so the 6-decimal round matches the oracle
    bit-for-bit."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": pc.cast(batch["ts"], pa.int64()),
                "bucket": pa.array(b),
            }
        )

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_gaps": pd.Series([], dtype=np.int64),
                    "avg_gap_us": pd.Series([], dtype=np.float64),
                    "max_gap_us": pd.Series([], dtype=np.int64),
                }
            )
        same_user = np.r_[False, uid[1:] == uid[:-1]]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        g = pd.DataFrame({"user_id": uid[same_user], "gap": gap[same_user]})
        agg = g.groupby("user_id", sort=False)["gap"].agg(["count", "sum", "max"])
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(np.int64),
                "n_gaps": agg["count"].to_numpy(np.int64),
                "avg_gap_us": np.round(
                    agg["sum"].to_numpy(np.float64) / agg["count"].to_numpy(np.float64),
                    6,
                ),
                "max_gap_us": agg["max"].to_numpy(np.int64),
            }
        )

    return (
        events.select_columns(["user_id", "event_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fn, batch_format="pandas")
        .sort("user_id")
    )


def event_transitions(
    events: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Markov transition counts — for each user's event stream ordered by
    (ts, event_id), count every consecutive (prev_type -> next_type) pair
    globally: SQL's ``LAG(event_type) OVER (PARTITION BY user ORDER BY
    ts, event_id)`` followed by GROUP BY (prev, next).  The first-order
    behavioral transition matrix a sequence-modeling pipeline derives
    before training (and the crawl analogue of link-follow statistics).

    Shape: shuffle #1 on a coarse user-hash bucket (consecutive-pair
    detection needs a user co-located and sorted), vectorized shift +
    per-bucket pandas combine down to at most |types|^2 rows per bucket,
    then shuffle #2 over that tiny partial — raw pairs never re-shuffle."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "ts": pc.cast(batch["ts"], pa.int64()),
                "bucket": pa.array(b),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=object),
                    "next_type": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        same_user = np.r_[False, uid[1:] == uid[:-1]]
        pairs = pd.DataFrame(
            {
                "prev_type": np.r_[[""], et[:-1]][same_user],
                "next_type": et[same_user],
            }
        )
        out = (
            pairs.groupby(["prev_type", "next_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    return (
        events.select_columns(["user_id", "event_id", "event_type", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["prev_type", "next_type"])
    )


def min_cost_supplier(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q2-shaped ARGMIN join: for every part, the supplier that
    sold it cheapest (min l_extendedprice, ties by lowest suppkey),
    decorated with the supplier's name and nation.

    Scale shape — argmin never shuffles the fact table:
      * map-side combiner: per block, one lexsort keeps ONE row per
        (partkey × block) — the block's own argmin;
      * one coarse-bucket groupby (hash(partkey) % num_buckets) applies
        the same lexsort-take-first globally — exact, vectorized, one
        map_groups call per bucket (never per part);
      * supplier -> name/nation is a broadcast dim lookup (ray.put one
        dict; suppliers are a dimension even at 100 TB fact scale).
    Float order ties match SQL exactly: no arithmetic touches the price
    before comparison."""

    def block_argmin(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, pr, pk))
        pks = pk[order]
        first = np.r_[True, pks[1:] != pks[:-1]]
        sel = order[first]
        return pa.table(
            {
                "l_partkey": pa.array(pk[sel]),
                "l_extendedprice": pa.array(pr[sel]),
                "l_suppkey": pa.array(sk[sel]),
                "bucket": pa.array(
                    ((pk[sel].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                     % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    def bucket_argmin(t: pa.Table) -> pa.Table:
        return block_argmin(t).drop_columns(["bucket"])

    sup = supplier.select_columns(["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    keys = sup["s_suppkey"].astype(int)
    names_s = pd.Series(sup["s_name"].to_numpy(), index=keys)
    nations_s = pd.Series(
        sup["s_nationkey"].astype(int).map(nmap).to_numpy(), index=keys
    )
    smap_ref = ray.put((names_s, nations_s))

    def decorate(batch: pa.Table) -> pa.Table:
        names_s, nations_s = ray.get(smap_ref)
        sk = pd.Series(batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "p_partkey": batch["l_partkey"],
                "min_price_cents": pa.array(cents),
                "s_suppkey": pa.array(sk.to_numpy()),
                "s_name": pa.array(sk.map(names_s).to_numpy(), type=pa.string()),
                "n_name": pa.array(sk.map(nations_s).to_numpy(), type=pa.string()),
            }
        )

    return (
        lineitem.select_columns(["l_partkey", "l_extendedprice", "l_suppkey"])
        .map_batches(block_argmin, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_argmin, batch_format="pyarrow")
        .map_batches(decorate, batch_format="pyarrow")
        .sort("p_partkey")
    )


def bucket_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_schema: "pa.Schema",
    right_schema: "pa.Schema",
    num_buckets: int = 64,
    tag_batch_size: int = 262_144,
    salt: int = 1,
) -> ray.data.Dataset:
    """Distributed INNER equi-join as ONE coarse-bucket groupby + an
    in-bucket vectorized pandas merge — the empty-partition-safe
    alternative to ``Dataset.join``.

    Why it exists: ray.data's native hash-shuffle join (ray 2.49,
    ``execution/operators/join.py:104-126``) builds each partition side
    with an ArrowBlockBuilder; a hash partition that receives ZERO rows
    on either side builds a zero-column table and ``pa.Table.join`` then
    rejects the key FieldRef ("No match or multiple matches"). Any join
    whose key set is sparse relative to num_partitions — e.g. a
    HAVING-filtered tail joined back to its fact table — hits this.
    A groupby never materializes empty groups, so this shape cannot.

    Both sides are tagged into one superset schema (the other side's
    columns ride as typed nulls), exchanged once on a mixed key hash
    (~``num_buckets`` uniform groups), and merged per bucket with
    side-separated pandas frames (each side's own columns are null-free,
    so integer dtypes survive). Keys may be integer-castable OR strings
    (string keys bucket via ``hashing.hash64`` and merge on the string
    itself — URL-/domain-keyed joins at 100 TB); output columns = left
    columns + right columns minus the right key, with the declared
    schemas' types restored. Join output per bucket must fit a worker —
    at 100 TB raise num_buckets with data volume.

    ``salt`` > 1 is the hot-key (skew) escape hatch: a Zipf-hot key
    hashes every one of its rows into ONE bucket, so that bucket's merge
    becomes the straggler (and at 100 TB, the OOM). With salting, each
    LEFT row lands in one of ``salt`` sub-buckets of its key's bucket
    (round-robin within the batch — placement-only, so block layout
    cannot change the join OUTPUT), and every RIGHT row is REPLICATED
    into all ``salt`` sub-buckets; each left row still meets every
    matching right row exactly once, so the output set is identical
    while the hottest bucket shrinks ~``salt``-fold. Pass the SMALLER
    side as right when salting (its rows ship ``salt`` times); salting
    cannot help a key that is hot on BOTH sides (the join output itself
    is quadratic in that key — filter or pre-aggregate it instead)."""
    if salt < 1:
        raise ValueError(f"bucket_hash_join: salt must be >= 1, got {salt}")
    MIX = np.uint64(0x9E3779B97F4A7C15)
    lnames = [f.name for f in left_schema]
    rnames = [f.name for f in right_schema if f.name != right_on]
    dup = set(lnames) & set(rnames)
    if dup:
        raise ValueError(
            f"bucket_hash_join: column name collision {sorted(dup)} — "
            "rename one side before joining"
        )
    all_fields = [(n, left_schema.field(n).type) for n in lnames] + [
        (n, right_schema.field(n).type) for n in rnames
    ]
    out_schema = pa.schema(all_fields)
    # string keys bucket via the repo's stable 64-bit string hash
    # (hashing.hash64) and merge on the STRING itself in-bucket — the
    # hash only places rows, so collisions cannot create false matches;
    # the 100 TB URL-/domain-keyed joins need exactly this path
    lk_str = pa.types.is_string(left_schema.field(left_on).type) or pa.types.is_large_string(
        left_schema.field(left_on).type
    )
    rk_str = pa.types.is_string(right_schema.field(right_on).type) or pa.types.is_large_string(
        right_schema.field(right_on).type
    )
    if lk_str != rk_str:
        raise ValueError(
            "bucket_hash_join: key dtypes disagree — one side is string, "
            "the other integer; cast before joining"
        )
    key_is_str = lk_str

    def tag(side: int, key_col: str, own: List[str]):
        def fn(batch: pa.Table) -> pa.Table:
            if key_is_str:
                from ..hashing import hash64

                karr = pc.cast(batch[key_col], pa.string())
                h = hash64(karr)
                n = len(h)
                bucket = (h % np.uint64(num_buckets)).astype(np.int32)
                key_arr = karr
            else:
                k = (
                    pc.cast(batch[key_col], pa.int64())
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                n = len(k)
                bucket = ((k.astype(np.uint64) * MIX) % np.uint64(num_buckets)).astype(
                    np.int32
                )
                key_arr = pa.array(k)
            def one(bucket_arr: np.ndarray) -> pa.Table:
                cols = {
                    "__bucket": pa.array(bucket_arr),
                    "__side": pa.array(np.full(n, side, dtype=np.int8)),
                    "__key": key_arr,
                }
                for name, typ in all_fields:
                    if name in own:
                        cols[name] = pc.cast(batch[name], typ)
                    else:
                        cols[name] = pa.nulls(n, type=typ)
                return pa.table(cols)

            if salt == 1:
                return one(bucket)
            if side == 0:
                # probe side: spread rows round-robin over the salt
                # sub-buckets of their key bucket (placement-only)
                s = (np.arange(n, dtype=np.int64) % salt).astype(np.int32)
                return one(bucket * np.int32(salt) + s)
            # build side: replicate into every sub-bucket
            parts = [
                one(bucket * np.int32(salt) + np.int32(s)) for s in range(salt)
            ]
            return pa.concat_tables(parts)

        return fn

    def merge(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = (
            t.filter(pa.array(side == 0))
            .select(["__key"] + lnames)
            .to_pandas()
        )
        rt = (
            t.filter(pa.array(side == 1))
            .select(["__key"] + rnames)
            .to_pandas()
        )
        out = lt.merge(rt, on="__key")
        return pa.table(
            {n: pa.array(out[n], type=typ) for n, typ in all_fields},
            schema=out_schema,
        )

    # tag_batch_size bundles the (often post-filter tiny) upstream blocks
    # into few fat tagged blocks — the sort-shuffle behind groupby costs
    # ~linearly in INPUT BLOCK COUNT at fixed rows (measured 32-CPU
    # barrier: 128 tiny blocks 2.5 s vs 16 blocks 0.3 s for the same
    # 100k rows), so coalescing here, with zero extra exchange, removes
    # most of the per-join fixed cost. At scale the same value simply
    # caps tagged blocks at ~tag_batch_size rows (~10-20 MB for these
    # narrow join schemas).
    tagged = left.map_batches(
        tag(0, left_on, lnames),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=tag_batch_size,
    ).union(
        right.map_batches(
            tag(1, right_on, rnames),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=tag_batch_size,
        )
    )
    return tagged.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


def source_count_join(
    docs: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Every document tagged with its source's corpus-wide doc count —
    a STRING-keyed fact -> aggregate join: (doc_id, source, n_docs).

    Exercises ``bucket_hash_join``'s string-key path end to end: the
    counts reduce map-side first (one Arrow group_by per block, then a
    tiny source groupby), and the join back to the fact side buckets on
    ``hash64(source)`` while merging on the string itself.  At this
    source cardinality a broadcast map would also work; the bucket join
    is the shape that still works when the key is a URL/domain column
    with corpus-scale cardinality."""
    fact = docs.select_columns(["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        agg = t.group_by(["source"]).aggregate([("n_docs", "sum")])
        return pa.table({"source": agg["source"], "n_docs": agg["n_docs_sum"]})

    counts = (
        docs.select_columns(["source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    return bucket_hash_join(
        fact,
        counts,
        left_on="source",
        right_on="source",
        left_schema=pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
        right_schema=pa.schema([("source", pa.string()), ("n_docs", pa.int64())]),
        num_buckets=num_buckets,
    ).sort("doc_id")


def large_volume_customers(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    *,
    min_qty: int = 300,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q18-shaped HAVING-filter join: orders whose total line-item
    quantity exceeds ``min_qty``, with customer name and order facts.

    Scale shape — aggregate, HAVING filter and the first join share ONE
    exchange: the coarse bucket (hash(orderkey) % num_buckets)
    co-locates every qty partial of an orderkey with its orders row, so
    the per-bucket merge sums partials, applies the > min_qty filter
    and joins in the same vectorized pass (a separate orderkey groupby
    would move the same rows twice). Line items still reduce map-side
    first (one Arrow group_by per block). The customer hop is
    ``bucket_hash_join`` (see its docstring: the survivor key set is
    SPARSE by construction, which is exactly the shape that breaks
    ray.data's native join with empty hash partitions) — with the
    customer scan Bloom-pruned map-side first (survivor custkeys folded
    to broadcast BITS, never keys; FPs only pass extra rows into the
    exact join), so the second exchange ships ~survivors, not the whole
    dimension.  The HAVING survivors are materialized once (they are
    aggregate-sized) so the Bloom pass does not re-run the first
    exchange.  At sf0.1 the wall time is unchanged (~11 s — per-exchange
    fixed overhead dominates at this size); the prune pays at real scale
    where the customer exchange is data-bound, not overhead-bound.
    Quantities are integral, summed as int64 (exact at any add order)."""
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "qty": pc.cast(batch["l_quantity"], pa.int64()),
            }
        )
        agg = t.group_by(["l_orderkey"]).aggregate([("qty", "sum")])
        k = agg["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        return pa.table(
            {
                "__bucket": pa.array(
                    ((k.astype(np.uint64) * MIX) % np.uint64(num_buckets)).astype(np.int32)
                ),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "l_orderkey": pa.array(k),
                "qty": agg["qty_sum"],
                "o_custkey": pa.nulls(n, type=pa.int64()),
                "o_orderdate": pa.nulls(n, type=pa.timestamp("us")),
                "o_totalprice": pa.nulls(n, type=pa.float64()),
            }
        )

    def ord_tag(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(k)
        return pa.table(
            {
                "__bucket": pa.array(
                    ((k.astype(np.uint64) * MIX) % np.uint64(num_buckets)).astype(np.int32)
                ),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "l_orderkey": pa.array(k),
                "qty": pa.nulls(n, type=pa.int64()),
                "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
                "o_orderdate": pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                "o_totalprice": pc.cast(batch["o_totalprice"], pa.float64()),
            }
        )

    def agg_filter_join(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = (
            t.filter(pa.array(side == 0))
            .select(["l_orderkey", "qty"])
            .group_by(["l_orderkey"])
            .aggregate([("qty", "sum")])
        )
        qty = lt["qty_sum"].to_numpy(zero_copy_only=False)
        keep = qty > min_qty
        lp = pd.DataFrame(
            {
                "l_orderkey": lt["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "total_qty": qty[keep].astype(np.int64),
            }
        )
        rp = (
            t.filter(pa.array(side == 1))
            .select(["l_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
            .to_pandas()
        )
        out = lp.merge(rp, on="l_orderkey")
        return pa.table(
            {
                "l_orderkey": pa.array(out["l_orderkey"], type=pa.int64()),
                "total_qty": pa.array(out["total_qty"], type=pa.int64()),
                "o_custkey": pa.array(out["o_custkey"], type=pa.int64()),
                "o_orderdate": pa.array(out["o_orderdate"], type=pa.timestamp("us")),
                "o_totalprice": pa.array(out["o_totalprice"], type=pa.float64()),
            }
        )

    with_orders = (
        lineitem.select_columns(["l_orderkey", "l_quantity"])
        .map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            orders.select_columns(
                ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
            ).map_batches(ord_tag, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("__bucket")
        .map_groups(agg_filter_join, batch_format="pyarrow")
        .materialize()  # HAVING survivors: aggregate-sized by construction
    )
    wo_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("total_qty", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice", pa.float64()),
        ]
    )
    from ..functions.bloom import bloom_of_dataset

    cbloom = bloom_of_dataset(with_orders.select_columns(["o_custkey"]), "o_custkey")
    cbloom_ref = ray.put(cbloom)

    def cust_prune(batch: pa.Table) -> pa.Table:
        bf = ray.get(cbloom_ref)
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.filter(pa.array(bf.contains_many(keys)))

    joined = bucket_hash_join(
        with_orders,
        customer.select_columns(["c_custkey", "c_name"]).map_batches(
            cust_prune, batch_format="pyarrow", zero_copy_batch=True
        ),
        left_on="o_custkey",
        right_on="c_custkey",
        left_schema=wo_schema,
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
        num_buckets=num_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "c_name": batch["c_name"],
                "o_orderkey": batch["l_orderkey"],
                "o_orderdate": pc.strftime(batch["o_orderdate"], format="%Y-%m-%d"),
                "price_cents": pa.array(cents),
                "total_qty": batch["total_qty"],
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort(
        ["total_qty", "o_orderkey"], descending=[True, False]
    )


def promo_revenue_monthly(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    *,
    promo_type: str = "ECONOMY",
) -> ray.data.Dataset:
    """TPC-H Q14-shaped conditional revenue: per ship month, revenue
    cents from parts of ``promo_type`` vs all revenue.

    Scale shape: the part side reduces to ONE BIT per partkey — a
    broadcast flag set (ray.put once, read per task; ~12 MB per 10^8
    parts as a key set), so the fact table joins map-side with zero
    shuffle; the only exchange is the month groupby of per-block
    partial sums (tiny). Cents are floored per row (same double
    expression as the SQL twin) then summed as int64 — exact."""
    parts_pd = part.select_columns(["p_partkey", "p_type"]).to_pandas()
    all_pk = parts_pd["p_partkey"].to_numpy().astype(np.int64)
    pk = parts_pd[parts_pd["p_type"] == promo_type]["p_partkey"].to_numpy().astype(np.int64)
    # two packed bitmaps, literally 1 bit per partkey id (keys are dense
    # in TPC-H): 2^31 parts -> 256 MB each, broadcastable where an int64
    # key array (16 GB) is not. Exact — no Bloom false positives here,
    # membership changes cents. The EXISTS bitmap mirrors the SQL twin's
    # INNER JOIN: a lineitem whose partkey has no part row contributes
    # to NEITHER sum.
    size = int(all_pk.max()) + 1 if len(all_pk) else 1
    exists = np.zeros(size, dtype=bool)
    exists[all_pk] = True
    dense = np.zeros(size, dtype=bool)
    if len(pk):
        dense[pk] = True
    flag_ref = ray.put((np.packbits(dense), np.packbits(exists), size))

    def partial(batch: pa.Table) -> pa.Table:
        bits, exists_bits, size = ray.get(flag_ref)
        k = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        inb = (k >= 0) & (k < size)
        kk = np.where(inb, k, 0)
        known = inb & (((exists_bits[kk >> 3] >> (7 - (kk & 7))) & 1).astype(bool))
        batch = batch.filter(pa.array(known))  # SQL INNER JOIN semantics
        k = kk[known]
        month = pc.strftime(batch["l_shipdate"], format="%Y-%m")
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0
            + 0.5
        ).astype(np.int64)
        is_promo = ((bits[k >> 3] >> (7 - (k & 7))) & 1).astype(bool)
        t = pa.table(
            {
                "month": month,
                "promo_cents": pa.array(np.where(is_promo, cents, 0)),
                "total_cents": pa.array(cents),
            }
        )
        agg = t.group_by(["month"]).aggregate(
            [("promo_cents", "sum"), ("total_cents", "sum")]
        )
        return pa.table(
            {
                "month": agg["month"],
                "promo_cents": agg["promo_cents_sum"],
                "total_cents": agg["total_cents_sum"],
            }
        )

    return (
        lineitem.select_columns(
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .sort("month")
    )


def events_by_weekday(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-weekday event rollup (count + value cents) — the calendar
    scalar-function family (strftime %w) over the fact table, map-side
    combined so the exchange moves 7 rows per block."""

    def partial(batch: pa.Table) -> pa.Table:
        wd = pc.strftime(batch["ts"], format="%w")
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["value"], 100.0), 0.5)), pa.int64()
        )
        t = pa.table({"weekday": wd, "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)), "cents": cents})
        agg = t.group_by(["weekday"]).aggregate([("n", "sum"), ("cents", "sum")])
        return pa.table(
            {
                "weekday": agg["weekday"],
                "n_events": agg["n_sum"],
                "value_cents": agg["cents_sum"],
            }
        )

    return (
        events.select_columns(["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("weekday")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
        .sort("weekday")
    )


def group_percent_rank(orders: ray.data.Dataset) -> ray.data.Dataset:
    """PERCENT_RANK / ROW_NUMBER within each order-priority group over
    (o_totalprice DESC, o_orderkey) — the per-group window-rank shape
    where groups are FEW but each is corpus-sized, so per-group
    map_groups would be unbounded.

    Scale shape (the ``global_rank`` two-pass generalized to grouped
    ranks): distributed sort on (group, cents DESC, key), MATERIALIZE
    the narrow projection, pass 1 pulls one summary row per (block x
    group-run) — block-count-bounded, since group runs are contiguous
    in sorted blocks — the driver cumsums per group, pass 2 broadcasts
    the per-run offset map and group totals; each block assigns
    rank = run_offset + local position. percent_rank = (rank-1)/(n-1)
    computed from exact ints (pinned double division, matches SQL)."""

    def project(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "grp": batch["o_orderpriority"],
                "o_orderkey": batch["o_orderkey"],
                "cents": cents,
            }
        )

    ordered = (
        orders.select_columns(["o_orderpriority", "o_orderkey", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["grp", "cents", "o_orderkey"], descending=[False, True, False])
        .materialize()
    )

    def run_summaries(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "grp": pa.array([], type=pa.string()),
                    "first_cents": pa.array([], type=pa.int64()),
                    "first_key": pa.array([], type=pa.int64()),
                    "rows": pa.array([], type=pa.int64()),
                }
            )
        g = batch["grp"].to_numpy(zero_copy_only=False)
        first = np.r_[True, g[1:] != g[:-1]]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(g)]
        c = batch["cents"].to_numpy(zero_copy_only=False)
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "grp": pa.array(g[starts].tolist(), type=pa.string()),
                "first_cents": pa.array(c[starts].astype(np.int64)),
                "first_key": pa.array(k[starts].astype(np.int64)),
                "rows": pa.array((ends - starts).astype(np.int64)),
            }
        )

    sm = ordered.map_batches(
        run_summaries, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    # run order within a group = sort order: cents DESC, key ASC
    sm = sm.sort_values(
        ["grp", "first_cents", "first_key"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    per_grp = sm.groupby("grp", sort=False)["rows"]
    offs_vals = (per_grp.cumsum() - sm["rows"]).to_numpy().astype(np.int64)
    totals = sm.groupby("grp")["rows"].sum().astype(np.int64).to_dict()
    offs = dict(
        zip(
            zip(
                sm["grp"].tolist(),
                sm["first_cents"].to_numpy().astype(np.int64).tolist(),
                sm["first_key"].to_numpy().astype(np.int64).tolist(),
            ),
            offs_vals.tolist(),
        )
    )
    offs_ref = ray.put((offs, totals))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], type=pa.string()),
                    "o_orderkey": pa.array([], type=pa.int64()),
                    "price_cents": pa.array([], type=pa.int64()),
                    "rnk": pa.array([], type=pa.int64()),
                    "pct_rank": pa.array([], type=pa.float64()),
                }
            )
        omap, tmap = ray.get(offs_ref)
        g = batch["grp"].to_numpy(zero_copy_only=False)
        c = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        first = np.r_[True, g[1:] != g[:-1]]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(g)]
        rnk = np.empty(len(g), dtype=np.int64)
        denom = np.empty(len(g), dtype=np.int64)
        for s, e in zip(starts, ends):  # <= #groups runs per block
            base = omap[(str(g[s]), int(c[s]), int(k[s]))]
            rnk[s:e] = base + np.arange(e - s, dtype=np.int64) + 1
            denom[s:e] = tmap[str(g[s])]
        pct = np.where(denom > 1, (rnk - 1) / np.maximum(denom - 1, 1), 0.0)
        return pa.table(
            {
                "o_orderpriority": batch["grp"],
                "o_orderkey": pa.array(k),
                "price_cents": pa.array(c),
                "rnk": pa.array(rnk),
                "pct_rank": pa.array(pct.astype(np.float64)),
            }
        )

    return ordered.map_batches(
        assign, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def regional_supplier_revenue(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
    region: ray.data.Dataset,
    *,
    region_name: str = "ASIA",
    year: int = 1998,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q5-shaped six-table join: revenue per nation from line
    items where the CUSTOMER's nation equals the SUPPLIER's nation,
    both inside one region, for orders of one year.

    Scale shape, per join class:
      * region->nation (25 rows) and supplier->nationkey are DIMENSION
        broadcasts (ray.put once; suppliers are fact/10,000 in TPC-H —
        a key->int16 map even at 100 TB);
      * customer is projected to (custkey, nationkey) and filtered to
        the region MAP-SIDE before anything moves;
      * the two FACT hops (orders⋈customer-proj on custkey, then
        lineitem⋈that on orderkey) are ``bucket_hash_join``s — the
        year+region filters make the key sets sparse, exactly the
        shape that crashes ray.data's native join on empty partitions;
      * the nation-equality predicate and cent flooring are map-side;
        the final exchange is a #nations-row groupby of per-block
        partial sums."""
    import pandas as _pd

    nat = nation.select_columns(["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg[reg["r_name"] == region_name]["r_regionkey"].iloc[0])
    region_nations = nat[nat["n_regionkey"] == rkey]
    nset = np.sort(region_nations["n_nationkey"].to_numpy().astype(np.int64))
    nname = _pd.Series(
        region_nations["n_name"].to_numpy(),
        index=region_nations["n_nationkey"].astype(np.int64),
    )
    sup = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    smap = _pd.Series(
        sup["s_nationkey"].astype(np.int64).to_numpy(),
        index=sup["s_suppkey"].astype(np.int64),
    )
    bc = ray.put((nset, nname, smap))

    def cust_in_region(batch: pa.Table) -> pa.Table:
        ns, _, _ = ray.get(bc)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, ns)
        return pa.table(
            {
                "c_custkey": pc.cast(batch["c_custkey"], pa.int64()).filter(pa.array(keep)),
                "c_nationkey": pa.array(nk[keep]),
            }
        )

    lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"), type=pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"), type=pa.timestamp("us"))

    def orders_in_year(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo),
            pc.less(batch["o_orderdate"], hi),
        )
        t = batch.filter(m)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        )

    cust = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        cust_in_region, batch_format="pyarrow", zero_copy_batch=True
    )
    ordy = orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_in_year, batch_format="pyarrow", zero_copy_batch=True
    )
    # Bloom semi-join prune: fold the year-filtered orderkeys into a
    # broadcast bit array (driver holds BITS, never keys) and drop
    # non-matching line items MAP-SIDE before the join exchange — the
    # year filter is ~1/7 selective, so ~6/7 of the fact rows never
    # shuffle. False positives only pass extra rows into the exact join.
    from ..functions.bloom import bloom_of_dataset

    obloom = bloom_of_dataset(ordy.select_columns(["o_orderkey"]), "o_orderkey")
    obloom_ref = ray.put(obloom)
    ord_cust = bucket_hash_join(
        ordy,
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
        num_buckets=num_buckets,
    )

    def li_proj(batch: pa.Table) -> pa.Table:
        bf = ray.get(obloom_ref)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        batch = batch.filter(pa.array(bf.contains_many(keys)))
        cents = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            batch["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
                        ),
                        100.0,
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(batch["l_suppkey"], pa.int64()),
                "cents": cents,
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
    joined = bucket_hash_join(
        li,
        ord_cust,
        left_on="l_orderkey",
        right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()), ("cents", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("c_nationkey", pa.int64())]
        ),
        num_buckets=num_buckets,
    )

    def nation_match(batch: pa.Table) -> pa.Table:
        _, names, sm = ray.get(bc)
        sk = _pd.Series(batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        s_nat = sk.map(sm).to_numpy()
        c_nat = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s_nat == c_nat
        cents = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        nk = c_nat[keep]
        t = pa.table(
            {
                "n_name": pa.array(
                    _pd.Series(nk).map(names).to_numpy(), type=pa.string()
                ),
                "revenue_cents": pa.array(cents),
            }
        )
        agg = t.group_by(["n_name"]).aggregate([("revenue_cents", "sum")])
        return pa.table(
            {"n_name": agg["n_name"], "revenue_cents": agg["revenue_cents_sum"]}
        )

    return (
        joined.map_batches(nation_match, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .sort(["revenue_cents", "n_name"], descending=[True, False])
    )


def brand_revenue(
    lineitem: ray.data.Dataset, part: ray.data.Dataset
) -> ray.data.Dataset:
    """Revenue rollup by part brand: the fact-dim broadcast join + agg
    archetype (part is a dimension; its (partkey -> brand) projection
    broadcasts once via ray.put and the fact table never shuffles raw —
    the exchange moves #brands rows per block).

    Output (p_brand, n_items, revenue_cents), ordered by revenue."""
    pp = part.select_columns(["p_partkey", "p_brand"]).to_pandas()
    bmap = pd.Series(
        pp["p_brand"].to_numpy(), index=pp["p_partkey"].astype(np.int64)
    )
    bref = ray.put(bmap)

    def partial(batch: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        k = pd.Series(
            batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        brand = k.map(bm)
        known = brand.notna().to_numpy()  # INNER-JOIN semantics
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0
            + 0.5
        ).astype(np.int64)[known]
        t = pa.table(
            {
                "p_brand": pa.array(brand.to_numpy()[known], type=pa.string()),
                "n_items": pa.array(np.ones(int(known.sum()), dtype=np.int64)),
                "revenue_cents": pa.array(cents),
            }
        )
        agg = t.group_by(["p_brand"]).aggregate(
            [("n_items", "sum"), ("revenue_cents", "sum")]
        )
        return pa.table(
            {
                "p_brand": agg["p_brand"],
                "n_items": agg["n_items_sum"],
                "revenue_cents": agg["revenue_cents_sum"],
            }
        )

    return (
        lineitem.select_columns(["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_brand")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .sort(["revenue_cents", "p_brand"], descending=[True, False])
    )


def order_line_histogram(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """Aggregate-of-aggregate (TPC-H Q13's shape): line-item count per
    order, then the distribution of those counts — (n_lines, n_orders).

    Scale shape: level 1 pre-aggregates map-side (one Arrow group_by per
    block) and shuffles one row per (order × block); level 2's input is
    one row per ORDER but its partials collapse map-side again to one
    row per (n_lines × block), so the second exchange is histogram-
    sized. Nothing touches the driver."""

    def l1_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        agg = t.group_by(["l_orderkey"]).aggregate([("n", "sum")])
        return pa.table({"l_orderkey": agg["l_orderkey"], "n": agg["n_sum"]})

    per_order = (
        lineitem.select_columns(["l_orderkey"])
        .map_batches(l1_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("n", alias_name="n_lines"))
    )

    def l2_partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["n_lines"].combine_chunks() if isinstance(
            batch["n_lines"], pa.ChunkedArray) else batch["n_lines"])
        return pa.table(
            {
                "n_lines": pc.cast(vc.field("values"), pa.int64()),
                "n_orders": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        per_order.map_batches(l2_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_lines")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("n_lines")
    )


def late_shipment_orders(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """TPC-H Q4-shaped correlated EXISTS: orders per priority that have
    at least one line item shipped AFTER the order date.

    Scale shape — ONE exchange total: EXISTS(ship > date) is
    max(ship) > date, and a global max exceeds the date iff ANY
    per-block partial max does, so the per-orderkey global Max shuffle
    the first version paid is unnecessary.  Line items reduce map-side
    to one (orderkey, block-max) row per order per block; order rows and
    those partials are tagged into ONE orderkey-bucket shuffle; inside
    each bucket a vectorized sort + segment-max pass decides EXISTS per
    order and rolls up per priority, so the final exchange is
    #priorities-sized.  (Measured 11.6 s -> ~4 s at sf0.1 vs the
    groupby-Max + bucket_hash_join formulation.)"""
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def _kb(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * MIX) % np.uint64(num_buckets)).astype(
            np.int32
        )

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": pc.cast(batch["l_orderkey"], pa.int64()),
                "ship_us": pc.cast(
                    pc.cast(batch["l_shipdate"], pa.timestamp("us")), pa.int64()
                ),
            }
        )
        agg = t.group_by(["k"]).aggregate([("ship_us", "max")])
        ids = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        return pa.table(
            {
                "k": ids,
                "ts_us": agg["ship_us_max"],
                "o_orderpriority": pa.nulls(n, type=pa.string()),
                "side": np.ones(n, dtype=np.int8),
                "bucket": _kb(ids),
            }
        )

    def ord_proj(batch: pa.Table) -> pa.Table:
        ids = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        return pa.table(
            {
                "k": ids,
                "ts_us": pc.cast(
                    pc.cast(batch["o_orderdate"], pa.timestamp("us")), pa.int64()
                ),
                "o_orderpriority": batch["o_orderpriority"],
                "side": np.zeros(n, dtype=np.int8),
                "bucket": _kb(ids),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "o_orderpriority": pd.Series([], dtype=object),
                "n_orders": pd.Series([], dtype=np.int64),
            }
        )
        side = df["side"].to_numpy()
        orders_df = df[side == 0]
        li = df[side == 1]
        if len(orders_df) == 0 or len(li) == 0:
            return empty
        mx = li.groupby("k", sort=False)["ts_us"].max()
        ship = orders_df["k"].map(mx).to_numpy()
        late = ship > orders_df["ts_us"].to_numpy()  # NaN -> False (no lines)
        kept = orders_df[late]
        if len(kept) == 0:
            return empty
        agg = kept.groupby("o_orderpriority", sort=False).size()
        return pd.DataFrame(
            {
                "o_orderpriority": agg.index.to_numpy(),
                "n_orders": agg.to_numpy().astype(np.int64),
            }
        )

    tagged = (
        orders.select_columns(["o_orderkey", "o_orderpriority", "o_orderdate"])
        .map_batches(ord_proj, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            lineitem.select_columns(["l_orderkey", "l_shipdate"]).map_batches(
                li_partial, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    )
    return (
        tagged.groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def cumulative_revenue(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Running revenue: per order month, the month's cents and the
    cumulative cents to date (SUM() OVER (ORDER BY month)). The fact
    scan reduces map-side to per-(month × block) partials; the running
    sum is computed on the AGGREGATED series (#months rows — calendar-
    bounded regardless of corpus size), the one place a driver-side
    cumsum is scale-correct."""

    def partial(batch: pa.Table) -> pa.Table:
        month = pc.strftime(batch["o_orderdate"], format="%Y-%m")
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        )
        t = pa.table({"month": month, "cents": cents})
        agg = t.group_by(["month"]).aggregate([("cents", "sum")])
        return pa.table({"month": agg["month"], "cents": agg["cents_sum"]})

    series = (
        orders.select_columns(["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month")
        .aggregate(Sum("cents", alias_name="month_cents"))
        .sort("month")
        .to_pandas()  # calendar-bounded: one row per month
    )
    series["cum_cents"] = series["month_cents"].cumsum().astype(np.int64)
    return series


def user_activity_full(
    events: ray.data.Dataset,
    *,
    type_a: str = "click",
    type_b: str = "purchase",
) -> ray.data.Dataset:
    """FULL OUTER JOIN of two derived per-user aggregates — count of
    ``type_a`` events per user vs count of ``type_b`` events per user,
    one row per user who did EITHER, with a typed NULL on the side the
    user never touched (exactly SQL's ``a FULL OUTER JOIN b ON
    a.user_id = b.user_id`` output, COALESCEd key).

    The outer-join twin of ``user_type_sets``: that operator returns set
    MEMBERSHIP (both / a_only); this one returns the joined VALUE rows
    with null preservation, which is the shape a curation pipeline needs
    when merging two optional per-document annotation tables.

    Scale shape: no join at all — both sides come off the same fact scan.
    One pass tags each event with (n_a, n_b, has_a, has_b) and a
    per-batch Arrow group_by collapses to one row per user×batch, so the
    single groupby(user_id) exchange carries one narrow row per
    user×batch. NULLs are re-introduced map-side post-aggregate from the
    has_* flags (a SUM of 0s cannot distinguish "no rows" from "sum 0",
    the flags can). Nothing reaches the driver."""

    def flags(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        a = pc.cast(pc.equal(et, pa.scalar(type_a)), pa.int64())
        b = pc.cast(pc.equal(et, pa.scalar(type_b)), pa.int64())
        t = pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "n_a": a,
                "n_b": b,
            }
        )
        g = t.group_by(["user_id"]).aggregate([("n_a", "sum"), ("n_b", "sum")])
        t2 = pa.table(
            {
                "user_id": g["user_id"],
                "n_a": g["n_a_sum"],
                "n_b": g["n_b_sum"],
            }
        )
        either = pc.or_(
            pc.greater(t2["n_a"], pa.scalar(0, type=pa.int64())),
            pc.greater(t2["n_b"], pa.scalar(0, type=pa.int64())),
        )
        return t2.filter(either)

    def finish(batch: pa.Table) -> pa.Table:
        na = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                f"n_{type_a}": pa.array(na, type=pa.int64(), mask=na == 0),
                f"n_{type_b}": pa.array(nb, type=pa.int64(), mask=nb == 0),
            }
        )

    return (
        events.select_columns(["user_id", "event_type"])
        .map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort("user_id")
    )


def party_nations(
    customer: ray.data.Dataset, supplier: ray.data.Dataset
) -> ray.data.Dataset:
    """Cross-table UNION ALL + aggregate — parties (customers +
    suppliers) per nation, the one set-op over TWO tables the contract
    lacked (user_type_sets covers INTERSECT/EXCEPT over derived sets of
    one table). SQL: SELECT nationkey, COUNT(*) FROM (c_nationkey
    UNION ALL s_nationkey) GROUP BY nationkey.

    Scale shape: each side projects to its key and pre-counts per batch
    (one Arrow group_by), the union concatenates lazily block-wise (no
    exchange), and ONE nation-sized groupby folds the partials."""

    def proj(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "nationkey": pc.cast(batch[col], pa.int64()),
                    "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                }
            )
            g = t.group_by(["nationkey"]).aggregate([("n", "sum")])
            return pa.table({"nationkey": g["nationkey"], "n": g["n_sum"]})

        return fn

    u = customer.select_columns(["c_nationkey"]).map_batches(
        proj("c_nationkey"), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        supplier.select_columns(["s_nationkey"]).map_batches(
            proj("s_nationkey"), batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return (
        u.groupby("nationkey")
        .aggregate(Sum("n", alias_name="n_parties"))
        .sort("nationkey")
    )


def suggest_salt(
    ds: ray.data.Dataset,
    key: str,
    *,
    num_buckets: int = 64,
    target_share: float = 1.5,
    max_salt: int = 64,
) -> dict:
    """Measure, don't guess: decide whether a ``bucket_hash_join`` probe
    side needs hot-key salting, from ONE cheap aggregate pass.

    Per batch, an Arrow group_by collapses to (key, n) partials; ONE
    groupby(key) exchange of those narrow partials yields exact per-key
    counts, of which only the TOP key and the total (two scalars plus an
    O(blocks) partial stream) matter — nothing vocabulary-sized reaches
    the driver beyond the aggregate's own blocks.  The hottest bucket of
    an unsalted join holds hot_n + (total - hot_n)/num_buckets rows in
    expectation; salting divides the hot term by the salt.  The
    suggested salt is the smallest power of two that brings the hottest
    bucket under ``target_share`` x the mean bucket load (1 when the key
    is already uniform enough).

    Returns {"hot_key", "hot_n", "total", "hot_share", "salt"}.  Run it
    once per (table, key) on a sample or the full data and cache the
    decision — at 100 TB the pass is a key-sized aggregate, the same
    cost class as the join's own exchange, so probe a sample (e.g.
    ``ds.limit(10_000_000)``) when the table is the full fact."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch[key],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["k"]).aggregate([("n", "sum")])
        return pa.table({"k": g["k"], "n": g["n_sum"]})

    counts = (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
    )
    top = counts.sort("n", descending=True).limit(1).to_pandas()
    total = int(
        counts.sum("n") or 0
    )
    if len(top) == 0 or total == 0:
        return {"hot_key": None, "hot_n": 0, "total": 0, "hot_share": 0.0, "salt": 1}
    hot_n = int(top["n"].iloc[0])
    hot_key = top["k"].iloc[0]
    mean_bucket = total / num_buckets
    salt = 1
    while (
        hot_n / salt + (total - hot_n) / num_buckets > target_share * mean_bucket
        and salt < max_salt
    ):
        salt *= 2
    return {
        "hot_key": hot_key,
        "hot_n": hot_n,
        "total": total,
        "hot_share": round(hot_n / total, 4),
        "salt": salt,
    }
