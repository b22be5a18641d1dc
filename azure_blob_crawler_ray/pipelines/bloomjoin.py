"""Bloom-filter semi-join — the cut-BEFORE-shuffle join primitive.

The broadcast joins in ``relational.py`` / ``tpch3.py`` ship the build
side's EXACT key set (or a dense 1-bit-per-id bitmap when keys are
dense, see ``promo_revenue_monthly``).  Both stop working when the
build side's distinct-key set itself is too big to hold exactly but the
probe side is far bigger still — the classic 100 TB fact-table shape.
The Bloom filter is the standard answer (Bloom 1970; used as a join
prefilter by every warehouse engine): ~10 bits per build key at ~1 %
false positives, independent of key width or density, so 10^9 build
keys broadcast as a ~1.2 GB bitset where an int64 key array (8 GB) or
a dense id bitmap (unbounded for sparse keys) cannot.

Pipeline shape (three narrow exchanges, all documented here):

1. **Build** (``functions.bloom.bloom_of_dataset_sparse``): one
   streaming pass over the build keys; each batch OR-packs its distinct
   set-bit positions into (word_idx, 64-bit word) pairs merged by one
   ~256-group coarse groupby — the exchange is O(set words) <= m/64
   narrow rows, never O(build rows).  The driver materialises only the
   m-bit ``BloomFilter`` (m/8 bytes) and broadcasts it once via
   ``ray.put``.
2. **Probe prefilter + partial aggregate**: map-side, zero shuffle.
   Rows whose k probes are not all set are dropped (a true non-member
   never survives: Bloom has no false negatives, so the prefilter is
   SOUND); survivors are pre-aggregated per (key, group) inside the
   batch so the verify exchange carries partials, not raw fact rows.
3. **Exact verify**: the surviving partials and the exact build keys
   are exchanged ONCE on a coarse key-hash bucket (the
   ``bucket_hash_join`` shape, relational.py:3137) and membership is
   checked exactly per bucket — Bloom false positives (~fp_rate of
   surviving keys) are removed here, so the operator is EXACT end to
   end; the filter only shrinks what the exchange carries.

The reference has no join surface at all (its lookups are point reads
against Azure Search, ref shared/azure_clients/search_client.py); this
is part of the relational family the engine adds (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum as _Sum

from ..functions.bloom import bloom_of_dataset_sparse

_MIX = np.uint64(0x9E3779B97F4A7C15)  # verify-stage bucket mixing


def bloom_params_for(n_keys: int, fp_rate: float = 0.01) -> Tuple[int, int]:
    """Analytic Bloom sizing: (m_bits, k) for ``n_keys`` build keys at
    ``fp_rate`` — m = -n ln p / (ln 2)^2, k = (m/n) ln 2.  At scale the
    caller sizes from an estimate (block-count x rows-per-block, or a
    prior count); overshooting m only wastes bitset bytes, and the exact
    verify stage makes correctness independent of the estimate.  m is
    rounded up to whole 64-bit words (the sparse build requires it)."""
    n = max(1, int(n_keys))
    m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2.0) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # whole uint64 words
    k = max(1, int(round(m / n * np.log(2.0))))
    return m, min(k, 16)


def bloom_semi_revenue(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    *,
    priority: str = "1-URGENT",
    m_bits: int = 1 << 20,
    k: int = 7,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-returnflag revenue of lineitems whose order has the given
    priority — an EXACT fact-side semi-join executed as Bloom prefilter
    -> map-side partial aggregate -> one bucketed exact-verify exchange.

    Output: (l_returnflag, n_rows, sum_qty, revenue_cents), all int64
    (floor(price*(1-disc)*100+0.5) per row, the repo's exact-cents
    convention), so the DuckDB twin hashes identically.

    Scale: the probe side never shuffles raw rows — survivors collapse
    to per-(orderkey, flag) integer partials inside each batch, and the
    verify exchange carries those partials plus the build keys, hashed
    into ``num_buckets`` coarse groups (raise with data volume; each
    bucket must fit a worker).  The only driver-side state is the
    m-bit bitset."""
    build = orders.filter(
        expr=f"o_orderpriority == '{priority}'"
    ).select_columns(["o_orderkey"])
    bf = bloom_of_dataset_sparse(build, "o_orderkey", num_bits=m_bits, num_hashes=k)
    bloom_ref = ray.put(bf)

    part_schema = pa.schema(
        [
            ("__bucket", pa.int32()),
            ("__side", pa.int8()),
            ("__key", pa.int64()),
            ("l_returnflag", pa.string()),
            ("n_rows", pa.int64()),
            ("sum_qty", pa.int64()),
            ("revenue_cents", pa.int64()),
        ]
    )
    empty = part_schema.empty_table()

    def probe_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        bf_ = ray.get(bloom_ref)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = bf_.contains_many(keys)
        if not keep.any():
            return empty
        batch = batch.filter(pa.array(keep))
        keys = keys[keep]
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0
            + 0.5
        ).astype(np.int64)
        qty = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "__key": pa.array(keys),
                "l_returnflag": batch["l_returnflag"],
                "n_rows": pa.array(np.ones(len(keys), dtype=np.int64)),
                "sum_qty": pa.array(qty),
                "revenue_cents": pa.array(cents),
            }
        )
        g = t.group_by(["__key", "l_returnflag"]).aggregate(
            [("n_rows", "sum"), ("sum_qty", "sum"), ("revenue_cents", "sum")]
        )
        kk = g["__key"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = ((kk.astype(np.uint64) * _MIX) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "__bucket": pa.array(bucket),
                "__side": pa.array(np.zeros(len(kk), dtype=np.int8)),
                "__key": pa.array(kk),
                "l_returnflag": g["l_returnflag"],
                "n_rows": g["n_rows_sum"],
                "sum_qty": g["sum_qty_sum"],
                "revenue_cents": g["revenue_cents_sum"],
            },
            schema=part_schema,
        )

    def build_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        kk = (
            pc.cast(batch["o_orderkey"], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        bucket = ((kk.astype(np.uint64) * _MIX) % np.uint64(num_buckets)).astype(
            np.int32
        )
        n = len(kk)
        return pa.table(
            {
                "__bucket": pa.array(bucket),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__key": pa.array(kk),
                "l_returnflag": pa.nulls(n, type=pa.string()),
                "n_rows": pa.array(np.zeros(n, dtype=np.int64)),
                "sum_qty": pa.array(np.zeros(n, dtype=np.int64)),
                "revenue_cents": pa.array(np.zeros(n, dtype=np.int64)),
            },
            schema=part_schema,
        )

    def verify(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        kk = group["__key"].to_numpy(zero_copy_only=False)
        true_keys = kk[side == 1]
        probe = group.filter(pa.array(side == 0))
        ok = np.isin(
            probe["__key"].to_numpy(zero_copy_only=False), true_keys
        )
        return probe.filter(pa.array(ok)).select(
            ["l_returnflag", "n_rows", "sum_qty", "revenue_cents"]
        )

    probe = lineitem.select_columns(
        ["l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(probe_partial, batch_format="pyarrow", zero_copy_batch=True)
    tagged = probe.union(
        build.map_batches(build_rows, batch_format="pyarrow", zero_copy_batch=True)
    )
    # the final aggregate is <= #returnflags rows by construction —
    # finish driver-side with an explicit schema so an EMPTY result (no
    # build keys / no survivors) still carries the declared columns (an
    # empty Ray groupby loses its schema; see tpch3.nation_trade_volume)
    agg = (
        tagged.groupby("__bucket")
        .map_groups(verify, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            _Sum("n_rows", alias_name="n_rows"),
            _Sum("sum_qty", alias_name="sum_qty"),
            _Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
    )
    if len(agg):
        agg = agg.sort_values("l_returnflag", kind="mergesort")
    return ray.data.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(
                    list(agg.get("l_returnflag", [])), type=pa.string()
                ),
                "n_rows": pa.array(
                    np.asarray(agg.get("n_rows", []), dtype=np.int64)
                ),
                "sum_qty": pa.array(
                    np.asarray(agg.get("sum_qty", []), dtype=np.int64)
                ),
                "revenue_cents": pa.array(
                    np.asarray(agg.get("revenue_cents", []), dtype=np.int64)
                ),
            }
        )
    )


def bloom_prefilter(
    probe: ray.data.Dataset,
    build: ray.data.Dataset,
    *,
    probe_on: str,
    build_on: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> ray.data.Dataset:
    """Generic SOUND prefilter: probe rows whose key might be in the
    build keys (superset; ~fp_rate extra).  Compose with
    ``relational.bucket_hash_join`` (or a groupby verify as above) when
    exact semantics are required; use alone where a small false-positive
    rate is acceptable (e.g. candidate generation)."""
    bf = bloom_of_dataset_sparse(
        build.select_columns([build_on]), build_on, num_bits=m_bits, num_hashes=k
    )
    ref = ray.put(bf)

    def filt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        bf_ = ray.get(ref)
        keys = (
            pc.cast(batch[probe_on], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return batch.filter(pa.array(bf_.contains_many(keys)))

    return probe.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
