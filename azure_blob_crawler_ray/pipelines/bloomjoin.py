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

1. **Build** (``build_bloom``): one streaming pass over the build keys;
   each batch emits its DISTINCT set-bit positions as int64 rows, and a
   ``groupby(bit)`` dedups them cluster-wide — the exchange is
   O(distinct set bits) <= m narrow rows, never O(build rows).  The
   driver materialises only the m-bit bitset (m/8 bytes) and broadcasts
   it once via ``ray.put``.
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

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over int64 keys — vectorized, deterministic
    everywhere (pure uint64 arithmetic, no Python hash)."""
    # seed offset computed in Python ints: wraparound without numpy's
    # scalar-overflow warning (the wrap itself is intended splitmix64)
    z = x.astype(np.uint64) + np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bloom_params_for(n_keys: int, fp_rate: float = 0.01) -> Tuple[int, int]:
    """Analytic Bloom sizing: (m_bits, k) for ``n_keys`` build keys at
    ``fp_rate`` — m = -n ln p / (ln 2)^2, k = (m/n) ln 2.  At scale the
    caller sizes from an estimate (block-count x rows-per-block, or a
    prior count); overshooting m only wastes bitset bytes, and the exact
    verify stage makes correctness independent of the estimate."""
    n = max(1, int(n_keys))
    m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2.0) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # whole uint64 words
    k = max(1, int(round(m / n * np.log(2.0))))
    return m, min(k, 16)


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for each key — k independent mixes mod m."""
    return np.stack(
        [(_mix64(keys, s + 1) % np.uint64(m_bits)) for s in range(k)], axis=1
    )


_OR_BUCKETS = 256  # coarse word-hash groups for the build exchange


def _or_pack(w: np.ndarray, v: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Segmented bitwise-OR: given word indices ``w`` (any order) and
    word values ``v``, return (distinct_w, OR of v per w) — sort + one
    ``np.bitwise_or.reduceat`` (bit patterns are preserved through the
    int64 view, so signed storage is safe)."""
    order = np.argsort(w, kind="stable")
    w, v = w[order], v[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(w)) + 1])
    return w[starts], np.bitwise_or.reduceat(v, starts)


def build_bloom(
    build: ray.data.Dataset, key_col: str, *, m_bits: int, k: int
) -> np.ndarray:
    """One streaming pass over the build keys -> packed uint64 bitset
    (m_bits/64 words).

    Exchange shape: each batch OR-packs its own bit positions into
    (word_idx, word) int64 pairs — at most m/64 rows per batch, 64x
    narrower than raw bit rows — and ONE coarse groupby over
    ``word_idx % 256`` merges them with a vectorized segmented OR per
    bucket.  ~256 uniform groups keep the sort-shuffle trivial (a
    groupby keyed on the raw bit produced millions of one-row groups
    and cost ~9 s where this costs ~1 s at the same scale), and the
    driver pull is bounded by m/64 word rows regardless of build size."""
    empty = pa.table(
        {
            "word": pa.array([], type=pa.int64()),
            "val": pa.array([], type=pa.int64()),
        }
    )

    def words_of(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        keys = (
            pc.cast(batch[key_col], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pos = np.unique(_positions(keys, m_bits, k))  # sorted distinct bits
        w = (pos >> np.uint64(6)).view(np.int64)
        v = (np.uint64(1) << (pos & np.uint64(63))).view(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(w)) + 1])
        return pa.table(
            {
                "word": pa.array(w[starts]),
                "val": pa.array(np.bitwise_or.reduceat(v, starts)),
            }
        )

    def or_bucket(group: pa.Table) -> pa.Table:
        w = group["word"].to_numpy(zero_copy_only=False)
        v = group["val"].to_numpy(zero_copy_only=False)
        ww, vv = _or_pack(w, v)
        return pa.table({"word": pa.array(ww), "val": pa.array(vv)})

    agg = (
        build.select_columns([key_col])
        .map_batches(words_of, batch_format="pyarrow", zero_copy_batch=True)
        .add_column("__bucket", lambda df: df["word"] % _OR_BUCKETS)
        .groupby("__bucket")
        .map_groups(or_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(agg):
        w = agg["word"].to_numpy().astype(np.int64)
        v = agg["val"].to_numpy().view(np.uint64)
        words[w] = v
    return words


def _member(keys: np.ndarray, words: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Boolean mask: all k probe bits set (superset of true members)."""
    pos = _positions(keys, m_bits, k)
    hit = (
        words[(pos >> np.uint64(6)).astype(np.int64)]
        >> (pos & np.uint64(63))
    ) & np.uint64(1)
    return hit.all(axis=1)


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
    words = build_bloom(build, "o_orderkey", m_bits=m_bits, k=k)
    bloom_ref = ray.put(words)

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
        w = ray.get(bloom_ref)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _member(keys, w, m_bits, k)
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
    return (
        tagged.groupby("__bucket")
        .map_groups(verify, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            _Sum("n_rows", alias_name="n_rows"),
            _Sum("sum_qty", alias_name="sum_qty"),
            _Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .sort("l_returnflag")
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
    words = build_bloom(
        build.select_columns([build_on]), build_on, m_bits=m_bits, k=k
    )
    ref = ray.put(words)

    def filt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        w = ray.get(ref)
        keys = (
            pc.cast(batch[probe_on], pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return batch.filter(pa.array(_member(keys, w, m_bits, k)))

    return probe.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
