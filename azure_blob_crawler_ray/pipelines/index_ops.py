"""Index maintenance operators — the reference's document delete/update
surface (SURVEY.md §2.1 S9/S10) as Dataset transforms.

The reference deletes by id (ref shared/azure_clients/
search_client.py:123-165) and "updates" non-atomically as
delete-then-upload (ref :167-197). Here both are pure
``Dataset -> Dataset`` set operations keyed on the deterministic id:

- delete: broadcast the (small) id set, map-side anti-filter — no
  shuffle. For an unbounded delete set, the groupby variant below
  co-partitions instead.
- upsert: existing rows whose id reappears in the new batch are
  replaced (delete-then-upload ≡ anti-filter + union).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..hashing import hash64


def _id_filter(ids_ref, id_col: str, keep_members: bool):
    def fn(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        h = hash64([str(x) for x in batch[id_col].to_pylist()])
        mask = np.isin(h, wanted)
        if not keep_members:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return fn


def index_delete(
    index: ray.data.Dataset, ids: Iterable, *, id_col: str = "id"
) -> ray.data.Dataset:
    """Drop rows whose id is in ``ids`` (broadcast anti-join; the id set
    is hashed once and shipped via the object store, read per task)."""
    wanted = np.sort(hash64([str(x) for x in ids]))
    ref = ray.put(wanted)
    return index.map_batches(
        _id_filter(ref, id_col, keep_members=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def index_upsert(
    index: ray.data.Dataset,
    new_docs: ray.data.Dataset,
    *,
    id_col: str = "id",
    copartition: bool = False,
) -> ray.data.Dataset:
    """Delete-then-upload upsert (ref search_client.py:167-197): existing
    rows with a reappearing id are replaced by the new rows.

    ``copartition=False`` (default): the new side is broadcast-small —
    one driver pull of its id column, map-side anti-filter, union.
    ``copartition=True``: UNBOUNDED new side — no driver pull; see
    :func:`index_upsert_copartitioned`."""
    if copartition:
        return index_upsert_copartitioned(index, new_docs, id_col=id_col)
    new_ids = new_docs.select_columns([id_col]).to_pandas()[id_col].tolist()
    survivors = index_delete(index, new_ids, id_col=id_col)
    return survivors.union(new_docs)


def index_upsert_copartitioned(
    index: ray.data.Dataset,
    new_docs: ray.data.Dataset,
    *,
    id_col: str = "id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Upsert with an UNBOUNDED new side: tag each side, union, shuffle
    ONCE on a coarse hash bucket of the id (64 groups — constant task
    count regardless of id cardinality), and keep the new-side row per id
    with a vectorized first-of-run filter. Nothing reaches the driver.

    Requires both sides to share a schema and the new side to have unique
    ids (the reference's upsert has the same contract — one document per
    key, ref search_client.py:167-197). Ids are compared via hash64 of
    their string form, the same keying as :func:`index_delete`."""
    import pyarrow.compute as pc

    def tag(src: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = hash64([str(x) for x in batch[id_col].to_pylist()])
            n = len(h)
            return (
                batch.append_column("__h", pa.array(h))
                .append_column("__src", pa.array(np.full(n, src, dtype=np.int8)))
                .append_column(
                    "__bucket",
                    pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                )
            )

        return fn

    both = index.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        new_docs.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def keep_newest(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("__h", "ascending"), ("__src", "descending")]
        )
        t = t.take(idx)
        h = t["__h"].to_numpy(zero_copy_only=False)
        first = np.r_[True, h[1:] != h[:-1]]
        return t.filter(pa.array(first)).drop_columns(["__h", "__src", "__bucket"])

    return both.groupby("__bucket").map_groups(keep_newest, batch_format="pyarrow")
