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
    index: ray.data.Dataset, new_docs: ray.data.Dataset, *, id_col: str = "id"
) -> ray.data.Dataset:
    """Delete-then-upload upsert (ref search_client.py:167-197): existing
    rows with a reappearing id are replaced by the new rows. The new side
    is assumed broadcast-small (one driver pull of its id column); for an
    unbounded new side, hash-partition both on id and keep-newest per
    group instead."""
    new_ids = new_docs.select_columns([id_col]).to_pandas()[id_col].tolist()
    survivors = index_delete(index, new_ids, id_col=id_col)
    return survivors.union(new_docs)
