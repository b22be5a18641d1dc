"""Storage seam: atomic partitioned writes, completeness markers,
empty-table round trips — the resumable-output contract."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.schemas import DEAD_LETTER
from azure_blob_crawler_ray.storage import (
    is_complete,
    read_table,
    read_table_arrow,
    write_arrow,
    write_table,
)


def test_write_read_roundtrip(tmp_path):
    uri = str(tmp_path / "t")
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    write_table(ray.data.from_arrow(t), uri)
    assert is_complete(uri)
    got = read_table_arrow(uri)
    assert got.sort_by("a").equals(t)
    assert read_table(uri).count() == 3


def test_overwrite_replaces(tmp_path):
    uri = str(tmp_path / "t")
    write_table(ray.data.from_arrow(pa.table({"a": [1, 2]})), uri)
    write_table(ray.data.from_arrow(pa.table({"a": [9]})), uri)
    assert read_table_arrow(uri)["a"].to_pylist() == [9]


def test_empty_dataset_commits_with_schema(tmp_path):
    uri = str(tmp_path / "empty")
    empty = ray.data.from_arrow(
        pa.table({f.name: [] for f in DEAD_LETTER}, schema=DEAD_LETTER)
    ).filter(expr="status == -1")
    write_table(empty, uri)
    assert is_complete(uri)
    got = read_table_arrow(uri, schema=DEAD_LETTER)
    assert got.num_rows == 0
    assert got.schema.equals(DEAD_LETTER)


def test_incomplete_dir_not_marked(tmp_path):
    uri = str(tmp_path / "part")
    os.makedirs(uri)
    assert not is_complete(uri)


def test_write_arrow_atomic(tmp_path):
    uri = str(tmp_path / "small")
    t = pa.table({"x": [1]})
    write_arrow(t, uri)
    assert is_complete(uri)
    assert read_table_arrow(uri).equals(t)
    write_arrow(pa.table({"x": [2]}), uri)
    assert read_table_arrow(uri)["x"].to_pylist() == [2]


def test_write_sharded_resume_skips_completed(tmp_path):
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.storage import (
        is_complete,
        read_sharded,
        shard_path,
        write_sharded,
    )

    out = str(tmp_path / "sharded")
    n, k = 200, 8
    ids = np.arange(n, dtype=np.int64)
    t1 = pa.table({"doc_id": ids, "shard": ids % k, "v": np.full(n, 1, dtype=np.int64)})
    res1 = write_sharded(ray.data.from_arrow(t1), out, shard_col="shard", num_shards=k)
    assert res1 == {"written": list(range(k)), "skipped": []}
    assert all(is_complete(shard_path(out, s)) for s in range(k))

    # simulate a crash that lost shard 3 mid-write: drop its marker
    os.remove(os.path.join(shard_path(out, 3), "_SUCCESS"))

    # resume with DIFFERENT payload: only shard 3 may be rewritten
    t2 = pa.table({"doc_id": ids, "shard": ids % k, "v": np.full(n, 2, dtype=np.int64)})
    res2 = write_sharded(ray.data.from_arrow(t2), out, shard_col="shard", num_shards=k)
    assert res2 == {"written": [3], "skipped": [s for s in range(k) if s != 3]}

    back = read_sharded(out).to_pandas().sort_values("doc_id")
    assert len(back) == n
    # shard 3 rows carry the new payload, every other shard the old one
    assert (back.loc[back["shard"] == 3, "v"] == 2).all()
    assert (back.loc[back["shard"] != 3, "v"] == 1).all()

    # fully-complete layout: a third run touches nothing
    res3 = write_sharded(ray.data.from_arrow(t1), out, shard_col="shard", num_shards=k)
    assert res3 == {"written": [], "skipped": list(range(k))}
    shutil.rmtree(out)


def test_compact_shards_roundtrip_and_crash_repair(tmp_path):
    import shutil

    import numpy as np

    from azure_blob_crawler_ray.storage import (
        compact_shards,
        read_sharded,
        shard_path,
        write_sharded,
    )

    import pyarrow.parquet as pq

    out = str(tmp_path / "tbl")
    n, k = 4000, 4
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"doc_id": ids, "shard": ids % k, "v": ids * 3})
    # many small input blocks -> many part files per shard
    ds = ray.data.from_arrow(t).repartition(16)
    write_sharded(ds, out, shard_col="shard", num_shards=k)
    before = read_sharded(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    files0 = sum(
        len([f for f in os.listdir(shard_path(out, s)) if f.endswith(".parquet")])
        for s in range(k)
    )
    assert files0 > k  # the small-files problem exists

    # crash state: a prior compaction attempt died mid-write — the
    # originals are intact and a part-c leftover with bogus content
    # sits beside them; the run must drop the leftover, not trust it
    victim = shard_path(out, 1)
    pa_bad = pa.table(
        {"doc_id": pa.array([999999], type=pa.int64()),
         "shard": pa.array([1], type=pa.int64()),
         "v": pa.array([0], type=pa.int64())}
    )
    pq.write_table(pa_bad, os.path.join(victim, "part-c-99999.parquet"))

    res = compact_shards(out, target_rows=600)
    assert res["compacted"] == k and res["files_before"] == files0
    after = read_sharded(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert after.equals(before)
    assert res["files_after"] == sum(
        -(-int((before["shard"] == s).sum()) // 600) for s in range(k)
    )

    # the bogus leftover was dropped, not trusted
    assert 999999 not in set(after["doc_id"])

    # idempotent: second run skips everything
    res2 = compact_shards(out, target_rows=600)
    assert res2["compacted"] == 0 and res2["skipped"] == k
    assert read_sharded(out).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    ).equals(before)
    shutil.rmtree(out)


def test_compact_shards_mid_delete_crash_keeps_committed_part_c(tmp_path):
    """The OTHER crash window: every part-c file was durable and the
    _COMPACTED marker was written, then the process died while deleting
    the originals.  Recovery must keep part-c (the committed set) and
    finish deleting the partially-removed originals — rewriting from
    the partial originals would silently drop rows."""
    import shutil

    import numpy as np

    from azure_blob_crawler_ray.storage import (
        compact_shards,
        read_sharded,
        shard_path,
        write_sharded,
    )

    out = str(tmp_path / "tbl")
    n, k = 2000, 2
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"doc_id": ids, "shard": ids % k, "v": ids * 7})
    write_sharded(ray.data.from_arrow(t).repartition(8), out,
                  shard_col="shard", num_shards=k)
    before = read_sharded(out).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # Run a real compaction of shard 0 up to the commit point by hand:
    # write the part-c set + marker, then delete only SOME originals
    # (simulating a crash mid-delete).
    import pyarrow.parquet as pq

    victim = shard_path(out, 0)
    olds = sorted(f for f in os.listdir(victim)
                  if f.endswith(".parquet") and not f.startswith("part-c-"))
    full = pq.read_table([os.path.join(victim, f) for f in olds])
    pq.write_table(full, os.path.join(victim, "part-c-00000.parquet"))
    with open(os.path.join(victim, "_COMPACTED"), "w"):
        pass
    # crash mid-delete: half the originals are already gone
    for f in olds[: len(olds) // 2]:
        os.remove(os.path.join(victim, f))

    res = compact_shards(out, target_rows=10_000)
    # shard 0 was committed -> finished (skipped, no rewrite); shard 1 compacted
    assert res["skipped"] == 1 and res["compacted"] == 1

    after = read_sharded(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert after.equals(before)  # zero rows lost
    # shard 0 now contains ONLY the committed part-c file, marker gone
    left = sorted(os.listdir(victim))
    assert left == ["_SUCCESS", "part-c-00000.parquet"]

    # idempotent after recovery
    res2 = compact_shards(out, target_rows=10_000)
    assert res2["compacted"] == 0 and res2["skipped"] == k
    shutil.rmtree(out)
