"""Index delete / upsert semantics (S9/S10)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.pipelines.index_ops import index_delete, index_upsert


def _idx(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([r[0] for r in rows], type=pa.string()),
                "content": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


def test_delete_removes_only_named_ids():
    idx = _idx([("a", "1"), ("b", "2"), ("c", "3")])
    out = index_delete(idx, ["b"]).to_pandas().sort_values("id")
    assert out["id"].tolist() == ["a", "c"]


def test_delete_missing_id_is_noop():
    idx = _idx([("a", "1")])
    assert index_delete(idx, ["zzz"]).count() == 1


def test_upsert_replaces_and_appends():
    idx = _idx([("a", "old"), ("b", "keep")])
    new = _idx([("a", "new"), ("c", "added")])
    out = index_upsert(idx, new).to_pandas().sort_values("id")
    assert out["id"].tolist() == ["a", "b", "c"]
    assert dict(zip(out["id"], out["content"])) == {
        "a": "new",
        "b": "keep",
        "c": "added",
    }


def test_upsert_idempotent():
    idx = _idx([("a", "x")])
    new = _idx([("a", "y")])
    once = index_upsert(idx, new)
    twice = index_upsert(once, new).to_pandas()
    assert len(twice) == 1
    assert twice.iloc[0]["content"] == "y"


def test_copartitioned_upsert_equals_broadcast_on_large_new_side():
    """The no-driver-pull variant must produce exactly the broadcast
    variant's result when the new side is NOT small (VERDICT r1 #7)."""
    idx = _idx([(f"k{i}", f"old{i}") for i in range(500)])
    new = _idx([(f"k{i}", f"new{i}") for i in range(250, 750)])  # half overlap
    a = index_upsert(idx, new).to_pandas().sort_values("id").reset_index(drop=True)
    b = (
        index_upsert(idx, new, copartition=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(b) == 750  # k0..k249 kept, k250..k499 replaced, k500..k749 new
    got = dict(zip(b["id"], b["content"]))
    assert len(got) == 750
    assert got["k0"] == "old0" and got["k300"] == "new300" and got["k700"] == "new700"
