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
