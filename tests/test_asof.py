"""asof_join edge cases: inclusive equal-ts match, equal-ts tie-break to
highest right id, per-key isolation, inner semantics (no prior -> drop)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.pipelines.relational import asof_join


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    )


def test_asof_join_semantics():
    left = _ds(
        [
            (1, 1000, 100),  # after right 10 and 11 -> ties at same ts
            (1, 500, 101),   # equal ts as right 10 -> inclusive
            (1, 100, 102),   # before any right row -> dropped (inner)
            (2, 2000, 200),  # other user: must not see user 1's rights
        ]
    )
    right = _ds(
        [
            (1, 500, 10),
            (1, 500, 11),  # same ts as 10: tie-break -> highest id wins
            (1, 900, 12),
            (3, 1, 30),    # user with no left rows
        ]
    )
    got = (
        asof_join(left, right, on="user_id")
        .to_pandas()
        .set_index("left_id")["right_id"]
        .to_dict()
    )
    assert got == {100: 12, 101: 11}
