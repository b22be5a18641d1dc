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


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=25
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=25
    ),
)
@settings(max_examples=20, deadline=None)
def test_asof_join_matches_bruteforce(left_rows, right_rows):
    left = _ds([(u, t * 1000, 1000 + i) for i, (u, t) in enumerate(left_rows)])
    right = _ds([(u, t * 1000, 2000 + i) for i, (u, t) in enumerate(right_rows)])
    df = asof_join(left, right, on="user_id").to_pandas()
    got = {} if df.empty else df.set_index("left_id")["right_id"].to_dict()
    expect = {}
    for i, (u, t) in enumerate(left_rows):
        cands = [
            (rt, 2000 + j)
            for j, (ru, rt) in enumerate(right_rows)
            if ru == u and rt <= t
        ]
        if cands:
            expect[1000 + i] = max(cands)[1]  # greatest ts, then greatest id
    assert got == expect


def test_range_join_semantics():
    """[lo, hi) inclusivity, non-match drop, overlap rejection."""
    import pytest

    from azure_blob_crawler_ray.pipelines.relational import range_join

    facts = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "v": pa.array([0.0, 9.999, 10.0, -5.0])})
    )
    bands = pa.table({"lo": [0.0, 10.0], "hi": [10.0, 20.0], "band_id": [7, 8]})
    got = (
        range_join(facts, bands, value_col="v")
        .to_pandas()
        .set_index("k")["band_id"]
        .to_dict()
    )
    assert got == {1: 7, 2: 7, 3: 8}  # -5.0 dropped; hi exclusive, lo inclusive

    overlapping = pa.table({"lo": [0.0, 5.0], "hi": [10.0, 20.0], "band_id": [0, 1]})
    with pytest.raises(ValueError, match="non-overlapping"):
        range_join(facts, overlapping, value_col="v")
