"""connected_components vs a brute-force union-find oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.pipelines.graph import connected_components


def _uf_oracle(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # second pass: min id per root
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, r), n)
    return {n: roots[find(n)] for n in parent}


def _run(pairs: list[tuple[int, int]], **kw) -> dict[int, int]:
    t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], type=pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], type=pa.int64()),
        }
    )
    got = connected_components(ray.data.from_arrow(t), **kw).to_pandas()
    return dict(zip(got["doc_id"].astype(int), got["cluster_id"].astype(int)))


def test_chain_and_islands():
    # one long chain (diameter 9), one triangle, one isolated pair
    pairs = [(i, i + 1) for i in range(10, 19)]
    pairs += [(100, 101), (101, 102), (100, 102)]
    pairs += [(7, 3)]
    assert _run(pairs) == _uf_oracle(pairs)


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    pairs = [tuple(sorted(p)) for p in rng.integers(0, 400, size=(300, 2)).tolist() if p[0] != p[1]]
    assert _run(pairs, num_buckets=16) == _uf_oracle(pairs)


def test_empty_edges():
    t = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
        }
    )
    got = connected_components(ray.data.from_arrow(t))
    assert got.count() == 0
    # ds.to_pandas() on an empty dataset drops columns (Ray quirk);
    # the schema itself is what the contract promises
    assert got.schema().names == ["doc_id", "cluster_id"]


def test_label_is_component_min():
    pairs = [(5, 9), (9, 2), (50, 60)]
    got = _run(pairs)
    assert got[5] == got[9] == got[2] == 2
    assert got[50] == got[60] == 50
