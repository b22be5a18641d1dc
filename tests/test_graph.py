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


def test_pagerank_int_vs_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from azure_blob_crawler_ray.pipelines.graph import pagerank_int

    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, 120).astype(np.int64)
    b = rng.integers(0, 40, 120).astype(np.int64)
    keep = a != b
    edges = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])})
    )
    got = pagerank_int(edges, iters=3).to_pandas()

    # brute-force integer oracle
    u = np.concatenate([a[keep], b[keep]])
    v = np.concatenate([b[keep], a[keep]])
    nodes = np.unique(u)
    n = len(nodes)
    idx = {x: i for i, x in enumerate(nodes)}
    ui = np.array([idx[x] for x in u])
    vi = np.array([idx[x] for x in v])
    deg = np.bincount(ui, minlength=n).astype(np.int64)
    scale = 1_000_000_000_000
    r = np.full(n, scale // n, dtype=np.int64)
    base = (3 * scale) // (20 * n)
    for _ in range(3):
        contrib = (17 * r[ui]) // (20 * deg[ui])
        r = base + np.bincount(vi, weights=None, minlength=n) * 0  # init
        r = base + np.zeros(n, dtype=np.int64)
        np.add.at(r, vi, contrib)
    assert dict(zip(got["doc_id"], got["rank_scaled"])) == dict(
        zip(nodes.tolist(), r.tolist())
    )


def test_pagerank_partitioning_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from azure_blob_crawler_ray.pipelines.graph import pagerank_int

    rng = np.random.default_rng(11)
    a = rng.integers(0, 30, 80).astype(np.int64)
    b = rng.integers(0, 30, 80).astype(np.int64)
    keep = a != b
    t = pa.table({"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])})
    e1 = ray.data.from_arrow(t)
    e2 = ray.data.from_arrow(t).repartition(5)
    g1 = pagerank_int(e1, iters=3).to_pandas()
    g2 = pagerank_int(e2, iters=3, num_buckets=3).to_pandas()
    assert g1.equals(g2)
