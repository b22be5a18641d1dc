"""Triangle enumeration and weighted (A-Res) sampling vs brute-force
oracles at sf0.001."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep, graph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def near_dup_pairs():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dataprep.ngram_jaccard_pairs(
        docs, ngram=12, threshold=0.35, max_posting=200
    ).materialize()


def _triangle_oracle(pairs_pd):
    adj = {}
    for a, b in zip(pairs_pd["doc_a"], pairs_pd["doc_b"]):
        adj.setdefault(a, set()).add(b)
    out = []
    for a in adj:
        for b, c in itertools.combinations(sorted(adj[a]), 2):
            if c in adj.get(b, ()):
                out.append((a, b, c))
    return sorted(out)


def test_triangles(near_dup_pairs):
    got = graph.triangles(near_dup_pairs).to_pandas()
    want = _triangle_oracle(near_dup_pairs.to_pandas())
    assert list(zip(got["a"], got["b"], got["c"])) == want
    assert len(want) > 0  # the fixture graph must actually close triangles


def test_triangles_partitioning_invariant(near_dup_pairs):
    a = graph.triangles(near_dup_pairs).to_pandas()
    b = graph.triangles(near_dup_pairs.repartition(5), num_buckets=3).to_pandas()
    assert a.equals(b)


def test_triangles_synthetic_hub():
    # K4 on {1,2,3,4} plus a hub 0 connected to everything: K5 = 10 triangles.
    edges = [(a, b) for a, b in itertools.combinations(range(5), 2)]
    ds = ray.data.from_items([{"doc_a": a, "doc_b": b} for a, b in edges])
    got = graph.triangles(ds).to_pandas()
    assert len(got) == 10
    # max_degree below the hub's out-degree (4) drops its wedges — the
    # documented loud-skip bound — leaving the triangles whose apex
    # degree fits: apexes 1 (deg 3), 2 (deg 2).
    capped = graph.triangles(ds, max_degree=3).to_pandas()
    assert list(zip(capped["a"], capped["b"], capped["c"])) == _triangle_oracle(
        ray.data.from_items(
            [{"doc_a": a, "doc_b": b} for a, b in edges if a != 0]
        ).to_pandas()
    )


def _ares_oracle(docs_pd, k=100):
    keys = []
    for r in docs_pd.itertuples():
        if r.n_chars <= 0:
            continue
        h = int(hashlib.md5(r.text.encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / 4294967296.0
        keys.append((np.log(u) / r.n_chars, r.doc_id, r.n_chars))
    keys.sort(key=lambda t: (-t[0], t[1]))
    return keys[:k], keys[k : k + 1]


def test_weighted_sample(docs_pd_module=None):
    docs_pd = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    got = dataprep.weighted_sample(
        ray.data.read_parquet(f"{SF}/documents.parquet")
    ).to_pandas()
    want, nxt = _ares_oracle(docs_pd)
    assert list(zip(got["doc_id"], got["w"])) == [(d, w) for _, d, w in want]
    # boundary margin between the k-th and (k+1)-th priority must dwarf
    # double noise, or cross-engine libm differences could flip the set
    if nxt:
        assert want[-1][0] - nxt[0][0] > 1e-9


def test_weighted_sample_sharding_invariant():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    a = dataprep.weighted_sample(ds).to_pandas()
    b = dataprep.weighted_sample(ds.repartition(7)).to_pandas()
    assert a.equals(b)


def test_weighted_sample_is_weight_biased():
    docs_pd = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    got = dataprep.weighted_sample(
        ray.data.read_parquet(f"{SF}/documents.parquet"), k=100
    ).to_pandas()
    # expected inclusion scales with weight: the sampled mean weight must
    # exceed the corpus mean (500 docs, k=100 — a huge margin in practice)
    assert got["w"].mean() > docs_pd["n_chars"].mean()


def test_approx_quantiles_relative_error():
    li = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )
    got = dataprep.approx_quantiles(
        li, value_col="l_extendedprice", group_col="l_returnflag", rel_err=0.01
    ).to_pandas()
    exact_pd = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    ).to_pandas()
    assert got["n_dropped"].eq(0).all()
    checked = 0
    for r in got.itertuples():
        vals = np.sort(
            exact_pd[exact_pd["l_returnflag"] == r.grp]["l_extendedprice"].to_numpy()
        )
        true = vals[max(int(np.ceil(r.q * len(vals))), 1) - 1]
        assert abs(r.value - true) <= 0.0101 * true, (r.grp, r.q, r.value, true)
        checked += 1
    assert checked == 9  # 3 groups x 3 quantiles


def test_approx_quantiles_merge_invariant():
    li = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )
    a = dataprep.approx_quantiles(
        li, value_col="l_extendedprice", group_col="l_returnflag"
    ).to_pandas()
    b = dataprep.approx_quantiles(
        li.repartition(17), value_col="l_extendedprice", group_col="l_returnflag"
    ).to_pandas()
    assert a.equals(b)  # sketch merge is exact addition — sharding-invariant


def test_approx_quantiles_drops_nonpositive_loudly():
    ds = ray.data.from_items(
        [{"g": "x", "v": 0.0}, {"g": "x", "v": -3.0}]
        + [{"g": "x", "v": float(i)} for i in range(1, 101)]
    )
    got = dataprep.approx_quantiles(ds, value_col="v", group_col="g").to_pandas()
    assert got["n_dropped"].eq(2).all()
    med = got[got["q"] == 0.5]["value"].iloc[0]
    assert abs(med - 50) <= 0.0101 * 50 + 1  # midpoint rule on small ints


def _lev1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if abs(la - lb) != 1:
        return False
    s, t = (a, b) if la < lb else (b, a)
    k = 0
    while k < len(s) and s[k] == t[k]:
        k += 1
    return t[:k] + t[k + 1 :] == s


def test_fuzzy_pairs_vs_bruteforce():
    names = pq.read_table(
        "/root/testdata/sf0.001/customer.parquet", columns=["c_name"]
    ).to_pandas()["c_name"].tolist()
    got = dataprep.fuzzy_pairs(
        ray.data.read_parquet("/root/testdata/sf0.001/customer.parquet")
    ).to_pandas()
    uniq = sorted(set(names))
    want = [
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev1(a, b)
    ]
    assert list(zip(got["name_a"], got["name_b"])) == sorted(want)
    assert len(want) > 100  # sf0.001 names must produce a real workload


def test_fuzzy_pairs_insert_delete_and_substitution():
    rows = [{"c_name": n} for n in
            ["abc", "abcd", "azc", "abc", "xyz", "ab", "qrstu"]]
    ds = ray.data.from_items(rows).repartition(3)
    got = dataprep.fuzzy_pairs(ds, num_buckets=4).to_pandas()
    have = set(zip(got["name_a"], got["name_b"]))
    assert have == {
        ("ab", "abc"),    # deletion
        ("abc", "abcd"),  # insertion
        ("abc", "azc"),   # substitution
    }
    assert ("ab", "azc") not in have  # distance 2 must not leak through


def test_heavy_hitters_cms_guarantees():
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    got = dataprep.heavy_hitters(docs, threshold_frac=0.01)
    # exact truth
    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    ).to_pandas()["text"]
    from collections import Counter

    cnt = Counter()
    for t in texts:
        cnt.update(w for w in t.split() if w)
    total = sum(cnt.values())
    heavy = {w for w, n in cnt.items() if n >= 0.01 * total}
    have = dict(zip(got["term"], got["est_count"]))
    # no false negatives
    assert heavy <= set(have)
    # overestimate-only, bounded by total/width per CMS row
    for w, est in have.items():
        assert est >= cnt[w]
        assert est - cnt[w] <= total / (1 << 14) + 1
    # sharding invariance
    again = dataprep.heavy_hitters(docs.repartition(9), threshold_frac=0.01)
    assert got.equals(again)
