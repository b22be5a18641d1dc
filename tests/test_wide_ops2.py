"""Keep-latest dedup, full-outer aggregate join, hopping windows,
bigram counts, decontamination, shard manifest and label centroids vs
brute-force pandas/numpy oracles at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep, relational, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def events_ds():
    return ray.data.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs_pd():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_latest_event_per_user(events_ds, events_pd):
    got = relational.latest_event_per_user(events_ds).to_pandas()
    df = events_pd.sort_values(["ts", "event_id"], kind="mergesort")
    want = df.groupby("user_id").last()
    assert got["user_id"].tolist() == sorted(want.index.tolist())
    assert dict(zip(got["user_id"], got["last_event_id"])) == want["event_id"].to_dict()
    assert (
        dict(zip(got["user_id"], got["last_ts_us"]))
        == want["ts"].astype("int64").to_dict()
    )


def test_latest_event_partitioning_invariant(events_ds):
    a = relational.latest_event_per_user(events_ds).to_pandas()
    b = relational.latest_event_per_user(
        events_ds.repartition(7), num_buckets=5
    ).to_pandas()
    assert a.equals(b)


def test_nation_balance_full_outer():
    cust = ray.data.read_parquet(f"{SF}/customer.parquet")
    supp = ray.data.read_parquet(f"{SF}/supplier.parquet")
    nation = ray.data.read_parquet(f"{SF}/nation.parquet")
    got = relational.nation_balance(cust, supp, nation).to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    s = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    n = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    cents = lambda v: np.floor(v * 100.0 + 0.5).astype(np.int64)  # noqa: E731
    ca = c.assign(cents=cents(c["c_acctbal"])).groupby("c_nationkey").agg(
        n_customers=("c_custkey", "size"), cust_cents=("cents", "sum")
    )
    sa = s.assign(cents=cents(s["s_acctbal"])).groupby("s_nationkey").agg(
        n_suppliers=("s_suppkey", "size"), supp_cents=("cents", "sum")
    )
    keys = sorted(set(ca.index) | set(sa.index))
    assert len(got) == len(keys)
    by_name = got.set_index("n_name")
    names = n.set_index("n_nationkey")["n_name"]
    for k in keys:
        row = by_name.loc[names[k]]
        assert row["n_customers"] == (ca["n_customers"].get(k, 0))
        assert row["cust_cents"] == (ca["cust_cents"].get(k, 0))
        assert row["n_suppliers"] == (sa["n_suppliers"].get(k, 0))
        assert row["supp_cents"] == (sa["supp_cents"].get(k, 0))


def test_events_hopping_covers_each_event_twice(events_ds, events_pd):
    got = relational.events_hopping(events_ds, size_days=2, hop_days=1).to_pandas()
    assert got["n_events"].sum() == 2 * len(events_pd)
    day = events_pd["ts"].astype("int64") // 86_400_000_000
    cents = np.floor(events_pd["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    per_day_n = day.value_counts().to_dict()
    per_day_c = pd.Series(cents).groupby(day.values).sum().to_dict()
    for _, row in got.iterrows():
        w = row["window_day"]
        assert row["n_events"] == per_day_n.get(w, 0) + per_day_n.get(w + 1, 0)
        assert row["cents"] == per_day_c.get(w, 0) + per_day_c.get(w + 1, 0)


def test_bigram_counts_match_python(docs_ds, docs_pd):
    got = dataprep.bigram_counts(docs_ds, top_k=20).to_pandas()
    from collections import Counter

    c = Counter()
    for t in docs_pd["text"]:
        toks = t.split()
        c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["bigram"], got["occurrences"])) == want


def test_decontaminate_exact(docs_ds, docs_pd):
    n = 20
    got = dataprep.decontaminate(docs_ds, bench_below=20, ngram=n).to_pandas()
    bench = {
        t[i : i + n]
        for t in docs_pd[docs_pd["doc_id"] < 20]["text"]
        for i in range(len(t) - n + 1)
    }
    want = [
        int(d)
        for d, t in zip(docs_pd["doc_id"], docs_pd["text"])
        if d >= 20
        and not any(t[i : i + n] in bench for i in range(len(t) - n + 1))
    ]
    assert got["doc_id"].tolist() == sorted(want)


def test_shard_manifest_partition_of_corpus(docs_ds, docs_pd):
    got = dataprep.shard_manifest(docs_ds, num_shards=8).to_pandas()
    shard = (
        (docs_pd["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
        % np.uint64(1 << 32)
    ) % np.uint64(8)
    want = (
        pd.DataFrame({"shard": shard.astype(np.int64), "n": docs_pd["n_chars"]})
        .groupby("shard")
        .agg(n_docs=("n", "size"), total_chars=("n", "sum"))
    )
    assert got["n_docs"].sum() == len(docs_pd)
    assert dict(zip(got["shard"], got["n_docs"])) == want["n_docs"].to_dict()
    assert dict(zip(got["shard"], got["total_chars"])) == want["total_chars"].to_dict()


def test_label_centroids_exact_integer_sums():
    emb_ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = similarity.label_centroids(emb_ds).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    m = np.stack(t["embedding"].to_numpy())
    q = np.floor(m.astype(np.float64) * (1 << 20)).astype(np.int64)
    labels = t["label"].to_numpy()
    d = m.shape[1]
    assert len(got) == len(np.unique(labels)) * d
    for lab in np.unique(labels):
        sub = got[got["label"] == lab].sort_values("pos")
        assert sub["pos"].tolist() == list(range(1, d + 1))
        assert (sub["sum_q"].to_numpy() == q[labels == lab].sum(axis=0)).all()
        assert (sub["n_vals"] == (labels == lab).sum()).all()


def test_top_terms_per_lang(docs_ds, docs_pd):
    from collections import Counter

    got = dataprep.top_terms_per_lang(docs_ds, k=5).to_pandas()
    for lang, g in docs_pd.groupby("lang"):
        c = Counter()
        for t in g["text"]:
            c.update(t.split())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        sub = got[got["lang"] == lang].sort_values("rank")
        assert list(zip(sub["term"], sub["occurrences"])) == want
        assert sub["rank"].tolist() == list(range(1, len(want) + 1))


def test_dedup_keep_best_keeps_best_per_cluster(docs_ds, docs_pd):
    from azure_blob_crawler_ray.pipelines.graph import connected_components

    kept = set(
        dataprep.dedup_keep_best(docs_ds, ngram=12, threshold=0.5, max_posting=200)
        .to_pandas()["doc_id"]
    )
    pairs = dataprep.ngram_jaccard_pairs(
        docs_ds, ngram=12, threshold=0.5, max_posting=200
    )
    cc = connected_components(pairs).to_pandas()
    wc = dict(zip(docs_pd["doc_id"], docs_pd["text"].str.split().str.len()))
    members = set(cc["doc_id"])
    # isolated docs all kept
    for d in docs_pd["doc_id"]:
        if d not in members:
            assert d in kept
    # exactly one survivor per cluster: the max-wc (tie: min doc_id) one
    for cid, g in cc.groupby("cluster_id"):
        ms = g["doc_id"].tolist()
        best = min(ms, key=lambda d: (-wc[d], d))
        assert set(ms) & kept == {best}


def test_media_resize_bounds_dims_and_payload():
    import pyarrow as pa

    from azure_blob_crawler_ray.stages.media import (
        DeterministicFakeCodec,
        media_resize,
    )

    payloads = [bytes([i % 251 for i in range(n)]) for n in (10, 3000, 90000)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1, 2], type=pa.int64()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )
    )
    out = media_resize(ds, max_side=64).to_pandas().sort_values("media_id")
    codec = DeterministicFakeCodec()
    assert list(out.columns) == ["media_id", "height", "width", "payload"]
    for (_, row), orig in zip(out.iterrows(), payloads):
        h, w, _ = codec.decode_meta(orig)
        assert max(row["height"], row["width"]) <= 64
        assert row["height"] >= 1 and row["width"] >= 1
        # aspect preserved within integer truncation
        if max(h, w) > 64:
            assert len(row["payload"]) <= len(orig)
        else:
            assert bytes(row["payload"]) == orig
    # deterministic
    again = media_resize(ds, max_side=64).to_pandas().sort_values("media_id")
    assert [bytes(p) for p in again["payload"]] == [
        bytes(p) for p in out["payload"]
    ]


def test_frame_sample_rows_per_duration():
    import pyarrow as pa

    from azure_blob_crawler_ray.stages.media import frame_sample

    ds = ray.data.from_arrow(
        pa.table(
            {
                "media_id": pa.array([7, 8], type=pa.int64()),
                "duration_s": pa.array([0.4, 3.0], type=pa.float64()),
            }
        )
    )
    out = frame_sample(ds, fps=2.0).to_pandas()
    by = out.groupby("media_id")["frame"].apply(list).to_dict()
    assert by[7] == [0]  # max(1, int(0.4*2)) = 1 frame
    assert by[8] == [0, 1, 2, 3, 4, 5]
    t8 = out[out["media_id"] == 8].sort_values("frame")["t_s"].tolist()
    assert t8 == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]


def test_events_cube_levels(events_ds, events_pd):
    got = relational.events_cube(events_ds).to_pandas()
    total = got[(got["day"] == "ALL") & (got["event_type"] == "ALL")]
    assert total["event_count"].tolist() == [len(events_pd)]
    per_type = got[(got["day"] == "ALL") & (got["event_type"] != "ALL")]
    want = events_pd["event_type"].value_counts().to_dict()
    assert dict(zip(per_type["event_type"], per_type["event_count"])) == want
    fine = got[(got["day"] != "ALL") & (got["event_type"] != "ALL")]
    assert fine["event_count"].sum() == len(events_pd)


def test_normalize_text_canonical(docs_ds, docs_pd):
    import re

    got = dataprep.normalize_text(docs_ds).to_pandas()
    lut = dict(zip(got["doc_id"], got["norm"]))
    for d, t in zip(docs_pd["doc_id"], docs_pd["text"]):
        want = re.sub(r"\s+", " ", re.sub(r"[.!?,;:]", "", t.lower())).strip()
        assert lut[d] == want


def test_group_quantiles_cont_matches_numpy_linear():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    rng = np.random.default_rng(9)
    langs = np.repeat(["aa", "bb", "cc"], 123)
    vals = rng.integers(0, 10_000, len(langs))
    ds = ray.data.from_arrow(
        pa.table({"lang": pa.array(langs), "n_chars": pa.array(vals, type=pa.int64())})
    ).repartition(7)
    out = relational.group_quantiles_cont(
        ds, value_col="n_chars", group_col="lang", qs=(0.25, 0.5, 0.75)
    ).to_pandas()
    df = pd.DataFrame({"lang": langs, "v": vals})
    for (lang, q), row in out.set_index(["lang", "q"]).iterrows():
        want = np.percentile(
            df[df["lang"] == lang]["v"].to_numpy(), q * 100, method="linear"
        )
        assert abs(row["value"] - want) < 1e-9, (lang, q, row["value"], want)


def test_incremental_agg_refresh_sequence_equals_full():
    """A view maintained through TWO successive deltas equals the
    from-scratch aggregate over all rows."""
    import pyarrow.parquet as pq
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    full = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    k = full["l_orderkey"].to_numpy()
    import numpy as np
    import pyarrow as pa

    parts = [full.filter(pa.array(k % 3 == r)) for r in range(3)]
    view = relational.lineitem_agg_view(ray.data.from_arrow(parts[0])).materialize()
    # fold delta 1, store, fold delta 2: refresh output -> strip rounding
    # back into view form? The maintained view must be the UNROUNDED form,
    # so re-derive it by merging view with delta's partial directly.
    view2 = (
        view.union(relational.lineitem_agg_view(ray.data.from_arrow(parts[1])))
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            ray.data.aggregate.Sum("sum(qty)", alias_name="sum(qty)"),
            ray.data.aggregate.Sum("sum(price)", alias_name="sum(price)"),
            ray.data.aggregate.Sum("sum(disc_price)", alias_name="sum(disc_price)"),
            ray.data.aggregate.Sum("sum(cnt)", alias_name="sum(cnt)"),
        )
        .materialize()
    )
    got = relational.lineitem_agg_refresh(
        view2, ray.data.from_arrow(parts[2])
    ).to_pandas()
    want = relational.lineitem_agg(ray.data.from_arrow(full)).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)


def test_group_weighted_median_hand_and_layout():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    # lower weighted median: values [1,2,3] weights [1,1,2] -> tot=4,
    # cum at v=2 is 2 and 2*2>=4 -> median 2 (not 3)
    t = pa.table(
        {
            "g": pa.array(["a", "a", "a"]),
            "v": pa.array([1, 2, 3], type=pa.int64()),
            "w": pa.array([1, 1, 2], type=pa.int64()),
        }
    )
    out = relational.group_weighted_median(
        ray.data.from_arrow(t), value_col="v", weight_col="w", group_col="g"
    ).to_pandas()
    assert out["weighted_median"].tolist() == [2]

    # random data, layout invariance + sequential twin
    rng = np.random.default_rng(5)
    g = rng.choice(["x", "y", "z"], 500)
    v = rng.integers(0, 1000, 500)
    w = rng.integers(1, 9, 500)
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v, type=pa.int64()),
                    "w": pa.array(w, type=pa.int64())})
    import pandas as pd

    want = {}
    df = pd.DataFrame({"g": g, "v": v, "w": w})
    for grp, sub in df.groupby("g"):
        s = sub.groupby("v")["w"].sum().sort_index()
        cw = s.cumsum()
        tot = int(s.sum())
        want[grp] = int(s.index[(2 * cw >= tot).values.argmax()])
    for parts in (1, 7):
        got = relational.group_weighted_median(
            ray.data.from_arrow(tbl).repartition(parts),
            value_col="v", weight_col="w", group_col="g",
        ).to_pandas()
        assert dict(zip(got["g"], got["weighted_median"])) == want


def test_daily_ohlc_matches_pandas_twin():
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    got = relational.daily_ohlc(
        ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_totalprice"],
        ).repartition(7)
    ).to_pandas()
    df = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    df["day"] = df["o_orderdate"].dt.strftime("%Y-%m-%d")
    df["cents"] = np.floor(df["o_totalprice"] * 100.0 + 0.5).astype(np.int64)
    df = df.sort_values(["day", "o_orderdate", "o_orderkey"], kind="mergesort")
    g = df.groupby("day", sort=True)
    want = pd.DataFrame(
        {
            "day": g.size().index,
            "open": g["cents"].first().to_numpy(np.int64) / 100.0,
            "high": g["cents"].max().to_numpy(np.int64) / 100.0,
            "low": g["cents"].min().to_numpy(np.int64) / 100.0,
            "close": g["cents"].last().to_numpy(np.int64) / 100.0,
            "n_orders": g.size().to_numpy().astype(np.int64),
        }
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_gini_known_values():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    # equal values -> gini 0; one-holder extreme -> (n-1)/n - tiny
    t = pa.table(
        {
            "lang": pa.array(["eq"] * 4 + ["sk"] * 4),
            "n_chars": pa.array([5, 5, 5, 5, 0, 0, 0, 100], type=pa.int64()),
        }
    )
    out = (
        relational.group_gini(
            ray.data.from_arrow(t).repartition(3),
            value_col="n_chars",
            group_col="lang",
        )
        .to_pandas()
        .set_index("lang")
    )
    assert abs(out.loc["eq", "gini"]) < 1e-9
    # sorted [0,0,0,100]: G = 2*(4*100)/(4*100) - 5/4 = 2 - 1.25 = 0.75
    assert abs(out.loc["sk", "gini"] - 0.75) < 1e-9


def test_nation_share_sums_to_one_per_region():
    import numpy as np
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    sf = "/root/testdata/sf0.001"
    out = relational.nation_share_in_region(
        ray.data.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]),
        ray.data.read_parquet(f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"]),
        ray.data.read_parquet(f"{sf}/nation.parquet"),
        ray.data.read_parquet(f"{sf}/region.parquet"),
    ).to_pandas()
    sums = out.groupby("r_name")["share_in_region"].sum()
    assert np.allclose(sums.to_numpy(), 1.0, atol=1e-5)


def test_group_trimmed_mean_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    rng = np.random.default_rng(11)
    g = np.repeat(["x", "y"], 500)
    # heavy right tail so the trim actually moves the center
    v = np.round(rng.lognormal(5, 1.2, len(g)), 2)
    ds = ray.data.from_arrow(
        pa.table({"flag": pa.array(g), "price": pa.array(v, type=pa.float64())})
    ).repartition(9)
    out = (
        relational.group_trimmed_mean(
            ds, value_col="price", group_col="flag", lo_q=0.05, hi_q=0.95
        )
        .to_pandas()
        .set_index("flag")
    )
    df = pd.DataFrame({"g": g, "v": v})
    for grp, sub in df.groupby("g"):
        lo = np.percentile(sub["v"], 5, method="linear")
        hi = np.percentile(sub["v"], 95, method="linear")
        kept = sub["v"][(sub["v"] >= lo) & (sub["v"] <= hi)]
        cents = np.floor(kept.to_numpy() * 100.0 + 0.5).astype(np.int64)
        want = round(cents.sum() / 100.0 / len(kept), 2)
        row = out.loc[grp]
        assert abs(row["lo"] - lo) < 1e-9 and abs(row["hi"] - hi) < 1e-9
        assert row["n_kept"] == len(kept)
        assert abs(row["trimmed_avg"] - want) < 1e-12
        # the trim is real: plain mean of a lognormal sits above the
        # trimmed mean
        assert row["trimmed_avg"] < sub["v"].mean()
