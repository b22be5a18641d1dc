"""Dedup family + text analysis vs brute-force Python oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from azure_blob_crawler_ray.functions.textstats import char_ngrams, jaccard
from azure_blob_crawler_ray.pipelines import dataprep

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def docs_pd():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_text_stats_matches_python(docs_ds, docs_pd):
    import re

    got = dataprep.text_stats(docs_ds).to_pandas().set_index("doc_id").sort_index()
    for _, row in docs_pd.head(50).iterrows():
        t = row["text"]
        g = got.loc[row["doc_id"]]
        assert g["word_count"] == len(re.findall(r"\S+", t))
        assert g["punct_count"] == len(re.findall(r"[.!?,;:]", t))
        assert g["char_count"] == len(t)


def test_exact_dedup_collapses_planted_dups(docs_ds, docs_pd):
    # plant exact duplicates by unioning a copy with shifted ids
    dup = pa.table(
        {
            "doc_id": pa.array((docs_pd["doc_id"] + 10_000).astype("int64")),
            "text": pa.array(docs_pd["text"]),
        }
    )
    both = docs_ds.union(ray.data.from_arrow(dup))
    out = dataprep.exact_dedup(both).to_pandas()
    assert len(out) == len(docs_pd)  # every original text collapses once
    assert (out["dup_count"] == 2).all()
    assert (out["doc_id"] < 10_000).all()  # keeper is the min id


def _brute_jaccard_pairs(texts: pd.Series, ids: pd.Series, ngram: int, th: float):
    sets = {i: char_ngrams(t, ngram) for i, t in zip(ids, texts)}
    keys = sorted(sets)
    out = set()
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            if jaccard(sets[a], sets[b]) >= th:
                out.add((a, b))
    return out


def test_ngram_jaccard_exact_vs_bruteforce(docs_ds, docs_pd):
    got = dataprep.ngram_jaccard_pairs(docs_ds, ngram=5, threshold=0.5).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    exp = _brute_jaccard_pairs(docs_pd["text"], docs_pd["doc_id"], 5, 0.5)
    assert got_pairs == exp
    # jaccard values are exact
    sets = {i: char_ngrams(t, 5) for i, t in zip(docs_pd["doc_id"], docs_pd["text"])}
    for _, r in got.iterrows():
        assert abs(r["jaccard"] - jaccard(sets[r["doc_a"]], sets[r["doc_b"]])) < 1e-12


def test_minhash_lsh_finds_planted_near_dups(docs_ds, docs_pd):
    exp = _brute_jaccard_pairs(docs_pd["text"], docs_pd["doc_id"], 5, 0.8)
    assert exp, "corpus should contain planted near-dups"
    got = dataprep.minhash_lsh_pairs(docs_ds, threshold=0.6).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    # LSH at threshold 0.6 with 16 bands x 4 rows: recall on >=0.8 pairs
    found = len(exp & got_pairs) / len(exp)
    assert found >= 0.9, f"recall {found} over {len(exp)} true pairs"
    # precision: every reported pair really is similar (est >= 0.6 -> true >= 0.4)
    sets = {i: char_ngrams(t, 5) for i, t in zip(docs_pd["doc_id"], docs_pd["text"])}
    for a, b in got_pairs:
        assert jaccard(sets[a], sets[b]) >= 0.4


def test_simhash_planted_dups(docs_ds, docs_pd):
    got = dataprep.simhash_pairs(docs_ds, max_hamming=3).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    # exact text dups must always be found (hamming 0)
    exact = _brute_jaccard_pairs(docs_pd["text"], docs_pd["doc_id"], 3, 0.999)
    assert exact <= got_pairs
    # reported pairs are textually similar
    sets = {i: char_ngrams(t, 3) for i, t in zip(docs_pd["doc_id"], docs_pd["text"])}
    for a, b in got_pairs:
        assert jaccard(sets[a], sets[b]) >= 0.5


def test_langid_deterministic_rule(docs_ds, docs_pd):
    got = dataprep.langid(docs_ds).to_pandas().set_index("doc_id")
    for _, row in docs_pd.head(80).iterrows():
        t = row["text"]
        occ = {m: t.count(m) for m, _ in dataprep.LANG_MARKERS}
        if occ["join"] > occ["the"] and occ["join"] > occ["data"]:
            exp = "fr"
        elif occ["data"] > occ["the"]:
            exp = "de"
        elif occ["the"] > 0:
            exp = "en"
        else:
            exp = "und"
        assert got.loc[row["doc_id"], "pred_lang"] == exp


def test_fingerprint_md5(docs_ds, docs_pd):
    import hashlib

    got = dataprep.fingerprint(docs_ds).to_pandas().set_index("doc_id")
    for _, row in docs_pd.head(20).iterrows():
        assert (
            got.loc[row["doc_id"], "fp"]
            == hashlib.md5(row["text"].encode()).hexdigest()
        )


def test_rolling_fingerprint_properties():
    from azure_blob_crawler_ray.functions.textstats import rolling_fingerprint

    a = rolling_fingerprint(["hello world", "hello world", "hello world!"])
    assert a[0] == a[1]
    assert a[0] != a[2]
    assert rolling_fingerprint([""])[0] == 0


def test_stable_split_survives_reordering(docs_ds, docs_pd):
    import ray.data as rd

    a = dataprep.stable_split(docs_ds).to_pandas().set_index("doc_id")["split"]
    shuffled = rd.from_pandas(
        docs_pd[["doc_id", "text"]].sample(frac=1.0, random_state=7).reset_index(drop=True)
    )
    b = dataprep.stable_split(shuffled).to_pandas().set_index("doc_id")["split"]
    assert a.sort_index().equals(b.sort_index())
    frac = (a == "val").mean()
    assert 0.03 < frac < 0.2  # ~10% nominal


def test_pack_sequences_bins_are_contiguous_and_bounded(docs_ds):
    out = dataprep.pack_sequences(docs_ds, capacity=500).to_pandas()
    assert out["doc_id"].is_monotonic_increasing
    assert out["bin"].is_monotonic_increasing
    # each bin's preceding-cumsum start is within capacity of its first doc
    for b, grp in out.groupby("bin"):
        # bin content exceeds capacity by at most one document's tokens
        assert grp["tokens"].sum() <= 500 + grp["tokens"].max()


def test_pack_interleaved_charges_media_tokens(docs_ds, docs_pd):
    import re

    out = dataprep.pack_interleaved(
        docs_ds, capacity=800, media_every=3, media_tokens=64
    ).to_pandas()
    ref = docs_pd.sort_values("doc_id")
    want = (
        ref["text"].map(lambda t: len(re.findall(r"\S+", t))).to_numpy()
        + (ref["doc_id"].to_numpy() % 3) * 64
    )
    got = out.sort_values("doc_id")
    assert got["tokens"].tolist() == want.tolist()
    # bin = floor(exclusive-prefix / capacity) over doc_id order
    cum = np.cumsum(want)
    assert got["bin"].tolist() == ((cum - want) // 800).tolist()


def test_stratified_sample_counts(docs_ds):
    out = dataprep.stratified_sample(
        ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]),
        per_stratum=5,
    ).to_pandas()
    counts = out.groupby("lang").size()
    assert (counts == 5).all()


def test_simhash_generalized_hamming_radius():
    """Block-permute completeness for max_hamming != 3: a synthetic pair
    at Hamming distance 5 must be found at radius 5 and not at 3."""
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines import dataprep as dp

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    # flip a few characters so the simhashes are close but unequal
    variant = base.replace("gamma", "gamm4", 2)
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array([base, variant])})
    )
    sig = dp.simhash_signatures(docs).to_pandas().set_index("doc_id")["simhash"]
    d = bin(int(sig[1]) ^ int(sig[2])).count("1")
    found_d = dp.simhash_pairs(docs, max_hamming=d).to_pandas()
    assert len(found_d) == 1 and found_d.iloc[0]["hamming"] == d
    if d > 0:
        found_lower = dp.simhash_pairs(docs, max_hamming=d - 1).to_pandas()
        assert len(found_lower) == 0


def test_ngram_jaccard_matches_bruteforce_random_corpora():
    """The vectorized inverted-index path must equal brute-force
    set-Jaccard when the prefix filter is disabled (guards the
    run-length-batched pair generation rewrite)."""
    import itertools

    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.functions.textstats import char_ngrams, jaccard
    from azure_blob_crawler_ray.pipelines import dataprep as dp

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsi"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(40)
    ]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                  "text": pa.array(texts)})
    )
    got = dp.ngram_jaccard_pairs(
        docs, ngram=4, threshold=0.3, max_posting=10_000
    ).to_pandas()
    got_pairs = {
        (a, b): round(j, 9)
        for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])
    }
    sets = {i: char_ngrams(t, 4) for i, t in enumerate(texts)}
    expect = {}
    for a, b in itertools.combinations(range(40), 2):
        if not sets[a] or not sets[b]:
            continue  # empty shingle sets never co-occur in a posting
        j = jaccard(sets[a], sets[b])
        if j >= 0.3 and len(sets[a] & sets[b]) > 0:
            expect[(a, b)] = round(j, 9)
    assert got_pairs == expect


def test_signature_batching_matches_per_doc_computation():
    """The reduceat-batched minhash/simhash signatures must equal the
    straightforward per-document formulas over the SAME shingle hashes
    (guards the batching rewrite, incl. empty docs interleaved with
    non-empty ones and the short-doc whole-text path)."""
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.functions.textstats import (
        char_ngrams,
        hashed_shingles,
    )
    from azure_blob_crawler_ray.pipelines import dataprep as dp

    texts = ["alpha beta gamma", "", "beta beta beta delta", "   ", "x"]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                  "text": pa.array(texts)})
    )
    num_perm = 16
    got = (
        dp.minhash_signatures(docs, ngram=3, num_perm=num_perm)
        .to_pandas()
        .set_index("doc_id")
    )
    a, b = dp._minhash_params(num_perm)
    for i, t in enumerate(texts):
        x, sizes = hashed_shingles([t], 3)  # per-doc reference hashes
        assert sizes[0] == len(char_ngrams(t, 3))  # set semantics hold
        if not len(x):
            expect = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        else:
            expect = ((x[:, None] * a[None, :] + b[None, :]) % dp._MERSENNE).min(axis=0)
        assert np.array_equal(np.asarray(got.loc[i, "sig"], dtype=np.uint64), expect)
        assert got.loc[i, "n_shingles"] == sizes[0]

    sim = (
        dp.simhash_signatures(docs, ngram=3)
        .to_pandas()
        .set_index("doc_id")["simhash"]
    )
    for i, t in enumerate(texts):
        h, sizes = hashed_shingles([t], 3)
        if not len(h):
            assert int(sim[i]) == 0
            continue
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        expect = int(np.bitwise_or.reduce(
            (vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        ))
        assert int(sim[i]) == expect


def test_remove_duplicate_spans_hand_case():
    """Keeper (min doc_id) survives intact; non-keepers lose every
    covered position (overlapping spans merge); short docs only get
    whitespace-normalized; a doc that IS the span empties out."""
    import pyarrow as pa
    import ray.data

    G = "a b c d e f g h"  # the shared 8-gram
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    [
                        G + " X",              # keeper (min doc_id)
                        "z " + G + " " + G + " y",  # two occurrences, both excised
                        G,                      # exactly the span -> empty
                        "p  q \t r",            # short: normalize only
                        "w " + G + " v",        # one occurrence
                    ]
                ),
            }
        )
    )
    got = dataprep.remove_duplicate_spans(docs, n=8, min_docs=2).to_pandas()
    assert got["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert got["clean_text"].tolist() == [G + " X", "z y", "", "p q r", "w v"]
    assert got["n_removed"].tolist() == [0, 16, 8, 0, 8]


# ---------- training-data sharding (round 4) ----------

def test_training_order_matches_pandas(docs_pd):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    got = (
        dataprep.training_order(ds, shards=8, seed=17)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    ids = docs_pd["doc_id"].to_numpy().astype(np.int64)
    h = (ids * np.int64(2654435761) + np.int64(17) * np.int64(40503)) % np.int64(1 << 32)
    want = (
        pd.DataFrame({"doc_id": ids, "h": h, "shard": (h % 8).astype(np.int32)})
        .sort_values(["shard", "h", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    want["pos"] = want.groupby("shard").cumcount()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["pos"].tolist() == want["pos"].tolist()
    # every shard is a contiguous 0..n-1 position range
    for s, grp in got.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))


def test_training_order_partitioning_invariant():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    a = dataprep.training_order(ds, shards=4, seed=3).to_pandas()
    b = dataprep.training_order(ds.repartition(7), shards=4, seed=3).to_pandas()
    key = ["shard", "pos"]
    assert (
        a.sort_values(key).reset_index(drop=True)["doc_id"].tolist()
        == b.sort_values(key).reset_index(drop=True)["doc_id"].tolist()
    )
    # a different seed is a genuinely different order
    c = dataprep.training_order(ds, shards=4, seed=4).to_pandas()
    assert (
        a.sort_values(key).reset_index(drop=True)["doc_id"].tolist()
        != c.sort_values(key).reset_index(drop=True)["doc_id"].tolist()
    )


def test_source_cap_matches_pandas():
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    full = ds.to_pandas()
    k = 30
    got = (
        dataprep.source_cap(ds.repartition(5), k=k)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    want = full.sort_values(
        ["source", "n_chars", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    want["rank"] = want.groupby("source").cumcount() + 1
    want = want[want["rank"] <= k].reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
