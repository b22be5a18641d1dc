"""Measured quality floors for every approximate dedup operator
(VERDICT r2 #4): each test computes the operator's recall/precision
against its EXACT counterpart on the sf0.01 tables and asserts a floor
below the measured value — a silent quality regression (parameter
drift, broken banding, broken verify) fails CI even though the
operators are rows-only in the correctness harness.

Measured on sf0.01 (2026-08): lsh recall 0.898 (auto-tuned params),
minhash recall 1.0 / precision 1.0, semdedup within-cluster marks
exactly equal to the exact pair baseline."""

from __future__ import annotations

import numpy as np
import ray.data

from azure_blob_crawler_ray.functions.textstats import char_ngrams
from azure_blob_crawler_ray.pipelines import dataprep, similarity

SF = "/root/testdata/sf0.01"
THR = 0.4  # NEAR_DUP_THRESHOLD in __ray_entry__


def _emb():
    return ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _exact_pairs():
    ex = similarity.cosine_near_dup_pairs(_emb(), threshold=THR).to_pandas()
    return ex, set(zip(ex.vec_a.astype(int), ex.vec_b.astype(int)))


def test_lsh_near_dup_recall_floor():
    _, exact = _exact_pairs()
    lsh = similarity.lsh_near_dup_pairs(_emb(), threshold=THR).to_pandas()
    pairs = set(zip(lsh.vec_a.astype(int), lsh.vec_b.astype(int)))
    assert len(exact) > 20  # the baseline itself must be non-trivial
    recall = len(pairs & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.3f} < 0.8"
    # in-bucket exact verify => no false positives, ever
    assert pairs <= exact


def test_lsh_params_meet_target_across_thresholds():
    # the closed-form planner must request enough tables that the
    # analytic recall 1-(1-p^B)^T clears the target at every threshold
    import math

    for thr in (0.3, 0.4, 0.5, 0.7, 0.9, 0.95):
        bits, tables = similarity.lsh_params_for(thr, target_recall=0.9)
        p = 1.0 - math.acos(thr) / math.pi
        analytic = 1.0 - (1.0 - p**bits) ** tables
        assert analytic >= 0.9, (thr, bits, tables, analytic)
        assert tables <= 64


def test_semdedup_within_cluster_marks_are_exact():
    # semdedup's marks must equal the exact pair baseline RESTRICTED to
    # its own clusters — the clustering is the (documented, paper-
    # inherent) approximation; the in-cluster pass is not allowed any
    ex, exact = _exact_pairs()
    sd = similarity.semdedup(_emb(), threshold=THR).to_pandas()
    marks = set(sd[sd.is_dup].vec_id.astype(int))
    cluster = dict(zip(sd.vec_id.astype(int), sd.cluster.astype(int)))
    expected = {b for a, b in exact if cluster[a] == cluster[b]}
    assert marks == expected


def test_minhash_lsh_precision_recall_floor():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    mh = dataprep.minhash_lsh_pairs(docs, threshold=0.6).to_pandas()
    got = set(zip(mh.doc_a.astype(int), mh.doc_b.astype(int)))
    sdf = docs.to_pandas()
    ids = sdf.doc_id.to_numpy()
    sets = [char_ngrams(t, 5) for t in sdf.text]
    exact = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            if inter and inter / (len(sets[i]) + len(sets[j]) - inter) >= 0.6:
                x, y = int(ids[i]), int(ids[j])
                exact.add((min(x, y), max(x, y)))
    assert len(exact) > 10
    inter = got & exact
    recall = len(inter) / len(exact)
    precision = len(inter) / max(len(got), 1)
    assert recall >= 0.9, f"minhash recall {recall:.3f}"
    assert precision >= 0.9, f"minhash precision {precision:.3f}"


def test_mmr_agreement_vs_exhaustive():
    """mmr_topk restricts the greedy to the global top-pool candidates;
    against the exhaustive greedy (pool = corpus) the selected sets must
    agree almost everywhere at bench parameters."""
    mm = similarity.mmr_topk(_emb()).to_pandas()
    ex = similarity.mmr_exhaustive(_emb()).to_pandas()
    g = mm.groupby("query_id")["vec_id"].apply(set)
    e = ex.groupby("query_id")["vec_id"].apply(set)
    inter = sum(len(g[q] & e[q]) for q in e.index)
    agreement = inter / max(sum(len(s) for s in e.index.map(e)), 1)
    assert agreement >= 0.9, f"mmr agreement {agreement:.3f} < 0.9"


def test_simhash_recall_precision_vs_exact_hamming():
    """simhash_pairs' block-permute candidates are pigeonhole-COMPLETE
    and its in-bucket verify is exact, so against brute-force Hamming on
    the same signatures both recall and precision must be 1.0."""
    import pandas as pd
    import ray.data

    from azure_blob_crawler_ray.pipelines import dataprep

    # the corpus has no natural Hamming<=3 twins at this sf, so plant
    # deterministic near-dups: every 3rd doc gets a one-word-appended copy
    src = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).head(200)
    rows = [{"doc_id": int(i), "text": t} for i, t in zip(src.doc_id, src.text)]
    rows += [
        {"doc_id": int(i) + 1_000_000, "text": t + " zxqv"}
        for i, t in zip(src.doc_id, src.text)
        if int(i) % 3 == 0
    ]
    docs = ray.data.from_items(rows)
    got = dataprep.simhash_pairs(docs, max_hamming=3).to_pandas()
    gset = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    ex = dataprep.simhash_pairs_exact(docs, max_hamming=3)
    eset = set(zip(ex["doc_a"], ex["doc_b"]))
    assert len(eset) > 0
    hit = gset & eset
    recall = len(hit) / len(eset)
    precision = len(hit) / max(len(gset), 1)
    assert recall == 1.0, f"simhash recall {recall:.3f}"
    assert precision == 1.0, f"simhash precision {precision:.3f}"


def test_hll_relative_error_vs_exact_two_scales():
    """approx_distinct_users_per_type (HyperLogLog, p=12): measured
    relative error vs exact distinct at two corpus scales.  Standard
    error at p=12 is ~1.04/sqrt(4096) ~ 1.6%; the floor allows 3 sigma
    (5%) per event type — a broken register mix, rho computation, or
    small-range correction blows far past it."""
    import pandas as pd
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["event_type", "user_id"]
        )
        approx = relational.approx_distinct_users_per_type(ev).to_pandas()
        exact = (
            pd.read_parquet(
                f"{sf}/events.parquet", columns=["event_type", "user_id"]
            )
            .groupby("event_type")["user_id"]
            .nunique()
        )
        merged = approx.set_index("event_type").join(exact.rename("exact"))
        assert not merged.isna().any().any()
        rel = (merged["approx_users"] - merged["exact"]).abs() / merged["exact"]
        assert rel.max() <= 0.05, f"{sf}: HLL rel error {rel.max():.4f} > 5%"
