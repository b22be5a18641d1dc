"""Incremental cross-run MinHash dedup vs a sequential twin that applies
the module's rules 1-3 literally (probe the accumulated band index, then
min-id-per-pair within the increment, then index EVERYTHING including
dups), plus chain/layout/resume/meta-guard properties."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import incdedup
from azure_blob_crawler_ray.pipelines.dataprep import (
    band_keys,
    minhash_signatures,
)

SF = "/root/testdata/sf0.001"


def _docs_df() -> pd.DataFrame:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    return t.to_pandas()


def _sig_map(df: pd.DataFrame, ngram: int, num_perm: int) -> dict:
    """doc_id -> uint64 signature row, via the ENGINE's signature stage
    (the sketch itself is recall-gated elsewhere; the twin here tests
    the INCREMENTAL machinery: index accumulation, probe, resolution)."""
    sigs = minhash_signatures(
        ray.data.from_pandas(df), ngram=ngram, num_perm=num_perm
    ).to_pandas()
    return {
        int(r.doc_id): np.asarray(r.sig, dtype=np.uint64)
        for r in sigs.itertuples()
    }


def _seq_twin(runs, sig_of, *, bands, threshold):
    """Sequential replica of rules 1-3: returns per run a dict
    doc_id -> (is_dup, dup_of, est)."""
    index = {}  # band_key -> list[(doc_id, sig)]
    out = []
    for ids in runs:
        ids = sorted(int(i) for i in ids)
        bk_of = {d: band_keys(sig_of[d][None, :], bands).ravel() for d in ids}
        # rule 1
        hits = {}
        for d in ids:
            best = None
            seen = set()
            for bk in bk_of[d]:
                for i_id, i_sig in index.get(int(bk), []):
                    if i_id in seen:
                        continue
                    seen.add(i_id)
                    est = float((sig_of[d] == i_sig).mean())
                    if est < threshold:
                        continue
                    if (
                        best is None
                        or est > best[1]
                        or (est == best[1] and i_id < best[0])
                    ):
                        best = (i_id, est)
            if best:
                hits[d] = best
        # rule 2: min-id-per-pair among band-colliding increment docs,
        # doc_a must have survived rule 1
        intra = {}
        for j, b in enumerate(ids):
            best = None
            for a in ids[:j]:
                if a in hits:
                    continue
                if not (set(map(int, bk_of[a])) & set(map(int, bk_of[b]))):
                    continue
                est = float((sig_of[a] == sig_of[b]).mean())
                if est < threshold:
                    continue
                if (
                    best is None
                    or est > best[1]
                    or (est == best[1] and a < best[0])
                ):
                    best = (a, est)
            if best:
                intra[b] = best
        res = {}
        for d in ids:
            if d in hits:
                res[d] = (True, hits[d][0], hits[d][1])
            elif d in intra:
                res[d] = (True, intra[d][0], intra[d][1])
            else:
                res[d] = (False, -1, 0.0)
        out.append(res)
        # rule 3
        for d in ids:
            for bk in bk_of[d]:
                index.setdefault(int(bk), []).append((d, sig_of[d]))
    return out


PARAMS = dict(ngram=5, num_perm=64, bands=16, num_shards=8)
THRESH = 0.5


def _run_engine(index_uri, run_id, df, threshold=THRESH, blocks=4, **overrides):
    p = {**PARAMS, **overrides}
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = incdedup.incremental_minhash_dedup(
        index_uri, run_id, ds, threshold=threshold, **p
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_two_increments_match_sequential_twin(tmp_path):
    df = _docs_df()
    run1 = df[df["doc_id"] % 2 == 0]
    run2 = df[df["doc_id"] % 2 == 1]
    sig_of = _sig_map(df, PARAMS["ngram"], PARAMS["num_perm"])
    twin = _seq_twin(
        [run1["doc_id"], run2["doc_id"]],
        sig_of,
        bands=PARAMS["bands"],
        threshold=THRESH,
    )
    uri = str(tmp_path / "idx")
    for rid, rdf, tw in [("0001", run1, twin[0]), ("0002", run2, twin[1])]:
        got = _run_engine(uri, rid, rdf)
        assert len(got) == len(tw)
        for r in got.itertuples():
            want = tw[int(r.doc_id)]
            assert (bool(r.is_dup), int(r.dup_of)) == (want[0], want[1]), (
                rid,
                r.doc_id,
                (r.is_dup, r.dup_of, r.est_jaccard),
                want,
            )
            assert r.est_jaccard == pytest.approx(want[2], abs=0)
    # the test is vacuous unless BOTH rules fired somewhere
    assert any(v[0] for v in twin[1].values()), "no cross-run dup in data"


def test_chain_through_an_indexed_dup(tmp_path):
    """Run 1: A=X.  Run 2: B=X+Y -> dup of A.  Run 3: C=Y -> shares
    nothing with A, half with B; C must still be flagged, proving DUPS
    are indexed too (rule 3)."""
    rng = np.random.default_rng(11)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    X = "".join(rng.choice(alpha, 400))
    Y = "".join(rng.choice(alpha, 400))
    a = pd.DataFrame({"doc_id": [1], "text": [X]})
    b = pd.DataFrame({"doc_id": [2], "text": [X + Y]})
    c = pd.DataFrame({"doc_id": [3], "text": [Y]})
    uri = str(tmp_path / "idx")
    # 2-row bands: at J~0.5 a band collides w.p. 1-(3/4)^64 ~ 1-1e-8,
    # so candidate generation cannot miss the deterministic draw
    r1 = _run_engine(uri, "r1", a, threshold=0.35, num_perm=128, bands=64)
    r2 = _run_engine(uri, "r2", b, threshold=0.35, num_perm=128, bands=64)
    r3 = _run_engine(uri, "r3", c, threshold=0.35, num_perm=128, bands=64)
    assert not r1["is_dup"].iloc[0]
    assert r2["is_dup"].iloc[0] and r2["dup_of"].iloc[0] == 1
    assert r3["is_dup"].iloc[0] and r3["dup_of"].iloc[0] == 2


def test_layout_invariance(tmp_path):
    df = _docs_df()
    run1 = df[df["doc_id"] < 250]
    run2 = df[df["doc_id"] >= 250]
    out = {}
    for blocks in (3, 11):
        uri = str(tmp_path / f"idx{blocks}")
        _run_engine(uri, "a", run1, blocks=blocks)
        out[blocks] = _run_engine(uri, "b", run2, blocks=blocks)
    pd.testing.assert_frame_equal(out[3], out[11])


def test_append_resume_after_crash(tmp_path):
    df = _docs_df()
    run1 = df[df["doc_id"] < 250]
    run2 = df[df["doc_id"] >= 250]

    clean = str(tmp_path / "clean")
    _run_engine(clean, "a", run1)

    crashed = str(tmp_path / "crashed")
    _run_engine(crashed, "a", run1)
    # simulate a crash mid-append: run marker gone, one shard uncommitted
    run_dir = os.path.join(crashed, "run-a")
    os.remove(os.path.join(run_dir, "_RUN_COMMITTED"))
    shutil.rmtree(os.path.join(run_dir, "shard-0003"))
    # an uncommitted run is INVISIBLE to probes
    assert incdedup.committed_runs(crashed) == []
    # re-append is idempotent: only the missing shard is rewritten
    ds = ray.data.from_pandas(run1).repartition(4)
    res = incdedup.minhash_index_append(crashed, "a", ds, **PARAMS)
    assert res["written"] == [3]
    assert os.path.exists(os.path.join(run_dir, "_RUN_COMMITTED"))

    got_clean = _run_engine(clean, "b", run2)
    got_crashed = _run_engine(crashed, "b", run2)
    pd.testing.assert_frame_equal(got_clean, got_crashed)


def test_rerun_same_run_id_is_idempotent(tmp_path):
    """The natural retry after a driver crash POST-append: re-invoking
    the increment with the same run_id must reproduce the original
    verdicts, not flag every doc a self-dup against its own committed
    run (the probe excludes run-<run_id> from the committed-run list)."""
    df = _docs_df()
    run1 = df[df["doc_id"] < 250]
    run2 = df[df["doc_id"] >= 250]
    uri = str(tmp_path / "idx")
    _run_engine(uri, "a", run1)
    first = _run_engine(uri, "b", run2)
    # retry: run-b is already committed; the probe must not see it
    retry = _run_engine(uri, "b", run2)
    pd.testing.assert_frame_equal(first, retry)
    assert not (
        (retry["is_dup"]) & (retry["dup_of"] == retry["doc_id"])
    ).any(), "self-dups: probe matched the increment's own run"


def test_meta_guard_rejects_mismatched_params(tmp_path):
    df = _docs_df().head(20)
    uri = str(tmp_path / "idx")
    _run_engine(uri, "a", df)
    with pytest.raises(ValueError, match="sketch parameters"):
        incdedup.minhash_index_append(
            uri, "b", ray.data.from_pandas(df), **{**PARAMS, "bands": 8}
        )


def test_first_run_empty_index(tmp_path):
    """Empty index: no rule-1 hits; flags reduce to within-increment
    min-id-per-pair dedup."""
    df = _docs_df()
    uri = str(tmp_path / "idx")
    got = _run_engine(uri, "a", df)
    assert len(got) == len(df)
    dup = got[got["is_dup"]]
    assert len(dup) > 0  # the corpus has near-dups
    assert (dup["dup_of"] < dup["doc_id"]).all()  # only lower ids
    assert (got.loc[~got["is_dup"], "dup_of"] == -1).all()
