"""Incremental cross-run near-duplicate detection against a PERSISTED
MinHash band index — the operation a continuous crawl actually needs:
each new increment (a crawl wave, a fresh dump) is deduplicated against
every document ever processed WITHOUT reprocessing or reshuffling the
historical corpus.  (Reference analog: the crawler's delete/reprocess
cycle re-submits changed blobs against the already-built search index,
function_app.py event flow — here the "index" is a dedup sketch instead
of a search index, and the increment never rescans history.)

Index layout — one resumable sharded write per increment, crash-safe via
the existing ``storage.write_sharded`` ``_SUCCESS`` markers plus a
run-level commit marker (a run is visible to probes only once EVERY
shard committed):

    index_uri/_META.json                      (ngram/num_perm/bands/num_shards)
    index_uri/run-<run_id>/_RUN_COMMITTED
    index_uri/run-<run_id>/shard-NNNN/*.parquet
        (band_key uint64, doc_id int64, sig fixed_size_list<uint64>)

Scale shape: the probe co-partitions the NEW docs' band rows by the same
``band_key % num_shards`` the index is laid out in, so each shard task
reads only its own shard directory from every committed run — the index
is never shuffled, never broadcast, and never crosses the object store;
the only exchange is ``bands``-per-new-doc narrow rows.  ``num_shards``
is fixed at index creation (stored in ``_META.json``) and should be
sized so one shard of the LARGEST expected increment fits a worker; the
on-disk index can grow unboundedly because a probe task streams its
shard's parquet files run by run.

Semantics (deterministic, order-defined; twin-tested sequentially in
tests/test_incdedup.py):

  1. a new doc is a dup of the INDEX if some band-key collision reaches
     signature agreement >= ``threshold``; ``dup_of`` is the best match
     (max agreement, then min doc_id);
  2. otherwise it is a WITHIN-INCREMENT dup if band collisions pair it
     with a LOWER-doc_id increment doc that itself survived rule 1
     (min-id-per-pair greedy — the same resolution exact keep-first
     dedup uses; a chain a<b<c with pairs (a,b),(b,c) drops both b and
     c, documented and replicated by the twin);
  3. ALL increment docs' bands are appended to the index — dups too, so
     a future doc matching only a dup (chain A~B in run 1, B~C in run
     2, A!~C) is still caught.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..storage import (
    commit_run,
    committed_runs,
    is_complete,
    shard_path,
    write_json,
    write_sharded,
)
from .dataprep import band_keys, minhash_lsh_pairs, minhash_signatures

_META = "_META.json"
_RUN_OK = "_RUN_COMMITTED"  # storage.RUN_MARKER; kept for test visibility


def _meta_path(index_uri: str) -> str:
    return os.path.join(index_uri, _META)


def _load_meta(index_uri: str) -> dict | None:
    p = _meta_path(index_uri)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _ensure_meta(index_uri: str, params: dict) -> dict:
    """First append stamps the sketch parameters; later appends/probes
    must match them — a probe with different banding would silently
    miss every historical dup."""
    meta = _load_meta(index_uri)
    if meta is None:
        os.makedirs(index_uri, exist_ok=True)
        write_json(params, _meta_path(index_uri))
        return params
    if meta != params:
        raise ValueError(
            f"minhash index at {index_uri} was built with {meta}, "
            f"got {params}; sketch parameters are fixed at creation"
        )
    return meta


# committed_runs is shared index-layout machinery (storage.committed_runs);
# re-exported here because it is part of this module's public semantics.


def _band_rows(
    docs: ray.data.Dataset,
    *,
    ngram: int,
    num_perm: int,
    bands: int,
    num_shards: int,
    sigs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(doc_id, band_key, shard, sig) — ``bands`` narrow rows per doc,
    sharded by the index's layout key.  ``sigs`` reuses a pre-computed
    signature stream (the shingle pass dominates)."""
    if sigs is None:
        sigs = minhash_signatures(docs, ngram=ngram, num_perm=num_perm)

    def explode(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(
            -1, num_perm
        )
        bkey = band_keys(sig, bands).ravel()
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(batch["doc_id"].to_numpy(), bands)
                ),
                "band_key": pa.array(bkey, type=pa.uint64()),
                "shard": pa.array(
                    (bkey % np.uint64(num_shards)).astype(np.int64)
                ),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        np.repeat(sig, bands, axis=0).ravel(),
                        type=pa.uint64(),
                    ),
                    num_perm,
                ),
            }
        )

    # batch_size coalesces the small signature blocks into few fat band
    # blocks — both consumers (the probe's shard groupby and the sharded
    # write) cost ~linearly in input block count at fixed rows
    return sigs.map_batches(explode, batch_format="pyarrow", batch_size=65_536)


def minhash_index_append(
    index_uri: str,
    run_id: str,
    docs: ray.data.Dataset,
    *,
    ngram: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    num_shards: int = 64,
    sigs: ray.data.Dataset | None = None,
) -> dict:
    """Append one increment's band rows to the index under
    ``run-<run_id>`` (idempotent: a committed run is a no-op; a crashed
    append resumes shard by shard via ``write_sharded``'s markers)."""
    meta = _ensure_meta(
        index_uri,
        {
            "ngram": ngram,
            "num_perm": num_perm,
            "bands": bands,
            "num_shards": num_shards,
        },
    )
    run_dir = os.path.join(index_uri, f"run-{run_id}")
    if os.path.exists(os.path.join(run_dir, _RUN_OK)):
        return {"written": [], "skipped": list(range(meta["num_shards"]))}
    rows = _band_rows(
        docs,
        ngram=meta["ngram"],
        num_perm=meta["num_perm"],
        bands=meta["bands"],
        num_shards=meta["num_shards"],
        sigs=sigs,
    )
    res = write_sharded(
        rows, run_dir, shard_col="shard", num_shards=meta["num_shards"]
    )
    commit_run(run_dir)
    return res


def minhash_index_probe(
    index_uri: str,
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.6,
    ngram: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    num_shards: int = 64,
    max_candidates: int = 200,
    sigs: ray.data.Dataset | None = None,
    exclude_run: str | None = None,
) -> ray.data.Dataset:
    """Best index match per new doc: (doc_id, dup_of, est_jaccard) for
    docs whose best signature agreement >= ``threshold``.  Parameters
    default from ``_META.json`` when the index exists.

    ``exclude_run`` drops ``run-<exclude_run>`` from the committed-run
    list: a retried ``incremental_minhash_dedup`` whose previous attempt
    crashed AFTER its append committed would otherwise probe the
    increment against its own rows and flag every doc a self-dup.

    Each shard group loads ONLY its shard directory from every committed
    run (workers share storage — the object-store read pattern).  A
    band key collided by > ``max_candidates`` index rows is truncated to
    the ``max_candidates`` smallest doc_ids: such a key means a
    mega-cluster of identical content, and the minimal ids are exactly
    the deterministic representatives rule 1 would pick anyway."""
    meta = _load_meta(index_uri) or {
        "ngram": ngram,
        "num_perm": num_perm,
        "bands": bands,
        "num_shards": num_shards,
    }
    runs = committed_runs(index_uri)
    if exclude_run is not None:
        skip = f"run-{exclude_run}"
        runs = [r for r in runs if os.path.basename(r) != skip]
    npm = int(meta["num_perm"])

    rows = _band_rows(
        docs,
        ngram=meta["ngram"],
        num_perm=npm,
        bands=meta["bands"],
        num_shards=meta["num_shards"],
        sigs=sigs,
    )

    empty = pd.DataFrame(
        {"doc_id": [], "dup_of": [], "est_jaccard": []}
    ).astype({"doc_id": "int64", "dup_of": "int64", "est_jaccard": "float64"})

    skip_name = None if exclude_run is None else f"run-{exclude_run}"

    def _shard_files(run_list: list, s: int) -> list:
        files = []
        for r in run_list:
            d = shard_path(r, s)
            if not is_complete(d):  # pragma: no cover - committed_runs gates
                continue
            files += [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
        return files

    def _resolve_runs() -> list:
        return [
            r
            for r in committed_runs(index_uri)
            if os.path.basename(r) != skip_name
        ]

    def probe_shard(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or not runs:
            return empty
        s = int(df["shard"].iloc[0])
        # A merge_runs racing this probe can delete captured source runs
        # before or during the read. merge commits the merged run FIRST,
        # so whenever a captured run's marker is gone, a freshly
        # re-resolved committed-run list is complete again (it includes
        # the merged run). Two triggers: a dead marker detected up
        # front (silent-skip window — is_complete would just skip the
        # vanished run), or FileNotFoundError mid-read (deletion raced
        # the listing). Workers share the index storage, so the re-list
        # sees the post-merge state; 3 attempts bound repeated merges.
        run_list, idx, last_err = list(runs), None, None
        for _ in range(3):
            if any(
                not os.path.exists(os.path.join(r, _RUN_OK)) for r in run_list
            ):
                run_list = _resolve_runs()
            try:
                files = _shard_files(run_list, s)
                idx = (
                    pa.concat_tables(pq.read_table(f) for f in files)
                    if files
                    else None
                )
                break
            except FileNotFoundError as e:  # pragma: no cover - race window
                last_err = e
                run_list = _resolve_runs()
        else:  # pragma: no cover - race window
            raise last_err
        if idx is None or idx.num_rows == 0:
            return empty
        ikey = idx["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        iid = idx["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isig = np.asarray(
            idx["sig"].combine_chunks().flatten(), dtype=np.uint64
        ).reshape(-1, npm)
        io = np.lexsort((iid, ikey))  # (band_key, doc_id) — determinism
        ikey, iid, isig = ikey[io], iid[io], isig[io]

        pkey = df["band_key"].to_numpy().astype(np.uint64)
        pid = df["doc_id"].to_numpy().astype(np.int64)
        psig = np.stack(df["sig"].to_numpy()).astype(np.uint64)
        lo = np.searchsorted(ikey, pkey, side="left")
        hi = np.searchsorted(ikey, pkey, side="right")
        cnt = np.minimum(hi - lo, max_candidates)
        m = cnt > 0
        if not m.any():
            return empty
        lo, cnt = lo[m], cnt[m]
        # expand collision ranges: index row positions per probe row
        starts = np.repeat(lo, cnt)
        offs = np.arange(cnt.sum()) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        ipos = starts + offs
        prow = np.repeat(np.flatnonzero(m), cnt)
        est = (psig[prow] == isig[ipos]).mean(axis=1)
        cand = pd.DataFrame(
            {"doc_id": pid[prow], "dup_of": iid[ipos], "est_jaccard": est}
        )
        # per-doc best within this shard: max est, then min index doc_id
        cand = cand.sort_values(
            ["doc_id", "est_jaccard", "dup_of"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return cand.drop_duplicates("doc_id", keep="first")

    best = rows.groupby("shard").map_groups(probe_shard, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty
        df = df.sort_values(
            ["doc_id", "est_jaccard", "dup_of"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("doc_id", keep="first")
        return df[df["est_jaccard"] >= threshold].reset_index(drop=True)

    # final reduce: one doc-bucket exchange over per-shard bests
    # (bounded by #docs-with-candidates rows, <= bands per doc)
    def add_dbucket(batch: pa.Table) -> pa.Table:
        k = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "dbucket",
            pa.array(
                ((k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)).astype(
                    np.int32
                )
            ),
        )

    return (
        best.map_batches(
            add_dbucket, batch_format="pyarrow", batch_size=262_144
        )
        .groupby("dbucket")
        .map_groups(
            lambda d: finish(d.drop(columns=["dbucket"])),
            batch_format="pandas",
        )
    )


def incremental_minhash_dedup(
    index_uri: str,
    run_id: str,
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.6,
    ngram: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Probe + within-increment resolve + append, returning one row per
    increment doc: (doc_id, is_dup, dup_of, est_jaccard).  ``dup_of`` is
    -1 for kept docs; ``est_jaccard`` is the matched agreement (0.0 for
    kept docs).  Rules 1-3 of the module docstring.

    Scale shape: nothing corpus-sized touches the driver.  The resolve
    is TWO narrow doc_id-bucket exchanges over near-dup-DENSITY-sized
    inputs (index hits + LSH pairs), plus the probe's shard exchange and
    the pair generation it composes: (a) pairs whose doc_a is itself an
    index dup are dropped by a tagged-union bucket join keyed on doc_a;
    (b) one doc_id-keyed exchange both picks the best surviving partner
    per doc (max est, min doc_a) and re-attaches flags to the full
    increment id stream with rule-1 precedence.  The probe dataset
    captures the committed-run list BEFORE the append AND excludes
    ``run-<run_id>`` explicitly, so neither laziness nor a retried
    crashed-but-committed append can make the increment match itself.

    Concurrency contract: ``merge_runs`` may race PROBES (they
    re-resolve the committed-run list when captured runs vanish) but
    must not run while an increment with a committed-but-unfinished
    append is still probing — a merge that absorbs ``run-<run_id>``
    into a merged run would defeat the self-exclusion.  Sequence
    compactions between increments (as ``pipelines/continuous.py``
    does)."""
    params = dict(
        ngram=ngram, num_perm=num_perm, bands=bands, num_shards=num_shards
    )
    nb = 64
    mix = np.uint64(0x9E3779B97F4A7C15)

    def _bucket(batch: pa.Table, col: str) -> pa.Table:
        k = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bkt", pa.array(((k * mix) % np.uint64(nb)).astype(np.int32))
        )

    # ONE shingle pass: the signature stream (~0.5 KB/doc, far smaller
    # than the text) is materialized once and feeds the probe, the
    # within-increment pair generation, the append, AND the id stream —
    # the raw docs are read exactly once.
    sigs = minhash_signatures(docs, ngram=ngram, num_perm=num_perm).materialize()

    # rule 1 hits (committed-run list is captured here, pre-append, AND
    # run-<run_id> is excluded explicitly — so neither laziness nor a
    # retry after a crashed-but-committed append can make the increment
    # match itself)
    hits = minhash_index_probe(
        index_uri,
        docs,
        threshold=threshold,
        sigs=sigs,
        exclude_run=run_id,
        **params,
    ).materialize()
    pairs = minhash_lsh_pairs(
        docs,
        ngram=ngram,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
        sigs=sigs,
    )

    # (a) drop pairs whose doc_a is an index dup — tagged union keyed
    # on doc_a, ONE bucket exchange, vectorized isin per bucket
    # batch_size coalesces the (tiny, many-blocked) upstream outputs
    # into few fat blocks before each exchange — the sort-shuffle
    # behind groupby costs ~linearly in input BLOCK COUNT at fixed
    # rows (bucket_hash_join's measured lesson; 840 tiny blocks cost
    # ~30 s here before coalescing, ~1 s after)
    p_tag = pairs.map_batches(
        lambda b: _bucket(
            b.append_column("tag", pa.array(np.ones(b.num_rows, np.int8))),
            "doc_a",
        ),
        batch_format="pyarrow",
        batch_size=262_144,
    ).select_columns(["doc_a", "doc_b", "est_jaccard", "tag", "bkt"])
    h_tag = hits.map_batches(
        lambda b: _bucket(
            pa.table(
                {
                    "doc_a": b["doc_id"],
                    "doc_b": pa.array(np.full(b.num_rows, -1, np.int64)),
                    "est_jaccard": b["est_jaccard"],
                    "tag": pa.array(np.zeros(b.num_rows, np.int8)),
                }
            ),
            "doc_a",
        ),
        batch_format="pyarrow",
        batch_size=262_144,
    )

    def drop_ruled_out(df: pd.DataFrame) -> pd.DataFrame:
        dup_a = df.loc[df["tag"] == 0, "doc_a"].to_numpy(np.int64)
        p = df[df["tag"] == 1]
        if len(dup_a):
            p = p[~p["doc_a"].isin(dup_a)]
        return p[["doc_a", "doc_b", "est_jaccard"]]

    surv = (
        p_tag.union(h_tag)
        .groupby("bkt")
        .map_groups(drop_ruled_out, batch_format="pandas")
    )

    # (b)+(c) in ONE doc_id-keyed exchange: per doc, a rule-1 hit wins;
    # otherwise the best surviving lower-id partner (max est, min doc_a)
    ids = sigs.select_columns(["doc_id"]).map_batches(
        lambda b: _bucket(
            pa.table(
                {
                    "doc_id": b["doc_id"],
                    "dup_of": pa.array(np.full(b.num_rows, -1, np.int64)),
                    "est_jaccard": pa.array(np.zeros(b.num_rows, np.float64)),
                    "rule": pa.array(np.full(b.num_rows, 9, np.int8)),
                }
            ),
            "doc_id",
        ),
        batch_format="pyarrow",
        batch_size=262_144,
    )
    h_flag = hits.map_batches(
        lambda b: _bucket(
            b.append_column("rule", pa.array(np.ones(b.num_rows, np.int8))),
            "doc_id",
        ),
        batch_format="pyarrow",
        batch_size=262_144,
    ).select_columns(["doc_id", "dup_of", "est_jaccard", "rule", "bkt"])
    s_flag = surv.map_batches(
        lambda b: _bucket(
            pa.table(
                {
                    "doc_id": b["doc_b"],
                    "dup_of": b["doc_a"],
                    "est_jaccard": b["est_jaccard"],
                    "rule": pa.array(np.full(b.num_rows, 2, np.int8)),
                }
            ),
            "doc_id",
        ),
        batch_format="pyarrow",
        batch_size=262_144,
    )

    # rule 3: the WHOLE increment enters the index (chains across runs)
    minhash_index_append(index_uri, run_id, docs, sigs=sigs, **params)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # rule asc, then est desc / dup_of asc within rule 2 — one sort
        # implements both the precedence and the best-partner tiebreak
        df = df.sort_values(
            ["doc_id", "rule", "est_jaccard", "dup_of"],
            ascending=[True, True, False, True],
            kind="mergesort",
        ).drop_duplicates("doc_id", keep="first")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "is_dup": (df["rule"] < 9).to_numpy(),
                "dup_of": df["dup_of"].astype(np.int64),
                "est_jaccard": df["est_jaccard"].astype(np.float64),
            }
        )

    return (
        ids.union(h_flag)
        .union(s_flag)
        .groupby("bkt")
        .map_groups(
            lambda d: resolve(d.drop(columns=["bkt"])), batch_format="pandas"
        )
    )
