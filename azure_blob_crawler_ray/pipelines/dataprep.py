"""Training-data preparation operators over a `documents` table
(doc_id, text, ...) — the large-scale pipeline ops a 100 TB corpus needs
on top of the reference's ingest semantics: text analysis, fingerprints
and the deduplication family (exact, MinHash+LSH, SimHash, n-gram
Jaccard).

Everything is ``Dataset -> Dataset`` over Arrow batches. Design notes per
operator explain the partitioning assumption that makes it scale: the
only all-to-all exchanges are groupbys on content-hash / band-key /
shingle-hash — all uniformly distributed keys — and every per-batch
function is vectorized (pyarrow.compute / numpy); per-Python-row work is
bounded by shingle extraction, which is inherent to the operator.

Reference tie-in: the reference's only dedup story is deterministic doc
ids + idempotent upsert (ref shared/processing/document_processor.py:328,
shared/azure_clients/search_client.py:71-121, SURVEY.md §2.7 D1); the
near-dup family generalizes it for corpus curation.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.textstats import (
    char_count,
    hashed_shingles,
    md5_hex,
    occurrences,
    punct_count,
    rolling_fingerprint,
    upper_count,
    word_count,
)
from ..hashing import hash64
from ..tokenizer import Tokenizer

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _pool_size(lo: int = 1, floor: int = 8) -> tuple:
    """Actor-pool bounds sized to the cluster at call time: a fixed
    (1, 8) cap idles 3/4 of a 32-CPU node through a CPU-bound stage."""
    ncpu = int(ray.cluster_resources().get("CPU", floor)) if ray.is_initialized() else floor
    return (lo, max(floor, ncpu))


def _pairs_within_runs(
    starts: np.ndarray, lens: np.ndarray, max_n: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Global (i, j) index pairs for all-pairs WITHIN each run of a
    sorted array, runs given by (starts, lens); runs longer than
    ``max_n`` are skipped (callers handle them separately). Vectorized
    by batching runs of identical length — one triu per DISTINCT length
    (≤ max_n iterations) instead of one Python iteration per run
    (millions at corpus scale)."""
    keep = (lens >= 2) & (lens <= max_n)
    if not keep.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z
    s, l = starts[keep], lens[keep]
    out_a, out_b = [], []
    for L in np.unique(l):
        rs = s[l == L]
        ia, ib = np.triu_indices(int(L), k=1)
        out_a.append((rs[:, None] + ia[None, :]).ravel())
        out_b.append((rs[:, None] + ib[None, :]).ravel())
    return np.concatenate(out_a), np.concatenate(out_b)


def _pack_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack (doc_a, doc_b) id pairs into one uint64 key for vectorized
    local combines. PRECONDITION: ids in [0, 2^32) — distinct pairs
    would silently collide otherwise, so this is a hard check, not a
    documented assumption. Corpora with wider ids should re-key docs
    (e.g. dense rank of the content hash) before the dedup family."""
    if len(a) and (
        min(int(a.min()), int(b.min())) < 0
        or max(int(a.max()), int(b.max())) >= 1 << 32
    ):
        raise ValueError(
            "doc ids must be in [0, 2**32) for packed-pair dedup keys; "
            "re-key the corpus (dense rank) before near-dup pair generation"
        )
    return (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _fan_out(ds: ray.data.Dataset, target_rows: int = 128) -> ray.data.Dataset:
    """Split oversized blocks so per-row stages parallelize: a table read
    from one parquet file can arrive as ~1 block, which serializes every
    downstream stage. Uses the STREAMING row-count split (local block
    slicing), not ``repartition(n)`` — that variant is an all-to-all
    exchange and measured ~25% of the whole minhash wall at sf0.1."""
    return ds.repartition(target_num_rows_per_block=target_rows)




def text_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc integer quality counters (SQL-verifiable): word, punct,
    uppercase and char counts. One vectorized map_batches, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "word_count": pc.cast(word_count(t), pa.int64()),
                "punct_count": pc.cast(punct_count(t), pa.int64()),
                "upper_count": pc.cast(upper_count(t), pa.int64()),
                "char_count": pc.cast(char_count(t), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Heuristic quality score in [0,1] from vectorized counters:
    penalizes very short docs, punctuation-free walls of text, and
    shouting. Engine-side only (float score; the integer inputs are the
    SQL-checked surface in ``text_stats``)."""

    def fn(batch: pa.Table) -> pa.Table:
        wc = word_count(batch["text"]).to_numpy().astype(np.float64)
        punct = punct_count(batch["text"]).to_numpy().astype(np.float64)
        upper = upper_count(batch["text"]).to_numpy().astype(np.float64)
        chars = char_count(batch["text"]).to_numpy().astype(np.float64)
        length_score = np.clip(wc / 50.0, 0.0, 1.0)
        punct_score = np.clip(punct / np.maximum(wc / 15.0, 1.0), 0.0, 1.0)
        shout_penalty = np.clip(1.0 - upper / np.maximum(chars, 1.0) * 10.0, 0.0, 1.0)
        score = (length_score + punct_score + shout_penalty) / 3.0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "quality": pa.array(score, type=pa.float64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# language-ID marker terms: deterministic occurrence-count rule shared
# with the SQL oracle (the real-world analogue is an n-gram profile; the
# synthetic corpus has no language signal, so the RULE is the operator).
LANG_MARKERS: List[Tuple[str, str]] = [("the", "en"), ("data", "de"), ("join", "fr")]


def langid(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Marker-occurrence language ID: argmax of per-language marker
    counts, earlier marker wins ties, 'und' when all zero."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        counts = [occurrences(t, term).to_numpy().astype(np.int64) for term, _ in LANG_MARKERS]
        n = len(counts[0])
        pred = np.full(n, "und", dtype=object)
        best = np.zeros(n, dtype=np.int64)
        for cnt, (_, lang) in zip(counts, LANG_MARKERS):
            win = cnt > best  # strict: earlier marker keeps ties
            pred[win] = lang
            best = np.maximum(best, cnt)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(pred.tolist(), type=pa.string()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Content fingerprints: md5 hex (SQL-verifiable) + 64-bit rolling
    hash (engine-side lineage key)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fp": pa.array(md5_hex(texts), type=pa.string()),
                "fp_roll": pa.array(rolling_fingerprint(texts)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def token_count_bpe(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Tokenizer-based token counts (the chunker's token budget currency,
    ref shared/utils/chunking.py:42-56). Stateful tokenizer per actor."""

    class Counter:
        def __init__(self):
            self.tok = Tokenizer()

        def __call__(self, batch: pa.Table) -> pa.Table:
            counts = [self.tok.count_tokens(t) for t in batch["text"].to_pylist()]
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "bpe_tokens": pa.array(counts, type=pa.int64()),
                }
            )

    return docs.map_batches(Counter, batch_format="pyarrow", concurrency=_pool_size())


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact content dedup: hash-partition by md5(text), keep the lowest
    doc_id per group (D1 generalized). The groupby key is a uniform
    content hash, so the shuffle is skew-free by construction; the text
    column is dropped BEFORE the shuffle (only doc_id+fp move)."""

    def fp_fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fp": pa.array(md5_hex(batch["text"].to_pylist()), type=pa.string()),
            }
        )

    return (
        docs.map_batches(fp_fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="dup_count"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: ray.data.Dataset,
    *,
    ngram: int = 5,
    num_perm: int = 64,
) -> ray.data.Dataset:
    """doc_id -> MinHash signature + shingle count (Broder '97 resemblance
    sketch). Shingle extraction is the per-row cost; the k permutations
    are one vectorized (num_shingles × num_perm) min-reduce per doc."""
    a, b = _minhash_params(num_perm)

    docs = _fan_out(docs)

    class Sig:
        def __init__(self):
            self.a, self.b = a, b

        def __call__(self, batch: pa.Table) -> pa.Table:
            # batched: ONE vectorized shingle-hash pass over the whole
            # batch (hashed_shingles: sliding-window polynomial + mix),
            # one (total_shingles × num_perm) permutation pass, per-doc
            # min via np.minimum.reduceat — zero per-doc Python
            x, sizes = hashed_shingles(batch["text"].to_pylist(), ngram)
            n = len(sizes)
            sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
            nonempty = np.flatnonzero(sizes)
            if len(x):
                v = (x[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
                starts = np.cumsum(sizes[nonempty]) - sizes[nonempty]
                sig[nonempty] = np.minimum.reduceat(v, starts, axis=0)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "sig": pa.FixedSizeListArray.from_arrays(
                        pa.array(sig.ravel(), type=pa.uint64()), num_perm
                    ),
                    "n_shingles": pa.array(sizes),
                }
            )

    return docs.map_batches(Sig, batch_format="pyarrow", concurrency=_pool_size())


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) uint64 signature matrix -> (n, bands) uint64 band
    keys: each band's rows mixed with the golden-ratio multiplier, the
    band index folded into the top byte so key equality implies SAME
    band. Shared by the batch LSH (``minhash_lsh_pairs``) and the
    incremental index (``incdedup``) so their collision semantics are
    identical by construction."""
    n, num_perm = sig.shape
    rows_per_band = num_perm // bands
    keys = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows_per_band):
        col = sig[:, np.arange(bands) * rows_per_band + r]
        keys = keys * np.uint64(0x9E3779B97F4A7C15) + col
    return keys ^ (np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(56))


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    *,
    ngram: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.6,
    sigs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by MinHash banding (Leskovec et al., MMDS ch.3):
    band-key groupby generates candidates; estimated Jaccard =
    signature-agreement fraction filters them. Returns
    (doc_a, doc_b, est_jaccard) with doc_a < doc_b.

    Scale shape: the only shuffle is groupby(band, band_key) — band keys
    are hashes, uniform. Buckets up to ``max_bucket`` emit all O(g²)
    pairs (normal LSH); a pathological bucket (thousands of identical
    docs) degrades to the star pattern — pairs against the group's
    minimum doc_id only — which still suffices for keep-one dedup.

    ``sigs``: pre-computed ``minhash_signatures`` output to reuse (the
    shingle pass dominates; callers composing several sketch consumers
    — e.g. the incremental index — pay it once)."""
    if sigs is None:
        sigs = minhash_signatures(docs, ngram=ngram, num_perm=num_perm)

    num_gbuckets = 64

    def band_explode(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(-1, num_perm)
        n = sig.shape[0]
        doc_ids = batch["doc_id"].to_numpy()
        out_doc = np.repeat(doc_ids, bands)
        bkey = band_keys(sig, bands)
        flat_sig = np.repeat(sig, bands, axis=0).ravel()
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "band_key": pa.array(bkey.ravel()),
                "gbucket": pa.array(
                    (bkey.ravel() % np.uint64(num_gbuckets)).astype(np.int32)
                ),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat_sig, type=pa.uint64()), num_perm
                ),
            }
        )

    max_bucket = 200

    def bucket_pairs(df):
        """One call per coarse gbucket (64 total): vectorized run
        detection over sorted band_key, per-run pair generation."""
        import pandas as pd

        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"}
        )
        if len(df) < 2:
            return empty
        df = df.sort_values(["band_key", "doc_id"], kind="mergesort")
        bk = df["band_key"].to_numpy().astype(np.uint64)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        sigm = np.stack(df["sig"].to_numpy())
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        lens = np.diff(np.r_[starts, len(bk)])
        # normal buckets: all pairs, batched by distinct run length —
        # one row-wise signature-agreement pass over every pair at once
        gi, gj = _pairs_within_runs(starts, lens, max_bucket)
        out_a = [ids[gi]]
        out_b = [ids[gj]]
        out_e = [(sigm[gi] == sigm[gj]).mean(axis=1)]
        # pathological buckets (> max_bucket identical-band docs): star
        # pattern against the run's min-id doc — rare, looped
        for s, n in zip(starts[lens > max_bucket], lens[lens > max_bucket]):
            out_a.append(np.full(n - 1, ids[s], dtype=np.int64))
            out_b.append(ids[s + 1 : s + n])
            out_e.append((sigm[s + 1 : s + n] == sigm[s]).mean(axis=1))
        doc_a = np.concatenate(out_a)
        if not len(doc_a):
            return empty
        return pd.DataFrame(
            {
                "doc_a": doc_a,
                "doc_b": np.concatenate(out_b),
                "est_jaccard": np.concatenate(out_e).astype(np.float64),
            }
        )

    def combine_pairs(df):
        """Collapse the same pair surfacing from several bands (keep max
        estimate), vectorized over a packed pair key."""
        import pandas as pd

        pair = _pack_pairs(df["doc_a"].to_numpy(), df["doc_b"].to_numpy())
        est = df["est_jaccard"].to_numpy()
        uniq, inv = np.unique(pair, return_inverse=True)
        best = np.zeros(len(uniq))
        np.maximum.at(best, inv, est)
        keep = best >= threshold
        return pd.DataFrame(
            {
                "doc_a": (uniq[keep] >> np.uint64(32)).astype(np.int64),
                "doc_b": (uniq[keep] & np.uint64(0xFFFFFFFF)).astype(np.int64),
                "est_jaccard": best[keep],
            }
        )

    def add_pbucket(batch: pa.Table) -> pa.Table:
        key = (
            batch["doc_a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + batch["doc_b"].to_numpy().astype(np.uint64)
        )
        return batch.append_column(
            "pbucket", pa.array((key % np.uint64(64)).astype(np.int32))
        )

    # batch_size coalesces the many small signature blocks (_fan_out
    # makes ~128-row blocks for shingle parallelism) into few fat blocks
    # before each exchange — the groupby sort-shuffle costs ~linearly in
    # input BLOCK COUNT at fixed rows (bucket_hash_join's measured
    # lesson). 65k band rows ≈ 35 MB with the riding signatures.
    return (
        sigs.map_batches(band_explode, batch_format="pyarrow", batch_size=65_536)
        .groupby("gbucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(add_pbucket, batch_format="pyarrow", batch_size=262_144)
        .groupby("pbucket")
        .map_groups(combine_pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_signatures(docs: ray.data.Dataset, *, ngram: int = 3) -> ray.data.Dataset:
    """64-bit SimHash (Charikar '02) over hashed character n-grams."""
    docs = _fan_out(docs)

    def fn(batch: pa.Table) -> pa.Table:
        # batched: one vectorized shingle-hash pass, one bit-unpack,
        # per-doc bit votes via np.add.reduceat over segment boundaries
        h, sizes = hashed_shingles(batch["text"].to_pylist(), ngram)
        out = np.zeros(batch.num_rows, dtype=np.uint64)
        nonempty = np.flatnonzero(sizes)
        if len(h):
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
            ).astype(np.int64)
            starts = np.cumsum(sizes[nonempty]) - sizes[nonempty]
            ones = np.add.reduceat(bits, starts, axis=0)  # (k, 64)
            vote = 2 * ones - sizes[nonempty][:, None]  # ones - zeros
            out[nonempty] = np.bitwise_or.reduce(
                (vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :],
                axis=1,
            )
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out)})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_pairs_exact(
    docs: ray.data.Dataset, *, ngram: int = 3, max_hamming: int = 3
) -> pd.DataFrame:
    """Driver-side EXACT Hamming baseline for the quality gates:
    brute-force all-pairs popcount over the same ``simhash_signatures``
    the distributed operator uses (chunked 8-bit-LUT popcount, so n in
    the thousands stays in memory).  A measurement tool for small n —
    the pigeonhole candidate generation in ``simhash_pairs`` should
    match it exactly (recall 1.0 / precision 1.0)."""
    sig = simhash_signatures(docs, ngram=ngram).to_pandas()
    h = sig["simhash"].to_numpy().astype(np.uint64)
    ids = sig["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    h, ids = h[order], ids[order]
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
        1
    ).astype(np.uint8)
    rows_a: list = []
    rows_b: list = []
    rows_h: list = []
    n = len(h)
    for lo in range(0, n, 512):
        hi = min(lo + 512, n)
        x = h[lo:hi, None] ^ h[None, :]
        ham = (
            lut[x.view(np.uint8)].reshape(hi - lo, n, 8).sum(2, dtype=np.int64)
        )
        ia, ib = np.nonzero(ham <= max_hamming)
        keep = (lo + ia) < ib  # upper triangle only (a < b by sorted id)
        rows_a.extend(ids[lo + ia[keep]].tolist())
        rows_b.extend(ids[ib[keep]].tolist())
        rows_h.extend(ham[ia[keep], ib[keep]].tolist())
    return pd.DataFrame(
        {"doc_a": rows_a, "doc_b": rows_b, "hamming": rows_h}
    ).astype("int64")


def simhash_pairs(
    docs: ray.data.Dataset, *, ngram: int = 3, max_hamming: int = 3
) -> ray.data.Dataset:
    """Near-dup pairs with Hamming distance ≤ max_hamming. Block-permuted
    candidate generation (Manku et al., WWW'07): split the 64-bit hash
    into ``max_hamming + 1`` blocks (pigeonhole: any pair within distance
    d agrees exactly on ≥1 of d+1 blocks), so groupby(block_idx,
    block_value) finds all candidates; verify exact Hamming inside the
    group. Block widths are ⌈64/(d+1)⌉-balanced, so the completeness
    guarantee holds for ANY max_hamming < 64, not just the classic 4×16
    split for d=3."""
    if not 0 <= max_hamming < 64:
        raise ValueError("max_hamming must be in [0, 64)")
    sigs = simhash_signatures(docs, ngram=ngram)
    num_gbuckets = 64
    nblocks = max_hamming + 1
    bounds = np.linspace(0, 64, nblocks + 1).astype(np.uint64)  # block bit ranges

    def block_explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        doc_ids = batch["doc_id"].to_numpy()
        cols = []
        for b in range(nblocks):
            lo, hi = bounds[b], bounds[b + 1]
            width = hi - lo
            mask = (np.uint64(1) << width) - np.uint64(1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
            cols.append((h >> lo) & mask)
        blocks = np.stack(cols, axis=1).astype(np.uint64)
        # fold the block index into the key (block widths are ≤ 32 bits
        # whenever nblocks ≥ 2, so bit 56 is free; a single block needs
        # no index); coarse gbucket drives the shuffle
        if nblocks > 1:
            bkey = blocks | (
                np.arange(nblocks, dtype=np.uint64)[None, :] << np.uint64(56)
            )
        else:
            bkey = blocks
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, nblocks)),
                "bkey": pa.array(bkey.ravel()),
                "gbucket": pa.array(
                    ((bkey.ravel() * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_gbuckets)).astype(np.int32)
                ),
                "simhash": pa.array(np.repeat(h, nblocks)),
            }
        )

    def verify(df):
        """One call per coarse gbucket: run detection over sorted bkey,
        exact Hamming verification per run, local pair dedup (min
        hamming) on a packed pair key."""
        import pandas as pd

        empty = pd.DataFrame(
            {"doc_a": [], "doc_b": [], "hamming": [], "pbucket": []}
        ).astype("int64")
        if len(df) < 2:
            return empty
        df = df.sort_values(["bkey", "doc_id"], kind="mergesort").drop_duplicates(
            ["bkey", "doc_id"]
        )
        bk = df["bkey"].to_numpy().astype(np.uint64)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        h = df["simhash"].to_numpy().astype(np.uint64)
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        lens = np.diff(np.r_[starts, len(bk)])
        gi, gj = _pairs_within_runs(starts, lens, int(lens.max()))
        if not len(gi):
            return empty
        x = h[gi] ^ h[gj]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        ham = ham[keep]
        pair = _pack_pairs(ids[gi[keep]], ids[gj[keep]])
        uniq, inv = np.unique(pair, return_inverse=True)
        best = np.full(len(uniq), 65, dtype=np.int64)
        np.minimum.at(best, inv, ham)
        return pd.DataFrame(
            {
                "doc_a": (uniq >> np.uint64(32)).astype(np.int64),
                "doc_b": (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
                "hamming": best,
                "pbucket": (uniq % np.uint64(num_gbuckets)).astype(np.int64),
            }
        )

    def combine(df):
        import pandas as pd

        pair = _pack_pairs(df["doc_a"].to_numpy(), df["doc_b"].to_numpy())
        uniq, inv = np.unique(pair, return_inverse=True)
        best = np.full(len(uniq), 65, dtype=np.int64)
        np.minimum.at(best, inv, df["hamming"].to_numpy().astype(np.int64))
        return pd.DataFrame(
            {
                "doc_a": (uniq >> np.uint64(32)).astype(np.int64),
                "doc_b": (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
                "hamming": best,
            }
        )

    return (
        sigs.map_batches(
            block_explode, batch_format="pyarrow", batch_size=262_144
        )
        .groupby("gbucket")
        .map_groups(verify, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(combine, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index formulation)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    *,
    ngram: int = 5,
    threshold: float = 0.5,
    max_posting: int = 2000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT n-gram Jaccard similarity ≥ threshold, computed distributed
    without ever comparing texts directly (inverted-index formulation):

      doc -> (shingle_hash, doc_id, set_size)        [map_batches]
      groupby(shingle % num_buckets)                 [ONE coarse shuffle:
        -> co-occurring pairs per shingle run         per-bucket pair gen
           (vectorized triu per run)                  is numpy, not
                                                      per-group Python]
      groupby(pair) -> intersection = pair count     [sort-aggregate]
      jaccard = inter / (|a| + |b| - inter)          [exact, no text]

    The shuffle key is a coarse HASH BUCKET of the shingle, not the
    shingle itself — one map_groups call per bucket (64 total), each
    doing vectorized run-detection + pair emission, instead of one
    Python call per distinct shingle. Posting lists longer than
    ``max_posting`` (stop-shingles present in ~every doc) are dropped —
    the standard prefix-filter concession; intersections then undercount
    only by shingles shared with more than ``max_posting`` documents."""

    def explode(batch: pa.Table) -> pa.Table:
        # one vectorized shingle pass; doc_id/set_size by np.repeat
        flat, sizes = hashed_shingles(batch["text"].to_pylist(), ngram)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((flat % np.uint64(num_buckets)).astype(np.int32)),
                "shingle": pa.array(flat),
                "doc_id": pa.array(np.repeat(ids, sizes)),
                "set_size": pa.array(np.repeat(sizes, sizes)),
            }
        )

    def bucket_pairs(df):
        """Per shingle-bucket: vectorized run-wise pair emission, then a
        LOCAL combine (pack pair into one uint64, np.unique with counts)
        — the partial-aggregation step that keeps the second shuffle
        small. Output: one row per distinct pair within this bucket."""
        import pandas as pd

        empty = pd.DataFrame(
            {"pbucket": [], "pair": [], "size_a": [], "size_b": [], "inter": []}
        ).astype({"pbucket": "int32", "pair": "uint64", "size_a": "int64",
                  "size_b": "int64", "inter": "int64"})
        if len(df) < 2:
            return empty
        df = df.sort_values(["shingle", "doc_id"], kind="mergesort")
        sh = df["shingle"].to_numpy().astype(np.uint64)
        ids = df["doc_id"].to_numpy().astype(np.int64)
        sz = df["set_size"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        lens = np.diff(np.r_[starts, len(sh)])
        gi, gj = _pairs_within_runs(starts, lens, max_posting)
        if not len(gi):
            return empty
        pair = _pack_pairs(ids[gi], ids[gj])
        sa = sz[gi]
        sb = sz[gj]
        uniq, first, inter = np.unique(pair, return_index=True, return_counts=True)
        return pd.DataFrame(
            {
                "pbucket": (uniq % np.uint64(num_buckets)).astype(np.int32),
                "pair": uniq,
                "size_a": sa[first],
                "size_b": sb[first],
                "inter": inter.astype(np.int64),
            }
        )

    def combine_pairs(df):
        """Per pair-bucket: sum per-shingle-bucket partial intersections,
        compute exact Jaccard, filter. Vectorized (np.add.at)."""
        import pandas as pd

        pair = df["pair"].to_numpy().astype(np.uint64)
        uniq, inv = np.unique(pair, return_inverse=True)
        inter = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(inter, inv, df["inter"].to_numpy().astype(np.int64))
        first = np.full(len(uniq), -1, dtype=np.int64)
        first[inv[::-1]] = np.arange(len(pair) - 1, -1, -1)
        sa = df["size_a"].to_numpy().astype(np.int64)[first]
        sb = df["size_b"].to_numpy().astype(np.int64)[first]
        jac = inter / (sa + sb - inter)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": (uniq[keep] >> np.uint64(32)).astype(np.int64),
                "doc_b": (uniq[keep] & np.uint64(0xFFFFFFFF)).astype(np.int64),
                "jaccard": jac[keep],
            }
        )

    return (
        _fan_out(docs)
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(combine_pairs, batch_format="pandas")
    )


def term_frequencies(
    docs: ray.data.Dataset, *, top_k: int = 50
) -> ray.data.Dataset:
    """Corpus vocabulary statistics: top-k terms by total occurrence.

    The scale shape is the word-count archetype done right: terms are
    counted WITHIN each batch first (one np.unique per batch — the
    map-side combiner), so the groupby shuffle moves one row per
    (term × batch), not one per token. Ties in the top-k break by term
    (deterministic)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        # vectorized tokenization + count: split on whitespace, flatten,
        # Arrow value_counts — tokens never become Python objects
        tokens = _pc.split_pattern_regex(batch["text"], r"\s+")
        flat = tokens.combine_chunks().flatten() if isinstance(
            tokens, pa.ChunkedArray
        ) else tokens.flatten()
        vc = _pc.value_counts(flat)
        terms = vc.field("values")
        counts = vc.field("counts")
        keep = _pc.not_equal(terms, "")
        return pa.table(
            {
                "term": terms.filter(keep),
                "occurrences": pc.cast(counts.filter(keep), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("occurrences", alias_name="occurrences"))
        .sort(["occurrences", "term"], descending=[True, False])
        .limit(top_k)
    )


def length_stats_by_lang(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-language length order statistics (min / median / max of
    n_chars). Median is computed exactly per group — groups are
    language-sized (small); the groupby is the only shuffle."""
    import pandas as pd

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["n_chars"].to_numpy().astype(np.int64))
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "n_docs": [len(v)],
                "min_chars": [int(v[0])],
                "median_chars": [float(np.median(v))],
                "max_chars": [int(v[-1])],
            }
        )

    return (
        docs.select_columns(["lang", "n_chars"])
        .groupby("lang")
        .map_groups(stats, batch_format="pandas")
        .sort("lang")
    )


# ---------------------------------------------------------------------------
# deterministic sampling / splits / packing (training-data plumbing)
# ---------------------------------------------------------------------------


def stable_split(
    docs: ray.data.Dataset, *, val_pct: int = 10
) -> ray.data.Dataset:
    """Deterministic train/val assignment by content hash: a document
    lands in 'val' iff its md5 bucket (first 2 hex chars, 0-255) falls
    below val_pct% of 256. Content-keyed, so the split survives
    re-sharding, re-ordering and incremental appends — the property
    row-number splits lack. No shuffle; one vectorized map."""
    threshold = (val_pct * 256) // 100

    def fn(batch: pa.Table) -> pa.Table:
        fps = md5_hex(batch["text"].to_pylist())
        buckets = np.array([int(f[:2], 16) for f in fps], dtype=np.int64)
        split = np.where(buckets < threshold, "val", "train")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "split": pa.array(split.tolist(), type=pa.string()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    docs: ray.data.Dataset, *, per_stratum: int = 20, stratum_col: str = "lang"
) -> ray.data.Dataset:
    """Deterministic stratified sample: the ``per_stratum`` documents
    with the lowest md5(text) per stratum — a content-keyed 'random'
    order that every engine reproduces. One groupby(stratum) shuffle of
    (id, stratum, fp) rows only."""

    def fp_fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                stratum_col: batch[stratum_col],
                "fp": pa.array(md5_hex(batch["text"].to_pylist()), type=pa.string()),
            }
        )

    def head_fn(df):
        return df.sort_values(["fp", "doc_id"], kind="mergesort").head(per_stratum)

    return (
        docs.map_batches(fp_fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(stratum_col)
        .map_groups(head_fn, batch_format="pandas")
        .sort(["fp", "doc_id"])
    )


def pack_sequences(
    docs: ray.data.Dataset, *, capacity: int = 500, token_cost=None
) -> ray.data.Dataset:
    """Sequence packing for training batches: documents (ordered by
    doc_id) fill contiguous bins of ~``capacity`` whitespace tokens —
    bin = floor(preceding cumulative tokens / capacity). The cumulative
    prefix is what makes this deterministic and SQL-checkable; a true
    best-fit packer is order-dependent and engine-specific.

    Hierarchical prefix sum — nothing row-scale ever reaches the driver:

      1. project to (doc_id, tokens), sort by doc_id, MATERIALIZE the
         narrow projection (distributed, fixes the block set so both
         passes below see identical batches);
      2. pass 1: one summary row per block (block min doc_id + token
         subtotal) — driver pulls #blocks rows, computes exclusive
         prefix offsets keyed by the block's min doc_id;
      3. pass 2: broadcast the tiny offset map (ray.put, read once per
         task); each block does a local cumsum + its broadcast offset.

    Assumes doc_id is unique (it is the corpus primary key).

    ``token_cost`` (optional): fn(batch: pa.Table) -> int64 pa.Array of
    per-doc token costs, replacing the default whitespace word count —
    the seam ``pack_interleaved`` uses to price media spans in."""

    def counted(batch: pa.Table) -> pa.Table:
        toks = (
            token_cost(batch)
            if token_cost is not None
            else pc.cast(word_count(batch["text"]), pa.int64())
        )
        return pa.table({"doc_id": batch["doc_id"], "tokens": toks})

    # deterministic global order by doc_id; materialize the narrow
    # 2-column projection so pass 1 and pass 2 iterate the SAME blocks
    ordered = (
        docs.map_batches(counted, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
        .materialize()
    )

    def block_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"min_doc": pa.array([], type=pa.int64()),
                             "subtotal": pa.array([], type=pa.int64())})
        toks = batch["tokens"].to_numpy()
        return pa.table(
            {
                "min_doc": pa.array([int(batch["doc_id"][0].as_py())], type=pa.int64()),
                "subtotal": pa.array([int(toks.sum())], type=pa.int64()),
            }
        )

    # one row per block -> driver sees #blocks rows, not #docs rows
    summaries = ordered.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    if len(summaries) == 0:  # empty corpus: schema-typed empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "tokens": pa.array([], type=pa.int64()),
                    "bin": pa.array([], type=pa.int64()),
                }
            )
        )
    summaries = summaries.sort_values("min_doc")
    sub = summaries["subtotal"].to_numpy().astype(np.int64)
    offsets = dict(
        zip(
            summaries["min_doc"].to_numpy().astype(np.int64).tolist(),
            (np.cumsum(sub) - sub).tolist(),
        )
    )
    offsets_ref = ray.put(offsets)

    def assign_bins(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "tokens": pa.array([], type=pa.int64()),
                             "bin": pa.array([], type=pa.int64())})
        offs = ray.get(offsets_ref)
        toks = batch["tokens"].to_numpy().astype(np.int64)
        start = offs[int(batch["doc_id"][0].as_py())]
        cum = start + np.cumsum(toks)
        bins = (cum - toks) // capacity
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "tokens": pa.array(toks),
                "bin": pa.array(bins.astype(np.int64)),
            }
        )

    return ordered.map_batches(
        assign_bins, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def pack_interleaved(
    docs: ray.data.Dataset,
    *,
    capacity: int = 800,
    media_every: int = 3,
    media_tokens: int = 64,
) -> ray.data.Dataset:
    """Sequence packing for INTERLEAVED text+media documents (the
    north-star table shape): a document's budget cost is its text token
    count plus its media spans priced at ``media_tokens`` each — the way
    a multimodal training pipeline charges patch/frame embeddings
    against the context window.  The media-span count is derived
    deterministically from the row (doc_id % media_every), keeping the
    packing reproducible from the table alone and SQL-checkable; a real
    span table plugs the same cost in per row via ``token_cost``.

    Same hierarchical prefix-sum as ``pack_sequences`` — nothing
    row-scale reaches the driver."""

    def cost(batch: pa.Table) -> pa.Array:
        wc = pc.cast(word_count(batch["text"]), pa.int64()).to_numpy()
        did = batch["doc_id"].to_numpy().astype(np.int64)
        return pa.array(wc + (did % media_every) * media_tokens)

    return pack_sequences(docs, capacity=capacity, token_cost=cost)


def bigram_counts(docs: ray.data.Dataset, *, top_k: int = 50) -> ray.data.Dataset:
    """Top-k bigram (consecutive-token-pair) frequencies — the n-gram
    statistics pass a corpus LM/quality pipeline runs beside
    ``term_frequencies``.  Same map-side-combine shape: bigrams are
    formed AND counted inside each batch (pure Arrow/numpy — tokens
    never become Python objects), so the shuffle moves one row per
    (bigram × batch).  Ties in the top-k break by bigram text.

    Pair formation is offset arithmetic over the flattened token-list
    array: for each document the pair indices are (i, i+1) within the
    document's [offset, offset+len) slice — np.repeat/arange, no loop."""

    def partial(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern_regex(batch["text"], r"\s+")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        off = tokens.offsets.to_numpy().astype(np.int64)
        vals = tokens.values
        n_pairs = np.maximum(np.diff(off) - 1, 0)
        total = int(n_pairs.sum())
        if total == 0:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "occurrences": pa.array([], type=pa.int64())}
            )
        starts = off[:-1]
        left = (
            np.repeat(starts, n_pairs)
            + np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(n_pairs) - n_pairs, n_pairs)
        )
        lt = vals.take(pa.array(left))
        rt = vals.take(pa.array(left + 1))
        # split_pattern_regex only yields '' at a doc's first/last slot
        # (leading/trailing whitespace); the SQL oracle extracts \S+ so
        # pairs touching those are not real token pairs — mask them.
        ok = pc.and_(pc.not_equal(lt, ""), pc.not_equal(rt, ""))
        bg = pc.binary_join_element_wise(lt.filter(ok), rt.filter(ok), " ")
        vc = pc.value_counts(bg)
        return pa.table(
            {
                "bigram": vc.field("values"),
                "occurrences": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("occurrences", alias_name="occurrences"))
        .sort(["occurrences", "bigram"], descending=[True, False])
        .limit(top_k)
    )


def decontaminate(
    docs: ray.data.Dataset,
    *,
    bench_below: int = 20,
    ngram: int = 13,
) -> ray.data.Dataset:
    """Benchmark decontamination — drop every corpus document that shares
    any ``ngram``-character shingle with the benchmark set (here: docs
    with doc_id < ``bench_below``), the standard eval-leakage filter a
    training corpus goes through before packing.

    Scale shape: the benchmark side is SMALL by definition — its shingle
    set is built once on the driver and broadcast via ``ray.put`` (read
    once per actor, never re-shipped per batch).  The corpus side streams
    through one ``map_batches``: all texts of a batch are concatenated
    into one byte buffer with NUL-gap separators (documents are ASCII;
    NUL never occurs in a real shingle, so cross-document windows cannot
    false-match), a single ``sliding_window_view`` + polynomial dot
    produces every window hash in one vector op, and ``np.isin`` against
    the benchmark hash array flags candidate docs.  Only candidates pay
    an exact (string-level) verify against the benchmark shingle set, so
    hash collisions cannot change the result — output is exact and
    engine-independent."""
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    weights = np.array(
        [pow(257, ngram - 1 - i, 1 << 64) for i in range(ngram)], dtype=np.uint64
    )

    def shingle_hashes(buf: np.ndarray) -> np.ndarray:
        if len(buf) < ngram:
            return np.empty(0, dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(buf, ngram)
        return win.astype(np.uint64) @ weights  # uint64 wrap = the hash

    bench_texts = [
        t
        for t in docs.filter(expr=f"doc_id < {bench_below}")
        .select_columns(["text"])
        .to_pandas()["text"]
        if len(t) >= ngram
    ]
    bench_set = {
        t[i : i + ngram] for t in bench_texts for i in range(len(t) - ngram + 1)
    }
    bench_hashes = np.unique(
        np.concatenate(
            [shingle_hashes(np.frombuffer(t.encode(), dtype=np.uint8))
             for t in bench_texts]
            or [np.empty(0, dtype=np.uint64)]
        )
    )
    ref = ray.put((bench_hashes, bench_set))

    def keep_clean(batch: pa.Table) -> pa.Table:
        hashes, exact = ray.get(ref)
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        corpus = (ids >= bench_below)
        gap = b"\x00" * ngram
        buf = np.frombuffer(gap.join(t.encode() for t in texts), dtype=np.uint8)
        hits = np.zeros(len(texts), dtype=bool)
        if len(buf) >= ngram and len(hashes):
            hv = shingle_hashes(buf)
            flag = np.isin(hv, hashes)
            if flag.any():
                # map window start -> doc index (gaps belong to no doc)
                lens = np.array([len(t.encode()) for t in texts], dtype=np.int64)
                starts = np.concatenate(([0], np.cumsum(lens + ngram)[:-1]))
                for pos in np.flatnonzero(flag):
                    d = int(np.searchsorted(starts, pos, side="right") - 1)
                    if pos + ngram <= starts[d] + lens[d] and corpus[d]:
                        t = texts[d]
                        s = t[pos - starts[d] : pos - starts[d] + ngram]
                        if s in exact:
                            hits[d] = True
        return pa.table(
            {"doc_id": pa.array(ids[corpus & ~hits], type=pa.int64())}
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(keep_clean, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )


def shard_manifest(
    docs: ray.data.Dataset, *, num_shards: int = 16
) -> ray.data.Dataset:
    """Deterministic output sharding manifest — the bookkeeping step
    behind resumable partitioned writes: assign every doc a shard by a
    fixed multiplicative hash of its id and report per-shard row count
    and byte budget.  A failed 100 TB run re-reads this manifest and
    skips finished shards.  Per-batch combine first (num_shards rows per
    batch through the exchange), one tiny groupby after."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shard = (
            (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        ) % np.uint64(num_shards)
        t = pa.table(
            {
                "shard": shard.astype(np.int64),
                "n_docs": np.ones(len(batch), dtype=np.int64),
                "total_chars": pc.cast(batch["n_chars"], pa.int64()),
            }
        )
        return t.group_by("shard").aggregate(
            [("n_docs", "sum"), ("total_chars", "sum")]
        )

    return (
        docs.select_columns(["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .rename_columns({"n_docs_sum": "n_docs", "total_chars_sum": "total_chars"})
        .groupby("shard")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_chars", alias_name="total_chars"))
        .sort("shard")
    )


def top_terms_per_lang(
    docs: ray.data.Dataset, *, k: int = 10
) -> ray.data.Dataset:
    """Grouped top-k over text: the k most frequent terms per language
    with their rank — per-language vocabulary profiles (stopword lists,
    language-model priors) in one pass.

    Shape: per-batch (lang, term) counts via one Arrow value_counts over
    a packed "lang\\x1fterm" key (map-side combine — the shuffle carries
    one row per distinct key per batch, never tokens), a single-key
    groupby sum, then per-language top-k where groups number a handful —
    the only per-group Python calls are per LANGUAGE, not per term."""
    SEP = "\x1f"

    def partial(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern_regex(batch["text"], r"\s+")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        counts = pc.list_value_length(tokens).to_numpy().astype(np.int64)
        langs = pa.array(
            np.repeat(batch["lang"].to_numpy(zero_copy_only=False), counts)
        )
        flat = tokens.values
        keyed = pc.binary_join_element_wise(langs, flat, SEP)
        keep = pc.not_equal(flat, "")
        vc = pc.value_counts(keyed.filter(keep))
        return pa.table(
            {
                "key": vc.field("values"),
                "occurrences": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        split = df["key"].str.split(SEP, n=1, expand=True)
        df = pd.DataFrame(
            {
                "lang": split[0],
                "term": split[1],
                "occurrences": df["occurrences"].to_numpy(),
            }
        ).sort_values(
            ["occurrences", "term"], ascending=[False, True], kind="mergesort"
        )
        df = df.head(k).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    def add_lang(batch: pa.Table) -> pa.Table:
        first = pc.split_pattern(batch["key"], SEP, max_splits=1)
        lang = pc.list_element(first, 0)
        return batch.append_column("lang", lang)

    return (
        docs.select_columns(["lang", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("occurrences", alias_name="occurrences"))
        .map_batches(add_lang, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topk, batch_format="pandas")
        .sort(["lang", "rank"])
    )


def dedup_keep_best(
    docs: ray.data.Dataset,
    *,
    ngram: int = 12,
    threshold: float = 0.5,
    max_posting: int = 200,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Cluster-level canonical selection — the step AFTER near-dup
    detection: connected components over the exact n-gram-Jaccard pair
    graph, then per cluster keep the doc with the most words (ties:
    smallest doc_id); docs in no cluster keep themselves.  Returns the
    surviving doc_ids.

    Shape: cluster assignments are EDGE-sized (isolated docs never enter
    the graph), so the member↔word-count join is a hash join over the
    small near-dup subset; the corpus-sized step is one scan for word
    counts and one doc_id-bucket anti-join shuffle against the loser set
    — no corpus-sized join, no driver materialization."""
    pairs = ngram_jaccard_pairs(
        docs, ngram=ngram, threshold=threshold, max_posting=max_posting
    )
    from .graph import connected_components

    cc = connected_components(pairs)  # (doc_id, cluster_id), edge-sized

    def wc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "wc": pc.cast(word_count(batch["text"]), pa.int64()),
            }
        )

    counts = docs.map_batches(wc, batch_format="pyarrow", zero_copy_batch=True)
    members = cc.join(
        counts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cluster_id", "wc", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        first = np.r_[True, df["cluster_id"].to_numpy()[1:]
                      != df["cluster_id"].to_numpy()[:-1]]
        out = df.loc[~first, ["doc_id"]]
        return out.rename(columns={"doc_id": "loser_id"})

    def add_bucket(batch: pa.Table) -> pa.Table:
        cid = batch["cluster_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((cid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def as_arrow(df: pd.DataFrame) -> pa.Table:
        # typed even for zero-row stub blocks, so the join schema resolves
        vals = df["loser_id"].to_numpy() if "loser_id" in df.columns else []
        return pa.table({"loser_id": pa.array(vals, type=pa.int64())})

    # edge-sized; materialized so the union below streams clean blocks
    # (groupby-inside-union is the known pathological plan shape)
    losing = (
        members.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(losers, batch_format="pandas")
        .map_batches(as_arrow, batch_format="pandas")
        .materialize()
    )

    # anti-join via the coarse-bucket union pattern (native left_anti
    # chokes on the zero-row schema-less stub blocks map_groups emits):
    # tag both sides, one doc_id-bucket shuffle, vectorized np.isin.
    def _idbucket(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(64)
        ).astype(np.int32)

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": ids,
                "is_loser": np.zeros(len(ids), dtype=np.int8),
                "bucket": _idbucket(ids),
            }
        )

    def tag_losers(batch: pa.Table) -> pa.Table:
        ids = batch["loser_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": ids,
                "is_loser": np.ones(len(ids), dtype=np.int8),
                "bucket": _idbucket(ids),
            }
        )

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        flag = df["is_loser"].to_numpy()
        dropped = ids[flag == 1]
        keep = ids[(flag == 0) & ~np.isin(ids, dropped)]
        return pd.DataFrame({"doc_id": keep})

    tagged = (
        docs.select_columns(["doc_id"])
        .map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
        .union(losing.map_batches(tag_losers, batch_format="pyarrow"))
    )
    return (
        tagged.groupby("bucket")
        .map_groups(survivors, batch_format="pandas")
        .sort("doc_id")
    )


def normalize_text(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Text canonicalization — the pre-tokenization cleanup pass every
    corpus pipeline runs before hashing/shingling: lowercase, strip
    sentence punctuation, collapse whitespace runs, trim.  Pure Arrow
    kernels (both Arrow and the SQL oracle compile these regexes with
    RE2, so the semantics match engine-for-engine); no shuffle — a
    stateless streaming map."""

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(batch["text"])
        s = pc.replace_substring_regex(s, pattern=r"[.!?,;:]", replacement="")
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({"doc_id": batch["doc_id"], "norm": s})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def length_histogram(
    docs: ray.data.Dataset, *, bin_width: int = 200
) -> ray.data.Dataset:
    """Fixed-width histogram of document length (the profiling pass a
    curation pipeline runs before choosing length filters): one row per
    occupied ``bin_width``-char bucket with doc count and min/max.

    Shape: pure map-side combine — each batch collapses to (buckets in
    batch) rows before the groupby, so the shuffle moves O(buckets ×
    blocks) rows regardless of corpus size."""

    def partial(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"].to_numpy().astype(np.int64)
        b = n // bin_width
        uniq, inv = np.unique(b, return_inverse=True)
        cnt = np.bincount(inv)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, n)
        np.maximum.at(mx, inv, n)
        return pa.table(
            {
                "bucket_lo": uniq * bin_width,
                "n_docs": cnt.astype(np.int64),
                "min_chars": mn,
                "max_chars": mx,
            }
        )

    return (
        docs.select_columns(["n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket_lo")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("min_chars", alias_name="min_chars"),
            Max("max_chars", alias_name="max_chars"),
        )
        .sort("bucket_lo")
    )


def group_zscore(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-group standardization — z-score of n_chars within each lang
    (the grouped-normalization step feature pipelines need before
    mixing heterogeneous sources).

    Shape: two passes, both cheap — (1) one groupby over per-batch
    integer partials (sum, sum-of-squares, count: exact, order
    independent) producing a LANGUAGES-sized table that is broadcast via
    ``ray.put``; (2) a map-only pass computes z per row.  The float
    formula is fixed as (x - s/n) / sqrt(ss/n - (s/n)^2) from exact
    integer s/ss/n, so any engine reproduces it bit-for-bit (sqrt and
    the divisions are IEEE-correctly-rounded)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "lang": batch["lang"],
                "s": batch["n_chars"],
                "ss": pc.multiply(batch["n_chars"], batch["n_chars"]),
            }
        ).to_pandas()
        g = df.groupby("lang", as_index=False).agg(
            s=("s", "sum"), ss=("ss", "sum"), n=("s", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (
        docs.select_columns(["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    s = stats["s"].to_numpy().astype(np.float64)
    ss = stats["ss"].to_numpy().astype(np.float64)
    n = stats["n"].to_numpy().astype(np.float64)
    mean = s / n
    sd = np.sqrt(ss / n - mean * mean)
    lut = pd.DataFrame({"lang": stats["lang"], "mean": mean, "sd": sd})
    ref = ray.put(lut)

    def score(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        df = batch.to_pandas().merge(lk, on="lang", how="left")
        x = df["n_chars"].to_numpy().astype(np.float64)
        sd_ = df["sd"].to_numpy()
        z = np.where(sd_ > 0, (x - df["mean"].to_numpy()) / sd_, 0.0)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy()),
                "lang": pa.array(df["lang"]),
                "zscore": pa.array(np.round(z, 6)),
            }
        )

    return docs.select_columns(["doc_id", "lang", "n_chars"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def tfidf_top_terms(
    docs: ray.data.Dataset, *, k: int = 5, num_buckets: int = 64
) -> ray.data.Dataset:
    """Per-document top-k terms by TF-IDF (tf × ln(N/df)) — the classic
    keyword-extraction / relevance-weighting operator over a corpus.

    Shape: (1) one tokenization pass emits per-batch (doc, term, tf)
    partials; (2) document frequency is a groupby over per-batch
    DISTINCT (term, doc) rows reduced map-side to (term, partial-df) —
    word-level vocabulary is bounded (Heaps' law), so the resulting df
    table broadcasts via ``ray.put``; (3) scores are computed map-side
    and per-doc top-k uses the coarse-bucket idiom (hash(doc) %
    num_buckets shuffle, vectorized rank inside the bucket).  Ranking
    compares ROUND(score, 6) then term, so ordering is reproducible
    across engines despite last-ulp libm differences."""
    n_docs = float(docs.count())

    def doc_tf(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern_regex(batch["text"], r"\s+")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        counts = pc.list_value_length(tokens).to_numpy().astype(np.int64)
        dids = np.repeat(batch["doc_id"].to_numpy(), counts)
        flat = tokens.values
        keep = pc.not_equal(flat, "")
        pairs = (
            pa.table({"doc_id": pa.array(dids), "term": flat})
            .filter(keep)
            .to_pandas()
        )
        g = (
            pairs.groupby(["doc_id", "term"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        g["tf"] = g["tf"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    tf = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_tf, batch_format="pyarrow", zero_copy_batch=True
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        # rows are already distinct per (doc, term): count docs per term
        vc = pc.value_counts(batch["term"])
        return pa.table(
            {
                "term": vc.field("values"),
                "df": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    df_tbl = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    idf = dict(zip(df_tbl["term"], np.log(n_docs / df_tbl["df"].to_numpy())))
    ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        tfs = batch["tf"].to_numpy().astype(np.float64)
        idf_col = pd.Series(batch["term"].to_pandas()).map(lk).to_numpy()
        scores = np.round(tfs * idf_col, 6)
        uid = batch["doc_id"].to_numpy().astype(np.uint64)
        bucket = (
            (uid * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "term": batch["term"],
                "tfidf": pa.array(scores),
                "bucket": pa.array(bucket),
            }
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["doc_id", "tfidf", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        rank = df.groupby("doc_id").cumcount()
        out = df[rank < k]
        return out[["doc_id", "term", "tfidf"]]

    return (
        tf.map_batches(score, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(topk, batch_format="pandas")
        .sort(["doc_id", "term"])
    )


def source_entropy(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-language Shannon entropy of the source distribution — the
    diversity/balance diagnostic a corpus-curation pipeline reports per
    slice (is a language dominated by one crawl source?).

    Exact int64 (lang, source) counts via map-side combine, ONE shuffle
    of langs x sources x batches partial rows, then the float formula
    H = -sum(p * log2 p) runs once per language on exact integers and is
    rounded to 6 decimals — the same pinned-formula trick as
    ``group_zscore`` (the sum spans a handful of terms, so association
    order cannot move the 6th decimal)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "source": batch["source"].to_pandas(),
            }
        )
        g = df.groupby(["lang", "source"], sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], sort=False)["cnt"].sum().reset_index()
        g = g.sort_values(["lang", "source"], kind="mergesort")
        out = []
        for lang, sub in g.groupby("lang", sort=True):
            c = sub["cnt"].to_numpy().astype(np.float64)
            n = c.sum()
            p = c / n
            h = float(-(p * np.log2(p)).sum())
            out.append((lang, int(n), len(sub), round(h, 6)))
        return pd.DataFrame(
            out, columns=["lang", "n_docs", "n_sources", "entropy"]
        )

    return (
        docs.select_columns(["lang", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(finish, batch_format="pandas")
        .sort("lang")
    )


def lang_sources(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Ordered list aggregation — per language, the comma-joined sorted
    list of DISTINCT sources (SQL string_agg(DISTINCT ... ORDER BY)).
    Deterministic because the join order is pinned to ascending source.

    Shape: per-batch distinct partial folds rows to (lang, source)
    pairs before the exchange; one groupby over langs (tiny), sorted
    join inside the group."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": batch["lang"].to_pandas(), "source": batch["source"].to_pandas()}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        srcs = sorted(df["source"].unique())
        return pd.DataFrame(
            {
                "lang": [df["lang"].iloc[0]],
                "n_sources": np.array([len(srcs)], dtype=np.int64),
                "sources": [",".join(srcs)],
            }
        )

    return (
        docs.select_columns(["lang", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(finish, batch_format="pandas")
        .sort("lang")
    )


def regex_match_stats(
    docs: ray.data.Dataset,
    *,
    pattern: str = "[a-z]{8,}",
) -> ray.data.Dataset:
    """Vectorized regex extraction rollup — per language: documents with
    >=1 match of ``pattern``, total non-overlapping matches, and the
    per-doc maximum.  The shape every PII-scrub / boilerplate-detect /
    contamination-scan pass takes over a text corpus: a compiled-regex
    count per document followed by a tiny keyed rollup.

    Vectorization: ``pyarrow.compute.count_substring_regex`` runs RE2
    over the whole Arrow column in C++ — no Python per row, no
    ``re`` module in the hot path.  DuckDB's regex is also RE2, so
    ``len(regexp_extract_all(text, pattern))`` is count-for-count
    identical and serves as the oracle.

    Scale shape: per-batch partial (lang -> 3 counters) BEFORE the
    shuffle; only (langs x batches) rows move."""

    def partial(batch: pa.Table) -> pa.Table:
        cnt = pc.count_substring_regex(batch["text"], pattern=pattern).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "cnt": cnt,
                "has": (cnt > 0).astype(np.int64),
            }
        )
        agg = df.groupby("lang", sort=False).agg(
            n_docs=("cnt", "size"),
            docs_with_match=("has", "sum"),
            total_matches=("cnt", "sum"),
            max_per_doc=("cnt", "max"),
        )
        return pa.Table.from_pandas(agg.reset_index(), preserve_index=False)

    return (
        docs.select_columns(["lang", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("docs_with_match", alias_name="docs_with_match"),
            Sum("total_matches", alias_name="total_matches"),
            Max("max_per_doc", alias_name="max_per_doc"),
        )
        .sort("lang")
    )


def scrub_values(
    events: ray.data.Dataset,
    *,
    pattern: str = "[0-9]+",
    replacement: str = "<NUM>",
) -> ray.data.Dataset:
    """PII / sensitive-value redaction as a STREAMING MAP — every numeric
    run in the event payload (`props`, a JSON string) is replaced with a
    placeholder, and the count of redactions rides along per row.  This
    is the scrub pass a training-data pipeline runs before anything else
    touches raw logs (emails / phone numbers / account ids are the same
    regex-replace kernel with a different pattern).

    Vectorization: ``pc.replace_substring_regex`` and
    ``pc.count_substring_regex`` are RE2 over the whole Arrow column —
    no Python in the hot path, and DuckDB's ``regexp_replace(...,'g')``
    (also RE2) reproduces the output byte-for-byte as the oracle.

    Scale shape: map-only — zero shuffles, zero state; the operator
    streams at read speed and composes in front of any downstream
    pipeline stage."""

    def scrub(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "scrubbed": pc.replace_substring_regex(
                    batch["props"], pattern=pattern, replacement=replacement
                ),
                "n_redacted": pc.cast(
                    pc.count_substring_regex(batch["props"], pattern=pattern),
                    pa.int64(),
                ),
            }
        )

    return events.select_columns(["event_id", "props"]).map_batches(
        scrub, batch_format="pyarrow", zero_copy_batch=True
    )


def source_overlap(
    docs: ray.data.Dataset, *, ngram: int = 12, num_buckets: int = 64
) -> ray.data.Dataset:
    """Cross-source contamination matrix — for every unordered pair of
    sources (a < b), the number of distinct ``ngram``-char shingles that
    appear in BOTH sources.  The corpus-audit step behind source-mixing
    decisions (a high shared-shingle count means two "independent"
    sources are mirrors or heavy quoters of each other).

    Shape (the ``type_cooccurrence`` bitmask algebra applied to text):
    a metadata-sized distinct pre-pass pins the source -> bit order
    (mask is one uint64 word, so <= 64 sources; wider catalogs take
    ceil(k/64) mask columns — same algebra per word); per batch, each
    doc's DISTINCT shingle set (shared ``char_ngrams`` normalization:
    whitespace-collapse, whole-string when shorter than ``ngram``) is
    hashed once and OR-folded to one (shingle, mask) row per shingle per
    batch; ONE coarse shingle-hash-bucket shuffle ORs masks globally;
    per-bucket pair counts are popcount algebra over k x k; the final
    exchange is #pairs rows.  Shingle identity is its 64-bit hash —
    collisions would merge two shingles' masks (probability ~n²/2^64;
    negligible, and only ever OVERcounts by 1 per collision)."""
    sources = sorted(docs.select_columns(["source"]).unique("source"))
    if len(sources) > 64:
        raise ValueError("source_overlap: one-word mask supports <= 64 sources")
    order = {s: i for i, s in enumerate(sources)}

    def _or_fold(sh: np.ndarray, mask: np.ndarray):
        """(shingle, mask) rows -> one OR-folded mask per distinct
        shingle: sort + segmented np.bitwise_or.reduceat (NOT a pandas
        groupby-agg, which falls back to one Python call per group)."""
        o = np.argsort(sh, kind="mergesort")
        sh, mask = sh[o], mask[o]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        return sh[starts], np.bitwise_or.reduceat(mask, starts)

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        flat, sizes = hashed_shingles(texts, ngram)
        masks = np.repeat(
            np.array([np.uint64(1) << np.uint64(order[s]) for s in srcs], dtype=np.uint64),
            sizes,
        )
        if not len(flat):
            return pa.table(
                {
                    "shingle": pa.array([], type=pa.uint64()),
                    "mask": pa.array([], type=pa.uint64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        sh, m = _or_fold(flat, masks)
        return pa.table(
            {
                "shingle": pa.array(sh),
                "mask": pa.array(m),
                "bucket": pa.array(
                    (sh % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    k = len(sources)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        _, m = _or_fold(
            df["shingle"].to_numpy().astype(np.uint64),
            df["mask"].to_numpy().astype(np.uint64),
        )
        rows = []
        for a in range(k):
            ha = (m >> np.uint64(a)) & np.uint64(1)
            if not ha.any():
                continue
            for b in range(a + 1, k):
                c = int((ha & (m >> np.uint64(b))).sum())
                if c:
                    rows.append((a, b, c))
        return pd.DataFrame(
            {
                "a": pd.Series([r[0] for r in rows], dtype=np.int64),
                "b": pd.Series([r[1] for r in rows], dtype=np.int64),
                "n": pd.Series([r[2] for r in rows], dtype=np.int64),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source_a": pa.array([sources[i] for i in a], type=pa.string()),
                "source_b": pa.array([sources[i] for i in b], type=pa.string()),
                "shared_shingles": batch["sum(n)"],
            }
        )

    return (
        docs.select_columns(["source", "text"])
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("n"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["source_a", "source_b"])
    )


def length_band_filter(
    docs: ray.data.Dataset, *, q_lo: float = 0.1, q_hi: float = 0.9
) -> ray.data.Dataset:
    """Percentile-band length filter — keep documents whose char length
    lies within [percentile_disc(q_lo), percentile_disc(q_hi)] of their
    LANGUAGE, and report per-language kept docs + kept chars.  The
    outlier-trimming curation step (drop truncated fragments and
    concatenation accidents) expressed as statistics -> broadcast ->
    map-side filter.

    Shape: the per-lang bounds come from the exact distributed
    order-statistics operator (``relational.group_quantiles`` — histogram
    pass + residual-rank gather, no global sort); the bounds table is
    #langs x 2 rows, broadcast via ``ray.put``; the filter + rollup pass
    is map-only with a per-batch combine, so the second exchange is
    #langs rows per block.  Bounds are integers compared with integer
    n_chars — no float boundary."""
    from .relational import group_quantiles

    b = group_quantiles(
        docs, value_col="n_chars", group_col="lang", qs=(q_lo, q_hi)
    ).to_pandas()  # (#langs x 2) rows
    bounds = {}
    for lang, sub in b.groupby("lang"):
        lo = int(sub[sub["q"] == q_lo]["value"].iloc[0])
        hi = int(sub[sub["q"] == q_hi]["value"].iloc[0])
        bounds[lang] = (lo, hi)
    ref = ray.put(bounds)

    def partial(batch: pa.Table) -> pa.Table:
        bd = ray.get(ref)
        langs = batch["lang"].to_pandas()
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = langs.map(lambda l: bd[l][0]).to_numpy().astype(np.int64)
        hi = langs.map(lambda l: bd[l][1]).to_numpy().astype(np.int64)
        keep = (n >= lo) & (n <= hi)
        df = pd.DataFrame({"lang": langs[keep], "n_chars": n[keep]})
        agg = df.groupby("lang", sort=False).agg(
            kept_docs=("n_chars", "size"), kept_chars=("n_chars", "sum")
        )
        return pa.Table.from_pandas(agg.reset_index(), preserve_index=False)

    return (
        docs.select_columns(["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("kept_docs", alias_name="kept_docs"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
        .sort("lang")
    )


def robust_length_outliers(
    docs: ray.data.Dataset, *, k: float = 3.0
) -> ray.data.Dataset:
    """Robust outlier detection per language: median / MAD (median
    absolute deviation) instead of mean / stddev — the curation filter
    that survives the heavy-tailed length distributions real corpora
    have (a handful of giant concatenation accidents corrupt a z-score,
    not a MAD).  Flags docs with |n_chars − median| > k·MAD and reports
    per-language totals.

    Composition of exact distributed order statistics — NO global sort:
    pass 1 computes each language's median with the histogram +
    residual-rank machinery (``relational.group_quantiles``); the
    #langs-row result broadcasts via ``ray.put``; pass 2 computes the
    median of |x − med| the same way over the derived column; pass 3 is
    a map-only integer-compare rollup.  Medians and MADs are SELECTED
    integers, so the threshold compare is exact (k·MAD stays integral
    for integral k·2 via doubling: the test uses 2|x−med| > 2k·MAD in
    int64)."""
    from .relational import group_quantiles

    med = group_quantiles(
        docs, value_col="n_chars", group_col="lang", qs=(0.5,)
    ).to_pandas()
    med_map = dict(zip(med["lang"], med["value"].astype(np.int64)))
    med_ref = ray.put(med_map)

    def absdev(batch: pa.Table) -> pa.Table:
        mm = ray.get(med_ref)
        langs = batch["lang"].to_pandas()
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = langs.map(mm).to_numpy().astype(np.int64)
        return pa.table({"lang": batch["lang"], "n_chars": np.abs(n - m)})

    dev = docs.select_columns(["lang", "n_chars"]).map_batches(
        absdev, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=262_144,
    )
    mad = group_quantiles(
        dev, value_col="n_chars", group_col="lang", qs=(0.5,)
    ).to_pandas()
    mad_map = dict(zip(mad["lang"], mad["value"].astype(np.int64)))
    mad_ref = ray.put(mad_map)
    k2 = int(round(2 * k))

    def flag(batch: pa.Table) -> pa.Table:
        mm = ray.get(med_ref)
        dd = ray.get(mad_ref)
        langs = batch["lang"].to_pandas()
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = langs.map(mm).to_numpy().astype(np.int64)
        d = langs.map(dd).to_numpy().astype(np.int64)
        out = 2 * np.abs(n - m) > k2 * d  # exact int compare
        df = pd.DataFrame({"lang": langs, "out": out.astype(np.int64)})
        agg = df.groupby("lang", sort=False).agg(
            n_docs=("out", "size"), n_outliers=("out", "sum")
        )
        return pa.Table.from_pandas(agg.reset_index(), preserve_index=False)

    return (
        docs.select_columns(["lang", "n_chars"])
        .map_batches(
            flag,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_outliers", alias_name="n_outliers"),
        )
        .sort("lang")
    )


def weighted_sample(
    docs: ray.data.Dataset,
    *,
    k: int = 100,
    weight_col: str = "n_chars",
) -> ray.data.Dataset:
    """Deterministic weighted sampling without replacement — the A-Res
    priority-sampling scheme (Efraimidis & Spirakis, IPL 2006): each
    document gets priority u^(1/w) for uniform u and weight w, and the
    k highest priorities are the sample; P(doc in sample) is
    proportional-to-weight.  Here u is content-keyed (md5 of the text,
    first 8 hex chars, as a uniform in (0,1]) so the same corpus always
    yields the same sample regardless of sharding or order — the
    training-data property that makes sampling reproducible across
    engines, and what lets DuckDB serve as the oracle.

    Ordering is by the monotone-equivalent ln(u)/w (one libm call
    instead of a pow); the selected SET is what crosses the conformance
    boundary, so only the k-th/(k+1)-th boundary gap matters for
    cross-engine agreement — measured ≥1e-5 at sf0.01, ~11 orders above
    double noise.

    Shape: a distributed top-k — per-block partial top-k (vectorized
    argpartition-equivalent via sort+head), then one tiny sort+limit
    over <= k * num_blocks rows.  No corpus-wide shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        fps = md5_hex(batch["text"].to_pylist())
        h = np.array([int(f[:8], 16) for f in fps], dtype=np.float64)
        u = (h + 1.0) / 4294967296.0
        w = batch[weight_col].to_numpy().astype(np.float64)
        ok = w > 0
        key = np.full(len(u), -np.inf)
        key[ok] = np.log(u[ok]) / w[ok]
        df = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "w": batch[weight_col].to_numpy().astype(np.int64),
                "key": key,
            }
        )[ok]
        df = df.sort_values(["key", "doc_id"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["key"])

    return (
        docs.select_columns(["doc_id", "text", weight_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["key", "doc_id"], descending=[True, False])
        .limit(k)
        .map_batches(finish, batch_format="pyarrow")
    )


def approx_quantiles(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    group_col: str,
    qs: Tuple[float, ...] = (0.5, 0.9, 0.99),
    rel_err: float = 0.01,
) -> ray.data.Dataset:
    """Approximate per-group quantiles with a bounded RELATIVE error —
    the 100 TB scale path next to the exact ``relational.group_quantiles``
    (which needs a per-group sort / full value-count exchange; fine for
    bounded-domain ints, corpus-sized for continuous values).

    Sketch: DDSketch-style logarithmic buckets (Masson, Rim & Lee,
    "DDSketch: a fast and fully-mergeable quantile sketch with
    relative-error guarantees", VLDB'19): bucket(x) = ceil(log_gamma x)
    with gamma = (1+a)/(1-a); returning the bucket midpoint
    2*gamma^i/(gamma+1) guarantees |est - true| <= a * true for any
    positive value.  The sketch is a (bucket -> count) map — fully
    mergeable by addition, so the pipeline is: per-batch vectorized
    bincount partial -> groupby(group, bucket) Sum -> per-group
    cumulative walk over its OWN tiny histogram (at most a few hundred
    buckets span any float range).  Only histogram-sized data ever
    shuffles; nothing corpus-sized moves or sorts.

    Quantile rule matches PERCENTILE_DISC rank ceil(q*n) so the test can
    compare against the exact operator.  Requires value_col > 0 (log
    buckets); nonpositive rows are dropped loudly via the n_dropped
    column on every output row."""
    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    log_gamma = np.log(gamma)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = batch[group_col].to_numpy(zero_copy_only=False)
        pos = v > 0
        dropped = int((~pos).sum())
        idx = np.ceil(np.log(v[pos]) / log_gamma).astype(np.int64)
        df = (
            pd.DataFrame({"grp": g[pos], "bucket": idx})
            .groupby(["grp", "bucket"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        df["n_dropped"] = 0
        if dropped and len(df):
            df.loc[0, "n_dropped"] = dropped
        elif dropped:
            df = pd.DataFrame(
                {"grp": [g[0]], "bucket": [0], "n": [0], "n_dropped": [dropped]}
            )
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_q, out_v, out_d = [], [], [], []
        total_dropped = int(df["n_dropped"].sum())
        for grp, gdf in df[df["n"] > 0].groupby("grp", sort=True):
            gdf = gdf.sort_values("bucket")
            counts = gdf["n"].to_numpy(np.int64)
            buckets = gdf["bucket"].to_numpy(np.int64)
            cum = np.cumsum(counts)
            n = cum[-1]
            for q in qs:
                rank = max(int(np.ceil(q * n)), 1)
                i = int(np.searchsorted(cum, rank))
                # round-6 so the DuckDB twin (POWER vs numpy **, <=1 ulp
                # apart) hashes identically
                mid = float(np.round(2.0 * (gamma ** buckets[i]) / (gamma + 1.0), 6))
                out_g.append(grp)
                out_q.append(q)
                out_v.append(mid)
                out_d.append(total_dropped)
        return pd.DataFrame(
            {"grp": out_g, "q": out_q, "value": out_v, "n_dropped": out_d}
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["grp", "bucket"])
        .aggregate(Sum("n", alias_name="n"), Sum("n_dropped", alias_name="n_dropped"))
        .repartition(1)  # histogram-sized, not data-sized
        .map_batches(finish, batch_format="pandas", batch_size=None)
        .sort(["grp", "q"])
    )


def fuzzy_pairs(
    ds: ray.data.Dataset,
    *,
    col: str = "c_name",
    num_buckets: int = 64,
    max_bucket: int = 4000,
) -> ray.data.Dataset:
    """Edit-distance-1 similarity join (entity resolution / typo
    clustering) via the SymSpell deletion neighborhood (Garbe's symmetric
    delete algorithm): two strings with Levenshtein distance <= 1 share
    at least one member of {s} ∪ {s minus one char}, so candidate pairs
    are exactly the strings sharing a deletion-variant bucket — never an
    all-pairs scan.  Candidates are then verified with an exact
    vectorized distance<=1 check (equal length -> <=1 substitution;
    length diff 1 -> deletion alignment), so the output is exact.

    Shape: distinct(col) shuffle -> per-batch variant explode (|s|+1
    variants per term) -> coarse variant-hash bucket groupby with the
    dedup family's run-pair kernel -> (a, b) dedupe shuffle -> verify.
    Variants shared by more than ``max_bucket`` terms are skipped loudly
    (same prefix-filter contract as ngram_jaccard's max_posting).
    """

    def variants(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch[col].to_pylist(), dtype=object)
        out_v: List[str] = []
        out_t: List[str] = []
        for t in terms:  # bounded by the DISTINCT terms of one block
            # set-dedupe: deleting any of k identical adjacent chars
            # yields the same variant; duplicates would quadratically
            # inflate the run-pair kernel downstream
            vs = {t}
            for i in range(len(t)):
                vs.add(t[:i] + t[i + 1 :])
            out_v.extend(vs)
            out_t.extend([t] * len(vs))
        vh = hash64(pa.array(out_v, type=pa.string()))
        return pa.table(
            {
                "term": pa.array(out_t, type=pa.string()),
                "vh": pa.array(vh),
                "bucket": pa.array(
                    ((vh * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(
                        np.int32
                    )
                ),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["vh", "term"], kind="mergesort")
        vh = df["vh"].to_numpy(np.uint64)
        terms = df["term"].to_numpy()
        n = len(vh)
        starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]]) if n else np.zeros(0, np.int64)
        lens = np.diff(np.r_[starts, n])
        gi, gj = _pairs_within_runs(starts, lens, max_bucket)
        keep = terms[gi] != terms[gj]  # same term via two variants is not a pair
        return pd.DataFrame({"name_a": terms[gi][keep], "name_b": terms[gj][keep]})

    def verify(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["name_a"].to_pylist(), dtype=object)
        b = np.asarray(batch["name_b"].to_pylist(), dtype=object)
        la = np.array([len(x) for x in a])
        lb = np.array([len(x) for x in b])
        ok = np.zeros(len(a), dtype=bool)
        same = la == lb
        for L in np.unique(la[same]):
            m = same & (la == L)
            if L == 0 or not m.any():
                ok[m] = True
                continue
            ca = np.frombuffer("".join(a[m]).encode("utf-32-le"), dtype=np.uint32).reshape(-1, int(L))
            cb = np.frombuffer("".join(b[m]).encode("utf-32-le"), dtype=np.uint32).reshape(-1, int(L))
            ok[np.flatnonzero(m)] = (ca != cb).sum(axis=1) <= 1
        for i in np.flatnonzero(np.abs(la - lb) == 1):  # small candidate subset
            s, t = (a[i], b[i]) if la[i] < lb[i] else (b[i], a[i])
            k = 0
            while k < len(s) and s[k] == t[k]:
                k += 1
            ok[i] = t[: k] + t[k + 1 :] == s
        return batch.filter(pa.array(ok))

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        # multi-key STRING groupby-aggregate is the measured Ray trap
        # (24 s for 55k rows at sf0.01) — coarse int bucket + in-bucket
        # drop_duplicates instead
        key = hash64(
            pc.binary_join_element_wise(batch["name_a"], batch["name_b"], "\x00")
        )
        return batch.append_column(
            "pbucket",
            pa.array(((key * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)).astype(np.int32)),
        )

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["name_a", "name_b"])[["name_a", "name_b"]]

    distinct = ds.select_columns([col]).groupby(col).aggregate(Count())
    return (
        distinct.map_batches(variants, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pbucket")
        .map_groups(dedupe, batch_format="pandas")
        .map_batches(verify, batch_format="pyarrow")
        .sort(["name_a", "name_b"])
    )


def heavy_hitters(
    docs: ray.data.Dataset,
    *,
    threshold_frac: float = 0.01,
    width: int = 1 << 14,
    depth: int = 4,
) -> pd.DataFrame:
    """Frequent-terms detection with a count-min sketch (Cormode &
    Muthukrishnan, J.Alg 2005) — the scale path when the vocabulary is
    too large for an exact term groupby (URL hosts, n-grams, token ids
    at 100 TB).  Guarantees: no false negatives (every term with true
    frequency >= threshold_frac * total_tokens is returned) and
    est >= true with est - true <= total/width per hash row (take the
    min over ``depth`` rows).

    Shape — nothing vocabulary-sized ever moves:
      * per-batch partial: vectorized token value_counts -> d hashed
        bincounts into a (depth, width) int64 sketch, emitted as NONZERO
        (r, c, n) rows; candidate terms = batch-local counts >=
        threshold * batch_tokens (pigeonhole: a globally-heavy term is
        heavy in at least one batch, so the union is complete);
      * groupby (r*width+c) Sum: sketches merge by pure addition;
      * the merged sketch (<= depth*width rows, bounded by the sketch —
        NOT the data) and the candidate set are pulled to the driver for
        the final min-over-rows estimate + threshold filter.
    Deterministic: hashing is seeded, candidates are sets, output sorted.
    Returns a pandas DataFrame (term, est_count) — driver-small."""
    from ..hashing import hash64

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        tokens = _pc.split_pattern_regex(batch["text"], r"\s+")
        flat = tokens.combine_chunks().flatten() if isinstance(
            tokens, pa.ChunkedArray
        ) else tokens.flatten()
        vc = _pc.value_counts(flat)
        terms = vc.field("values")
        counts = _pc.cast(vc.field("counts"), pa.int64()).to_numpy()
        keep = _pc.not_equal(terms, "").to_numpy(zero_copy_only=False)
        terms = terms.filter(pa.array(keep))
        counts = counts[keep]
        total = int(counts.sum())
        cells: dict = {}
        cand: List[str] = []
        if total:
            term_list = terms.to_pylist()
            for r in range(depth):
                h = hash64(terms, seed=1000 + r) % np.uint64(width)
                key = r * width + h.astype(np.int64)
                for k, n in zip(key.tolist(), counts.tolist()):
                    cells[k] = cells.get(k, 0) + n
            thr = threshold_frac * total
            cand = [t for t, n in zip(term_list, counts.tolist()) if n >= thr]
        keys = np.fromiter(cells.keys(), dtype=np.int64, count=len(cells))
        vals = np.fromiter(cells.values(), dtype=np.int64, count=len(cells))
        return pa.table(
            {
                "cell": pa.array(keys),
                "n": pa.array(vals),
                "cands": pa.array(
                    [",".join(sorted(set(cand)))] + [""] * (len(keys) - 1)
                    if len(keys)
                    else [],
                    type=pa.string(),
                ),
                "total": pa.array(
                    np.r_[np.int64(total), np.zeros(len(keys) - 1, dtype=np.int64)]
                    if len(keys)
                    else np.zeros(0, dtype=np.int64)
                ),
            }
        )

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed twice (sketch + candidates); sketch-sized
    sketch = (
        parts.groupby("cell")
        .aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="total"))
        .to_pandas()
    )  # sketch-sized (<= depth*width rows), bounded regardless of corpus
    cands: set = set()
    for s in parts.select_columns(["cands"]).to_pandas()["cands"]:
        if s:
            cands.update(s.split(","))
    total = int(sketch["total"].sum())
    cell_map = dict(zip(sketch["cell"].to_numpy(), sketch["n"].to_numpy()))
    out_t, out_n = [], []
    thr = threshold_frac * total
    for t in sorted(cands):
        est = min(
            cell_map.get(r * width + int(hash64([t], seed=1000 + r)[0] % np.uint64(width)), 0)
            for r in range(depth)
        )
        if est >= thr:
            out_t.append(t)
            out_n.append(int(est))
    return pd.DataFrame({"term": out_t, "est_count": out_n})


# ---------------------------------------------------------------------------
# corpus curation: duplicate-n-gram coverage, composite quality filter,
# intra-document repetition (the Rae et al. "Gopher" rule family and the
# Lee et al. "Deduplicating Training Data" substring-dedup signal at
# n-gram granularity) — beyond the reference, which curates only via
# deterministic ids + idempotent upsert (ref document_processor.py:328).
# ---------------------------------------------------------------------------


def _token_slices(batch: pa.Table):
    """(vals, starts, lens): per-doc word slices over the flattened
    whitespace-split token array. ``split_pattern_regex(r'\\s+')`` yields
    an empty token only at a doc's first/last slot (leading/trailing
    whitespace); those are trimmed so the token set equals the SQL twin's
    ``regexp_extract_all(text, '\\S+')``."""
    tokens = pc.split_pattern_regex(batch["text"], r"\s+")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    off = tokens.offsets.to_numpy().astype(np.int64)
    vals = tokens.values
    starts, ends = off[:-1].copy(), off[1:].copy()
    if len(vals):
        bl = pc.binary_length(vals).to_numpy(zero_copy_only=False).astype(np.int64)
        ne = ends > starts
        starts = starts + (ne & (bl[np.where(ne, starts, 0)] == 0))
        ne = ends > starts
        ends = ends - (ne & (bl[np.where(ne, ends - 1, 0)] == 0))
    return vals, starts, np.maximum(ends - starts, 0)


def _window_starts(starts: np.ndarray, lens: np.ndarray, n: int):
    """(flat_left, windows_per_doc): flat indices of every length-``n``
    token window start, per doc — np.repeat/arange offset arithmetic,
    no Python loop (the bigram_counts pattern generalized)."""
    G = np.maximum(lens - (n - 1), 0)
    total = int(G.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64), G
    left = (
        np.repeat(starts, G)
        + np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(G) - G, G)
    )
    return left, G


def _join_ngrams(vals: pa.Array, left: np.ndarray, n: int) -> pa.Array:
    parts = [vals.take(pa.array(left + k)) for k in range(n)]
    return pc.binary_join_element_wise(*parts, " ")


def dup_ngram_coverage(
    docs: ray.data.Dataset, *, n: int = 5, min_docs: int = 2, num_buckets: int = 64
) -> ray.data.Dataset:
    """Per-document duplicate-n-gram coverage: how many of a doc's word
    ``n``-grams occur in >= ``min_docs`` distinct documents corpus-wide —
    the substring-dedup signal of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better") at n-gram granularity,
    the form a 100 TB curation pass actually materializes before
    deciding span removal.

    Output: (doc_id, n_ngrams, dup_ngrams) for every doc with >= 1
    n-gram. All-integer, so the DuckDB oracle hash-matches exactly.

    Scale shape — the only all-to-all moves PRE-AGGREGATED rows:
      1. map: per batch, form n-grams vectorized (offset arithmetic +
         Arrow take/join) and collapse to DISTINCT (doc_id, gram, occ)
         rows via Arrow C++ group_by — the map-side combiner;
      2. one groupby on a coarse gram-hash bucket (~``num_buckets``
         uniform groups); within a bucket a vectorized pandas groupby
         finds grams with >= min_docs carriers and emits per-doc
         partial dup counts;
      3. one doc_id groupby sums partials with the per-doc gram totals
         (union trick: both sides carry both columns, zero-filled).
    Nothing row-scale touches the driver; skewed grams cost one bucket
    row each, and buckets are hash-uniform."""

    def grams_partial(batch: pa.Table) -> pa.Table:
        vals, starts, lens = _token_slices(batch)
        left, G = _window_starts(starts, lens, n)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(left) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int32()),
                    "g": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "occ": pa.array([], type=pa.int64()),
                }
            )
        g = _join_ngrams(vals, left, n)
        t = pa.table({"doc_id": pa.array(np.repeat(did, G)), "g": g})
        agg = t.group_by(["doc_id", "g"]).aggregate([("g", "count")])
        bucket = (hash64(agg["g"].combine_chunks()) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "g": agg["g"],
                "doc_id": agg["doc_id"],
                "occ": pc.cast(agg["g_count"], pa.int64()),
            }
        )

    def resolve(df: pd.DataFrame) -> pa.Table:
        carriers = df.groupby("g")["doc_id"].transform("size")
        dup = df[carriers >= min_docs]
        out = dup.groupby("doc_id", as_index=False)["occ"].sum()
        # Arrow out (the union partner is an Arrow-block dataset; mixed
        # block types break the aggregate's boundary sampling)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy().astype(np.int64)),
                "n_ngrams": pa.array(np.zeros(len(out), dtype=np.int64)),
                "dup_ngrams": pa.array(out["occ"].to_numpy().astype(np.int64)),
            }
        )

    def base_partial(batch: pa.Table) -> pa.Table:
        _vals, _starts, lens = _token_slices(batch)
        G = np.maximum(lens - (n - 1), 0)
        keep = G > 0
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(pa.array(keep)),
                "n_ngrams": pa.array(G[keep]),
                "dup_ngrams": pa.array(np.zeros(int(keep.sum()), dtype=np.int64)),
            }
        )

    proj = docs.select_columns(["doc_id", "text"])
    dups = (
        proj.map_batches(grams_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )
    base = proj.map_batches(base_partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        base.union(dups)
        .groupby("doc_id")
        .aggregate(
            Sum("n_ngrams", alias_name="n_ngrams"),
            Sum("dup_ngrams", alias_name="dup_ngrams"),
        )
        .sort("doc_id")
    )


def _per_doc_distinct(did: np.ndarray, g: pa.Array) -> Dict[int, int]:
    """doc_id -> distinct count of ``g`` values, via Arrow C++ group_by
    (exact string grouping, no Python per row)."""
    t = pa.table({"doc_id": pa.array(did), "g": g})
    agg = t.group_by(["doc_id", "g"]).aggregate([])
    vc = pc.value_counts(agg["doc_id"].combine_chunks())
    return dict(
        zip(
            vc.field("values").to_numpy(zero_copy_only=False),
            vc.field("counts").to_numpy(zero_copy_only=False),
        )
    )


def _gopher_arrays_fn(
    min_words: int,
    mean_len_lo_x10: int,
    mean_len_hi_x10: int,
    min_stop_hits: int,
    min_distinct_x10: int,
    stopwords: Tuple[str, ...],
):
    """The shared per-batch verdict kernel behind ``gopher_quality``
    (signal table) and ``gopher_filter_docs`` (fused in-place filter):
    returns (doc_ids, n_words, total_chars, stop_hits, distinct, kept,
    has_words) arrays for one batch. One definition so the two callers
    cannot drift."""
    stop_set = pa.array(list(stopwords), type=pa.string())

    def arrays(batch: pa.Table):
        vals, starts, lens = _token_slices(batch)
        ends = starts + lens
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vals):
            # utf8_length (characters), matching the SQL twin's
            # length(w) — binary_length counts BYTES and diverges on
            # any non-ASCII token
            bl = pc.utf8_length(vals).to_numpy(zero_copy_only=False).astype(np.int64)
            sh = pc.is_in(vals, value_set=stop_set).to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            bl = np.zeros(0, dtype=np.int64)
            sh = np.zeros(0, dtype=np.int64)
        cb = np.r_[0, np.cumsum(bl)]
        cs = np.r_[0, np.cumsum(sh)]
        total_chars = cb[ends] - cb[starts]
        stop_hits = cs[ends] - cs[starts]
        keep = lens > 0
        # distinct words per doc (Arrow C++ group_by over this batch's
        # tokens; rows are whole docs, so per-batch is per-doc exact).
        # Token indices come from the window helper with n=1 — the same
        # loop-free offset arithmetic the n-gram ops use.
        tok_idx, _G1 = _window_starts(starts, lens, 1)
        dmap = (
            _per_doc_distinct(np.repeat(did, lens), vals.take(pa.array(tok_idx)))
            if len(tok_idx)
            else {}
        )
        distinct = np.array([dmap.get(d, 0) for d in did], dtype=np.int64)
        kept = (
            (lens >= min_words)
            & (10 * total_chars >= mean_len_lo_x10 * lens)
            & (10 * total_chars <= mean_len_hi_x10 * lens)
            & (stop_hits >= min_stop_hits)
            & (10 * distinct >= min_distinct_x10 * lens)
        ).astype(np.int32)
        return did, lens, total_chars, stop_hits, distinct, kept, lens > 0

    return arrays


def gopher_quality(
    docs: ray.data.Dataset,
    *,
    min_words: int = 40,
    mean_len_lo_x10: int = 38,
    mean_len_hi_x10: int = 48,
    min_stop_hits: int = 1,
    min_distinct_x10: int = 4,
    stopwords: Tuple[str, ...] = ("the", "a", "and", "of", "to"),
) -> ray.data.Dataset:
    """Gopher-style composite quality filter (Rae et al. 2021 §A1.1):
    per doc the rule inputs (word count, total word chars, distinct
    words, stopword hits) and an integer ``kept`` verdict:

      kept = n_words >= min_words
           AND mean_len_lo_x10*n_words <= 10*total_word_chars
                                       <= mean_len_hi_x10*n_words
           AND stop_hits >= min_stop_hits
           AND 10*distinct_words >= min_distinct_x10*n_words

    All comparisons are integer-exact (the x10 scaling avoids float
    ratios), so the DuckDB oracle hash-matches. MAP-ONLY — one pass,
    no shuffle: every signal is per-document, computed vectorized
    (cumsum segment sums + one Arrow group_by per batch for the
    distinct counts). Docs with zero words are dropped (the SQL twin's
    unnest produces no rows for them)."""
    arrays = _gopher_arrays_fn(
        min_words, mean_len_lo_x10, mean_len_hi_x10,
        min_stop_hits, min_distinct_x10, stopwords,
    )

    def fn(batch: pa.Table) -> pa.Table:
        did, lens, total_chars, stop_hits, distinct, kept, keep = arrays(batch)
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "n_words": pa.array(lens[keep]),
                "total_word_chars": pa.array(total_chars[keep]),
                "distinct_words": pa.array(distinct[keep]),
                "stop_hits": pa.array(stop_hits[keep]),
                "kept": pa.array(kept[keep]),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def gopher_filter_docs(
    docs: ray.data.Dataset,
    *,
    min_words: int = 40,
    mean_len_lo_x10: int = 38,
    mean_len_hi_x10: int = 48,
    min_stop_hits: int = 1,
    min_distinct_x10: int = 4,
    stopwords: Tuple[str, ...] = ("the", "a", "and", "of", "to"),
) -> ray.data.Dataset:
    """The fused form of ``gopher_quality`` + kept-row semi-join: docs
    rows (doc_id, text) whose Gopher verdict is kept == 1, decided
    IN PLACE on the same batch that carries the text — zero exchanges
    where the compose-from-parts form pays a doc_id-bucket shuffle to
    re-attach text to the verdicts. Same kernel (``_gopher_arrays_fn``),
    so the kept set is identical by construction."""
    arrays = _gopher_arrays_fn(
        min_words, mean_len_lo_x10, mean_len_hi_x10,
        min_stop_hits, min_distinct_x10, stopwords,
    )

    def fn(batch: pa.Table) -> pa.Table:
        _, _, _, _, _, kept, _ = arrays(batch)
        return batch.select(["doc_id", "text"]).filter(pa.array(kept.astype(bool)))

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def intra_doc_repetition(docs: ray.data.Dataset, *, n: int = 2) -> ray.data.Dataset:
    """Within-document repetition: per doc the total and DISTINCT word
    ``n``-gram counts — the "fraction of duplicate n-grams" rule of the
    Gopher repetition family (Rae et al. 2021 §A1.1), kept as two exact
    integers so the verdict threshold stays a downstream choice and the
    DuckDB oracle hash-matches.

    MAP-ONLY: n-gram formation is the same offset arithmetic as
    dup_ngram_coverage; distinctness is per-document, so one Arrow C++
    group_by per batch resolves it locally — no shuffle at any corpus
    size."""

    def fn(batch: pa.Table) -> pa.Table:
        vals, starts, lens = _token_slices(batch)
        left, G = _window_starts(starts, lens, n)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = G > 0
        if len(left) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_ngrams": pa.array([], type=pa.int64()),
                    "distinct_ngrams": pa.array([], type=pa.int64()),
                }
            )
        g = _join_ngrams(vals, left, n)
        dmap = _per_doc_distinct(np.repeat(did, G), g)
        distinct = np.array([dmap.get(d, 0) for d in did[keep]], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "n_ngrams": pa.array(G[keep]),
                "distinct_ngrams": pa.array(distinct),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def boilerplate_coverage(
    docs: ray.data.Dataset, *, n: int = 5, min_count: int = 3
) -> ray.data.Dataset:
    """Boilerplate coverage: per document, how many TOKEN POSITIONS are
    covered by at least one "hot" word n-gram (total corpus occurrences
    >= ``min_count``) — the removal mask a boilerplate-stripping pass
    (headers, footers, licence blocks) materializes before editing text.
    Complements dup_ngram_coverage: that counts duplicated gram
    INSTANCES, this one the UNION of their token spans.

    Scale shape:
      * pass 1 — hot-gram discovery: per-batch Arrow value_counts (the
        map-side combiner), one groupby(gram) sum, filter >= min_count.
        The surviving head is broadcast via ray.put: boilerplate is by
        definition the high-frequency head, bounded by
        total_grams/min_count and in practice tiny (raise min_count
        with corpus size; the count is logged in the row estimate).
      * pass 2 — map-only coverage: per batch, windows whose gram is in
        the broadcast set mark [start, start+n) in a difference array;
        one cumsum yields the union coverage, segment sums split it per
        doc. No shuffle; nothing row-scale reaches the driver.

    Output (doc_id, n_tokens, covered_tokens), all-integer."""

    def gram_counts(batch: pa.Table) -> pa.Table:
        vals, starts, lens = _token_slices(batch)
        left, _G = _window_starts(starts, lens, n)
        if len(left) == 0:
            return pa.table(
                {
                    "g": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        vc = pc.value_counts(_join_ngrams(vals, left, n))
        return pa.table(
            {"g": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    proj = docs.select_columns(["doc_id", "text"])
    hot_df = (
        proj.map_batches(gram_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["n"], min_count)).select(["g"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    hot_ref = ray.put(pa.array(hot_df["g"].to_numpy(), type=pa.string()))

    def coverage(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        vals, starts, lens = _token_slices(batch)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = lens > 0
        left, _G = _window_starts(starts, lens, n)
        ends = starts + lens
        total = int(ends[-1]) if len(ends) else 0
        diff = np.zeros(total + 1, dtype=np.int64)
        if len(left):
            hit = pc.is_in(
                _join_ngrams(vals, left, n), value_set=hot
            ).to_numpy(zero_copy_only=False)
            hs = left[hit]
            np.add.at(diff, hs, 1)
            np.add.at(diff, hs + n, -1)
        covered = (np.cumsum(diff[:-1]) > 0).astype(np.int64)
        cc = np.r_[0, np.cumsum(covered)]
        per_doc = cc[np.minimum(ends, total)] - cc[np.minimum(starts, total)]
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "n_tokens": pa.array(lens[keep]),
                "covered_tokens": pa.array(per_doc[keep]),
            }
        )

    return proj.map_batches(coverage, batch_format="pyarrow", zero_copy_batch=True)


def langid_confusion(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Language-ID confusion matrix: stored label x marker-argmax
    prediction -> doc counts. The evaluation rollup a curation pipeline
    runs to decide whether its cheap classifier is safe to filter on.
    Map-side per-batch (lang, pred) partial counts (Arrow group_by),
    then one tiny groupby — the exchange moves #langs x #preds rows per
    block, never documents."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        counts = [
            occurrences(t, term).to_numpy().astype(np.int64)
            for term, _ in LANG_MARKERS
        ]
        n = len(counts[0]) if counts else 0
        pred = np.full(n, "und", dtype=object)
        best = np.zeros(n, dtype=np.int64)
        for cnt, (_, lang) in zip(counts, LANG_MARKERS):
            win = cnt > best
            pred[win] = lang
            best = np.maximum(best, cnt)
        part = pa.table(
            {
                "lang": batch["lang"],
                "pred_lang": pa.array(pred.tolist(), type=pa.string()),
            }
        )
        agg = part.group_by(["lang", "pred_lang"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": agg["lang"],
                "pred_lang": agg["pred_lang"],
                "n_docs": pc.cast(agg["count_all"], pa.int64()),
            }
        )

    return (
        docs.select_columns(["doc_id", "text", "lang"])
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .sort(["lang", "pred_lang"])
    )


def mix_sources(
    docs: ray.data.Dataset, weights: Dict[str, float] | None = None
) -> ray.data.Dataset:
    """Source-mixture sampling: keep each document with a per-source
    probability — the data-mixing step that turns raw source
    proportions into a training mixture (e.g. upweight encyclopedic,
    downweight forum). The accept decision is CONTENT-KEYED (first 8
    hex of md5(text) as a uniform in [0, 2^32)), so it is deterministic,
    resharding-proof and SQL-reproducible — the same convention as
    stable_split / stratified_sample. MAP-ONLY: the weight table is a
    handful of floats captured in the closure; no shuffle, no driver
    materialization.

    Output: the kept (doc_id, source) rows. The default weight table
    cycles 0.25/0.5/0.75/1.0 over the synthetic ``srcN`` names
    (weight(srcN) = (N % 4 + 1)/4), chosen to be SQL-expressible."""
    weights = weights or {f"src{i}": (i % 4 + 1) / 4.0 for i in range(64)}
    thr = {s: int(w * (1 << 32)) for s, w in weights.items()}

    def fn(batch: pa.Table) -> pa.Table:
        fps = md5_hex(batch["text"].to_pylist())
        u = np.array([int(f[:8], 16) for f in fps], dtype=np.int64)
        src = batch["source"].to_pylist()
        cut = np.array([thr.get(s, 0) for s in src], dtype=np.int64)
        keep = u < cut
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(pa.array(keep)),
                "source": pa.array(
                    [s for s, k in zip(src, keep) if k], type=pa.string()
                ),
            }
        )

    return docs.select_columns(["doc_id", "text", "source"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def remove_duplicate_spans(
    docs: ray.data.Dataset,
    *,
    n: int = 8,
    min_docs: int = 2,
    num_buckets: int = 64,
    doc_buckets: int = 64,
) -> ray.data.Dataset:
    """Cross-document duplicate-SPAN removal — the rewrite step of Lee
    et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") that ``dup_ngram_coverage`` only measures: every word
    ``n``-gram occurring in >= ``min_docs`` distinct documents keeps its
    FIRST carrier (min doc_id) intact and is excised from every other
    document.  Output per doc: (doc_id, clean_text, n_removed) where
    clean_text joins the surviving tokens with single spaces (the
    whitespace-normalized form the SQL twin's string_agg produces) and
    n_removed counts excised token positions.

    Scale shape — three linear exchanges, nothing corpus-scale on the
    driver:
      1. map: n-gram OCCURRENCES (gram, doc_id, start) form vectorized
         (offset arithmetic + Arrow take/join — no Python loop);
      2. one coarse gram-hash-bucket groupby; within a bucket a
         vectorized pandas transform finds grams with >= min_docs
         distinct carriers, assigns keeper = min(doc_id), and emits
         (doc_id, start) removal rows for non-keeper occurrences —
         exact string grouping, the hash only routes;
      3. removals and the doc text tag-union into ONE doc-bucket
         exchange; per bucket the covered position mask builds from
         merged [start, start+n) runs and the text re-joins.  Docs with
         no removals take a fully vectorized whitespace-normalize path;
         only actual dup carriers pay the per-doc rebuild loop."""
    import re as _re

    def occurrences_partial(batch: pa.Table) -> pa.Table:
        vals, starts, lens = _token_slices(batch)
        left, G = _window_starts(starts, lens, n)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(left) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int32()),
                    "g": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "start": pa.array([], type=pa.int64()),
                }
            )
        g = _join_ngrams(vals, left, n)
        rel = left - np.repeat(starts, G)  # 0-based window start in doc
        bucket = (hash64(g) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "g": g,
                "doc_id": pa.array(np.repeat(did, G)),
                "start": pa.array(rel),
            }
        )

    def find_removals(df: pd.DataFrame) -> pa.Table:
        grp = df.groupby("g")["doc_id"]
        nd = grp.transform("nunique")
        keeper = grp.transform("min")
        rem = df[(nd >= min_docs) & (df["doc_id"] != keeper)]
        return pa.table(
            {
                "doc_id": pa.array(rem["doc_id"].to_numpy().astype(np.int64)),
                "start": pa.array(rem["start"].to_numpy().astype(np.int64)),
            }
        )

    MIXC = np.uint64(0x9E3779B97F4A7C15)

    def tag_removals(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((ids.astype(np.uint64) * MIXC) % np.uint64(doc_buckets)).astype(np.int32)
        m = len(ids)
        return pa.table(
            {
                "dbucket": pa.array(b),
                "doc_id": pa.array(ids),
                "start": pc.cast(batch["start"], pa.int64()),
                "text": pa.array([""] * m, type=pa.string()),
            }
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = ((ids.astype(np.uint64) * MIXC) % np.uint64(doc_buckets)).astype(np.int32)
        m = len(ids)
        return pa.table(
            {
                "dbucket": pa.array(b),
                "doc_id": pa.array(ids),
                "start": pa.array(np.full(m, -1, dtype=np.int64)),
                "text": batch["text"],
            }
        )

    tok_re = _re.compile(r"\S+")

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        rem = df[df["start"] >= 0]
        starts_by_doc = rem.groupby("doc_id")["start"].apply(
            lambda s: np.unique(s.to_numpy())
        )
        d = df[df["start"] < 0]
        ids = d["doc_id"].to_numpy(np.int64)
        texts = d["text"]
        touched = np.isin(ids, starts_by_doc.index.to_numpy())
        # untouched docs: vectorized whitespace-normalize (== token join)
        clean = (
            texts.str.replace(r"\s+", " ", regex=True).str.strip().to_numpy(object)
        )
        removed = np.zeros(len(ids), dtype=np.int64)
        for i in np.flatnonzero(touched):
            toks = tok_re.findall(texts.iloc[i])
            keep = np.ones(len(toks), dtype=bool)
            for s in starts_by_doc[ids[i]]:
                keep[s : s + n] = False
            clean[i] = " ".join(t for t, k in zip(toks, keep) if k)
            removed[i] = int((~keep).sum())
        return pd.DataFrame(
            {"doc_id": ids, "clean_text": clean, "n_removed": removed}
        )

    proj = docs.select_columns(["doc_id", "text"])
    removals = (
        proj.map_batches(
            occurrences_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(find_removals, batch_format="pandas")
        .map_batches(tag_removals, batch_format="pyarrow", zero_copy_batch=True)
    )
    tagged_docs = proj.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        tagged_docs.union(removals)
        .groupby("dbucket")
        .map_groups(rebuild, batch_format="pandas")
        .sort("doc_id")
    )


# ---------- training-data sharding (round 4) ----------

def training_order(
    docs: ray.data.Dataset, *, shards: int = 8, seed: int = 17
) -> ray.data.Dataset:
    """Deterministic seeded 'shuffle' for training order: every doc gets
    a pseudo-random 32-bit key h = (doc_id * Knuth + seed * salt) mod
    2^32, lands in shard h % shards, and receives its position within
    the shard by (h, doc_id) order.  This is how a 100 TB corpus is
    dealt to trainer workers reproducibly: the key is pure arithmetic
    (any engine — and the SQL oracle — computes the identical order),
    re-running with the same seed yields byte-identical shards, and a
    new seed is a full reshuffle without moving the source data.

    Distribution: one narrow (doc_id, h, shard) exchange keyed on
    shard; the per-shard rank is a vectorized argsort inside ONE
    map_groups call per shard.  Each shard must fit a worker for the
    in-group sort — at trillion-row scale raise ``shards`` (the rank
    semantics are per-shard, so more shards = smaller groups; the
    reference point is shards ~ total_rows / 50M)."""
    K = np.int64(2654435761)
    SALT = np.int64(40503)
    MOD = np.int64(1 << 32)

    def key_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * K + np.int64(seed) * SALT) % MOD
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(h, type=pa.int64()),
                "shard": pa.array((h % np.int64(shards)).astype(np.int32)),
            }
        )

    def rank_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort").reset_index(drop=True)
        df["pos"] = np.arange(len(df), dtype=np.int64)
        return df

    return (
        docs.select_columns(["doc_id"])
        .map_batches(key_fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pandas")
    )


def source_cap(docs: ray.data.Dataset, *, k: int = 50) -> ray.data.Dataset:
    """Per-source document quota: keep each source's k longest docs
    (n_chars DESC, doc_id ASC tie-break) — the domain-cap step of a
    crawl-derived corpus (no single domain may dominate the mix).

    Skew-safe: a map-side per-source head-k combiner prunes every block
    to <= k rows per source BEFORE the exchange (a row ranked > k
    within one block is > k globally), so a hot source ships
    k x blocks rows, never its full count; then one groupby(source)
    applies the global cap."""

    def local_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        if len(df) == 0:
            return batch
        src = df["source"].to_numpy()
        new = np.r_[True, src[1:] != src[:-1]]
        first = np.flatnonzero(new)
        run_len = np.diff(np.r_[first, len(src)])
        rank = np.arange(len(src), dtype=np.int64) - np.repeat(first, run_len)
        return pa.Table.from_pandas(df.iloc[rank < k, :], preserve_index=False)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return (
        docs.select_columns(["doc_id", "source", "n_chars"])
        .map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(topk, batch_format="pandas")
    )
