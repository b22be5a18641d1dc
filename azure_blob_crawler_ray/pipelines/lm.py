"""CCNet-style n-gram language-model scoring over the documents table.

The CCNet pipeline (Wenzek et al., 2020) buckets a web corpus into
head / middle / tail quality tiers by the perplexity of a language model
trained on a trusted reference corpus.  The engine counterpart:

- **Train**: a bigram LM with add-one smoothing over a deterministic
  reference slice of the corpus itself (``doc_id % ref_mod == 0`` — the
  sandbox stand-in for "the trusted reference corpus"; any other
  Dataset can be passed as ``reference``).  Counting is one streaming
  ``map_batches`` pass emitting per-block partial counts, one
  model-sized ``groupby`` exchange, and a bounded driver pull: the
  pulled model is ``O(distinct bigrams after min_count pruning)``, the
  standard broadcast-LM working-set assumption (``min_count`` is the
  documented degradation knob at open-web vocabulary sizes; the pull
  refuses above ``max_model_rows`` instead of silently flooding the
  driver).
- **Score**: the model is broadcast once via ``ray.put`` and read once
  per worker process (per-process cache, not re-deserialized per
  batch); each batch builds its (row, w1, w2) bigram frame and resolves
  all probabilities with two vectorized pandas merges — no per-bigram
  Python dict lookups in the hot path.
- **Bucket**: exact NTILE over the total order (ppl, doc_id), computed
  with the same hierarchical two-pass rank as ``relational.global_rank``
  (per-block summaries -> driver prefix offsets -> broadcast), so
  nothing row-scale reaches the driver.

Tokenization is lowercase ASCII ``[a-z0-9]+`` runs so the DuckDB oracle
(`regexp_extract_all(lower(text), '[a-z0-9]+')`) is character-for-
character identical.  Perplexity is ``exp(-mean ln p(w_i|w_{i-1}))``
with ``p = (c(w1,w2)+1) / (c(w1,.)+V)``, ``V`` = distinct reference
unigrams + 1 (the OOV slot) — all-integer counts, so engine and SQL
agree to the last ulp before the final ROUND(4).

No counterpart exists in the reference repo (it crawls + indexes, it
does not curate); this family extends the engine toward training-data
preparation, like dataprep.decontaminate / gopher_quality.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# per-worker-process cache of deserialized broadcast models, keyed by
# ObjectRef hex: ray.get re-deserializes object-dtype pandas frames on
# every call, which would tax every batch of the scoring stage.  Bounded
# (worker processes outlive a single query): once full, the oldest
# entry is evicted — one scoring stage only ever reuses one key.
_MODEL_CACHE: dict = {}
_MODEL_CACHE_MAX = 4


def _cached_model(ref):
    key = ref.hex()
    st = _MODEL_CACHE.get(key)
    if st is None:
        if len(_MODEL_CACHE) >= _MODEL_CACHE_MAX:
            _MODEL_CACHE.pop(next(iter(_MODEL_CACHE)))
        st = _MODEL_CACHE[key] = ray.get(ref)
    return st


def _tokens(text: str) -> list:
    return _TOKEN_RE.findall(text.lower())


def train_bigram_lm(
    reference: ray.data.Dataset,
    *,
    min_count: int = 1,
    max_model_rows: int = 5_000_000,
):
    """Count bigrams over ``reference`` (columns: text) and return the
    broadcastable model ``(pairs_df, ctx_df, V)``.

    pairs_df: (w1, w2, c)   bigram counts, pruned to c >= min_count
    ctx_df:   (w1, c1)      per-context totals from the UNPRUNED counts
                            (pruning must not shift the denominator)
    V:        distinct reference unigrams + 1 (OOV slot)
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        pair = Counter()
        words = set()
        for t in batch["text"].to_pylist():
            ws = _tokens(t)
            words.update(ws)
            pair.update(zip(ws[:-1], ws[1:]))
        w1s = [k[0] for k in pair]
        w2s = [k[1] for k in pair]
        cs = list(pair.values())
        # unigram-presence rows ride along with kind=1 (c unused)
        return pa.table(
            {
                "kind": pa.array([0] * len(cs) + [1] * len(words), type=pa.int8()),
                "w1": pa.array(w1s + sorted(words), type=pa.string()),
                "w2": pa.array(w2s + [""] * len(words), type=pa.string()),
                "c": pa.array(cs + [0] * len(words), type=pa.int64()),
            }
        )

    partials = (
        reference.select_columns(["text"])
        # batch_size coalesces small scan blocks so the per-batch
        # combiner emits few fat partial blocks (the downstream
        # groupbys cost ~linearly in input block count)
        .map_batches(
            partial_counts,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=262_144,
        )
        .materialize()
    )
    n_vocab = int(
        partials.filter(expr="kind == 1").groupby("w1").count().count()
    )
    pair_rows = (
        partials.filter(expr="kind == 0")
        .groupby(["w1", "w2"])
        .sum("c")
        .rename_columns({"sum(c)": "c"})
    )
    # Context totals are computed DISTRIBUTED from the unpruned counts
    # (pruning must not shift the denominator), then the prune is pushed
    # into the dataset plan BEFORE the size guard and the driver pull —
    # so both the guard and driver memory really are O(rows after
    # pruning) and raising min_count is an effective remedy.
    ctx_rows = (
        pair_rows.groupby("w1").sum("c").rename_columns({"sum(c)": "c1"})
    )
    if min_count > 1:
        pair_rows = pair_rows.filter(expr=f"c >= {int(min_count)}")
    n_model = int(pair_rows.count()) + int(ctx_rows.count())
    if n_model > max_model_rows:
        raise ValueError(
            f"bigram model has {n_model} rows (pruned pairs + contexts) > "
            f"max_model_rows={max_model_rows}; raise min_count (prune rare "
            "bigrams) before broadcasting"
        )
    pairs_df = pair_rows.to_pandas()
    ctx_df = ctx_rows.to_pandas()
    return pairs_df, ctx_df, n_vocab + 1


def _score_fn(model_ref, round_to: int):
    def score(batch: pa.Table) -> pa.Table:
        pairs_df, ctx_df, vocab = _cached_model(model_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w1s: list = []
        w2s: list = []
        n_big = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            ws = _tokens(t)
            if len(ws) >= 2:
                w1s.extend(ws[:-1])
                w2s.extend(ws[1:])
                n_big[i] = len(ws) - 1
        has = n_big > 0
        if not has.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "ppl": pa.array([], type=pa.float64()),
                }
            )
        df = pd.DataFrame({"w1": w1s, "w2": w2s})
        df = df.merge(pairs_df, on=["w1", "w2"], how="left", copy=False)
        df = df.merge(ctx_df, on="w1", how="left", copy=False)
        c = df["c"].to_numpy(dtype=np.float64, na_value=0.0)
        c1 = df["c1"].to_numpy(dtype=np.float64, na_value=0.0)
        logp = np.log((c + 1.0) / (c1 + float(vocab)))
        ends = np.cumsum(n_big[has])
        sums = np.add.reduceat(logp, np.concatenate(([0], ends[:-1])))
        ppl = np.round(np.exp(-sums / n_big[has]), round_to)
        return pa.table(
            {
                "doc_id": pa.array(ids[has], type=pa.int64()),
                "n_bigrams": pa.array(n_big[has], type=pa.int64()),
                "ppl": pa.array(ppl, type=pa.float64()),
            }
        )

    return score


def lm_perplexity(
    docs: ray.data.Dataset,
    *,
    ref_mod: int = 5,
    min_count: int = 1,
    round_to: int = 4,
) -> ray.data.Dataset:
    """Per-document bigram-LM perplexity (doc_id, n_bigrams, ppl).

    Documents with fewer than two tokens have no bigrams and are
    excluded (the oracle's GROUP BY drops them identically).
    SQL twin registered as ``lm_perplexity`` in ``oracle_sql()``.
    """
    def ref_slice(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % ref_mod == 0))

    reference = docs.select_columns(["doc_id", "text"]).map_batches(
        ref_slice, batch_format="pyarrow", zero_copy_batch=True
    )
    model = train_bigram_lm(reference, min_count=min_count)
    model_ref = ray.put(model)
    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(
            _score_fn(model_ref, round_to),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort("doc_id")
    )


def ccnet_buckets(
    docs: ray.data.Dataset,
    *,
    ref_mod: int = 5,
    ntile: int = 3,
) -> ray.data.Dataset:
    """CCNet head/middle/tail tiers: NTILE(ntile) over the total order
    (ppl ASC, doc_id ASC), aggregated to one row per bucket:
    (bucket, n_docs, avg_ppl).  bucket 1 = head (lowest perplexity).

    Rank is exact and distributed: scores are sorted on the integer key
    round(ppl * 10^4) (the same rounding the score column carries, so
    SQL's ORDER BY ppl, doc_id is the identical total order), then one
    (first-key, rows) summary per block reaches the driver, which
    computes prefix offsets; blocks label their rows vectorized and
    emit per-bucket partials — only O(#blocks + ntile) rows ever leave
    the distributed plan."""
    scored = lm_perplexity(docs, ref_mod=ref_mod)

    def key_project(batch: pa.Table) -> pa.Table:
        ppl = batch["ppl"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ppl_e4": pa.array(np.round(ppl * 1e4).astype(np.int64)),
                "doc_id": batch["doc_id"],
                "ppl": batch["ppl"],
            }
        )

    ordered = (
        scored.map_batches(key_project, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["ppl_e4", "doc_id"])
        .materialize()
    )
    if ordered.count() == 0:
        # empty scored set (e.g. every doc < 2 tokens): every pandas
        # pull below would lose its columns — return typed empty
        return ray.data.from_arrow(
            pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "avg_ppl": pa.array([], type=pa.float64()),
                }
            )
        )

    def block_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "first_key": pa.array([], type=pa.int64()),
                    "first_doc": pa.array([], type=pa.int64()),
                    "rows": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "first_key": pa.array([int(batch["ppl_e4"][0].as_py())], type=pa.int64()),
                "first_doc": pa.array([int(batch["doc_id"][0].as_py())], type=pa.int64()),
                "rows": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    summaries = (
        ordered.map_batches(
            block_summary, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        .to_pandas()
        .sort_values(["first_key", "first_doc"], kind="mergesort")
    )
    rows = summaries["rows"].to_numpy().astype(np.int64)
    n_total = int(rows.sum())
    offsets = dict(
        zip(
            zip(
                summaries["first_key"].astype(np.int64).tolist(),
                summaries["first_doc"].astype(np.int64).tolist(),
            ),
            (np.cumsum(rows) - rows).tolist(),
        )
    )
    # SQL NTILE: q, r = divmod(n, k); first r tiles get q+1 rows
    q, r = divmod(n_total, ntile)
    # rank -> bucket boundary positions (exclusive prefix sums of tile sizes)
    tile_sizes = np.array([q + 1 if i < r else q for i in range(ntile)], dtype=np.int64)
    tile_starts = np.cumsum(tile_sizes) - tile_sizes
    off_ref = ray.put((offsets, tile_starts))

    def bucket_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "sum_ppl": pa.array([], type=pa.float64()),
                }
            )
        offs, starts = ray.get(off_ref)
        base = offs[
            (int(batch["ppl_e4"][0].as_py()), int(batch["doc_id"][0].as_py()))
        ]
        ranks = base + np.arange(batch.num_rows, dtype=np.int64)
        buckets = np.searchsorted(starts, ranks, side="right")  # 1-based like NTILE
        ppl = batch["ppl"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(buckets, return_inverse=True)
        cnt = np.bincount(inv)
        sums = np.bincount(inv, weights=ppl)
        return pa.table(
            {
                "bucket": pa.array(uniq, type=pa.int64()),
                "n_docs": pa.array(cnt, type=pa.int64()),
                "sum_ppl": pa.array(sums, type=pa.float64()),
            }
        )

    partials = ordered.map_batches(
        bucket_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    agg = (
        partials.groupby("bucket")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("sum_ppl", alias_name="sum_ppl"),
        )
        .to_pandas()
        .sort_values("bucket")
    )
    if len(agg) == 0:
        # an empty groupby().to_pandas() loses its columns (same pitfall
        # nation_trade_volume guards) — return a typed empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "avg_ppl": pa.array([], type=pa.float64()),
                }
            )
        )
    agg["avg_ppl"] = np.round(agg["sum_ppl"] / agg["n_docs"], 4)
    out = pa.table(
        {
            "bucket": pa.array(agg["bucket"].astype(np.int64)),
            "n_docs": pa.array(agg["n_docs"].astype(np.int64)),
            "avg_ppl": pa.array(agg["avg_ppl"].astype(np.float64)),
        }
    )
    return ray.data.from_arrow(out)


def _unigram_counts(
    docs: ray.data.Dataset, ref_mod: int, *, max_model_rows: int = 5_000_000
):
    """One streaming pass over (doc_id, text) emitting per-block partial
    unigram counts split into target (doc_id % ref_mod == 0) and raw
    (everything else) columns, then one model-sized exchange.  Returns
    (counts_df(w, ct, cr), N_target, N_raw, V) where V = distinct words
    anywhere + 1 (the OOV slot shared by both distributions).  The
    driver pull refuses above ``max_model_rows`` (same guard as
    ``train_bigram_lm``) instead of silently flooding the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tgt = Counter()
        raw = Counter()
        for i, t in enumerate(batch["text"].to_pylist()):
            (tgt if ids[i] % ref_mod == 0 else raw).update(_tokens(t))
        words = sorted(set(tgt) | set(raw))
        return pa.table(
            {
                "w": pa.array(words, type=pa.string()),
                "ct": pa.array([tgt.get(w, 0) for w in words], type=pa.int64()),
                "cr": pa.array([raw.get(w, 0) for w in words], type=pa.int64()),
            }
        )

    rows = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w")
        .aggregate(
            ray.data.aggregate.Sum("ct", alias_name="ct"),
            ray.data.aggregate.Sum("cr", alias_name="cr"),
        )
    )
    n_model = int(rows.count())
    if n_model > max_model_rows:
        raise ValueError(
            f"unigram model has {n_model} rows > max_model_rows={max_model_rows}; "
            "shrink the vocabulary (e.g. hash words into buckets) before "
            "broadcasting"
        )
    df = rows.to_pandas()
    return df, int(df["ct"].sum()), int(df["cr"].sum()), len(df) + 1


def dsir_weights(
    docs: ray.data.Dataset,
    *,
    ref_mod: int = 5,
    round_to: int = 4,
    max_model_rows: int = 5_000_000,
) -> ray.data.Dataset:
    """DSIR importance weights (Xie et al., 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    log-likelihood ratio between a target distribution (here the
    deterministic reference slice ``doc_id % ref_mod == 0``) and the
    raw-corpus distribution, over add-one-smoothed unigram features:

        logratio(d) = mean_{w in d} ln( p_target(w) / p_raw(w) )
        p_X(w) = (c_X(w) + 1) / (N_X + V)

    The mean (DSIR's feature-normalized form) keeps the weight length-
    independent.  Output (doc_id, n_tokens, logratio) for every doc
    with at least one token; target-slice docs score too (their ratios
    are the calibration band).  Same broadcast/working-set shape as
    ``lm_perplexity``; SQL twin ``dsir_weights``.
    """
    counts_df, n_t, n_r, vocab = _unigram_counts(
        docs, ref_mod, max_model_rows=max_model_rows
    )
    model_ref = ray.put((counts_df, float(n_t), float(n_r), float(vocab)))

    def score(batch: pa.Table) -> pa.Table:
        cdf, nt, nr, v = _cached_model(model_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        ws: list = []
        n_tok = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = _tokens(t)
            ws.extend(toks)
            n_tok[i] = len(toks)
        has = n_tok > 0
        if not has.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "logratio": pa.array([], type=pa.float64()),
                }
            )
        df = pd.DataFrame({"w": ws}).merge(cdf, on="w", how="left", copy=False)
        ct = df["ct"].to_numpy(dtype=np.float64, na_value=0.0)
        cr = df["cr"].to_numpy(dtype=np.float64, na_value=0.0)
        lr = np.log(((ct + 1.0) / (nt + v)) / ((cr + 1.0) / (nr + v)))
        ends = np.cumsum(n_tok[has])
        sums = np.add.reduceat(lr, np.concatenate(([0], ends[:-1])))
        out = np.round(sums / n_tok[has], round_to)
        return pa.table(
            {
                "doc_id": pa.array(ids[has], type=pa.int64()),
                "n_tokens": pa.array(n_tok[has], type=pa.int64()),
                "logratio": pa.array(out, type=pa.float64()),
            }
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )


def dsir_select(
    docs: ray.data.Dataset,
    *,
    k: int = 100,
    ref_mod: int = 5,
) -> ray.data.Dataset:
    """DSIR selection: the k raw-corpus documents most target-like by
    importance weight — ORDER BY logratio DESC, doc_id LIMIT k over the
    non-reference slice (the reference docs are the target, selecting
    them back would be circular).  A distributed top-k: per-block heads
    via sort inside the scoring plan, one bounded ``limit`` pull; the
    deterministic (logratio, doc_id) tie-break keeps the selected SET
    engine-independent.  SQL twin ``dsir_select``."""
    scored = dsir_weights(docs, ref_mod=ref_mod)

    def raw_only(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % ref_mod != 0))

    return (
        scored.map_batches(raw_only, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "logratio"])
        .sort(["logratio", "doc_id"], descending=[True, False])
        .limit(k)
    )


def lexical_diversity(
    docs: ray.data.Dataset,
    *,
    round_to: int = 4,
) -> ray.data.Dataset:
    """Per-document lexical-diversity features: token count, distinct
    count, type-token ratio, and Shannon entropy of the within-doc word
    distribution (nats) — the standard diversity signals a quality
    classifier consumes next to perplexity (low entropy = repetitive /
    template text).  MAP-ONLY: every feature is a function of one
    document, no exchange anywhere; same ``[a-z0-9]+`` tokenization as
    the LM family so the DuckDB twin is exact.  Output
    (doc_id, n_tokens, n_distinct, ttr, entropy); zero-token docs are
    excluded (the oracle's GROUP BY drops them identically).  ttr is
    the RAW double ratio (small-int division is bit-identical across
    engines, while ROUND ties break differently: Python rounds
    half-even, DuckDB half-away); entropy is rounded to ``round_to``
    (irrational sums, tie-free)."""

    def features(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_n, out_d, out_ttr, out_h = [], [], [], [], []
        for i, t in enumerate(batch["text"].to_pylist()):
            ws = _tokens(t)
            n = len(ws)
            if n == 0:
                continue
            c = np.asarray(list(Counter(ws).values()), dtype=np.float64)
            p = c / n
            out_id.append(ids[i])
            out_n.append(n)
            out_d.append(len(c))
            out_ttr.append(len(c) / n)
            out_h.append(round(float(-(p * np.log(p)).sum()), round_to))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_tokens": pa.array(out_n, type=pa.int64()),
                "n_distinct": pa.array(out_d, type=pa.int64()),
                "ttr": pa.array(out_ttr, type=pa.float64()),
                "entropy": pa.array(out_h, type=pa.float64()),
            }
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(features, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )
