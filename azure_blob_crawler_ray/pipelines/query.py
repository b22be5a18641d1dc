"""Query-side operators — the reference's MCP search tools (SURVEY.md
§2.11 Q1-Q5) re-expressed over Ray Datasets:

  Q1 text search   -> vectorized term-frequency scoring + exact top-k
  Q2 vector search -> brute-force cosine top-k (pipelines/similarity.py)
  Q3 hybrid        -> rank fusion of Q1 and Q2. Default is RRF
                      (score = Σ 1/(60+rank)) matching the published
                      semantics the reference delegates to Azure
                      (ref shared/azure_clients/search_client.py:239-259);
                      ``fusion="borda"`` keeps the integer rank-sum
                      variant
  Q4 get_all_docs  -> select id + deterministic order + cap
  Q5 projection    -> select_columns / drop vector

All scores that cross an engine boundary are INTEGERS (occurrence counts
and ranks) so conformance is exact, never float-rounded. Top-k ties break
by ascending doc id — the explicit determinism the reference lacks
(SURVEY.md §2.9)."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import SEARCH_ALL_DOCS_MAX, SEARCH_DEFAULT_TOP, SEARCH_MAX_TOP
from ..functions.textstats import occurrences
from .similarity import _emb_matrix, _normalize


def clamp_top(top: int) -> int:
    """ref services/mcp_server/app/app.py:97 — clamp to [1, max]."""
    return max(1, min(int(top), SEARCH_MAX_TOP))


def tf_scores(
    docs: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc integer relevance = Σ occurrences(term). Vectorized
    substring counting per batch; no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        score = np.zeros(batch.num_rows, dtype=np.int64)
        for t in terms:
            score += occurrences(batch[text_col], t).to_numpy().astype(np.int64)
        return pa.table({id_col: batch[id_col], "score": pa.array(score)})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def text_search(
    docs: ray.data.Dataset,
    terms: Sequence[str],
    *,
    top: int = SEARCH_DEFAULT_TOP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Q1: top-k by TF score desc, id asc. The sort input is the tiny
    (id, score) projection, not the corpus."""
    k = clamp_top(top)
    scored = tf_scores(docs, terms, id_col=id_col, text_col=text_col)
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


def vector_search_ranks(
    emb: ray.data.Dataset,
    *,
    num_queries: int = 4,
    top: int = SEARCH_DEFAULT_TOP,
) -> ray.data.Dataset:
    """Q2 output shape (query_id, rank, vec_id); see similarity module."""
    from .similarity import brute_force_topk

    return brute_force_topk(emb, num_queries=num_queries, k=clamp_top(top))


RRF_K = 60  # the published RRF constant (Cormack et al., SIGIR'09)


def hybrid_search(
    docs: ray.data.Dataset,
    emb: ray.data.Dataset,
    terms: Sequence[str],
    query_vec_id: int = 0,
    *,
    top: int = SEARCH_DEFAULT_TOP,
    pool: int = 100,
    fusion: str = "rrf",
) -> ray.data.Dataset:
    """Q3: join documents (text score) with embeddings (cosine rank to
    the query vector) on doc_id == vec_id, fuse the two rank lists, top-k.
    ``fusion="rrf"`` (default): fused = 1/(60+text_rank) + 1/(60+vec_rank),
    descending — the semantics Azure applies server-side in the reference
    (ref search_client.py:239-259). ``fusion="borda"``: integer rank sum,
    ascending. Ranks are over a fixed candidate pool of ``pool`` ids;
    embedding side is broadcast-scored inside map_batches (small-side
    lookup, no shuffle join)."""
    import ray as _ray

    k = clamp_top(top)
    # cosine scores of every vector vs the chosen query vector
    qdf = emb.filter(expr=f"vec_id == {query_vec_id}").to_pandas()
    qv = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))[0]
    q_ref = _ray.put(qv)

    def cos(batch: pa.Table) -> pa.Table:
        v = _ray.get(q_ref)
        m = _normalize(_emb_matrix(batch))
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cos": pa.array(m @ v, type=pa.float64()),
            }
        )

    cos_pool = (
        emb.map_batches(cos, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cos", "vec_id"], descending=[True, False])
        .limit(pool)
        .to_pandas()
    )
    cos_pool["vec_rank"] = np.arange(1, len(cos_pool) + 1, dtype=np.int64)

    tf_pool = (
        tf_scores(docs, terms)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(pool)
        .to_pandas()
    )
    tf_pool["text_rank"] = np.arange(1, len(tf_pool) + 1, dtype=np.int64)

    merged = tf_pool.merge(
        cos_pool, left_on="doc_id", right_on="vec_id", how="inner"
    )[["doc_id", "text_rank", "vec_rank"]]
    if fusion == "rrf":
        merged["fused"] = 1.0 / (RRF_K + merged["text_rank"].to_numpy()) + 1.0 / (
            RRF_K + merged["vec_rank"].to_numpy()
        )
        merged = merged.sort_values(
            ["fused", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        types = {"doc_id": "int64", "text_rank": "int64", "vec_rank": "int64",
                 "fused": "float64"}
    elif fusion == "borda":
        merged["fused"] = merged["text_rank"] + merged["vec_rank"]
        merged = merged.sort_values(["fused", "doc_id"], kind="mergesort").head(k)
        types = {"doc_id": "int64", "text_rank": "int64", "vec_rank": "int64",
                 "fused": "int64"}
    else:
        raise ValueError(f"unknown fusion {fusion!r} (expected 'rrf' or 'borda')")
    return ray.data.from_pandas(merged.reset_index(drop=True).astype(types))


def filtered_hybrid(
    docs: ray.data.Dataset,
    emb: ray.data.Dataset,
    terms: Sequence[str],
    query_vec_id: int = 0,
    *,
    expr: str,
    top: int = SEARCH_DEFAULT_TOP,
    pool: int = 100,
    fusion: str = "rrf",
    vector_filter_mode: str = "preFilter",
) -> ray.data.Dataset:
    """Q3 + filter_query: hybrid RRF search constrained by an attribute
    predicate — the reference's most common composite query (S12 accepts
    an OData ``filter_query`` together with text+vector search AND a
    ``vector_filter_mode``, ref shared/azure_clients/search_client.py:
    199-296, esp. :207,256-263).  The text leg is always pre-filtered
    (the reference attaches the scalar filter to the text query
    unconditionally, :262-263); ``vector_filter_mode`` picks the vector
    leg's semantics:

      * ``preFilter`` (default): the predicate restricts the vector
        candidate set BEFORE ranks are assigned — ranks are dense over
        eligible vectors;
      * ``postFilter``: vectors rank over the WHOLE corpus, then
        ineligible rows drop — rank numbers keep their unfiltered
        positions and the pool may come back short, exactly Azure's
        score-then-filter behavior.

    Scale shape: the predicate pushes down on the documents side for the
    text pool; the preFilter vector side is an EXACT distributed
    semi-join — cosine scores compute map-side, then one
    ``bucket_hash_join`` against the eligible doc_id projection (a Bloom
    filter would pass false positives into the rank pool and corrupt
    rank numbers); the postFilter side ranks first and then verifies
    only the ``pool`` winners against the predicate with a key-pushdown
    scan (bounded, never the dimension)."""
    import ray as _ray

    from .relational import bucket_hash_join

    k = clamp_top(top)
    fdocs = docs.filter(expr=expr)
    qdf = emb.filter(expr=f"vec_id == {query_vec_id}").to_pandas()
    qv = _normalize(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))[0]
    q_ref = _ray.put(qv)

    def cos(batch: pa.Table) -> pa.Table:
        v = _ray.get(q_ref)
        m = _normalize(_emb_matrix(batch))
        return pa.table(
            {
                "vec_id": pc.cast(batch["vec_id"], pa.int64()),
                "cos": pa.array(m @ v, type=pa.float64()),
            }
        )

    def keys_only(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(batch["doc_id"], pa.int64())})

    eligible = fdocs.map_batches(
        keys_only, batch_format="pyarrow", zero_copy_batch=True
    )
    scored = emb.map_batches(cos, batch_format="pyarrow", zero_copy_batch=True)
    if vector_filter_mode == "preFilter":
        cos_pool = (
            bucket_hash_join(
                scored,
                eligible,
                left_on="vec_id",
                right_on="doc_id",
                left_schema=pa.schema([("vec_id", pa.int64()), ("cos", pa.float64())]),
                right_schema=pa.schema([("doc_id", pa.int64())]),
            )
            .sort(["cos", "vec_id"], descending=[True, False])
            .limit(pool)
            .to_pandas()
        )
        cos_pool["vec_rank"] = np.arange(1, len(cos_pool) + 1, dtype=np.int64)
    elif vector_filter_mode == "postFilter":
        cos_pool = (
            scored.sort(["cos", "vec_id"], descending=[True, False])
            .limit(pool)
            .to_pandas()
        )
        cos_pool["vec_rank"] = np.arange(1, len(cos_pool) + 1, dtype=np.int64)
        # verify only the pool winners against the predicate — a
        # key-pushdown scan returns <= pool rows, never the dimension
        wset = pa.array(cos_pool["vec_id"].to_numpy().astype(np.int64))

        def pick(batch: pa.Table) -> pa.Table:
            m = pc.is_in(pc.cast(batch["doc_id"], pa.int64()), value_set=wset)
            return pa.table(
                {"doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(m)}
            )

        ok = eligible.map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        cos_pool = cos_pool[cos_pool["vec_id"].isin(set(ok["doc_id"]))]
    else:
        raise ValueError(
            f"unknown vector_filter_mode {vector_filter_mode!r} "
            "(expected 'preFilter' or 'postFilter')"
        )

    tf_pool = (
        tf_scores(fdocs, terms)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(pool)
        .to_pandas()
    )
    tf_pool["text_rank"] = np.arange(1, len(tf_pool) + 1, dtype=np.int64)

    merged = tf_pool.merge(
        cos_pool, left_on="doc_id", right_on="vec_id", how="inner"
    )[["doc_id", "text_rank", "vec_rank"]]
    if fusion == "rrf":
        merged["fused"] = 1.0 / (RRF_K + merged["text_rank"].to_numpy()) + 1.0 / (
            RRF_K + merged["vec_rank"].to_numpy()
        )
        merged = merged.sort_values(
            ["fused", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        types = {"doc_id": "int64", "text_rank": "int64", "vec_rank": "int64",
                 "fused": "float64"}
    elif fusion == "borda":
        merged["fused"] = merged["text_rank"] + merged["vec_rank"]
        merged = merged.sort_values(["fused", "doc_id"], kind="mergesort").head(k)
        types = {"doc_id": "int64", "text_rank": "int64", "vec_rank": "int64",
                 "fused": "int64"}
    else:
        raise ValueError(f"unknown fusion {fusion!r} (expected 'rrf' or 'borda')")
    return ray.data.from_pandas(merged.reset_index(drop=True).astype(types))


def bm25_search(
    docs: ray.data.Dataset,
    terms: Sequence[str],
    *,
    top: int = SEARCH_DEFAULT_TOP,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Okapi BM25 top-k (the length-normalized upgrade of Q1's raw TF
    scoring; Robertson/Sparck-Jones idf with the Lucene +1 floor so idf
    is always positive).  Two streaming passes:

      pass 1  corpus stats — N, Σdl, per-term document frequency — as one
              per-batch combine + a tiny global aggregate (never a
              per-doc shuffle);
      pass 2  vectorized per-batch scoring with the broadcast stats, then
              a sort over the (id, score) projection only.

    The reported score is ``score_e6`` = round(score * 1e6) as int64: the
    engine-boundary contract stays integer while full-double precision
    still decides the ordering (ties then break by id ascending)."""
    from ray.data.aggregate import Sum as _Sum

    k = clamp_top(top)
    terms = list(terms)

    def stats(batch: pa.Table) -> pa.Table:
        wc = pc.count_substring_regex(batch[text_col], r"\S+")
        cols = {
            "n": pa.array([batch.num_rows], type=pa.int64()),
            "sum_dl": pa.array([pc.sum(wc).as_py() or 0], type=pa.int64()),
        }
        for i, t in enumerate(terms):
            occ = occurrences(batch[text_col], t).to_numpy()
            cols[f"df{i}"] = pa.array([int((occ > 0).sum())], type=pa.int64())
        return pa.table(cols)

    agg = docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        _Sum("n"), _Sum("sum_dl"), *[_Sum(f"df{i}") for i in range(len(terms))]
    )
    n = float(agg["sum(n)"])
    avgdl = float(agg["sum(sum_dl)"]) / n
    idf = [
        np.log((n - float(agg[f"sum(df{i})"]) + 0.5) / (float(agg[f"sum(df{i})"]) + 0.5) + 1.0)
        for i in range(len(terms))
    ]
    import ray as _ray

    ref = _ray.put((idf, avgdl))

    def score(batch: pa.Table) -> pa.Table:
        idf_, avgdl_ = _ray.get(ref)
        dl = pc.count_substring_regex(batch[text_col], r"\S+").to_numpy().astype(
            np.float64
        )
        denom_norm = k1 * (1.0 - b + b * dl / avgdl_)
        s = np.zeros(batch.num_rows, dtype=np.float64)
        for i, t in enumerate(terms):
            tf = occurrences(batch[text_col], t).to_numpy().astype(np.float64)
            s += idf_[i] * (tf * (k1 + 1.0)) / (tf + denom_norm)
        return pa.table(
            {
                id_col: batch[id_col],
                "score": pa.array(s),
                # floor(x*1e6 + 0.5): identical in every engine for the
                # positive scores BM25+1 guarantees (np.round would be
                # half-to-even, SQL ROUND half-away)
                "score_e6": pa.array(np.floor(s * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return (
        docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
        .select_columns([id_col, "score_e6"])
    )


def get_all_docs(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    cap: int = SEARCH_ALL_DOCS_MAX,
) -> ray.data.Dataset:
    """Q4: ids only, deterministic order, hard cap
    (ref app.py:139-178, settings.py:146)."""
    return docs.select_columns([id_col]).sort(id_col).limit(cap)


def filter_select(
    docs: ray.data.Dataset,
    *,
    expr: str,
    columns: List[str],
    sort_by: str,
) -> ray.data.Dataset:
    """J2/Q5: OData-style filter + field selection (ref app.py:96,127;
    search_client.py:256-267) as predicate + projection pushdown."""
    return docs.filter(expr=expr).select_columns(columns).sort(sort_by)
