"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module:
nothing here (or in the library code it calls) initialises or shuts down
Ray. Each ``queries()`` entry is one operator/pipeline from SURVEY.md §2
(or a training-data op the 100 TB pipeline needs); ``oracle_sql()`` holds
the DuckDB-equivalent SQL for every SQL-expressible entry, with IDENTICAL
output column names. Scores that cross the boundary are integers
(occurrence counts / ranks) or 2-decimal-rounded sums, so value hashes
are exact.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

import ray.data


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _docs_as_blobs(sf_dir: str) -> ray.data.Dataset:
    """documents rows -> synthetic text blobs for the ingest pipeline:
    blob_name = '{source}/{doc_id}.txt', payload = utf-8 text bytes."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        names = [
            f"{s}/{d}.txt"
            for s, d in zip(batch["source"].to_pylist(), batch["doc_id"].to_pylist())
        ]
        payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "url": pa.array([f"https://corpus/{n}" for n in names]),
                "blob_name": pa.array(names, type=pa.string()),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "source", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# entry — flagship smoke
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship ingest pipeline (parse -> chunk -> embed -> index) over
    the sf0.001 documents table reinterpreted as text blobs."""
    from azure_blob_crawler_ray.pipelines.ingest import ingest

    blobs = _docs_as_blobs("/root/testdata/sf0.001")
    return ingest(blobs, embed_dim=64)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

SEARCH_TERMS = ("data", "join")
NUM_ANN_QUERIES = 8
ANN_K = 10
NEAR_DUP_THRESHOLD = 0.4  # synthetic 64-d embeddings: ~60 pairs clear it


def queries() -> dict[str, Callable[[str], Any]]:
    from azure_blob_crawler_ray.pipelines import dataprep, query, relational, similarity

    def q_text_stats(sf):
        return dataprep.text_stats(_read(sf, "documents", ["doc_id", "text"]))

    def q_langid(sf):
        return dataprep.langid(_read(sf, "documents", ["doc_id", "text"]))

    def q_fingerprint(sf):
        return dataprep.fingerprint(
            _read(sf, "documents", ["doc_id", "text"])
        ).select_columns(["doc_id", "fp"])

    def q_exact_dedup(sf):
        return dataprep.exact_dedup(_read(sf, "documents", ["doc_id", "text"]))

    def q_doc_lang_stats(sf):
        from ray.data.aggregate import Count, Sum

        return (
            _read(sf, "documents", ["lang", "n_chars"])
            .groupby("lang")
            .aggregate(Count(alias_name="doc_count"), Sum("n_chars", alias_name="total_chars"))
            .sort("lang")
        )

    def q_text_search(sf):
        return query.text_search(
            _read(sf, "documents", ["doc_id", "text"]), SEARCH_TERMS, top=10
        )

    def q_hybrid_search(sf):
        return query.hybrid_search(
            _read(sf, "documents", ["doc_id", "text"]),
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            SEARCH_TERMS,
            query_vec_id=0,
            top=10,
            pool=100,
        )

    def q_filtered_hybrid(sf):
        return query.filtered_hybrid(
            _read(sf, "documents", ["doc_id", "text", "lang", "n_chars"]),
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            SEARCH_TERMS,
            query_vec_id=0,
            expr="lang == 'en' and n_chars >= 200",
            top=10,
            pool=100,
        )

    def q_filtered_hybrid_post(sf):
        return query.filtered_hybrid(
            _read(sf, "documents", ["doc_id", "text", "lang", "n_chars"]),
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            SEARCH_TERMS,
            query_vec_id=0,
            expr="lang == 'en' and n_chars >= 200",
            top=10,
            pool=100,
            vector_filter_mode="postFilter",
        )

    def q_get_all_docs(sf):
        return query.get_all_docs(_read(sf, "documents", ["doc_id"]))

    def q_filter_select(sf):
        return query.filter_select(
            _read(sf, "documents", ["doc_id", "lang", "source", "n_chars"]),
            expr="lang == 'en' and n_chars >= 200",
            columns=["doc_id", "source", "n_chars"],
            sort_by="doc_id",
        )

    def q_ann_topk(sf):
        return similarity.brute_force_topk(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            num_queries=NUM_ANN_QUERIES,
            k=ANN_K,
        )

    def q_filtered_ann_pre(sf):
        return similarity.filtered_topk(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"]),
            num_queries=NUM_ANN_QUERIES,
            k=ANN_K,
            filter_column="label",
            filter_value=1,
            mode="preFilter",
        )

    def q_filtered_ann_post(sf):
        return similarity.filtered_topk(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"]),
            num_queries=NUM_ANN_QUERIES,
            k=ANN_K,
            filter_column="label",
            filter_value=1,
            mode="postFilter",
        )

    def q_cosine_near_dup(sf):
        return similarity.cosine_near_dup_pairs(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            threshold=NEAR_DUP_THRESHOLD,
        ).sort(["vec_a", "vec_b"])

    def q_ingest_chunks(sf):
        from azure_blob_crawler_ray.pipelines.ingest import chunk_stage, parse_stage

        chunks = chunk_stage(parse_stage(_docs_as_blobs(sf)))
        return (
            chunks.select_columns(["chunk_id", "content"])
            .rename_columns({"chunk_id": "id"})
            .sort("id")
        )

    def q_lineitem_agg(sf):
        return relational.lineitem_agg(_read(sf, "lineitem"))

    def q_top_customers(sf):
        return relational.top_customers(
            _read(sf, "orders", ["o_custkey", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_name"]),
            k=10,
        )

    def q_customers_per_region(sf):
        return relational.customers_per_region(
            _read(sf, "customer", ["c_nationkey"]),
            _read(sf, "nation"),
            _read(sf, "region"),
        )

    def q_events_by_type(sf):
        return relational.events_by_type(_read(sf, "events", ["event_type", "value"]))

    def q_events_daily(sf):
        return relational.events_daily(_read(sf, "events", ["ts", "event_type"]))

    def q_order_priority(sf):
        return relational.order_priority_counts(
            _read(sf, "orders", ["o_orderstatus", "o_orderpriority"])
        )

    def q_parts_by_brand(sf):
        return relational.parts_by_brand(_read(sf, "part", ["p_brand", "p_retailprice"]))

    def q_order_customer_join(sf):
        return relational.order_customer_join(
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_name"]),
            min_total=400_000.0,
        )

    def q_sessionize(sf):
        return relational.sessionize(
            _read(sf, "events", ["user_id", "event_id", "ts"]), gap_minutes=30
        )

    def q_asof_join(sf):
        ev = _read(sf, "events", ["event_id", "ts", "user_id", "event_type"])
        return relational.asof_join(
            ev.filter(expr="event_type == 'purchase'"),
            ev.filter(expr="event_type == 'click'"),
            on="user_id",
            left_out="purchase_event_id",
            right_out="click_event_id",
        )

    def q_range_join(sf):
        import pyarrow as pa
        import pyarrow.compute as pc
        from ray.data.aggregate import Count, Sum

        bands = pa.table(
            {
                "lo": [0.0, 100_000.0, 200_000.0, 400_000.0],
                "hi": [100_000.0, 200_000.0, 400_000.0, 1e12],
                "band_id": [0, 1, 2, 3],
            }
        )
        joined = relational.range_join(
            _read(sf, "orders", ["o_orderkey", "o_totalprice"]),
            bands,
            value_col="o_totalprice",
        )

        def finish(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "band_id": batch["band_id"],
                    "order_count": batch["count()"],
                    "revenue": pc.round(batch["sum(o_totalprice)"], ndigits=2),
                }
            )

        return (
            joined.groupby("band_id")
            .aggregate(Count(), Sum("o_totalprice"))
            .map_batches(finish, batch_format="pyarrow")
            .sort("band_id")
        )

    def q_top_orders_per_customer(sf):
        return relational.top_orders_per_customer(
            _read(sf, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]), k=2
        )

    def q_window_totals(sf):
        return relational.user_running_totals(
            _read(sf, "events", ["user_id", "event_id", "ts", "value"])
        )

    def q_shipping_priority(sf):
        return relational.shipping_priority(
            _read(sf, "customer", ["c_custkey", "c_mktsegment"]),
            _read(
                sf,
                "orders",
                ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            ),
            _read(sf, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]),
        )

    def q_user_type_sets(sf):
        return relational.user_type_sets(
            _read(sf, "events", ["user_id", "event_type"])
        )

    def q_moving_avg(sf):
        return relational.moving_avg_per_user(
            _read(sf, "events", ["user_id", "event_id", "ts", "value"])
        )

    def q_inter_event_gaps(sf):
        return relational.inter_event_gaps(
            _read(sf, "events", ["user_id", "event_id", "ts"])
        )

    def q_event_transitions(sf):
        return relational.event_transitions(
            _read(sf, "events", ["user_id", "event_id", "event_type", "ts"])
        )

    def q_regex_match_stats(sf):
        return dataprep.regex_match_stats(_read(sf, "documents", ["lang", "text"]))

    def q_triangles(sf):
        from azure_blob_crawler_ray.pipelines import graph

        pairs = dataprep.ngram_jaccard_pairs(
            _read(sf, "documents", ["doc_id", "text"]),
            ngram=12,
            threshold=0.35,
            max_posting=200,
        )
        return graph.triangles(pairs)

    def q_weighted_sample(sf):
        return dataprep.weighted_sample(
            _read(sf, "documents", ["doc_id", "text", "n_chars"])
        )

    def q_fuzzy_pairs(sf):
        return dataprep.fuzzy_pairs(_read(sf, "customer", ["c_name"]))

    def q_approx_quantiles(sf):
        return dataprep.approx_quantiles(
            _read(sf, "lineitem", ["l_returnflag", "l_extendedprice"]),
            value_col="l_extendedprice",
            group_col="l_returnflag",
        )

    def q_length_histogram(sf):
        return dataprep.length_histogram(_read(sf, "documents", ["n_chars"]))

    def q_group_zscore(sf):
        return dataprep.group_zscore(
            _read(sf, "documents", ["doc_id", "lang", "n_chars"])
        )

    def q_tfidf_top_terms(sf):
        return dataprep.tfidf_top_terms(_read(sf, "documents", ["doc_id", "text"]))

    def q_funnel_stage(sf):
        return relational.funnel_stage(
            _read(sf, "events", ["user_id", "event_type", "ts"])
        )

    def q_mode_event_type(sf):
        return relational.mode_event_type(
            _read(sf, "events", ["user_id", "event_type"])
        )

    def q_corr_qty_discount(sf):
        return relational.corr_qty_discount(
            _read(sf, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])
        )

    def q_monthly_growth(sf):
        return relational.monthly_growth(
            _read(sf, "orders", ["o_orderdate", "o_totalprice"])
        )

    def q_type_cooccurrence(sf):
        return relational.type_cooccurrence(
            _read(sf, "events", ["user_id", "event_type"])
        )

    def q_global_rank(sf):
        return relational.global_rank(
            _read(sf, "orders", ["o_orderkey", "o_totalprice"])
        )

    def q_source_entropy(sf):
        return dataprep.source_entropy(_read(sf, "documents", ["lang", "source"]))

    def q_json_prop_stats(sf):
        return relational.json_prop_stats(
            _read(sf, "events", ["event_type", "props"])
        )

    def q_revenue_share(sf):
        return relational.revenue_share(
            _read(sf, "orders", ["o_orderpriority", "o_totalprice"])
        )

    def q_cohort_retention(sf):
        return relational.cohort_retention(_read(sf, "events", ["user_id", "ts"]))

    def q_rolling_active_users(sf):
        return relational.rolling_active_users(
            _read(sf, "events", ["user_id", "ts"])
        )

    def q_unpivot_daily(sf):
        return relational.unpivot_daily(_read(sf, "events", ["ts", "event_type"]))

    def q_lang_sources(sf):
        return dataprep.lang_sources(_read(sf, "documents", ["lang", "source"]))

    def q_pagerank(sf):
        from azure_blob_crawler_ray.pipelines import graph

        pairs = dataprep.ngram_jaccard_pairs(
            _read(sf, "documents", ["doc_id", "text"]),
            ngram=12,
            threshold=0.5,
            max_posting=200,
        )
        return graph.pagerank_int(pairs)

    def q_anti_join(sf):
        return relational.customers_without_orders(
            _read(sf, "customer", ["c_custkey", "c_name"]),
            _read(sf, "orders", ["o_custkey", "o_totalprice"]),
            min_total=300_000.0,
        )

    def q_semi_join(sf):
        return relational.customers_with_big_orders(
            _read(sf, "customer", ["c_custkey", "c_name"]),
            _read(sf, "orders", ["o_custkey", "o_totalprice"]),
            min_total=450_000.0,
        )

    def q_events_pivot(sf):
        return relational.pivot_counts(
            _read(sf, "events", ["ts", "event_type"]),
            categories=("click", "error", "purchase", "signup", "view"),
        )

    def q_distinct_users(sf):
        return relational.distinct_users_per_type(
            _read(sf, "events", ["event_type", "user_id"])
        )

    def q_orders_above_avg(sf):
        return relational.orders_above_customer_avg(
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        )

    def q_events_rollup(sf):
        return relational.events_rollup(_read(sf, "events", ["ts", "event_type"]))

    def q_price_quantiles(sf):
        return relational.group_quantiles(
            _read(sf, "lineitem", ["l_returnflag", "l_extendedprice"]),
            value_col="l_extendedprice",
            group_col="l_returnflag",
            qs=(0.5, 0.9, 0.99),
        )

    def q_bm25_search(sf):
        return query.bm25_search(
            _read(sf, "documents", ["doc_id", "text"]), SEARCH_TERMS, top=10
        )

    def q_term_frequencies(sf):
        return dataprep.term_frequencies(
            _read(sf, "documents", ["doc_id", "text"]), top_k=50
        )

    def q_length_stats(sf):
        return dataprep.length_stats_by_lang(
            _read(sf, "documents", ["lang", "n_chars"])
        )

    def q_stable_split(sf):
        return dataprep.stable_split(_read(sf, "documents", ["doc_id", "text"]))

    def q_training_order(sf):
        return dataprep.training_order(
            _read(sf, "documents", ["doc_id"]), shards=8, seed=17
        )

    def q_source_cap(sf):
        return dataprep.source_cap(
            _read(sf, "documents", ["doc_id", "source", "n_chars"]), k=50
        )

    def q_stratified_sample(sf):
        return dataprep.stratified_sample(
            _read(sf, "documents", ["doc_id", "lang", "text"]), per_stratum=20
        )

    def q_pack_sequences(sf):
        return dataprep.pack_sequences(
            _read(sf, "documents", ["doc_id", "text"]), capacity=500
        )

    def q_pack_interleaved(sf):
        return dataprep.pack_interleaved(
            _read(sf, "documents", ["doc_id", "text"]),
            capacity=800,
            media_every=3,
            media_tokens=64,
        )

    def q_index_delete(sf):
        from azure_blob_crawler_ray.pipelines.index_ops import index_delete

        docs = _read(sf, "documents", ["doc_id", "n_chars"])
        all_ids = docs.select_columns(["doc_id"]).to_pandas()["doc_id"]
        victims = all_ids[all_ids % 10 == 0].tolist()
        return index_delete(docs, victims, id_col="doc_id").sort("doc_id")

    def q_index_upsert(sf):
        import pyarrow as pa
        import pyarrow.compute as pc

        from azure_blob_crawler_ray.pipelines.index_ops import index_upsert

        docs = _read(sf, "documents", ["doc_id", "text"]).rename_columns(
            {"text": "content"}
        )

        def revise(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "content": pc.replace_substring(batch["content"], "data", "DATA"),
                }
            )

        new = docs.filter(expr="doc_id < 50").map_batches(
            revise, batch_format="pyarrow", zero_copy_batch=True
        )
        return index_upsert(docs, new, id_col="doc_id").sort("doc_id")

    def q_index_upsert_copart(sf):
        import pyarrow as pa
        import pyarrow.compute as pc

        from azure_blob_crawler_ray.pipelines.index_ops import index_upsert

        docs = _read(sf, "documents", ["doc_id", "text"]).rename_columns(
            {"text": "content"}
        )

        def revise(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "content": pc.replace_substring(batch["content"], "data", "DATA"),
                }
            )

        new = docs.filter(expr="doc_id < 50").map_batches(
            revise, batch_format="pyarrow", zero_copy_batch=True
        )
        return index_upsert(docs, new, id_col="doc_id", copartition=True).sort(
            "doc_id"
        )

    def q_latest_event_per_user(sf):
        return relational.latest_event_per_user(
            _read(sf, "events", ["user_id", "event_id", "ts"])
        )

    def q_nation_balance(sf):
        return relational.nation_balance(
            _read(sf, "customer", ["c_nationkey", "c_acctbal"]),
            _read(sf, "supplier", ["s_nationkey", "s_acctbal"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        )

    def q_events_hopping(sf):
        return relational.events_hopping(
            _read(sf, "events", ["ts", "value"]), size_days=2, hop_days=1
        )

    def q_bigram_counts(sf):
        return dataprep.bigram_counts(
            _read(sf, "documents", ["doc_id", "text"]), top_k=50
        )

    def q_lm_perplexity(sf):
        from azure_blob_crawler_ray.pipelines import lm

        return lm.lm_perplexity(_read(sf, "documents", ["doc_id", "text"]))

    def q_ccnet_buckets(sf):
        from azure_blob_crawler_ray.pipelines import lm

        return lm.ccnet_buckets(_read(sf, "documents", ["doc_id", "text"]))

    def q_dsir_weights(sf):
        from azure_blob_crawler_ray.pipelines import lm

        return lm.dsir_weights(_read(sf, "documents", ["doc_id", "text"]))

    def q_dsir_select(sf):
        from azure_blob_crawler_ray.pipelines import lm

        return lm.dsir_select(_read(sf, "documents", ["doc_id", "text"]), k=100)

    def q_lexical_diversity(sf):
        from azure_blob_crawler_ray.pipelines import lm

        return lm.lexical_diversity(_read(sf, "documents", ["doc_id", "text"]))

    def q_decontaminate(sf):
        return dataprep.decontaminate(
            _read(sf, "documents", ["doc_id", "text"]), bench_below=20, ngram=20
        )

    def q_shard_manifest(sf):
        return dataprep.shard_manifest(
            _read(sf, "documents", ["doc_id", "n_chars"]), num_shards=16
        )

    def q_label_centroids(sf):
        return similarity.label_centroids(
            _read(sf, "embeddings", ["label", "embedding"])
        )

    def q_embed_covariance(sf):
        from azure_blob_crawler_ray.pipelines import decomp

        return decomp.embed_covariance(_read(sf, "embeddings", ["embedding"]))

    def q_pca_variance(sf):
        from azure_blob_crawler_ray.pipelines import decomp

        return decomp.pca_variance(_read(sf, "embeddings", ["embedding"]), k=8)

    def q_pca_project(sf):
        from azure_blob_crawler_ray.pipelines import decomp

        return decomp.pca_project(
            _read(sf, "embeddings", ["vec_id", "embedding"]), k=4
        )

    def q_kmeans_clusters(sf):
        from azure_blob_crawler_ray.pipelines import decomp

        return decomp.kmeans_clusters(
            _read(sf, "embeddings", ["vec_id", "embedding"]), k=8, iters=4
        )

    def q_pca_whiten(sf):
        from azure_blob_crawler_ray.pipelines import decomp

        return decomp.pca_whiten(
            _read(sf, "embeddings", ["vec_id", "embedding"]), k=4
        )

    def q_source_count_join(sf):
        return relational.source_count_join(
            _read(sf, "documents", ["doc_id", "source"])
        )

    def q_bloom_semi_revenue(sf):
        from azure_blob_crawler_ray.pipelines import bloomjoin

        return bloomjoin.bloom_semi_revenue(
            _read(
                sf,
                "lineitem",
                [
                    "l_orderkey",
                    "l_returnflag",
                    "l_quantity",
                    "l_extendedprice",
                    "l_discount",
                ],
            ),
            _read(sf, "orders", ["o_orderkey", "o_orderpriority"]),
            priority="1-URGENT",
        )

    def q_top_terms_per_lang(sf):
        return dataprep.top_terms_per_lang(
            _read(sf, "documents", ["lang", "text"]), k=10
        )

    def q_dedup_keep_best(sf):
        return dataprep.dedup_keep_best(
            _read(sf, "documents", ["doc_id", "text"]),
            ngram=12,
            threshold=0.5,
            max_posting=200,
        )

    def q_events_cube(sf):
        return relational.events_cube(_read(sf, "events", ["ts", "event_type"]))

    def q_normalize_text(sf):
        return dataprep.normalize_text(_read(sf, "documents", ["doc_id", "text"]))

    def q_media_frame_sample(sf):
        import pyarrow as pa
        import pyarrow.compute as pc

        from azure_blob_crawler_ray.stages.media import frame_sample

        def to_media(batch: pa.Table) -> pa.Table:
            import numpy as np

            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "media_id": batch["doc_id"],
                    "duration_s": pa.array(
                        (ids % 10 + 1).astype(np.float64), type=pa.float64()
                    ),
                }
            )

        media = _read(sf, "documents", ["doc_id"]).map_batches(
            to_media, batch_format="pyarrow", zero_copy_batch=True
        )

        def to_ms(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "frame": batch["frame"],
                    "t_ms": pc.cast(
                        pc.multiply(pc.cast(batch["frame"], pa.int64()), 500),
                        pa.int64(),
                    ),
                }
            )

        return (
            frame_sample(media, fps=2.0)
            .map_batches(to_ms, batch_format="pyarrow")
            .sort(["media_id", "frame"])
        )

    # ---- rows-only ops (non-SQL-expressible; driver records row counts) ----

    def q_minhash_lsh(sf):
        return dataprep.minhash_lsh_pairs(
            _read(sf, "documents", ["doc_id", "text"]), threshold=0.6
        )

    def q_incremental_dedup(sf):
        """Continuous-crawl dedup: split the corpus into two increments
        by doc_id parity, feed them through a fresh persisted band
        index, return the second increment's flags (rule 1 hits against
        run 1's docs + rule 2 within run 2). Sequential twin + chain/
        resume/layout tests: tests/test_incdedup.py."""
        import shutil as _sh
        import tempfile

        from azure_blob_crawler_ray.pipelines import incdedup

        import pyarrow.compute as _pc

        def _parity(par):
            def fn(b):
                return b.filter(
                    _pc.equal(_pc.bit_wise_and(b["doc_id"], 1), par)
                )

            return fn

        docs = _read(sf, "documents", ["doc_id", "text"])
        run1 = docs.map_batches(_parity(0), batch_format="pyarrow")
        run2 = docs.map_batches(_parity(1), batch_format="pyarrow")
        uri = tempfile.mkdtemp(prefix="abc_incdedup_", dir="/tmp")
        try:
            # num_shards sizes the index layout to the increment (the
            # 100 TB default is 64+; 16 keeps bench-scale file counts
            # sane). Run 1 only seeds the index — append alone, no flags.
            incdedup.minhash_index_append(uri, "0001", run1, num_shards=16)
            return (
                incdedup.incremental_minhash_dedup(
                    uri, "0002", run2, threshold=0.6, num_shards=16
                )
                .materialize()
                .sort("doc_id")
            )
        finally:
            _sh.rmtree(uri, ignore_errors=True)

    def q_simhash(sf):
        return dataprep.simhash_pairs(
            _read(sf, "documents", ["doc_id", "text"]), max_hamming=3
        )

    def q_ngram_jaccard(sf):
        # 12-char shingles keep postings sparse on this small-vocab
        # corpus; max_posting drops stop-shingles (present in >200 docs)
        # — the standard prefix-filter concession that keeps the
        # inverted-index pair explosion linear in true near-dup density
        return dataprep.ngram_jaccard_pairs(
            _read(sf, "documents", ["doc_id", "text"]),
            ngram=12,
            threshold=0.5,
            max_posting=200,
        )

    def q_dup_clusters(sf):
        from azure_blob_crawler_ray.pipelines import graph

        pairs = dataprep.ngram_jaccard_pairs(
            _read(sf, "documents", ["doc_id", "text"]),
            ngram=12,
            threshold=0.5,
            max_posting=200,
        )
        return graph.connected_components(pairs)

    def q_lsh_near_dup(sf):
        return similarity.lsh_near_dup_pairs(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            threshold=NEAR_DUP_THRESHOLD,
        )

    def q_heavy_hitters(sf):
        return dataprep.heavy_hitters(_read(sf, "documents", ["text"]))

    def q_quant_topk(sf):
        return similarity.quantized_topk(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            num_queries=NUM_ANN_QUERIES,
            k=ANN_K,
        )

    def q_ivf_topk(sf):
        return similarity.ivf_topk(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            num_queries=NUM_ANN_QUERIES,
            k=ANN_K,
        )

    def q_hnsw_topk(sf):
        return similarity.hnsw_topk(
            _read(sf, "embeddings", ["vec_id", "embedding"]),
            num_queries=NUM_ANN_QUERIES,
            k=ANN_K,
        )

    def q_ivf_persisted_topk(sf):
        """Persisted incremental IVF: build from the even vec_ids,
        append the odds as a second run (saved-centroid assignment),
        search reading only the probed lists' shard dirs. Recall /
        agreement / resume gates: tests/test_annindex.py."""
        import shutil as _sh
        import tempfile

        import pyarrow.compute as _pc

        from azure_blob_crawler_ray.pipelines import annindex

        emb = _read(sf, "embeddings", ["vec_id", "embedding"])

        def _parity(par):
            def fn(b):
                return b.filter(
                    _pc.equal(_pc.bit_wise_and(b["vec_id"], 1), par)
                )

            return fn

        uri = tempfile.mkdtemp(prefix="abc_ivfidx_", dir="/tmp")
        try:
            # centroids train on a full-corpus sample (train_on), not the
            # first increment alone — they are fixed forever at build
            annindex.ivf_index_build(
                uri,
                emb.map_batches(_parity(0), batch_format="pyarrow"),
                train_on=emb,
            )
            annindex.ivf_index_append(
                uri, "0001", emb.map_batches(_parity(1), batch_format="pyarrow")
            )
            return annindex.ivf_index_search(
                uri, emb, num_queries=NUM_ANN_QUERIES, k=ANN_K
            ).materialize()
        finally:
            _sh.rmtree(uri, ignore_errors=True)

    def q_quality(sf):
        return dataprep.quality_score(_read(sf, "documents", ["doc_id", "text"]))

    def q_token_count_bpe(sf):
        return dataprep.token_count_bpe(_read(sf, "documents", ["doc_id", "text"]))

    def q_approx_distinct(sf):
        return relational.approx_distinct_users_per_type(
            _read(sf, "events", ["event_type", "user_id"])
        )

    def q_interleaved_span_stats(sf):
        from azure_blob_crawler_ray.pipelines import spans

        return spans.interleaved_span_stats(_read(sf, "documents", ["doc_id", "text"]))

    def q_chunk_interleaved(sf):
        from azure_blob_crawler_ray.pipelines import spans

        derived = spans.derive_interleaved(
            _read(sf, "documents", ["doc_id", "text"])
        )
        return spans.chunk_interleaved(derived, max_tokens=48, media_tokens=16)

    def q_cumulative_revenue(sf):
        return relational.cumulative_revenue(
            _read(sf, "orders", ["o_orderdate", "o_totalprice"])
        )

    def q_late_shipments(sf):
        return relational.late_shipment_orders(
            _read(sf, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"]),
            _read(sf, "lineitem", ["l_orderkey", "l_shipdate"]),
        )

    def q_order_line_histogram(sf):
        return relational.order_line_histogram(_read(sf, "lineitem", ["l_orderkey"]))

    def q_brand_revenue(sf):
        return relational.brand_revenue(
            _read(sf, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]),
            _read(sf, "part", ["p_partkey", "p_brand"]),
        )

    def q_semdedup(sf):
        # threshold matched to the synthetic embedding density (the
        # exact all-pairs baseline finds pairs at 0.5; the sf tables
        # have no 0.95-cosine semantic dups)
        return similarity.semdedup(
            _read(sf, "embeddings", ["vec_id", "embedding"]), threshold=0.5
        )

    def q_returned_item_revenue(sf):
        from azure_blob_crawler_ray.pipelines import tpch2

        return tpch2.returned_item_revenue(
            _read(sf, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            _read(sf, "customer", ["c_custkey", "c_name"]),
        )

    def q_top_revenue_supplier(sf):
        from azure_blob_crawler_ray.pipelines import tpch2

        return tpch2.top_revenue_supplier(
            _read(sf, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]),
            _read(sf, "supplier", ["s_suppkey", "s_name"]),
        )

    def q_disjunctive_revenue(sf):
        from azure_blob_crawler_ray.pipelines import tpch2

        return tpch2.disjunctive_revenue(
            _read(sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]),
            _read(sf, "part", ["p_partkey", "p_brand", "p_size"]),
        )

    def q_dormant_rich_customers(sf):
        from azure_blob_crawler_ray.pipelines import tpch2

        return tpch2.dormant_rich_customers(
            _read(sf, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
            _read(sf, "orders", ["o_custkey", "o_orderdate"]),
        )

    def q_forecast_revenue(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.forecast_revenue(
            _read(sf, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        )

    def q_nation_trade_volume(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.nation_trade_volume(
            _read(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        )

    def q_market_share(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.market_share(
            _read(sf, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
            _read(sf, "region", ["r_regionkey", "r_name"]),
            _read(sf, "part", ["p_partkey", "p_type"]),
        )

    def q_customer_order_distribution(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.customer_order_distribution(
            _read(sf, "customer", ["c_custkey"]),
            _read(sf, "orders", ["o_custkey", "o_orderpriority"]),
        )

    def q_user_activity_full(sf):
        from azure_blob_crawler_ray.pipelines import relational

        return relational.user_activity_full(
            _read(sf, "events", ["user_id", "event_type"])
        )

    def q_party_nations(sf):
        from azure_blob_crawler_ray.pipelines import relational

        return relational.party_nations(
            _read(sf, "customer", ["c_nationkey"]),
            _read(sf, "supplier", ["s_nationkey"]),
        )

    def q_product_profit(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.product_profit(
            _read(sf, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"]),
            _read(sf, "orders", ["o_orderkey", "o_orderdate"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "part", ["p_partkey", "p_name", "p_retailprice"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        )

    def q_nation_part_value(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.nation_part_value(
            _read(sf, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        )

    def q_returnflag_priority_counts(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.returnflag_priority_counts(
            _read(sf, "lineitem", ["l_orderkey", "l_shipdate", "l_returnflag"]),
            _read(sf, "orders", ["o_orderkey", "o_orderpriority"]),
        )

    def q_supplier_part_counts(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.supplier_part_counts(
            _read(sf, "lineitem", ["l_partkey", "l_suppkey"]),
            _read(sf, "part", ["p_partkey", "p_brand", "p_type", "p_size"]),
            _read(sf, "supplier", ["s_suppkey", "s_acctbal"]),
        )

    def q_small_qty_revenue(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.small_qty_revenue(
            _read(sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]),
            _read(sf, "part", ["p_partkey", "p_brand", "p_size"]),
        )

    def q_bulk_part_suppliers(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.bulk_part_suppliers(
            _read(sf, "lineitem", ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"]),
            _read(sf, "part", ["p_partkey", "p_name"]),
            _read(sf, "supplier", ["s_suppkey", "s_name"]),
        )

    def q_sole_return_suppliers(sf):
        from azure_blob_crawler_ray.pipelines import tpch3

        return tpch3.sole_return_suppliers(
            _read(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"]),
            _read(sf, "orders", ["o_orderkey", "o_orderstatus"]),
            _read(sf, "supplier", ["s_suppkey", "s_name"]),
        )

    def q_remove_duplicate_spans(sf):
        return dataprep.remove_duplicate_spans(
            _read(sf, "documents", ["doc_id", "text"]), n=8, min_docs=2
        )

    def q_scrub_values(sf):
        return dataprep.scrub_values(_read(sf, "events", ["event_id", "props"]))

    def q_nation_share(sf):
        return relational.nation_share_in_region(
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "orders", ["o_custkey", "o_totalprice"]),
            _read(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
            _read(sf, "region", ["r_regionkey", "r_name"]),
        )

    def q_length_gini(sf):
        return relational.group_gini(
            _read(sf, "documents", ["lang", "n_chars"]),
            value_col="n_chars",
            group_col="lang",
        )

    def q_weighted_median_price(sf):
        import numpy as np
        import pyarrow as pa

        def proj(batch: pa.Table) -> pa.Table:
            cents = np.floor(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "l_returnflag": batch["l_returnflag"],
                    "cents": cents,
                    "qty": qty,
                }
            )

        li = _read(
            sf, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
        ).map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)
        return relational.group_weighted_median(
            li, value_col="cents", weight_col="qty", group_col="l_returnflag"
        ).map_batches(
            lambda b: b.rename_columns(["l_returnflag", "weighted_median_cents"]),
            batch_format="pyarrow",
        )

    def q_daily_ohlc(sf):
        return relational.daily_ohlc(
            _read(sf, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])
        )

    def q_curate_crawl(sf):
        from azure_blob_crawler_ray.config import CrawlConfig
        from azure_blob_crawler_ray.pipelines.curate import curate_crawl

        out = "/tmp/abc_entry_curate"
        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(
            universe=800,
            n_hosts=12,
            max_waves=2,
            wave_budget=200,
            max_fetches_per_host_per_wave=32,
            seeds_per_host=2,
            out_dir=out,
            emit_index=False,
            inject_faults=False,
        )
        return curate_crawl(cfg, capacity=400).sort("doc_id")

    def q_robust_length_outliers(sf):
        return dataprep.robust_length_outliers(
            _read(sf, "documents", ["lang", "n_chars"])
        )

    def q_regr_price_qty(sf):
        return relational.regr_price_qty(
            _read(sf, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
        )

    def q_incremental_agg(sf):
        # base view materialized once (the stored aggregate), then a
        # deterministic 1/7 delta folded in WITHOUT rescanning the base;
        # result must equal the from-scratch Q1 aggregate
        li = _read(
            sf,
            "lineitem",
            ["l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount"],
        )
        import numpy as np
        import pyarrow as pa

        def _part(want_delta: bool):
            def fn(batch: pa.Table) -> pa.Table:
                k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
                m = (k % 7) == 0
                return batch.filter(pa.array(m if want_delta else ~m))

            return fn

        base = li.map_batches(_part(False), batch_format="pyarrow", zero_copy_batch=True)
        delta = li.map_batches(_part(True), batch_format="pyarrow", zero_copy_batch=True)
        view = relational.lineitem_agg_view(base).materialize()
        return relational.lineitem_agg_refresh(view, delta)

    def q_length_quantiles_cont(sf):
        return relational.group_quantiles_cont(
            _read(sf, "documents", ["lang", "n_chars"]),
            value_col="n_chars",
            group_col="lang",
        )

    def q_trimmed_mean_price(sf):
        return relational.group_trimmed_mean(
            _read(sf, "lineitem", ["l_returnflag", "l_extendedprice"]),
            value_col="l_extendedprice",
            group_col="l_returnflag",
            lo_q=0.05,
            hi_q=0.95,
        )

    def q_pareto_front(sf):
        return relational.pareto_front(
            _read(sf, "part", ["p_partkey", "p_retailprice", "p_size"])
        )

    def q_clicks_before_purchase(sf):
        return relational.window_count_join(
            _read(sf, "events", ["user_id", "event_id", "ts", "event_type"])
        )

    def q_source_overlap(sf):
        return dataprep.source_overlap(_read(sf, "documents", ["source", "text"]))

    def q_length_band_filter(sf):
        return dataprep.length_band_filter(
            _read(sf, "documents", ["lang", "n_chars"])
        )

    def q_centroid_outliers(sf):
        return similarity.centroid_outliers(
            _read(sf, "embeddings", ["vec_id", "embedding", "label"]),
            threshold=-0.05,
        )

    def q_mmr_topk(sf):
        return similarity.mmr_topk(_read(sf, "embeddings", ["vec_id", "embedding"]))

    def q_mix_sources(sf):
        return dataprep.mix_sources(
            _read(sf, "documents", ["doc_id", "text", "source"])
        )

    def q_regional_revenue(sf):
        return relational.regional_supplier_revenue(
            _read(sf, "customer", ["c_custkey", "c_nationkey"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            _read(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
            _read(sf, "supplier", ["s_suppkey", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
            _read(sf, "region", ["r_regionkey", "r_name"]),
        )

    def q_langid_confusion(sf):
        return dataprep.langid_confusion(
            _read(sf, "documents", ["doc_id", "text", "lang"])
        )

    def q_events_by_weekday(sf):
        return relational.events_by_weekday(_read(sf, "events", ["ts", "value"]))

    def q_group_percent_rank(sf):
        return relational.group_percent_rank(
            _read(sf, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
        )

    def q_boilerplate_coverage(sf):
        return dataprep.boilerplate_coverage(_read(sf, "documents", ["doc_id", "text"]))

    def q_min_cost_supplier(sf):
        return relational.min_cost_supplier(
            _read(sf, "lineitem", ["l_partkey", "l_extendedprice", "l_suppkey"]),
            _read(sf, "supplier", ["s_suppkey", "s_name", "s_nationkey"]),
            _read(sf, "nation", ["n_nationkey", "n_name"]),
        )

    def q_large_volume_customers(sf):
        return relational.large_volume_customers(
            _read(sf, "lineitem", ["l_orderkey", "l_quantity"]),
            _read(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
            _read(sf, "customer", ["c_custkey", "c_name"]),
        )

    def q_promo_revenue(sf):
        return relational.promo_revenue_monthly(
            _read(sf, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]),
            _read(sf, "part", ["p_partkey", "p_type"]),
        )

    def q_dup_ngram_coverage(sf):
        return dataprep.dup_ngram_coverage(_read(sf, "documents", ["doc_id", "text"]))

    def q_gopher_quality(sf):
        return dataprep.gopher_quality(_read(sf, "documents", ["doc_id", "text"]))

    def q_intra_doc_repetition(sf):
        return dataprep.intra_doc_repetition(
            _read(sf, "documents", ["doc_id", "text"])
        )

    def q_media_features(sf):
        import pyarrow as pa

        from azure_blob_crawler_ray.stages.media import media_features

        def to_media(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "media_id": batch["doc_id"],
                    "payload": pa.array(
                        [t.encode("utf-8") for t in batch["text"].to_pylist()],
                        type=pa.large_binary(),
                    ),
                }
            )

        ds = _read(sf, "documents", ["doc_id", "text"]).map_batches(
            to_media, batch_format="pyarrow", zero_copy_batch=True
        )
        return media_features(ds, dim=32)

    def q_nearest_centroid(sf):
        return similarity.nearest_centroid(
            _read(sf, "embeddings", ["vec_id", "label", "embedding"])
        ).sort("vec_id")

    def q_span_kind_stats(sf):
        from azure_blob_crawler_ray.config import CrawlConfig
        from azure_blob_crawler_ray.pipelines import spans
        from azure_blob_crawler_ray.pipelines.crawl import read_documents, run_crawl

        out = "/tmp/abc_entry_spans"
        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(
            universe=600,
            n_hosts=10,
            max_waves=2,
            wave_budget=150,
            max_fetches_per_host_per_wave=32,
            seeds_per_host=2,
            out_dir=out,
            emit_index=False,
        )
        res = run_crawl(cfg)
        docs = ray.data.from_arrow(
            read_documents(out, range(res.waves_run[-1] + 1)).select(
                ["doc_id", "spans"]
            )
        )
        return spans.span_kind_stats(docs)

    def q_crawl_order(sf):
        from azure_blob_crawler_ray.config import CrawlConfig
        from azure_blob_crawler_ray.pipelines.crawl import read_crawl_order, run_crawl

        out = "/tmp/abc_entry_crawl"
        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(
            universe=600,
            n_hosts=10,
            max_waves=2,
            wave_budget=150,
            max_fetches_per_host_per_wave=32,
            seeds_per_host=2,
            out_dir=out,
            emit_index=False,
        )
        res = run_crawl(cfg)
        return read_crawl_order(out, res.waves_run)

    def q_continuous_crawl(sf):
        """Continuous crawl: 3 epochs of an evolving web, each crawled,
        deduped against the persisted MinHash band index, embedded, and
        appended to the persisted IVF index, with merge_runs compaction
        between epochs — the composition of every persisted piece.
        Returns all epochs' dedup verdicts; crash-resume equality vs the
        uninterrupted run: tests/test_continuous.py."""
        from azure_blob_crawler_ray.config import CrawlConfig
        from azure_blob_crawler_ray.pipelines import continuous

        state = "/tmp/abc_entry_continuous"
        shutil.rmtree(state, ignore_errors=True)
        cfg = CrawlConfig(
            universe=1000,
            n_hosts=10,
            max_waves=2,
            wave_budget=250,
            max_fetches_per_host_per_wave=40,
            seeds_per_host=2,
            out_dir="",
            emit_index=False,
            inject_faults=False,
            change_every=3,
        )
        continuous.continuous_crawl(
            cfg, state, epochs=3, num_shards=8, num_centroids=8
        )
        return (
            continuous.continuous_verdicts(state, 3)
            .materialize()
            .sort(["epoch", "doc_id"])
        )

    def q_refresh_changed(sf):
        import os

        from azure_blob_crawler_ray.config import CrawlConfig
        from azure_blob_crawler_ray.pipelines.crawl import run_crawl
        from azure_blob_crawler_ray.pipelines.refresh import refresh_crawl
        from azure_blob_crawler_ray.storage import read_table_arrow

        out = "/tmp/abc_entry_refresh"
        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(
            universe=600,
            n_hosts=10,
            max_waves=2,
            wave_budget=150,
            max_fetches_per_host_per_wave=32,
            seeds_per_host=2,
            out_dir=out,
            emit_index=False,
            inject_faults=False,
            change_every=3,
        )
        run_crawl(cfg)
        res = refresh_crawl(cfg, out, content_epoch=1)
        t = read_table_arrow(os.path.join(res.out_dir, "documents"))
        return t.select(["url", "url_hash", "content_fp"]).sort_by("url")

    return {
        "text_stats": q_text_stats,
        "langid": q_langid,
        "fingerprint": q_fingerprint,
        "exact_dedup": q_exact_dedup,
        "doc_lang_stats": q_doc_lang_stats,
        "text_search": q_text_search,
        "hybrid_search": q_hybrid_search,
        "filtered_hybrid": q_filtered_hybrid,
        "filtered_hybrid_post": q_filtered_hybrid_post,
        "get_all_docs": q_get_all_docs,
        "filter_select": q_filter_select,
        "ann_topk": q_ann_topk,
        "filtered_ann_pre": q_filtered_ann_pre,
        "filtered_ann_post": q_filtered_ann_post,
        "cosine_near_dup": q_cosine_near_dup,
        "ingest_chunks": q_ingest_chunks,
        "lineitem_agg": q_lineitem_agg,
        "top_customers": q_top_customers,
        "customers_per_region": q_customers_per_region,
        "events_by_type": q_events_by_type,
        "events_daily": q_events_daily,
        "order_priority": q_order_priority,
        "parts_by_brand": q_parts_by_brand,
        "order_customer_join": q_order_customer_join,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "index_delete": q_index_delete,
        "index_upsert": q_index_upsert,
        "index_upsert_copart": q_index_upsert_copart,
        "top_orders_per_customer": q_top_orders_per_customer,
        "window_totals": q_window_totals,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "events_pivot": q_events_pivot,
        "distinct_users": q_distinct_users,
        "orders_above_avg": q_orders_above_avg,
        "events_rollup": q_events_rollup,
        "price_quantiles": q_price_quantiles,
        "bm25_search": q_bm25_search,
        "stable_split": q_stable_split,
        "training_order": q_training_order,
        "source_cap": q_source_cap,
        "stratified_sample": q_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "pack_interleaved": q_pack_interleaved,
        "term_frequencies": q_term_frequencies,
        "length_stats": q_length_stats,
        "latest_event_per_user": q_latest_event_per_user,
        "nation_balance": q_nation_balance,
        "events_hopping": q_events_hopping,
        "bigram_counts": q_bigram_counts,
        "lm_perplexity": q_lm_perplexity,
        "ccnet_buckets": q_ccnet_buckets,
        "dsir_weights": q_dsir_weights,
        "dsir_select": q_dsir_select,
        "lexical_diversity": q_lexical_diversity,
        "decontaminate": q_decontaminate,
        "shard_manifest": q_shard_manifest,
        "label_centroids": q_label_centroids,
        "embed_covariance": q_embed_covariance,
        "pca_variance": q_pca_variance,
        "pca_project": q_pca_project,
        "pca_whiten": q_pca_whiten,
        "kmeans_clusters": q_kmeans_clusters,
        "bloom_semi_revenue": q_bloom_semi_revenue,
        "source_count_join": q_source_count_join,
        "top_terms_per_lang": q_top_terms_per_lang,
        "dedup_keep_best": q_dedup_keep_best,
        "media_frame_sample": q_media_frame_sample,
        "events_cube": q_events_cube,
        "normalize_text": q_normalize_text,
        "minhash_lsh_dedup": q_minhash_lsh,
        "incremental_dedup": q_incremental_dedup,
        "simhash_dedup": q_simhash,
        "ngram_jaccard_dedup": q_ngram_jaccard,
        "dup_clusters": q_dup_clusters,
        "lsh_near_dup": q_lsh_near_dup,
        "ivf_topk": q_ivf_topk,
        "ivf_persisted_topk": q_ivf_persisted_topk,
        "hnsw_topk": q_hnsw_topk,
        "approx_distinct_users": q_approx_distinct,
        "quality_score": q_quality,
        "token_count_bpe": q_token_count_bpe,
        "media_features": q_media_features,
        "nearest_centroid": q_nearest_centroid,
        "span_kind_stats": q_span_kind_stats,
        "crawl_order": q_crawl_order,
        "shipping_priority": q_shipping_priority,
        "user_type_sets": q_user_type_sets,
        "moving_avg": q_moving_avg,
        "length_histogram": q_length_histogram,
        "group_zscore": q_group_zscore,
        "tfidf_top_terms": q_tfidf_top_terms,
        "funnel_stage": q_funnel_stage,
        "mode_event_type": q_mode_event_type,
        "corr_qty_discount": q_corr_qty_discount,
        "monthly_growth": q_monthly_growth,
        "type_cooccurrence": q_type_cooccurrence,
        "global_rank": q_global_rank,
        "source_entropy": q_source_entropy,
        "json_prop_stats": q_json_prop_stats,
        "revenue_share": q_revenue_share,
        "cohort_retention": q_cohort_retention,
        "rolling_active_users": q_rolling_active_users,
        "unpivot_daily": q_unpivot_daily,
        "lang_sources": q_lang_sources,
        "pagerank": q_pagerank,
        "inter_event_gaps": q_inter_event_gaps,
        "event_transitions": q_event_transitions,
        "regex_match_stats": q_regex_match_stats,
        "triangles": q_triangles,
        "weighted_sample": q_weighted_sample,
        "approx_quantiles": q_approx_quantiles,
        "fuzzy_pairs": q_fuzzy_pairs,
        "quant_topk": q_quant_topk,
        "heavy_hitters": q_heavy_hitters,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "gopher_quality": q_gopher_quality,
        "intra_doc_repetition": q_intra_doc_repetition,
        "min_cost_supplier": q_min_cost_supplier,
        "large_volume_customers": q_large_volume_customers,
        "promo_revenue": q_promo_revenue,
        "boilerplate_coverage": q_boilerplate_coverage,
        "refresh_changed": q_refresh_changed,
        "continuous_crawl": q_continuous_crawl,
        "langid_confusion": q_langid_confusion,
        "events_by_weekday": q_events_by_weekday,
        "group_percent_rank": q_group_percent_rank,
        "regional_revenue": q_regional_revenue,
        "interleaved_span_stats": q_interleaved_span_stats,
        "chunk_interleaved": q_chunk_interleaved,
        "mix_sources": q_mix_sources,
        "semdedup": q_semdedup,
        "brand_revenue": q_brand_revenue,
        "order_line_histogram": q_order_line_histogram,
        "late_shipments": q_late_shipments,
        "cumulative_revenue": q_cumulative_revenue,
        "returned_item_revenue": q_returned_item_revenue,
        "top_revenue_supplier": q_top_revenue_supplier,
        "disjunctive_revenue": q_disjunctive_revenue,
        "dormant_rich_customers": q_dormant_rich_customers,
        "forecast_revenue": q_forecast_revenue,
        "nation_trade_volume": q_nation_trade_volume,
        "market_share": q_market_share,
        "customer_order_distribution": q_customer_order_distribution,
        "user_activity_full": q_user_activity_full,
        "party_nations": q_party_nations,
        "product_profit": q_product_profit,
        "nation_part_value": q_nation_part_value,
        "returnflag_priority_counts": q_returnflag_priority_counts,
        "supplier_part_counts": q_supplier_part_counts,
        "small_qty_revenue": q_small_qty_revenue,
        "bulk_part_suppliers": q_bulk_part_suppliers,
        "sole_return_suppliers": q_sole_return_suppliers,
        "remove_duplicate_spans": q_remove_duplicate_spans,
        "scrub_values": q_scrub_values,
        "centroid_outliers": q_centroid_outliers,
        "source_overlap": q_source_overlap,
        "length_band_filter": q_length_band_filter,
        "clicks_before_purchase": q_clicks_before_purchase,
        "mmr_topk": q_mmr_topk,
        "pareto_front": q_pareto_front,
        "length_quantiles_cont": q_length_quantiles_cont,
        "trimmed_mean_price": q_trimmed_mean_price,
        "incremental_agg": q_incremental_agg,
        "regr_price_qty": q_regr_price_qty,
        "robust_length_outliers": q_robust_length_outliers,
        "curate_crawl": q_curate_crawl,
        "daily_ohlc": q_daily_ohlc,
        "weighted_median_price": q_weighted_median_price,
        "nation_share": q_nation_share,
        "length_gini": q_length_gini,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; tables pre-registered as views)
# ---------------------------------------------------------------------------

_OCC = "CAST((length({col}) - length(replace({col}, '{t}', ''))) / length('{t}') AS BIGINT)"

# 12-char-shingle inverted-index CTE chain, shared by ngram_jaccard_dedup
# (pair list) and dup_clusters (connected components over those pairs).
_NGRAM_CTES = """
    norm AS (
        SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS s
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               CASE WHEN length(s) < 12 THEN s
                    ELSE substring(s, i, 12) END AS shingle
        FROM norm,
             LATERAL unnest(range(1, GREATEST(length(s) - 10, 2))) AS t(i)
        WHERE length(s) > 0
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
    ), kept AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(*) BETWEEN 2 AND 200
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN kept k ON k.shingle = a.shingle
        GROUP BY a.doc_id, b.doc_id
    )
"""


def _occ(term: str, col: str = "text") -> str:
    return _OCC.format(col=col, t=term)


def oracle_sql() -> dict[str, str]:
    occ_the, occ_data, occ_join = _occ("the"), _occ("data"), _occ("join")
    score = " + ".join(_occ(t) for t in SEARCH_TERMS)
    return {
        "text_stats": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS word_count,
                   CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS punct_count,
                   CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS upper_count,
                   CAST(length(text) AS BIGINT) AS char_count
            FROM documents
        """,
        "langid": f"""
            SELECT doc_id,
                   CASE
                     WHEN {occ_join} > {occ_the} AND {occ_join} > {occ_data} THEN 'fr'
                     WHEN {occ_data} > {occ_the} THEN 'de'
                     WHEN {occ_the} > 0 THEN 'en'
                     ELSE 'und'
                   END AS pred_lang
            FROM documents
        """,
        "fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "exact_dedup": """
            SELECT md5(text) AS fp, MIN(doc_id) AS doc_id,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "doc_lang_stats": """
            SELECT lang, COUNT(*) AS doc_count,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "text_search": f"""
            SELECT doc_id, {score} AS score
            FROM documents
            ORDER BY score DESC, doc_id
            LIMIT 10
        """,
        "hybrid_search": f"""
            WITH tpool AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY ({score}) DESC, doc_id) AS text_rank
                FROM documents
                ORDER BY ({score}) DESC, doc_id
                LIMIT 100
            ), q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
            ), cpool AS (
                SELECT e.vec_id,
                       ROW_NUMBER() OVER (
                         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC,
                                  e.vec_id) AS vec_rank
                FROM embeddings e, q
                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC, e.vec_id
                LIMIT 100
            )
            SELECT t.doc_id, t.text_rank, c.vec_rank,
                   1.0 / (60 + t.text_rank) + 1.0 / (60 + c.vec_rank) AS fused
            FROM tpool t JOIN cpool c ON t.doc_id = c.vec_id
            ORDER BY fused DESC, t.doc_id
            LIMIT 10
        """,
        "filtered_hybrid": f"""
            WITH elig AS (
                SELECT doc_id, text FROM documents
                WHERE lang = 'en' AND n_chars >= 200
            ), tpool AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY ({score}) DESC, doc_id) AS text_rank
                FROM elig
                ORDER BY ({score}) DESC, doc_id
                LIMIT 100
            ), q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
            ), cpool AS (
                SELECT e.vec_id,
                       ROW_NUMBER() OVER (
                         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC,
                                  e.vec_id) AS vec_rank
                FROM embeddings e JOIN elig d ON d.doc_id = e.vec_id, q
                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC, e.vec_id
                LIMIT 100
            )
            SELECT t.doc_id, t.text_rank, c.vec_rank,
                   1.0 / (60 + t.text_rank) + 1.0 / (60 + c.vec_rank) AS fused
            FROM tpool t JOIN cpool c ON t.doc_id = c.vec_id
            ORDER BY fused DESC, t.doc_id
            LIMIT 10
        """,
        "filtered_hybrid_post": f"""
            WITH elig AS (
                SELECT doc_id, text FROM documents
                WHERE lang = 'en' AND n_chars >= 200
            ), tpool AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY ({score}) DESC, doc_id) AS text_rank
                FROM elig
                ORDER BY ({score}) DESC, doc_id
                LIMIT 100
            ), q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
            ), cpool AS (
                -- postFilter: rank over the WHOLE corpus, THEN filter —
                -- rank numbers keep their unfiltered positions
                SELECT e.vec_id,
                       ROW_NUMBER() OVER (
                         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC,
                                  e.vec_id) AS vec_rank
                FROM embeddings e, q
                ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC, e.vec_id
                LIMIT 100
            ), ckept AS (
                SELECT c.vec_id, c.vec_rank FROM cpool c
                JOIN elig d ON d.doc_id = c.vec_id
            )
            SELECT t.doc_id, t.text_rank, c.vec_rank,
                   1.0 / (60 + t.text_rank) + 1.0 / (60 + c.vec_rank) AS fused
            FROM tpool t JOIN ckept c ON t.doc_id = c.vec_id
            ORDER BY fused DESC, t.doc_id
            LIMIT 10
        """,
        "get_all_docs": "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100000",
        "filter_select": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en' AND n_chars >= 200 ORDER BY doc_id
        """,
        "ann_topk": f"""
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < {NUM_ANN_QUERIES}
            ), scored AS (
                SELECT q.query_id, e.vec_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY q.query_id
                         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC,
                                  e.vec_id) AS rank
                FROM embeddings e, q
            )
            SELECT query_id, rank, vec_id FROM scored WHERE rank <= {ANN_K}
        """,
        "filtered_ann_pre": f"""
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < {NUM_ANN_QUERIES}
            ), scored AS (
                SELECT q.query_id, e.vec_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY q.query_id
                         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC,
                                  e.vec_id) AS rank
                FROM embeddings e, q
                WHERE e.label = 1
            )
            SELECT query_id, rank, vec_id FROM scored WHERE rank <= {ANN_K}
        """,
        "filtered_ann_post": f"""
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < {NUM_ANN_QUERIES}
            ), scored AS (
                SELECT q.query_id, e.vec_id, e.label,
                       ROW_NUMBER() OVER (
                         PARTITION BY q.query_id
                         ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.v) DESC,
                                  e.vec_id) AS rank
                FROM embeddings e, q
            )
            SELECT query_id, rank, vec_id FROM scored
            WHERE rank <= {ANN_K} AND label = 1
        """,
        "cosine_near_dup": f"""
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= {NEAR_DUP_THRESHOLD}
            ORDER BY vec_a, vec_b
        """,
        "ingest_chunks": """
            SELECT replace(replace(source || '/' || CAST(doc_id AS VARCHAR) || '.txt',
                                   '/', '_'), '.', '_') || '_chunk_0' AS id,
                   text AS content
            FROM documents ORDER BY id
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT o.o_custkey AS c_custkey, c.c_name,
                   ROUND(SUM(o.o_totalprice), 2) AS revenue,
                   COUNT(*) AS order_count
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey, c.c_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 10
        """,
        "customers_per_region": """
            SELECT r.r_name, COUNT(*) AS customer_count
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY r.r_name
        """,
        "events_by_type": """
            SELECT event_type, COUNT(*) AS event_count,
                   ROUND(SUM(value), 2) AS value_sum
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                   COUNT(*) AS event_count
            FROM events GROUP BY day, event_type ORDER BY day, event_type
        """,
        "order_priority": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "parts_by_brand": """
            SELECT p_brand, COUNT(*) AS part_count,
                   ROUND(MIN(p_retailprice), 2) AS min_price,
                   ROUND(MAX(p_retailprice), 2) AS max_price
            FROM part GROUP BY p_brand ORDER BY p_brand
        """,
        "order_customer_join": """
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_totalprice >= 400000.0
            ORDER BY o.o_orderkey
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rank
                FROM orders)
            WHERE rank <= 2
            ORDER BY o_custkey, rank
        """,
        "stable_split": """
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) < 25
                        THEN 'val' ELSE 'train' END AS split
            FROM documents
        """,
        "training_order": """
            SELECT doc_id, h, shard,
                   ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
                       AS pos
            FROM (SELECT doc_id,
                         (doc_id * 2654435761 + 17 * 40503) % 4294967296 AS h,
                         CAST((doc_id * 2654435761 + 17 * 40503) % 4294967296 % 8
                              AS INTEGER) AS shard
                  FROM documents)
        """,
        "source_cap": """
            SELECT doc_id, source, n_chars, rank FROM (
                SELECT doc_id, source, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY n_chars DESC, doc_id) AS rank
                FROM documents)
            WHERE rank <= 50
        """,
        "stratified_sample": """
            SELECT doc_id, lang, fp FROM (
                SELECT doc_id, lang, md5(text) AS fp,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY md5(text), doc_id) AS rn
                FROM documents)
            WHERE rn <= 20
            ORDER BY fp, doc_id
        """,
        "pack_sequences": """
            SELECT doc_id, tokens,
                   CAST(FLOOR((cum - tokens) / 500) AS BIGINT) AS bin
            FROM (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tokens,
                       SUM(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT))
                           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
                FROM documents)
        """,
        "pack_interleaved": """
            SELECT doc_id, tokens,
                   CAST(FLOOR((cum - tokens) / 800) AS BIGINT) AS bin
            FROM (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\\S+'))
                            + (doc_id % 3) * 64 AS BIGINT) AS tokens,
                       SUM(CAST(len(regexp_extract_all(text, '\\S+'))
                                + (doc_id % 3) * 64 AS BIGINT))
                           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
                FROM documents)
        """,
        "term_frequencies": """
            SELECT term, CAST(COUNT(*) AS BIGINT) AS occurrences
            FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS term
                  FROM documents)
            GROUP BY term
            ORDER BY occurrences DESC, term
            LIMIT 50
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id AS last_event_id,
                   CAST(epoch_us(ts) AS BIGINT) AS last_ts_us
            FROM (SELECT user_id, event_id, ts,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 ORDER BY user_id
        """,
        "nation_balance": """
            WITH c AS (
                SELECT c_nationkey AS k, COUNT(*) AS n_customers,
                       CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cust_cents
                FROM customer GROUP BY c_nationkey
            ), s AS (
                SELECT s_nationkey AS k, COUNT(*) AS n_suppliers,
                       CAST(SUM(CAST(FLOOR(s_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS supp_cents
                FROM supplier GROUP BY s_nationkey
            )
            SELECT n.n_name,
                   COALESCE(c.n_customers, 0) AS n_customers,
                   COALESCE(c.cust_cents, 0) AS cust_cents,
                   COALESCE(s.n_suppliers, 0) AS n_suppliers,
                   COALESCE(s.supp_cents, 0) AS supp_cents
            FROM c FULL OUTER JOIN s ON c.k = s.k
            JOIN nation n ON n.n_nationkey = COALESCE(c.k, s.k)
            ORDER BY n.n_name
        """,
        "events_hopping": """
            SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) - off AS window_day,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS cents
            FROM events CROSS JOIN (VALUES (0), (1)) offs(off)
            GROUP BY window_day ORDER BY window_day
        """,
        "lm_perplexity": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            big AS (
              SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
              FROM toks, UNNEST(generate_series(1, len(ws)-1)) AS t(i)
            ),
            refbig AS (SELECT w1, w2 FROM big WHERE doc_id % 5 = 0),
            pairc AS (SELECT w1, w2, COUNT(*) AS c FROM refbig GROUP BY 1, 2),
            ctxc AS (SELECT w1, COUNT(*) AS c1 FROM refbig GROUP BY 1),
            vocab AS (
              SELECT COUNT(DISTINCT w) + 1 AS v
              FROM (SELECT unnest(ws) AS w FROM toks WHERE doc_id % 5 = 0)
            )
            SELECT b.doc_id, COUNT(*) AS n_bigrams,
                   ROUND(EXP(-AVG(LN((COALESCE(p.c, 0) + 1.0)
                                     / (COALESCE(cx.c1, 0) + v.v)))), 4) AS ppl
            FROM big b
            LEFT JOIN pairc p USING (w1, w2)
            LEFT JOIN ctxc cx USING (w1)
            CROSS JOIN vocab v
            GROUP BY b.doc_id ORDER BY b.doc_id
        """,
        "ccnet_buckets": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            big AS (
              SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
              FROM toks, UNNEST(generate_series(1, len(ws)-1)) AS t(i)
            ),
            refbig AS (SELECT w1, w2 FROM big WHERE doc_id % 5 = 0),
            pairc AS (SELECT w1, w2, COUNT(*) AS c FROM refbig GROUP BY 1, 2),
            ctxc AS (SELECT w1, COUNT(*) AS c1 FROM refbig GROUP BY 1),
            vocab AS (
              SELECT COUNT(DISTINCT w) + 1 AS v
              FROM (SELECT unnest(ws) AS w FROM toks WHERE doc_id % 5 = 0)
            ),
            ppl AS (
              SELECT b.doc_id,
                     ROUND(EXP(-AVG(LN((COALESCE(p.c, 0) + 1.0)
                                       / (COALESCE(cx.c1, 0) + v.v)))), 4) AS ppl
              FROM big b
              LEFT JOIN pairc p USING (w1, w2)
              LEFT JOIN ctxc cx USING (w1)
              CROSS JOIN vocab v
              GROUP BY b.doc_id
            ),
            tiled AS (
              SELECT doc_id, ppl, NTILE(3) OVER (ORDER BY ppl, doc_id) AS bucket
              FROM ppl
            )
            SELECT bucket, COUNT(*) AS n_docs, ROUND(AVG(ppl), 4) AS avg_ppl
            FROM tiled GROUP BY bucket ORDER BY bucket
        """,
        "lexical_diversity": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            uni AS (SELECT doc_id, unnest(ws) AS w FROM toks),
            cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM uni GROUP BY 1, 2),
            tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS d FROM cnt GROUP BY 1)
            SELECT c.doc_id,
                   CAST(t.n AS BIGINT) AS n_tokens,
                   CAST(t.d AS BIGINT) AS n_distinct,
                   t.d * 1.0 / t.n AS ttr,
                   ROUND(-SUM((c.c * 1.0 / t.n) * LN(c.c * 1.0 / t.n)), 4) AS entropy
            FROM cnt c JOIN tot t USING (doc_id)
            GROUP BY c.doc_id, t.n, t.d ORDER BY c.doc_id
        """,
        "dsir_weights": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            uni AS (SELECT doc_id, unnest(ws) AS w FROM toks),
            cnt AS (
              SELECT w,
                     SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS ct,
                     SUM(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS cr
              FROM uni GROUP BY w
            ),
            tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) + 1 AS v FROM cnt)
            SELECT u.doc_id, COUNT(*) AS n_tokens,
                   ROUND(AVG(LN(((c.ct + 1.0) / (t.nt + t.v))
                                / ((c.cr + 1.0) / (t.nr + t.v)))), 4) AS logratio
            FROM uni u JOIN cnt c USING (w) CROSS JOIN tot t
            GROUP BY u.doc_id ORDER BY u.doc_id
        """,
        "dsir_select": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            uni AS (SELECT doc_id, unnest(ws) AS w FROM toks),
            cnt AS (
              SELECT w,
                     SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS ct,
                     SUM(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS cr
              FROM uni GROUP BY w
            ),
            tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr, COUNT(*) + 1 AS v FROM cnt),
            scored AS (
              SELECT u.doc_id,
                     ROUND(AVG(LN(((c.ct + 1.0) / (t.nt + t.v))
                                  / ((c.cr + 1.0) / (t.nr + t.v)))), 4) AS logratio
              FROM uni u JOIN cnt c USING (w) CROSS JOIN tot t
              GROUP BY u.doc_id
            )
            SELECT doc_id, logratio FROM scored
            WHERE doc_id % 5 <> 0
            ORDER BY logratio DESC, doc_id LIMIT 100
        """,
        "bigram_counts": """
            SELECT t[i] || ' ' || t[i + 1] AS bigram,
                   CAST(COUNT(*) AS BIGINT) AS occurrences
            FROM (SELECT regexp_extract_all(text, '\\S+') AS t FROM documents),
                 LATERAL unnest(range(1, GREATEST(len(t), 1))) AS u(i)
            GROUP BY bigram
            ORDER BY occurrences DESC, bigram
            LIMIT 50
        """,
        "decontaminate": """
            WITH bench AS (
                SELECT DISTINCT substr(text, i, 20) AS sh
                FROM documents,
                     LATERAL unnest(range(1, GREATEST(length(text) - 18, 1))) AS t(i)
                WHERE doc_id < 20 AND length(text) >= 20
            ), hits AS (
                SELECT DISTINCT doc_id
                FROM documents,
                     LATERAL unnest(range(1, GREATEST(length(text) - 18, 1))) AS t(i)
                WHERE doc_id >= 20 AND length(text) >= 20
                  AND substr(text, i, 20) IN (SELECT sh FROM bench)
            )
            SELECT doc_id FROM documents
            WHERE doc_id >= 20 AND doc_id NOT IN (SELECT doc_id FROM hits)
            ORDER BY doc_id
        """,
        "shard_manifest": """
            SELECT CAST((doc_id * 2654435761) % 4294967296 % 16 AS BIGINT) AS shard,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY shard ORDER BY shard
        """,
        "top_terms_per_lang": """
            SELECT lang, term, occurrences, rank FROM (
                SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS occurrences,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY COUNT(*) DESC, term) AS rank
                FROM (SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS term
                      FROM documents)
                GROUP BY lang, term)
            WHERE rank <= 10
            ORDER BY lang, rank
        """,
        "dedup_keep_best": f"""
            -- connected components over the ngram near-dup pair graph,
            -- then keep per cluster the doc with the most words
            -- (tie: smallest doc_id); isolated docs keep themselves
            WITH RECURSIVE {_NGRAM_CTES}, pairs AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (sa.set_size + sb.set_size - i) >= 0.5
            ), sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION ALL
                SELECT doc_b, doc_a FROM pairs
            ), reach(node, lab) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
            ), clusters AS (
                SELECT node AS doc_id, MIN(lab) AS cluster_id
                FROM reach GROUP BY node
            ), wc AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS wc
                FROM documents
            ), best AS (
                SELECT doc_id FROM (
                    SELECT c.doc_id,
                           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                              ORDER BY w.wc DESC, c.doc_id) AS rn
                    FROM clusters c JOIN wc w USING (doc_id))
                WHERE rn = 1
            )
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters)
               OR d.doc_id IN (SELECT doc_id FROM best)
            ORDER BY d.doc_id
        """,
        "events_cube": """
            SELECT COALESCE(d, 'ALL') AS day,
                   COALESCE(et, 'ALL') AS event_type,
                   CAST(COUNT(*) AS BIGINT) AS event_count
            FROM (SELECT strftime(ts, '%Y-%m-%d') AS d, event_type AS et
                  FROM events)
            GROUP BY CUBE(d, et)
            ORDER BY day, event_type
        """,
        "normalize_text": """
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(lower(text), '[.!?,;:]', '', 'g'),
                       '\\s+', ' ', 'g')) AS norm
            FROM documents
        """,
        "media_frame_sample": """
            SELECT CAST(doc_id AS BIGINT) AS media_id,
                   CAST(f AS INTEGER) AS frame,
                   CAST(f * 500 AS BIGINT) AS t_ms
            FROM documents,
                 LATERAL unnest(range(0, (1 + doc_id % 10) * 2)) AS t(f)
            ORDER BY media_id, frame
        """,
        "label_centroids": """
            SELECT label, pos, CAST(SUM(q) AS BIGINT) AS sum_q, COUNT(*) AS n_vals FROM (
                SELECT label,
                       generate_subscripts(embedding, 1) AS pos,
                       CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576.0)
                            AS BIGINT) AS q
                FROM embeddings)
            GROUP BY label, pos ORDER BY label, pos
        """,
        # Population covariance of the QUANTIZED embeddings (q = floor(v *
        # 2^20) as int64): the distributed sums are exact integers, so the
        # identical double formula below reproduces the engine bit-for-bit
        # (same trick as label_centroids; see decomp.embed_covariance).
        "embed_covariance": """
            WITH e AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) AS i,
                       CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576.0)
                            AS BIGINT) AS q
                FROM embeddings),
            p AS (
                SELECT a.i AS i, b.i AS j,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(a.q * b.q) AS sqq,
                       SUM(a.q) AS sa,
                       SUM(b.q) AS sb
                FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
                GROUP BY a.i, b.i)
            SELECT i, j, n,
                   (CAST(sqq AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / n)
                     / n / 1099511627776.0 AS cov
            FROM p ORDER BY i, j
        """,
        # String-keyed bucket join (hash64(source) places rows, the
        # merge matches on the string itself — exact).
        "source_count_join": """
            SELECT d.doc_id, d.source, s.n_docs
            FROM documents d
            JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM documents GROUP BY source) s USING (source)
            ORDER BY d.doc_id
        """,
        # Exact fact-side semi-join (Bloom prefilter + bucketed exact
        # verify in the engine; the filter is sound + verified, so plain
        # semi-join SQL is the oracle).  All outputs are int64 (exact
        # cents), see bloomjoin.bloom_semi_revenue.
        "bloom_semi_revenue": """
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                       * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "shipping_priority": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "user_type_sets": """
            WITH f AS (
                SELECT user_id,
                       MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_a,
                       MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_b
                FROM events GROUP BY user_id)
            SELECT user_id,
                   CASE WHEN has_b = 1 THEN 'both' ELSE 'a_only' END AS membership
            FROM f WHERE has_a = 1 ORDER BY user_id
        """,
        "moving_avg": """
            SELECT user_id, event_id,
                   ROUND(AVG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS mavg
            FROM events ORDER BY user_id, event_id
        """,
        "length_histogram": """
            SELECT CAST((n_chars // 200) * 200 AS BIGINT) AS bucket_lo,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # z = (x - s/n) / sqrt(ss/n - (s/n)^2), written EXACTLY as the
        # engine computes it from exact integer s/ss/n so the doubles
        # agree bit-for-bit before the 6-decimal round.
        "group_zscore": """
            WITH st AS (
                SELECT lang,
                       CAST(SUM(n_chars) AS DOUBLE) AS s,
                       CAST(SUM(n_chars * n_chars) AS DOUBLE) AS ss,
                       CAST(COUNT(*) AS DOUBLE) AS n
                FROM documents GROUP BY lang)
            SELECT doc_id, d.lang,
                   ROUND(CASE WHEN SQRT(ss/n - (s/n)*(s/n)) > 0
                              THEN (CAST(n_chars AS DOUBLE) - s/n)
                                   / SQRT(ss/n - (s/n)*(s/n))
                              ELSE 0.0 END, 6) AS zscore
            FROM documents d JOIN st USING (lang) ORDER BY doc_id
        """,
        # Rank compares the ROUNDED score then term, mirroring the engine,
        # so last-ulp libm ln() differences cannot reorder the top-k.
        "tfidf_top_terms": """
            WITH tok AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS term
                FROM documents),
            tf AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM tok GROUP BY doc_id, term),
            df AS (
                SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM tok GROUP BY term),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       ROUND(tf.tf * LN(n.n / df.df), 6) AS tfidf
                FROM tf JOIN df USING (term) CROSS JOIN n),
            ranked AS (
                SELECT doc_id, term, tfidf,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY tfidf DESC, term ASC) AS rn
                FROM scored)
            SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 5
            ORDER BY doc_id, term
        """,
        # Funnel: step k = MIN ts of that type strictly after step k-1's
        # ts (first-touch); stage is an integer so the hash is exact.
        "funnel_stage": """
            WITH t1 AS (
                SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (
                SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
                FROM events e JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
                GROUP BY e.user_id),
            t3 AS (
                SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
                FROM events e JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
                GROUP BY e.user_id)
            SELECT t1.user_id,
                   CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                             WHEN t2.user_id IS NOT NULL THEN 2
                             ELSE 1 END AS BIGINT) AS funnel_stage
            FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                    LEFT JOIN t3 ON t1.user_id = t3.user_id
            ORDER BY t1.user_id
        """,
        "mode_event_type": """
            WITH c AS (
                SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM events GROUP BY user_id, event_type),
            r AS (
                SELECT user_id, event_type AS mode_type, cnt AS mode_cnt,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY cnt DESC, event_type ASC) AS rn
                FROM c)
            SELECT user_id, mode_type, mode_cnt FROM r WHERE rn = 1
            ORDER BY user_id
        """,
        # Pearson r from exact int64 moments (x = quantity, y = 100*discount;
        # scale-invariant), identical double formula on both engines.
        "corr_qty_discount": """
            WITH m AS (
                SELECT l_returnflag,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(CAST(l_quantity AS BIGINT)) AS sx,
                       SUM(CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) AS sy,
                       SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
                       SUM(CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)
                           * CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) AS syy,
                       SUM(CAST(l_quantity AS BIGINT)
                           * CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)) AS sxy
                FROM lineitem GROUP BY l_returnflag),
            f AS (
                SELECT l_returnflag, n,
                       CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cov,
                       GREATEST(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0.0) AS vx,
                       GREATEST(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy, 0.0) AS vy
                FROM m)
            SELECT l_returnflag, n AS n_rows,
                   ROUND(CASE WHEN SQRT(vx) * SQRT(vy) > 0
                              THEN cov / (SQRT(vx) * SQRT(vy))
                              ELSE 0.0 END, 6) AS corr_qd
            FROM f ORDER BY l_returnflag
        """,
        # MoM growth over the monthly aggregate; cents are exact ints and
        # the lag runs over aggregate rows (gap months collapse) on both
        # engines.
        "monthly_growth": """
            WITH m AS (
                SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS year,
                       CAST(MONTH(o_orderdate) AS BIGINT) AS month,
                       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                            AS BIGINT) AS revenue_cents
                FROM orders GROUP BY 1, 2),
            l AS (
                SELECT year, month, revenue_cents,
                       LAG(revenue_cents) OVER (ORDER BY year, month) AS prev
                FROM m)
            SELECT year, month, revenue_cents,
                   ROUND((CAST(revenue_cents AS DOUBLE) - prev)
                         / CASE WHEN prev = 0 THEN 1 ELSE prev END, 6) AS growth
            FROM l WHERE prev IS NOT NULL ORDER BY year, month
        """,
        "type_cooccurrence": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "global_rank": """
            WITH r AS (
                SELECT o_orderkey,
                       ROW_NUMBER() OVER (
                           ORDER BY CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC,
                                    o_orderkey ASC) AS price_rank,
                       NTILE(4) OVER (
                           ORDER BY CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC,
                                    o_orderkey ASC) AS quartile
                FROM orders)
            SELECT o_orderkey, price_rank, CAST(quartile AS BIGINT) AS quartile
            FROM r ORDER BY o_orderkey
        """,
        # H = -sum(p log2 p) from exact integer counts; <=|sources| terms
        # per lang, so association order cannot move the 6th decimal.
        "source_entropy": """
            WITH c AS (
                SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM documents GROUP BY lang, source),
            t AS (
                SELECT lang, CAST(SUM(cnt) AS DOUBLE) AS n,
                       CAST(SUM(cnt) AS BIGINT) AS n_docs,
                       CAST(COUNT(*) AS BIGINT) AS n_sources
                FROM c GROUP BY lang)
            SELECT t.lang, t.n_docs, t.n_sources,
                   ROUND(-SUM((c.cnt / t.n) * LOG2(c.cnt / t.n)), 6) AS entropy
            FROM c JOIN t USING (lang)
            GROUP BY t.lang, t.n_docs, t.n_sources, t.n
            ORDER BY t.lang
        """,
        "json_prop_stats": """
            WITH x AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events)
            SELECT event_type,
                   CAST(COUNT(k) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k
            FROM x WHERE k IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "revenue_share": """
            WITH m AS (
                SELECT o_orderpriority,
                       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                            AS BIGINT) AS revenue_cents
                FROM orders GROUP BY 1),
            t AS (SELECT CAST(SUM(revenue_cents) AS DOUBLE) AS tot FROM m)
            SELECT o_orderpriority, revenue_cents,
                   ROUND(revenue_cents / t.tot, 6) AS share
            FROM m, t ORDER BY o_orderpriority
        """,
        "cohort_retention": """
            WITH a AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 604800000000 AS week
                FROM events),
            c AS (SELECT user_id, MIN(week) AS cw FROM a GROUP BY user_id)
            SELECT c.cw AS cohort_week, a.week - c.cw AS week_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM a JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "rolling_active_users": """
            WITH du AS (
                SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events),
            days AS (SELECT DISTINCT day FROM du)
            SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users
            FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day ORDER BY d.day
        """,
        "unpivot_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "lang_sources": """
            SELECT lang,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                   string_agg(DISTINCT source, ',' ORDER BY source) AS sources
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # fixed-point integer PageRank, 3 unrolled iterations over the
        # ngram near-dup pair graph — every step is int64 floor math, so
        # the hash compare is exact (damping 0.85 = 17/20).
        "pagerank": f"""
            WITH {_NGRAM_CTES}, pairs AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (sa.set_size + sb.set_size - i) >= 0.5
            ), sym AS (
                SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION ALL
                SELECT doc_b, doc_a FROM pairs
            ), deg AS (
                SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
            ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
            r0 AS (
                SELECT u AS node, 1000000000000 // nn.n AS r FROM deg, nn
            ),
            r1 AS (
                SELECT s.v AS node,
                       (3000000000000 // (20 * nn.n))
                       + SUM((17 * r0.r) // (20 * deg.d)) AS r
                FROM sym s JOIN r0 ON r0.node = s.u
                           JOIN deg ON deg.u = s.u, nn
                GROUP BY s.v, nn.n
            ),
            r2 AS (
                SELECT s.v AS node,
                       (3000000000000 // (20 * nn.n))
                       + SUM((17 * r1.r) // (20 * deg.d)) AS r
                FROM sym s JOIN r1 ON r1.node = s.u
                           JOIN deg ON deg.u = s.u, nn
                GROUP BY s.v, nn.n
            ),
            r3 AS (
                SELECT s.v AS node,
                       (3000000000000 // (20 * nn.n))
                       + SUM((17 * r2.r) // (20 * deg.d)) AS r
                FROM sym s JOIN r2 ON r2.node = s.u
                           JOIN deg ON deg.u = s.u, nn
                GROUP BY s.v, nn.n
            )
            SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_scaled
            FROM r3 ORDER BY doc_id
        """,
        # Argmax over cosine(v, per-label centroid).  Safe to hash-compare
        # despite float scoring: assigned labels are integers and the
        # measured sf0.01 margin between best and runner-up is >=1.1e-4,
        # ~10 orders above double rounding noise.  Centroid means reuse the
        # exact integer sums of label_centroids (scale cancels in argmax).
        "nearest_centroid": """
            WITH ex AS (
                SELECT vec_id, label,
                       generate_subscripts(embedding, 1) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ), cent AS (
                SELECT label AS clabel, pos,
                       SUM(FLOOR(v * 1048576.0)) / COUNT(*) AS c
                FROM ex GROUP BY label, pos
            ), cnorm AS (
                SELECT clabel, pos,
                       c / SQRT(SUM(c*c) OVER (PARTITION BY clabel)) AS cn
                FROM cent
            ), scores AS (
                SELECT ex.vec_id, ex.label, cnorm.clabel,
                       SUM(ex.v * cnorm.cn) AS score
                FROM ex JOIN cnorm ON ex.pos = cnorm.pos
                GROUP BY ex.vec_id, ex.label, cnorm.clabel
            ), ranked AS (
                SELECT vec_id, label, CAST(clabel AS BIGINT) AS assigned,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY score DESC, clabel ASC) AS rn
                FROM scores
            )
            SELECT vec_id, label, assigned FROM ranked
            WHERE rn = 1 ORDER BY vec_id
        """,
        "length_stats": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                   CAST(MEDIAN(n_chars) AS DOUBLE) AS median_chars,
                   CAST(MAX(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "index_delete": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id % 10 != 0 ORDER BY doc_id
        """,
        "index_upsert": """
            SELECT doc_id,
                   CASE WHEN doc_id < 50 THEN replace(text, 'data', 'DATA')
                        ELSE text END AS content
            FROM documents ORDER BY doc_id
        """,
        "index_upsert_copart": """
            SELECT doc_id,
                   CASE WHEN doc_id < 50 THEN replace(text, 'data', 'DATA')
                        ELSE text END AS content
            FROM documents ORDER BY doc_id
        """,
        "range_join": """
            WITH bands(lo, hi, band_id) AS (VALUES
                (0.0, 100000.0, 0), (100000.0, 200000.0, 1),
                (200000.0, 400000.0, 2), (400000.0, 1e12, 3))
            SELECT band_id, COUNT(*) AS order_count,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders o
            JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
            GROUP BY band_id ORDER BY band_id
        """,
        "asof_join": """
            WITH p AS (SELECT user_id, event_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, event_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT user_id, purchase_event_id, click_event_id FROM (
                SELECT p.user_id, p.event_id AS purchase_event_id,
                       c.event_id AS click_event_id,
                       ROW_NUMBER() OVER (PARTITION BY p.event_id
                                          ORDER BY c.ts DESC, c.event_id DESC) AS rn
                FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
            ) WHERE rn = 1
            ORDER BY user_id, purchase_event_id
        """,
        "window_totals": """
            SELECT event_id, user_id,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_count,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
                   CAST(COALESCE(epoch_us(ts) - epoch_us(LAG(ts) OVER w), -1)
                        AS BIGINT) AS since_prev_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, running_count
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice >= 300000.0)
            ORDER BY c_custkey
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice >= 450000.0)
            ORDER BY c_custkey
        """,
        "events_pivot": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
            FROM events GROUP BY day ORDER BY day
        """,
        "distinct_users": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "orders_above_avg": """
            WITH m AS (
                SELECT o_custkey, SUM(o_totalprice) / COUNT(*) AS mean
                FROM orders GROUP BY o_custkey
            )
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
            FROM orders o JOIN m ON o.o_custkey = m.o_custkey
            WHERE o.o_totalprice > 2.0 * m.mean
            ORDER BY o.o_orderkey
        """,
        "events_rollup": """
            SELECT day, event_type, event_count FROM (
                SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                       COUNT(*) AS event_count
                FROM events GROUP BY day, event_type
                UNION ALL
                SELECT strftime(ts, '%Y-%m-%d') AS day, 'ALL', COUNT(*)
                FROM events GROUP BY strftime(ts, '%Y-%m-%d')
                UNION ALL
                SELECT 'ALL', 'ALL', COUNT(*) FROM events
            ) ORDER BY day, event_type
        """,
        "price_quantiles": """
            WITH ranked AS (
                SELECT l_returnflag, l_extendedprice AS value,
                       ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                          ORDER BY l_extendedprice) AS rn,
                       COUNT(*) OVER (PARTITION BY l_returnflag) AS n
                FROM lineitem
            )
            SELECT l_returnflag, q, value
            FROM ranked
            JOIN (VALUES (0.5), (0.9), (0.99)) AS qs(q)
              ON rn = CAST(CEIL(q * n) AS BIGINT)
            ORDER BY l_returnflag, q
        """,
        "bm25_search": f"""
            WITH d AS (
                SELECT doc_id, CAST({occ_data} AS DOUBLE) AS tf0,
                       CAST({occ_join} AS DOUBLE) AS tf1,
                       CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS dl
                FROM documents
            ), s AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       SUM(dl) AS sum_dl,
                       CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
                       CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1
                FROM d
            ), sc AS (
                -- identical sub-expression shapes to the engine's numpy
                -- (idf * (tf*(k1+1)) / (tf + k1*(1-b+b*dl/avgdl)))
                SELECT doc_id,
                       ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0)
                         * (tf0 * (1.2 + 1.0))
                         / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n)))
                     + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0)
                         * (tf1 * (1.2 + 1.0))
                         / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n)))
                       AS score
                FROM d, s
            )
            SELECT doc_id, CAST(FLOOR(score * 1e6 + 0.5) AS BIGINT) AS score_e6
            FROM sc ORDER BY score DESC, doc_id LIMIT 10
        """,
        "quality_score": """
            SELECT doc_id,
                   (LEAST(wc / 50.0, 1.0)
                    + LEAST(punct / GREATEST(wc / 15.0, 1.0), 1.0)
                    + LEAST(GREATEST(1.0 - (upper / GREATEST(chars, 1.0)) * 10.0, 0.0), 1.0)
                   ) / 3.0 AS quality
            FROM (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS wc,
                       CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) AS punct,
                       CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS upper,
                       CAST(length(text) AS DOUBLE) AS chars
                FROM documents)
        """,
        "ngram_jaccard_dedup": f"""
            -- exact 12-char-shingle Jaccard >= 0.5 via the same
            -- inverted-index formulation the engine distributes:
            -- postings longer than 200 docs are dropped (prefix filter)
            WITH {_NGRAM_CTES}
            SELECT doc_a, doc_b,
                   CAST(i AS DOUBLE) / (sa.set_size + sb.set_size - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / (sa.set_size + sb.set_size - i) >= 0.5
        """,
        "dup_clusters": f"""
            -- connected components (cluster = min reachable doc_id) over
            -- the exact ngram-Jaccard near-dup pair graph
            WITH RECURSIVE {_NGRAM_CTES}, pairs AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (sa.set_size + sb.set_size - i) >= 0.5
            ), sym AS (
                SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION ALL
                SELECT doc_b, doc_a FROM pairs
            ), reach(node, lab) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, r.lab FROM reach r JOIN sym s ON s.a = r.node
            )
            SELECT node AS doc_id, MIN(lab) AS cluster_id
            FROM reach GROUP BY node ORDER BY doc_id
        """,
        "token_count_bpe": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '\\s*(?:[A-Za-z]+|\\d{1,3}|[^\\w\\s]+|_+)|\\s+')) AS BIGINT)
                   AS bpe_tokens
            FROM documents
        """,
        "sessionize": """
            WITH e AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_idx
                FROM e
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   COUNT(*) AS event_count
            FROM s GROUP BY user_id, session_idx
            ORDER BY user_id, session_idx
        """,
        # gaps stay exact int64 microseconds; the single SUM/COUNT divide
        # mirrors the engine's one final divide before the 6-decimal round.
        "inter_event_gaps": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS gap
                FROM events
            )
            SELECT user_id,
                   CAST(COUNT(gap) AS BIGINT) AS n_gaps,
                   ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(gap), 6) AS avg_gap_us,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_us
            FROM g WHERE gap IS NOT NULL
            GROUP BY user_id ORDER BY user_id
        """,
        "event_transitions": """
            WITH g AS (
                SELECT event_type AS next_type,
                       LAG(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
                FROM events
            )
            SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM g WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type ORDER BY prev_type, next_type
        """,
        # DuckDB's regex engine is RE2, same as pyarrow's
        # count_substring_regex — non-overlapping match counts agree.
        "regex_match_stats": """
            WITH per_doc AS (
                SELECT lang,
                       CAST(len(regexp_extract_all(text, '[a-z]{8,}')) AS BIGINT) AS cnt
                FROM documents
            )
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS docs_with_match,
                   CAST(SUM(cnt) AS BIGINT) AS total_matches,
                   CAST(MAX(cnt) AS BIGINT) AS max_per_doc
            FROM per_doc GROUP BY lang ORDER BY lang
        """,
        # threshold 0.35 (vs the dedup family's 0.5) so the near-dup
        # graph is dense enough to close triangles at test scale.
        "triangles": f"""
            WITH {_NGRAM_CTES}, pairs AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE CAST(i AS DOUBLE) / (sa.set_size + sb.set_size - i) >= 0.35
            )
            SELECT p1.doc_a AS a, p1.doc_b AS b, p2.doc_b AS c
            FROM pairs p1
            JOIN pairs p2 ON p2.doc_a = p1.doc_a AND p2.doc_b > p1.doc_b
            JOIN pairs p3 ON p3.doc_a = p1.doc_b AND p3.doc_b = p2.doc_b
            ORDER BY a, b, c
        """,
        # The DDSketch histogram is deterministic, so the SQL twin
        # recomputes the identical log-gamma buckets; gamma must be
        # forced to DOUBLE (DuckDB decimal literals would diverge).
        "approx_quantiles": """
            WITH g AS (SELECT CAST(1.01 AS DOUBLE) / CAST(0.99 AS DOUBLE) AS gamma),
            b AS (
                SELECT l_returnflag AS grp,
                       CAST(CEIL(LN(l_extendedprice) / LN(gamma)) AS BIGINT) AS bucket
                FROM lineitem, g WHERE l_extendedprice > 0
            ), h AS (
                SELECT grp, bucket, COUNT(*) AS n FROM b GROUP BY grp, bucket
            ), c AS (
                SELECT grp, bucket,
                       SUM(n) OVER (PARTITION BY grp ORDER BY bucket) AS cum,
                       SUM(n) OVER (PARTITION BY grp) AS total
                FROM h
            ), sel AS (
                SELECT grp, q, MIN(bucket) AS bucket
                FROM c JOIN (VALUES (0.5), (0.9), (0.99)) AS qs(q)
                  ON cum >= CEIL(q * total)
                GROUP BY grp, q
            )
            SELECT grp, q,
                   ROUND(2 * POWER(g.gamma, bucket) / (g.gamma + 1), 6) AS value,
                   CAST(0 AS BIGINT) AS n_dropped
            FROM sel, g ORDER BY grp, q
        """,
        # the CMS estimate equals the exact count whenever the term avoids
        # a collision in at least one of the 4 hash rows — with ~31
        # distinct terms vs width 2^14 a 4-row total collision is ~1e-7,
        # so the exact SQL twin hash-matches (verified at sf0.01 AND 0.1)
        "heavy_hitters": """
            WITH t AS (
                SELECT unnest(regexp_extract_all(text, '\\S+')) AS term
                FROM documents
            ), c AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS est_count
                FROM t GROUP BY term
            ), tot AS (SELECT SUM(est_count) AS n FROM c)
            SELECT term, est_count FROM c, tot
            WHERE est_count >= 0.01 * tot.n ORDER BY term
        """,
        "fuzzy_pairs": """
            WITH v AS (SELECT DISTINCT c_name AS t FROM customer)
            SELECT a.t AS name_a, b.t AS name_b
            FROM v a JOIN v b ON a.t < b.t AND levenshtein(a.t, b.t) <= 1
            ORDER BY name_a, name_b
        """,
        # A-Res priority sampling: u from the first 8 md5 hex chars as a
        # uniform in (0,1], ordered by the monotone-equivalent ln(u)/w.
        "weighted_sample": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS w
            FROM documents
            WHERE n_chars > 0
            ORDER BY ln((CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) + 1)
                        / 4294967296.0) / n_chars DESC, doc_id
            LIMIT 100
        """,
        # Lee et al. substring-dedup signal at 5-gram granularity: a gram
        # is duplicated when >= 2 distinct docs carry it; dup_ngrams
        # counts a doc's gram POSITIONS whose gram is duplicated.
        "dup_ngram_coverage": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
                FROM documents
            ), grams AS (
                SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g
                FROM toks,
                     LATERAL unnest(range(1, GREATEST(len(w) - 3, 1))) AS t(i)
            ), per_doc AS (
                SELECT doc_id, g, COUNT(*) AS occ FROM grams GROUP BY doc_id, g
            ), dupg AS (
                SELECT g FROM per_doc GROUP BY g HAVING COUNT(*) >= 2
            )
            SELECT p.doc_id,
                   CAST(SUM(p.occ) AS BIGINT) AS n_ngrams,
                   CAST(COALESCE(SUM(CASE WHEN d.g IS NOT NULL THEN p.occ END), 0)
                        AS BIGINT) AS dup_ngrams
            FROM per_doc p LEFT JOIN dupg d ON p.g = d.g
            GROUP BY p.doc_id ORDER BY p.doc_id
        """,
        # Gopher composite quality rules, integer-exact (x10 scaling)
        "gopher_quality": """
            WITH toks AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
                FROM documents
            ), per AS (
                SELECT doc_id,
                       CAST(COUNT(*) AS BIGINT) AS n_words,
                       CAST(SUM(length(w)) AS BIGINT) AS total_word_chars,
                       CAST(COUNT(DISTINCT w) AS BIGINT) AS distinct_words,
                       CAST(SUM(CASE WHEN w IN ('the','a','and','of','to')
                                     THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
                FROM toks GROUP BY doc_id
            )
            SELECT doc_id, n_words, total_word_chars, distinct_words, stop_hits,
                   CAST(CASE WHEN n_words >= 40
                              AND 10 * total_word_chars >= 38 * n_words
                              AND 10 * total_word_chars <= 48 * n_words
                              AND stop_hits >= 1
                              AND 10 * distinct_words >= 4 * n_words
                         THEN 1 ELSE 0 END AS INTEGER) AS kept
            FROM per ORDER BY doc_id
        """,
        # running total over the aggregated month series
        "cumulative_revenue": """
            SELECT month, month_cents,
                   CAST(SUM(month_cents) OVER (ORDER BY month) AS BIGINT)
                       AS cum_cents
            FROM (
                SELECT strftime(o_orderdate, '%Y-%m') AS month,
                       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS month_cents
                FROM orders GROUP BY month
            ) ORDER BY month
        """,
        # Q4-shaped correlated EXISTS: orders with a late line item
        "late_shipments": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate
            )
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        # aggregate-of-aggregate (Q13 shape): order size distribution
        "order_line_histogram": """
            SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM (
                SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
                FROM lineitem GROUP BY l_orderkey
            )
            GROUP BY n_lines ORDER BY n_lines
        """,
        # fact-dim broadcast join + brand revenue rollup
        "brand_revenue": """
            SELECT p.p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                                       * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
            ORDER BY revenue_cents DESC, p.p_brand
        """,
        # source-mixture sampling: content-hash uniform vs per-source
        # weight (N%4+1)/4 for srcN
        "mix_sources": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) AS u,
                       (CAST(substr(source, 4) AS BIGINT) % 4 + 1)
                           * 1073741824 AS cut
                FROM documents
            ) WHERE u < cut ORDER BY doc_id
        """,
        # interleaved text+media span rollup on the derived layout
        # (10-token text spans, one media span per 2 text spans)
        "interleaved_span_stats": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
                FROM documents
            ), pos AS (
                SELECT doc_id, i, length(w[i]) AS wl
                FROM toks,
                     LATERAL unnest(range(1, len(w) + 1)) AS t(i)
                WHERE len(w) > 0
            ), sp AS (
                SELECT doc_id, CAST(FLOOR((i - 1) / 10) AS BIGINT) AS sidx,
                       CAST(SUM(wl) + COUNT(*) - 1 AS BIGINT) AS chars
                FROM pos GROUP BY doc_id, FLOOR((i - 1) / 10)
            ), per_doc AS (
                SELECT doc_id, COUNT(*) AS nspans, SUM(chars) AS tchars
                FROM sp GROUP BY doc_id
            )
            SELECT * FROM (
                SELECT 'media' AS kind,
                       CAST(SUM(nspans // 2) AS BIGINT) AS n_spans,
                       CAST(0 AS BIGINT) AS total_chars,
                       CAST(COUNT(*) FILTER (WHERE nspans >= 2) AS BIGINT)
                           AS n_docs
                FROM per_doc
                UNION ALL
                SELECT 'text' AS kind,
                       CAST(SUM(nspans) AS BIGINT),
                       CAST(SUM(tchars) AS BIGINT),
                       CAST(COUNT(*) AS BIGINT)
                FROM per_doc
            ) ORDER BY kind
        """,
        # TPC-H Q5-shaped six-table regional revenue join
        "regional_revenue": """
            SELECT n_name,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                       * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= DATE '1998-01-01'
              AND o_orderdate < DATE '1999-01-01'
            GROUP BY n_name ORDER BY revenue_cents DESC, n_name
        """,
        # language-ID confusion matrix (same CASE as the langid oracle)
        "langid_confusion": f"""
            SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM (
                SELECT lang,
                       CASE
                         WHEN {occ_join} > {occ_the} AND {occ_join} > {occ_data} THEN 'fr'
                         WHEN {occ_data} > {occ_the} THEN 'de'
                         WHEN {occ_the} > 0 THEN 'en'
                         ELSE 'und'
                       END AS pred_lang
                FROM documents
            )
            GROUP BY lang, pred_lang ORDER BY lang, pred_lang
        """,
        # calendar rollup: events per weekday (strftime %w, Sunday=0)
        "events_by_weekday": """
            SELECT strftime(ts, '%w') AS weekday,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM events GROUP BY weekday ORDER BY weekday
        """,
        # per-group window rank: PERCENT_RANK within order priority
        "group_percent_rank": """
            SELECT o_orderpriority, o_orderkey,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
                   PERCENT_RANK() OVER w AS pct_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY FLOOR(o_totalprice * 100.0 + 0.5) DESC,
                                  o_orderkey)
            ORDER BY o_orderpriority, rnk
        """,
        # boilerplate mask: token positions covered by hot 5-grams
        "boilerplate_coverage": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
                FROM documents
            ), grams AS (
                SELECT doc_id, i, array_to_string(w[i:i+4], ' ') AS g
                FROM toks,
                     LATERAL unnest(range(1, GREATEST(len(w) - 3, 1))) AS t(i)
            ), hot AS (
                SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 3
            ), cov AS (
                SELECT doc_id, COUNT(DISTINCT p) AS covered
                FROM grams JOIN hot USING (g),
                     LATERAL unnest(range(i, i + 5)) AS u(p)
                GROUP BY doc_id
            ), base AS (
                SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens
                FROM toks WHERE len(w) > 0
            )
            SELECT b.doc_id, b.n_tokens,
                   CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_tokens
            FROM base b LEFT JOIN cov c ON b.doc_id = c.doc_id
            ORDER BY b.doc_id
        """,
        # TPC-H Q2-shaped argmin join: cheapest supplier per part
        "min_cost_supplier": """
            WITH r AS (
                SELECT l_partkey, l_extendedprice, l_suppkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY l_partkey
                           ORDER BY l_extendedprice, l_suppkey) AS rn
                FROM lineitem
            )
            SELECT r.l_partkey AS p_partkey,
                   CAST(FLOOR(r.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                       AS min_price_cents,
                   CAST(r.l_suppkey AS BIGINT) AS s_suppkey,
                   s.s_name, n.n_name
            FROM r
            JOIN supplier s ON r.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE rn = 1 ORDER BY p_partkey
        """,
        # TPC-H Q18-shaped HAVING-filter join: large-volume orders
        "large_volume_customers": """
            WITH big AS (
                SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                           AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
            )
            SELECT o.o_custkey AS c_custkey, c.c_name,
                   big.l_orderkey AS o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                       AS price_cents,
                   big.total_qty
            FROM big
            JOIN orders o ON big.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY big.total_qty DESC, o_orderkey
        """,
        # TPC-H Q14-shaped conditional revenue per ship month
        "promo_revenue": """
            SELECT strftime(l_shipdate, '%Y-%m') AS month,
                   CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
                            THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                            * 100.0 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS promo_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                       * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                       AS total_cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY month ORDER BY month
        """,
        # Gopher within-doc repetition inputs: total vs distinct bigrams
        "intra_doc_repetition": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
                FROM documents
            ), grams AS (
                SELECT doc_id, w[i] || ' ' || w[i+1] AS g
                FROM toks,
                     LATERAL unnest(range(1, GREATEST(len(w), 1))) AS t(i)
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
                   CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_ngrams
            FROM grams GROUP BY doc_id ORDER BY doc_id
        """,
        # TPC-H Q10-shaped: top-20 customers by returned-item revenue
        "returned_item_revenue": """
            WITH li AS (
                SELECT l_orderkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                      * 100.0 + 0.5) AS BIGINT)) AS cents
                FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
            )
            SELECT c.c_custkey, c.c_name,
                   ROUND(SUM(li.cents) / 100.0, 2) AS revenue
            FROM li
            JOIN orders o ON li.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c.c_custkey, c.c_name
            ORDER BY SUM(li.cents) DESC, c.c_custkey
            LIMIT 20
        """,
        # TPC-H Q15-shaped: supplier(s) at the global 3-month revenue max
        "top_revenue_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                      * 100.0 + 0.5) AS BIGINT)) AS cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   ROUND(rev.cents / 100.0, 2) AS total_revenue
            FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
            WHERE rev.cents = (SELECT MAX(cents) FROM rev)
            ORDER BY s.s_suppkey
        """,
        # TPC-H Q19-shaped: disjunctive brand/size/quantity clause revenue
        "disjunctive_revenue": """
            WITH clauses(clause_id, brand, smin, smax, qmin, qmax) AS (
                VALUES (0, 'Brand#12', 1, 15, 1.0, 21.0),
                       (1, 'Brand#23', 1, 25, 10.0, 30.0),
                       (2, 'Brand#4', 1, 50, 20.0, 40.0)
            )
            SELECT c.clause_id,
                   ROUND(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                                        * 100.0 + 0.5) AS BIGINT)) / 100.0,
                         2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN clauses c
              ON p.p_brand = c.brand
             AND p.p_size BETWEEN c.smin AND c.smax
             AND l.l_quantity BETWEEN c.qmin AND c.qmax
            GROUP BY c.clause_id ORDER BY c.clause_id
        """,
        # TPC-H Q22-shaped: above-global-average balance, no recent orders
        "dormant_rich_customers": """
            WITH cb AS (
                SELECT c_custkey, c_nationkey,
                       CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
                FROM customer
            ), bal AS (
                SELECT SUM(bal_cents) AS tot, COUNT(*) AS cnt
                FROM cb WHERE bal_cents > 0
            )
            SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
                   ROUND(SUM(bal_cents) / 100.0, 2) AS totacctbal
            FROM cb, bal
            WHERE cb.bal_cents * bal.cnt > bal.tot
              AND cb.c_custkey NOT IN (
                    SELECT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '2001-01-01')
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        # TPC-H Q6-shaped: pure scan filter aggregate
        "forecast_revenue": """
            SELECT ROUND(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100.0
                                        + 0.5) AS BIGINT)) / 100.0, 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        # TPC-H Q7-shaped: two-nation shipping volume by direction and year
        # cross-table UNION ALL + aggregate
        "party_nations": """
            SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_parties
            FROM (
                SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
                UNION ALL
                SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
            )
            GROUP BY nationkey ORDER BY nationkey
        """,
        # TPC-H Q13: filtered LEFT OUTER JOIN with zero-count preservation
        "customer_order_distribution": """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
                SELECT c.c_custkey,
                       CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count
                FROM customer c
                LEFT OUTER JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '5-LOW'
                GROUP BY c.c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        # FULL OUTER JOIN of two derived per-user aggregates
        "user_activity_full": """
            WITH a AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_click
                FROM events WHERE event_type = 'click' GROUP BY user_id
            ), b AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchase
                FROM events WHERE event_type = 'purchase' GROUP BY user_id
            )
            SELECT COALESCE(a.user_id, b.user_id) AS user_id,
                   a.n_click, b.n_purchase
            FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
            ORDER BY user_id
        """,
        "nation_trade_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
                   ROUND(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                                        * 100.0 + 0.5) AS BIGINT)) / 100.0,
                         2) AS revenue
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3')
                OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2'))
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # TPC-H Q8-shaped: one nation's market share by order year
        "market_share": """
            WITH slice AS (
                SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                       CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                                  * 100.0 + 0.5) AS BIGINT) AS cents,
                       s.s_nationkey
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation cn ON cn.n_nationkey = c.c_nationkey
                JOIN region r ON r.r_regionkey = cn.n_regionkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
                  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o.o_orderdate < TIMESTAMP '1998-01-01'
            )
            SELECT o_year,
                   SUM(CASE WHEN s_nationkey = (SELECT n_nationkey FROM nation
                                                WHERE n_name = 'NATION_3')
                            THEN cents ELSE 0 END) / SUM(cents) AS mkt_share,
                   ROUND(SUM(cents) / 100.0, 2) AS total_revenue
            FROM slice GROUP BY o_year ORDER BY o_year
        """,
        # TPC-H Q9-shaped: profit per supplier nation per year (retailprice
        # cost proxy, exact integer cents)
        "product_profit": """
            SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS o_year,
                   ROUND(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                                        * 100.0 + 0.5) AS BIGINT)
                             - CAST(FLOOR(p.p_retailprice * 10.0 + 0.5) AS BIGINT)
                               * CAST(l.l_quantity AS BIGINT)) / 100.0,
                         2) AS profit
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE p.p_name LIKE '%red%'
            GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC
        """,
        # TPC-H Q11-shaped: parts above 2x one nation's average part value
        # (the spec's fraction is 0.0001/SF, i.e. scale-dependent; the
        # mult*avg form keeps the HAVING selective at every sf)
        "nation_part_value": """
            WITH v AS (
                SELECT l_partkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                      * 100.0 + 0.5) AS BIGINT)) AS cents
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY l_partkey
            )
            SELECT l_partkey, ROUND(cents / 100.0, 2) AS value
            FROM v
            WHERE cents * (SELECT COUNT(*) FROM v)
                  > 2 * (SELECT SUM(cents) FROM v)
            ORDER BY value DESC, l_partkey
        """,
        # TPC-H Q12-shaped: high/low priority line counts per return flag
        "returnflag_priority_counts": """
            SELECT l.l_returnflag,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q16-shaped: distinct suppliers per surviving (brand,type,size)
        "supplier_part_counts": """
            WITH pairs AS (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            )
            SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
            FROM pairs pr JOIN part p ON p.p_partkey = pr.l_partkey
            WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
              AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND pr.l_suppkey NOT IN (
                    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        # TPC-H Q17-shaped: revenue of below-20%-of-avg-quantity lines
        "small_qty_revenue": """
            WITH pk AS (
                SELECT p_partkey FROM part
                WHERE p_brand = 'Brand#13' AND p_size <= 10
            ), agg AS (
                SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sq,
                       COUNT(*) AS c
                FROM lineitem JOIN pk ON p_partkey = l_partkey
                GROUP BY l_partkey
            )
            SELECT ROUND(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
                                        * 100.0 + 0.5) AS BIGINT)) / 100.0,
                         2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem l JOIN agg a ON a.l_partkey = l.l_partkey
            WHERE 5 * CAST(l.l_quantity AS BIGINT) * a.c < a.sq
        """,
        # TPC-H Q20-shaped: suppliers shipping bulk quantities of matched parts
        "bulk_part_suppliers": """
            WITH s AS (
                SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS q
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_name LIKE 'small%'
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY 1, 2
            )
            SELECT DISTINCT sp.s_suppkey, sp.s_name
            FROM s JOIN supplier sp ON sp.s_suppkey = s.l_suppkey
            WHERE s.q > 60 ORDER BY sp.s_suppkey
        """,
        # TPC-H Q21-shaped: sole returning supplier on multi-supplier F orders
        "sole_return_suppliers": """
            WITH pairs AS (
                SELECT l_orderkey, l_suppkey,
                       MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                           AS had_r
                FROM lineitem GROUP BY 1, 2
            ), ords AS (
                SELECT l_orderkey FROM pairs
                JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F'
                GROUP BY 1 HAVING COUNT(*) > 1 AND SUM(had_r) = 1
            ), cnts AS (
                SELECT p.l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT)
                           AS numwait
                FROM pairs p JOIN ords USING (l_orderkey)
                WHERE p.had_r = 1 GROUP BY 1
            )
            SELECT c.s_suppkey, sp.s_name, c.numwait
            FROM cnts c JOIN supplier sp ON sp.s_suppkey = c.s_suppkey
            ORDER BY c.numwait DESC, c.s_suppkey LIMIT 20
        """,
        # Lee et al. 2022 substring dedup, rewrite step: excise word
        # 8-grams seen in >=2 docs from every non-first carrier
        "remove_duplicate_spans": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
                FROM documents
            ), grams AS (
                SELECT doc_id, i AS s, array_to_string(w[i:i+7], ' ') AS g
                FROM toks, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
                WHERE len(w) >= 8
            ), dup AS (
                SELECT g, MIN(doc_id) AS keeper FROM grams
                GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
            ), covered AS (
                SELECT DISTINCT gr.doc_id, gr.s + o.off AS pos
                FROM grams gr JOIN dup d ON gr.g = d.g,
                     LATERAL unnest(range(0, 8)) AS o(off)
                WHERE gr.doc_id <> d.keeper
            ), positions AS (
                SELECT t.doc_id, i, w[CAST(i AS INT)] AS tok
                FROM toks t, LATERAL unnest(range(1, len(w) + 1)) AS t2(i)
            ), kept AS (
                SELECT p.doc_id, p.i, p.tok
                FROM positions p
                LEFT JOIN covered c ON c.doc_id = p.doc_id AND c.pos = p.i
                WHERE c.pos IS NULL
            )
            SELECT t.doc_id,
                   COALESCE(k.clean_text, '') AS clean_text,
                   CAST(len(t.w) - COALESCE(k.kept_cnt, 0) AS BIGINT) AS n_removed
            FROM toks t LEFT JOIN (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
                       COUNT(*) AS kept_cnt
                FROM kept GROUP BY doc_id
            ) k USING (doc_id)
            ORDER BY t.doc_id
        """,
        # streaming PII scrub: RE2 replace + redaction count (both engines RE2)
        "scrub_values": """
            SELECT event_id,
                   regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed,
                   CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
                       AS n_redacted
            FROM events ORDER BY event_id
        """,
        # own-label-centroid cosine outliers (exact-integer centroids as in
        # nearest_centroid; vectors L2-normalized for the threshold compare)
        "centroid_outliers": """
            WITH ex AS (
                SELECT vec_id, label,
                       generate_subscripts(embedding, 1) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings
            ), cent AS (
                SELECT label AS clabel, pos,
                       SUM(FLOOR(v * 1048576.0)) / COUNT(*) AS c
                FROM ex GROUP BY label, pos
            ), cnorm AS (
                SELECT clabel, pos,
                       c / SQRT(SUM(c*c) OVER (PARTITION BY clabel)) AS cn
                FROM cent
            ), vnorm AS (
                SELECT vec_id, SQRT(SUM(v*v)) AS nrm FROM ex GROUP BY vec_id
            ), scores AS (
                SELECT ex.vec_id, ex.label,
                       SUM((ex.v / NULLIF(vn.nrm, 0)) * cn.cn) AS score
                FROM ex
                JOIN cnorm cn ON ex.pos = cn.pos AND ex.label = cn.clabel
                JOIN vnorm vn ON vn.vec_id = ex.vec_id
                GROUP BY ex.vec_id, ex.label
            )
            SELECT vec_id, CAST(label AS BIGINT) AS label
            FROM scores WHERE score < -0.05 ORDER BY vec_id
        """,
        # cross-source shared-shingle contamination matrix (12-char
        # shingles, char_ngrams normalization = whitespace collapse)
        "source_overlap": """
            WITH norm AS (
                SELECT source, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS s
                FROM documents
            ), sh AS (
                SELECT DISTINCT source,
                       CASE WHEN length(s) < 12 THEN s
                            ELSE substring(s, i, 12) END AS shingle
                FROM norm,
                     LATERAL unnest(range(1, GREATEST(length(s) - 10, 2))) AS t(i)
                WHERE length(s) > 0
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_shingles
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
            GROUP BY source_a, source_b ORDER BY source_a, source_b
        """,
        # percentile-band length filter: per-lang docs/chars kept inside
        # [p10, p90] of n_chars (percentile_disc bounds, integer compare)
        "length_band_filter": """
            WITH b AS (
                SELECT lang,
                       percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars) AS lo,
                       percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS hi
                FROM documents GROUP BY lang
            )
            SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS kept_docs,
                   CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
            FROM documents d JOIN b ON d.lang = b.lang
            WHERE d.n_chars BETWEEN b.lo AND b.hi
            GROUP BY d.lang ORDER BY d.lang
        """,
        # temporal interval-count join: clicks in the hour before each
        # purchase, per user (exclusive lower bound, inclusive upper)
        "clicks_before_purchase": """
            SELECT p.event_id AS purchase_id, p.user_id,
                   CAST(COUNT(c.event_id) AS BIGINT) AS n_in_window
            FROM events p LEFT JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id, p.user_id ORDER BY purchase_id
        """,
        # skyline: parts not dominated under (min retailprice, max size);
        # both-axis ties survive (no strict domination)
        "pareto_front": """
            SELECT a.p_partkey, a.p_retailprice AS price,
                   CAST(a.p_size AS BIGINT) AS p_size
            FROM part a WHERE NOT EXISTS (
                SELECT 1 FROM part b
                WHERE b.p_retailprice <= a.p_retailprice
                  AND b.p_size >= a.p_size
                  AND (b.p_retailprice < a.p_retailprice
                       OR b.p_size > a.p_size))
            ORDER BY a.p_partkey
        """,
        # interpolated per-lang length percentiles (percentile_cont twin)
        "length_quantiles_cont": """
            SELECT lang, q, value FROM (
                SELECT lang, 0.25 AS q,
                       quantile_cont(n_chars, 0.25) AS value
                FROM documents GROUP BY lang
                UNION ALL
                SELECT lang, 0.5, quantile_cont(n_chars, 0.5)
                FROM documents GROUP BY lang
                UNION ALL
                SELECT lang, 0.75, quantile_cont(n_chars, 0.75)
                FROM documents GROUP BY lang
            ) ORDER BY lang, q
        """,
        # robust center: exact interpolated 5/95 percentile band per
        # group, then an integer-cents mean of the in-band values —
        # bounds pinned to quantile_cont, avg pinned to the engine's
        # ROUND(sum_cents/100/n, 2)
        "trimmed_mean_price": """
            WITH b AS (
                SELECT l_returnflag AS g,
                       quantile_cont(l_extendedprice, 0.05) AS lo,
                       quantile_cont(l_extendedprice, 0.95) AS hi
                FROM lineitem GROUP BY l_returnflag
            ), k AS (
                SELECT b.g, b.lo, b.hi,
                       CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
                FROM lineitem l JOIN b ON l.l_returnflag = b.g
                WHERE l.l_extendedprice >= b.lo AND l.l_extendedprice <= b.hi
            )
            SELECT g AS l_returnflag, lo, hi,
                   ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*), 2)
                       AS trimmed_avg,
                   COUNT(*) AS n_kept
            FROM k GROUP BY g, lo, hi
            ORDER BY l_returnflag
        """,
        # incremental view maintenance: base view + delta merge must
        # equal the from-scratch Q1 aggregate over ALL rows
        "incremental_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        # grouped OLS fit from exact integer moments; float ops mirror
        # the engine's pinned order term for term
        "regr_price_qty": """
            WITH m AS (
                SELECT l_returnflag,
                       CAST(COUNT(*) AS DOUBLE) AS n,
                       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
                       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
                                AS BIGINT)) AS DOUBLE) AS sy,
                       CAST(SUM(CAST(l_quantity AS BIGINT)
                                * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
                       CAST(SUM(CAST(l_quantity AS BIGINT)
                                * CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
                                       AS BIGINT)) AS DOUBLE) AS sxy,
                       COUNT(*) AS n_rows
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag, n_rows,
                   ROUND(CASE WHEN n * sxx - sx * sx > 0
                              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                              ELSE 0 END, 6) AS slope_cents,
                   ROUND((sy - (CASE WHEN n * sxx - sx * sx > 0
                                     THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                                     ELSE 0 END) * sx) / n, 6) AS intercept_cents
            FROM m ORDER BY l_returnflag
        """,
        # robust per-lang outliers: |x - median| > 3 * MAD, exact integer
        # order statistics (percentile_disc) for median and MAD
        "robust_length_outliers": """
            WITH med AS (
                SELECT lang,
                       percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS m
                FROM documents GROUP BY lang
            ), dev AS (
                SELECT d.lang, ABS(d.n_chars - med.m) AS ad, d.n_chars,
                       med.m
                FROM documents d JOIN med ON d.lang = med.lang
            ), mad AS (
                SELECT lang,
                       percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS mad
                FROM dev GROUP BY lang
            )
            SELECT dev.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN 2 * dev.ad > 6 * mad.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM dev JOIN mad ON dev.lang = mad.lang
            GROUP BY dev.lang ORDER BY dev.lang
        """,
        # per-day OHLC: open/close = first/last order by (ts, orderkey)
        "daily_ohlc": """
            WITH c AS (
                SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                       o_orderdate AS ts, o_orderkey AS k,
                       CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
                FROM orders
            ), r AS (
                SELECT day, cents,
                       ROW_NUMBER() OVER (PARTITION BY day
                                          ORDER BY ts, k) AS rn_a,
                       ROW_NUMBER() OVER (PARTITION BY day
                                          ORDER BY ts DESC, k DESC) AS rn_d
                FROM c
            )
            SELECT day,
                   MAX(CASE WHEN rn_a = 1 THEN cents END) / 100.0 AS open,
                   MAX(cents) / 100.0 AS high,
                   MIN(cents) / 100.0 AS low,
                   MAX(CASE WHEN rn_d = 1 THEN cents END) / 100.0 AS close,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM r GROUP BY day ORDER BY day
        """,
        # lower weighted median: smallest price-cents whose cumulative
        # quantity reaches half the group total (integer-exact)
        "weighted_median_price": """
            WITH c AS (
                SELECT l_returnflag AS g,
                       CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
                       CAST(l_quantity AS BIGINT) AS w
                FROM lineitem
            ), s AS (
                SELECT g, v, SUM(w) AS wsum FROM c GROUP BY g, v
            ), cum AS (
                SELECT g, v,
                       SUM(wsum) OVER (PARTITION BY g ORDER BY v) AS cw,
                       SUM(wsum) OVER (PARTITION BY g) AS tot
                FROM s
            )
            SELECT g AS l_returnflag,
                   CAST(MIN(v) AS BIGINT) AS weighted_median_cents
            FROM cum WHERE 2 * cw >= tot GROUP BY g ORDER BY l_returnflag
        """,
        # hierarchical percent-of-parent: nation revenue share within region
        "nation_share": """
            WITH per_nation AS (
                SELECT n.n_regionkey AS rkey, n.n_name,
                       SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5)
                           AS BIGINT)) AS cents
                FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                GROUP BY rkey, n.n_name
            ), with_reg AS (
                SELECT r.r_name, pn.n_name, pn.cents,
                       SUM(pn.cents) OVER (PARTITION BY pn.rkey) AS rtot
                FROM per_nation pn
                JOIN region r ON pn.rkey = r.r_regionkey
            )
            SELECT r_name, n_name,
                   ROUND(cents / 100.0, 2) AS revenue,
                   ROUND(CAST(cents AS DOUBLE) / CAST(rtot AS DOUBLE), 6)
                       AS share_in_region
            FROM with_reg ORDER BY r_name, n_name
        """,
        # per-lang Gini over doc lengths (pinned rank-sum formula)
        "length_gini": """
            WITH ranked AS (
                SELECT lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY n_chars) AS i
                FROM documents
            )
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   ROUND((2.0 * SUM(i * n_chars))
                         / (CAST(COUNT(*) AS DOUBLE)
                            * CAST(SUM(n_chars) AS DOUBLE))
                         - (COUNT(*) + 1) / CAST(COUNT(*) AS DOUBLE),
                         6) AS gini
            FROM ranked GROUP BY lang ORDER BY lang
        """,
    }
