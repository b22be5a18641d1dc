"""CCNet-style LM perplexity scoring (pipelines/lm.py): oracle parity
at sf0.001 (pytest replica of the driver gate) plus semantics unit
checks on the smoothing math and the NTILE tiling."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

import __ray_entry__ as entry
from azure_blob_crawler_ray.pipelines import lm

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", ["lm_perplexity", "ccnet_buckets"])
def test_matches_oracle(name):
    got = _canon(entry.queries()[name](SF).to_pandas())
    want = _canon(_duck().execute(entry.oracle_sql()[name]).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_smoothing_hand_case():
    # reference slice = doc 0 only (ref_mod large): "a b a b c"
    # pairs: (a,b)x2 (b,a)x1 (b,c)x1; ctx: a->2 b->2; V = 3 distinct + 1 = 4
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "a b a b c"},
            {"doc_id": 1, "text": "a b z"},  # (a,b): (2+1)/(2+4); (b,z): (0+1)/(2+4)
        ]
    )
    out = lm.lm_perplexity(docs, ref_mod=100).to_pandas().set_index("doc_id")
    logp = [np.log(3 / 6), np.log(1 / 6)]
    want1 = round(float(np.exp(-np.mean(logp))), 4)
    assert out.loc[1, "ppl"] == want1
    assert out.loc[1, "n_bigrams"] == 2
    # unseen context w1 ("z" never starts a reference bigram): p = 1/V
    docs2 = ray.data.from_items(
        [
            {"doc_id": 0, "text": "a b"},
            {"doc_id": 1, "text": "z q"},
        ]
    )
    out2 = lm.lm_perplexity(docs2, ref_mod=100).to_pandas().set_index("doc_id")
    # V = 2 distinct + 1 = 3; p(q|z) = (0+1)/(0+3)
    assert out2.loc[1, "ppl"] == round(float(np.exp(np.log(3.0))), 4)


def test_short_docs_excluded():
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "a b c d"},
            {"doc_id": 1, "text": "single"},
            {"doc_id": 2, "text": "   "},
        ]
    )
    out = lm.lm_perplexity(docs, ref_mod=1).to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_ntile_sizes_and_order():
    # 8 docs, ntile 3 -> sizes 3/3/2, head = lowest perplexity
    out = lm.ccnet_buckets(
        ray.data.read_parquet(f"{SF}/documents.parquet"), ntile=4
    ).to_pandas()
    n = int(out["n_docs"].sum())
    q, r = divmod(n, 4)
    assert out["n_docs"].tolist() == [q + 1 if i < r else q for i in range(4)]
    assert out["avg_ppl"].is_monotonic_increasing


@pytest.mark.parametrize("name", ["dsir_weights", "dsir_select"])
def test_dsir_matches_oracle(name):
    got = _canon(entry.queries()[name](SF).to_pandas())
    want = _canon(_duck().execute(entry.oracle_sql()[name]).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dsir_prefers_target_like_docs():
    # target slice (mod 2 == 0) speaks one vocabulary, raw docs another;
    # the raw doc borrowing the target vocabulary must outrank the rest.
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "alpha beta gamma alpha beta"},
            {"doc_id": 2, "text": "alpha gamma beta gamma"},
            {"doc_id": 1, "text": "alpha beta gamma"},          # target-like
            {"doc_id": 3, "text": "zeta eta theta iota"},        # off-target
            {"doc_id": 5, "text": "zeta eta zeta eta"},          # off-target
        ]
    )
    sel = lm.dsir_select(docs, k=1, ref_mod=2).to_pandas()
    assert sel["doc_id"].tolist() == [1]
    w = lm.dsir_weights(docs, ref_mod=2).to_pandas().set_index("doc_id")
    assert w.loc[1, "logratio"] > w.loc[3, "logratio"]
    assert w.loc[1, "logratio"] > w.loc[5, "logratio"]


def test_lexical_diversity_matches_oracle():
    got = _canon(entry.queries()["lexical_diversity"](SF).to_pandas())
    want = _canon(_duck().execute(entry.oracle_sql()["lexical_diversity"]).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lexical_diversity_hand_case():
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "a a a a"},       # ttr .25, entropy 0
            {"doc_id": 1, "text": "a b c d"},       # ttr 1, entropy ln(4)
            {"doc_id": 2, "text": ""},               # excluded
        ]
    )
    out = lm.lexical_diversity(docs).to_pandas().set_index("doc_id")
    assert out.loc[0, "entropy"] == 0.0 and out.loc[0, "ttr"] == 0.25
    assert out.loc[1, "ttr"] == 1.0
    assert out.loc[1, "entropy"] == round(float(np.log(4)), 4)
    assert 2 not in out.index


def test_bigram_guard_refuses_and_min_count_is_effective():
    # Tiny corpus with one repeated bigram and many singletons: with
    # min_count=1 the model exceeds a tiny max_model_rows and refuses;
    # raising min_count (the remedy the error names) prunes BEFORE the
    # guard, so the same cap now passes — the prune is in the plan, not
    # post-pull.
    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"common pair common pair unique{i} tail{i}"}
         for i in range(6)]
    )
    with pytest.raises(ValueError, match="max_model_rows"):
        lm.train_bigram_lm(docs, min_count=1, max_model_rows=10)
    pairs_df, ctx_df, vocab = lm.train_bigram_lm(
        docs, min_count=5, max_model_rows=10
    )
    # only bigrams seen >= 5 times survive the pruned pull
    assert (pairs_df["c"] >= 5).all() and len(pairs_df) > 0
    # ctx totals come from UNPRUNED counts: 'common'-> appears as w1
    # twice per doc (common pair, common pair) = 12 total
    c1 = dict(zip(ctx_df["w1"], ctx_df["c1"]))
    assert c1["common"] == 12


def test_dsir_unigram_guard_refuses():
    docs = ray.data.from_items(
        [{"doc_id": i, "text": f"w{i} w{i+1} w{i+2}"} for i in range(20)]
    )
    with pytest.raises(ValueError, match="max_model_rows"):
        lm.dsir_weights(docs, max_model_rows=3)


def test_ccnet_buckets_empty_scored_set():
    # every document has < 2 tokens -> zero scored rows; the bucket
    # aggregate must return a typed empty table, not KeyError
    docs = ray.data.from_items(
        [{"doc_id": i, "text": "solo"} for i in range(4)]
    )
    out_ds = lm.ccnet_buckets(docs)
    # (Ray's to_pandas drops columns on an empty dataset, so assert the
    # Dataset schema — the pipeline contract — not the pandas shape.)
    assert out_ds.schema().names == ["bucket", "n_docs", "avg_ppl"]
    assert out_ds.count() == 0
