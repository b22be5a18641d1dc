"""Corpus-curation operators (dup_ngram_coverage / gopher_quality /
intra_doc_repetition) vs hand-computed and DuckDB-computed truths on
tiny explicit corpora."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep

DOCS = [
    # doc 0 and 1 share the 5-gram "a b c d e" (and more)
    (0, "a b c d e f g"),
    (1, "x a b c d e y"),
    (2, "p q r s t u v w"),
    (3, "a b c d"),  # < 5 tokens: no 5-grams
    (4, ""),  # empty: no tokens at all
    (5, "m m m m m m"),  # heavy intra-doc repetition
]


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
                "text": pa.array([t for _, t in DOCS], type=pa.string()),
            }
        )
    )


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [d for d, _ in DOCS], "text": [t for _, t in DOCS]}),
    )
    return con.execute(sql).df()


def test_dup_ngram_coverage_hand():
    out = dataprep.dup_ngram_coverage(_ds()).to_pandas()
    got = dict(zip(out["doc_id"], zip(out["n_ngrams"], out["dup_ngrams"])))
    # doc0: grams {a b c d e, b c d e f, c d e f g}; only "a b c d e"
    # also occurs in doc1 -> dup 1 of 3
    assert got[0] == (3, 1)
    # doc1: {x a b c d, a b c d e, b c d e y} -> dup 1 of 3
    assert got[1] == (3, 1)
    assert got[2] == (4, 0)
    assert 3 not in got and 4 not in got  # no 5-grams -> absent
    # doc5: "m m m m m" twice (2 positions, same gram) -> within one doc
    # only, carriers=1 -> not duplicated
    assert got[5] == (2, 0)


def test_dup_ngram_multiplicity_counts_positions():
    # the duplicated gram occupies BOTH positions of doc 10
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11], type=pa.int64()),
                "text": pa.array(["z z z z z z", "z z z z z"]),
            }
        )
    )
    out = dataprep.dup_ngram_coverage(docs).to_pandas()
    got = dict(zip(out["doc_id"], zip(out["n_ngrams"], out["dup_ngrams"])))
    assert got[10] == (2, 2)
    assert got[11] == (1, 1)


def test_gopher_quality_rules():
    # thresholds chosen so each rule is individually decidable
    out = dataprep.gopher_quality(
        _ds(), min_words=5, mean_len_lo_x10=10, mean_len_hi_x10=20,
        min_stop_hits=1, min_distinct_x10=5, stopwords=("a", "x"),
    ).to_pandas()
    got = out.set_index("doc_id")
    assert 4 not in got.index  # empty doc dropped (SQL unnest yields none)
    r0 = got.loc[0]
    assert (r0["n_words"], r0["total_word_chars"], r0["distinct_words"], r0["stop_hits"]) == (7, 7, 7, 1)
    assert r0["kept"] == 1
    # doc2 has no stopword -> rejected
    assert got.loc[2]["kept"] == 0
    # doc5: distinct 1 of 6 -> repetition rule rejects
    assert got.loc[5]["kept"] == 0


def test_intra_doc_repetition_hand():
    out = dataprep.intra_doc_repetition(_ds()).to_pandas()
    got = dict(zip(out["doc_id"], zip(out["n_ngrams"], out["distinct_ngrams"])))
    assert got[0] == (6, 6)
    assert got[5] == (5, 1)  # "m m" x5
    assert 4 not in got


@pytest.mark.parametrize(
    "fn,sql_key",
    [
        (dataprep.dup_ngram_coverage, "dup_ngram_coverage"),
        (dataprep.gopher_quality, "gopher_quality"),
        (dataprep.intra_doc_repetition, "intra_doc_repetition"),
    ],
)
def test_curation_matches_duckdb(fn, sql_key):
    import __ray_entry__ as entrymod

    sql = entrymod.oracle_sql()[sql_key]
    eng = fn(_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ora = _duck(sql).sort_values("doc_id").reset_index(drop=True)
    eng = eng[sorted(eng.columns)].astype("int64")
    ora = ora[sorted(ora.columns)].astype("int64")
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


def test_boilerplate_coverage_hand():
    # "a b c d e" occurs 3 times -> hot at min_count=3; union coverage
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e x y",      # covers tokens 0-4 of 7
                        "q a b c d e",        # covers tokens 1-5 of 6
                        "a b c d e a b c d e",  # two hot windows: all 10
                    ]
                ),
            }
        )
    )
    out = dataprep.boilerplate_coverage(docs).to_pandas()
    got = dict(zip(out["doc_id"], zip(out["n_tokens"], out["covered_tokens"])))
    assert got[0] == (7, 5)
    assert got[1] == (6, 5)
    assert got[2] == (10, 10)


def test_boilerplate_coverage_overlap_union():
    # overlapping hot windows must not double-count positions
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(["z z z z z z"] * 3),  # every window hot
            }
        )
    )
    out = dataprep.boilerplate_coverage(docs).to_pandas()
    assert out["covered_tokens"].tolist() == [6, 6, 6]


def test_source_overlap_hand():
    # srcA/srcB share the 12-char shingles of "shared run of text here";
    # srcC is disjoint; within-source repeats must not create pairs
    docs = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["srcA", "srcB", "srcC", "srcA"]),
                "text": pa.array(
                    [
                        "shared run of text here plus alpha tail",
                        "shared run of text here plus beta tail",
                        "completely different words in this one",
                        "shared run of text here plus alpha tail",  # dup doc, same source
                    ]
                ),
            }
        )
    )
    out = dataprep.source_overlap(docs).to_pandas()
    got = {
        (a, b): n
        for a, b, n in zip(out["source_a"], out["source_b"], out["shared_shingles"])
    }
    # duckdb twin on the same frame
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"source": ["srcA", "srcB", "srcC", "srcA"],
         "text": ["shared run of text here plus alpha tail",
                  "shared run of text here plus beta tail",
                  "completely different words in this one",
                  "shared run of text here plus alpha tail"]}))
    want_rows = con.execute(
        """
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
        SELECT a.source, b.source, COUNT(*) FROM sh a
        JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2
        """
    ).fetchall()
    want = {(a, b): n for a, b, n in want_rows}
    assert got == want
    assert ("srcA", "srcB") in got and got[("srcA", "srcB")] > 0
    assert all("srcC" not in k for k in got)


def test_length_band_filter_matches_percentile_disc():
    import numpy as np

    rng = np.random.default_rng(3)
    n = 400
    langs = np.repeat(["aa", "bb"], n // 2)
    chars = rng.integers(10, 5000, n)
    docs = ray.data.from_arrow(
        pa.table({"lang": pa.array(langs), "n_chars": pa.array(chars, type=pa.int64())})
    )
    out = dataprep.length_band_filter(docs).to_pandas()
    df = pd.DataFrame({"lang": langs, "n_chars": chars})
    for lang, sub in df.groupby("lang"):
        v = np.sort(sub["n_chars"].to_numpy())
        lo = v[int(np.ceil(0.1 * len(v))) - 1]
        hi = v[int(np.ceil(0.9 * len(v))) - 1]
        kept = sub[(sub["n_chars"] >= lo) & (sub["n_chars"] <= hi)]
        row = out[out["lang"] == lang]
        assert int(row["kept_docs"].iloc[0]) == len(kept)
        assert int(row["kept_chars"].iloc[0]) == kept["n_chars"].sum()
