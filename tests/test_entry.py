"""Driver-contract checks: entry(), queries() vs oracle_sql() via DuckDB
— a pytest-sized replica of the external correctness gate (sf0.001;
the driver runs sf0.01)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"

# fast SQL-checked queries exercised in CI (the full set runs via
# scripts/parity.py; heavy rows-only ops are covered by their own tests)
CHECKED = [
    "text_stats",
    "langid",
    "fingerprint",
    "exact_dedup",
    "doc_lang_stats",
    "text_search",
    "hybrid_search",
    "get_all_docs",
    "filter_select",
    "ann_topk",
    "cosine_near_dup",
    "ingest_chunks",
    "lineitem_agg",
    "top_customers",
    "customers_per_region",
    "events_by_type",
    "events_daily",
    "order_priority",
    "parts_by_brand",
    "gopher_quality",
    "intra_doc_repetition",
    "mix_sources",
    "events_by_weekday",
    "group_percent_rank",
]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle_sql has {name} but queries() doesn't"


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(name, con):
    got = _canon(_to_pandas(entrymod.queries()[name](SF)))
    exp = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-6)


def test_entry_runs():
    df = _to_pandas(entrymod.entry())
    assert len(df) >= 1
    assert set(df.columns) == {"id", "content", "vector"}
