"""Q6/Q7/Q8/Q9/Q11/Q12/Q16/Q17/Q20/Q21-shaped operators
(pipelines/tpch3.py), each checked against its own oracle_sql() twin on
the sf0.001 tables — a pytest replica of the driver's parity gate for
the new family (the external gate re-checks them at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"

NEW_TPCH = [
    "forecast_revenue",
    "nation_trade_volume",
    "market_share",
    "product_profit",
    "nation_part_value",
    "returnflag_priority_counts",
    "supplier_part_counts",
    "small_qty_revenue",
    "bulk_part_suppliers",
    "sole_return_suppliers",
]


def _duck():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", NEW_TPCH)
def test_matches_oracle(name):
    got = _canon(entry.queries()[name](SF).to_pandas())
    want = _canon(_duck().execute(entry.oracle_sql()[name]).df())
    assert len(got) > 0, f"{name} empty at sf0.001 — constants too selective"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
