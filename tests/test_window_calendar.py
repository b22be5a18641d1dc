"""events_by_weekday, group_percent_rank, langid_confusion — hand
truths on tiny explicit inputs (the sf-scale check is the DuckDB
parity gate)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep, relational


def test_events_by_weekday_hand():
    # 2001-01-07 was a Sunday (%w == '0'); 2001-01-08 a Monday
    events = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(
                    [
                        np.datetime64("2001-01-07T10:00", "us"),
                        np.datetime64("2001-01-08T10:00", "us"),
                        np.datetime64("2001-01-15T10:00", "us"),
                    ],
                    type=pa.timestamp("us"),
                ),
                "value": pa.array([1.0, 2.0, 3.5]),
            }
        )
    )
    out = relational.events_by_weekday(events).to_pandas()
    got = out.set_index("weekday")
    assert got.loc["0"]["n_events"] == 1 and got.loc["0"]["value_cents"] == 100
    assert got.loc["1"]["n_events"] == 2 and got.loc["1"]["value_cents"] == 550


def test_group_percent_rank_hand():
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array(["A", "A", "A", "B"]),
                "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                "o_totalprice": pa.array([10.0, 30.0, 20.0, 5.0]),
            }
        )
    )
    out = relational.group_percent_rank(orders).to_pandas()
    got = out.set_index("o_orderkey")
    assert got.loc[2]["rnk"] == 1 and got.loc[2]["pct_rank"] == 0.0
    assert got.loc[3]["rnk"] == 2 and got.loc[3]["pct_rank"] == 0.5
    assert got.loc[1]["rnk"] == 3 and got.loc[1]["pct_rank"] == 1.0
    # single-member group: PERCENT_RANK is 0 by definition
    assert got.loc[4]["rnk"] == 1 and got.loc[4]["pct_rank"] == 0.0


def test_group_percent_rank_tie_broken_by_key():
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderpriority": pa.array(["A", "A"]),
                "o_orderkey": pa.array([7, 5], type=pa.int64()),
                "o_totalprice": pa.array([10.0, 10.0]),
            }
        )
    )
    out = relational.group_percent_rank(orders).to_pandas().set_index("o_orderkey")
    assert out.loc[5]["rnk"] == 1 and out.loc[7]["rnk"] == 2


def test_langid_confusion_hand():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "the the cat",      # pred en
                        "data data the",    # pred de
                        "nothing here",     # pred und
                    ]
                ),
                "lang": pa.array(["en", "en", "fr"]),
            }
        )
    )
    out = dataprep.langid_confusion(docs).to_pandas()
    got = {(r.lang, r.pred_lang): r.n_docs for r in out.itertuples()}
    assert got[("en", "en")] == 1
    assert got[("en", "de")] == 1
    assert got[("fr", "und")] == 1
