"""LAG-window family (inter-event gaps, transition counts) and the
vectorized regex rollup vs brute-force pandas oracles at sf0.001."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from azure_blob_crawler_ray.pipelines import dataprep, relational

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pd():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


@pytest.fixture(scope="module")
def events_ds():
    return ray.data.read_parquet(f"{SF}/events.parquet")


def _gap_oracle(events_pd):
    out = {}
    for uid, g in events_pd.groupby("user_id"):
        ts = (
            g.sort_values(["ts", "event_id"])["ts"]
            .astype("int64")
            .to_numpy()
        )
        if len(ts) < 2:
            continue
        gaps = np.diff(ts)
        out[uid] = (
            len(gaps),
            # np.round, not builtins.round: the engine (and DuckDB ROUND)
            # round the float64 representation, which can differ by one
            # ulp at the 6th decimal from decimal-correct rounding.
            float(np.round(float(gaps.sum()) / len(gaps), 6)),
            int(gaps.max()),
        )
    return out


def test_inter_event_gaps(events_ds, events_pd):
    got = relational.inter_event_gaps(events_ds).to_pandas()
    want = _gap_oracle(events_pd)
    have = {
        r.user_id: (r.n_gaps, r.avg_gap_us, r.max_gap_us)
        for r in got.itertuples()
    }
    assert have == want


def test_inter_event_gaps_partitioning_invariant(events_ds):
    a = relational.inter_event_gaps(events_ds).to_pandas()
    b = relational.inter_event_gaps(
        events_ds.repartition(7), num_buckets=5
    ).to_pandas()
    assert a.equals(b)


def _transition_oracle(events_pd):
    cnt: dict = {}
    for _, g in events_pd.groupby("user_id"):
        et = g.sort_values(["ts", "event_id"])["event_type"].to_numpy()
        for a, b in zip(et[:-1], et[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    return cnt


def test_event_transitions(events_ds, events_pd):
    got = relational.event_transitions(events_ds).to_pandas()
    want = _transition_oracle(events_pd)
    have = {(r.prev_type, r.next_type): r.n for r in got.itertuples()}
    assert have == want
    # total transitions = total events - number of users
    total = len(events_pd) - events_pd["user_id"].nunique()
    assert got["n"].sum() == total


def test_event_transitions_partitioning_invariant(events_ds):
    a = relational.event_transitions(events_ds).to_pandas()
    b = relational.event_transitions(
        events_ds.repartition(9), num_buckets=3
    ).to_pandas()
    assert a.equals(b)


def test_regex_match_stats():
    docs_pd = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    got = dataprep.regex_match_stats(
        ray.data.read_parquet(f"{SF}/documents.parquet")
    ).to_pandas()
    pat = re.compile(r"[a-z]{8,}")
    docs_pd = docs_pd.assign(cnt=[len(pat.findall(t)) for t in docs_pd["text"]])
    want = docs_pd.groupby("lang").agg(
        n_docs=("cnt", "size"),
        docs_with_match=("cnt", lambda c: int((c > 0).sum())),
        total_matches=("cnt", "sum"),
        max_per_doc=("cnt", "max"),
    )
    for r in got.itertuples():
        w = want.loc[r.lang]
        assert (r.n_docs, r.docs_with_match, r.total_matches, r.max_per_doc) == (
            w["n_docs"],
            w["docs_with_match"],
            w["total_matches"],
            w["max_per_doc"],
        )
    assert set(got["lang"]) == set(want.index)


def test_window_count_join_boundaries():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from azure_blob_crawler_ray.pipelines import relational

    H = 3_600_000_000  # 1h in us
    base = 10_000_000_000_000
    rows = [
        # user 1: purchase at base; clicks at base-H (EXCLUDED, boundary),
        # base-H+1 (in), base (in, inclusive upper), base+1 (after, out)
        (1, 100, base, "purchase"),
        (1, 1, base - H, "click"),
        (1, 2, base - H + 1, "click"),
        (1, 3, base, "click"),
        (1, 4, base + 1, "click"),
        # user 1: second purchase 2us later: window (base-H+2, base+2]
        # catches clicks 3 and 4 but drops click 2 (now below the band)
        (1, 101, base + 2, "purchase"),
        # user 2: purchase with no clicks at all -> 0 (LEFT JOIN)
        (2, 102, base, "purchase"),
        # user 3: clicks but no purchase -> no output row
        (3, 5, base, "click"),
        # other event types are ignored
        (2, 6, base, "view"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "event_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "ts": pa.array(
                    np.array([r[2] for r in rows], dtype="datetime64[us]")
                ),
                "event_type": pa.array([r[3] for r in rows]),
            }
        )
    )
    out = relational.window_count_join(ds).to_pandas()
    got = dict(zip(out["purchase_id"], out["n_in_window"]))
    assert got == {100: 2, 101: 2, 102: 0}
