"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf, compare row count, sorted
column names, and order-insensitive value hash.

Usage: python scripts/parity.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = canon(df)
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.astype(str)
        elif str(s.dtype).startswith("float"):
            vals = s.map(lambda x: f"{x:.6f}")
        else:
            vals = s.astype(str)
        h.update(("\x00".join(vals.tolist())).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
            if name in oracles:
                got = canon(got)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} cols={sorted(got.columns)} "
                  f"[rows-only] {dt:.1f}s")
            continue
        exp = canon(con.sql(oracles[name]).df())
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        if not problems and value_hash(got) != value_hash(exp):
            problems.append("value hash mismatch")
            for c in got.columns:
                a, b = got[c], exp[c]
                try:
                    same = (a.astype(str).values == b.astype(str).values).all()
                except Exception:  # noqa: BLE001
                    same = False
                if not same:
                    problems.append(f"  col {c} differs; got {a.head(3).tolist()} exp {b.head(3).tolist()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fails.append(name)
        else:
            print(f"ok   {name}: rows={len(got)} match {dt:.1f}s")

    if not only:
        t0 = time.time()
        res = to_pandas(e.entry())
        print(f"entry(): rows={len(res)} cols={list(res.columns)[:6]} {time.time()-t0:.1f}s")
    print("FAILURES:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
