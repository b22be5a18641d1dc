"""Table storage: Lance when available, Parquet directories otherwise.

The target data model stores tables as Lance (BASELINE.json north_rule).
The ``lance`` package is not installed in this sandbox, so storage goes
through this thin seam: ``write_table`` / ``read_table`` use
``ray.data.{read,write}_lance`` when importable and fall back to
partitioned Parquet with identical semantics (directory per table,
atomic-rename commit, ``_SUCCESS`` marker) — which is also what resumable
output needs: a failed run re-writes an uncommitted directory, a finished
directory is skipped.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

try:  # pragma: no cover - lance not present in sandbox
    import lance  # noqa: F401

    HAS_LANCE = True
except ImportError:
    HAS_LANCE = False


def write_table(ds: ray.data.Dataset, uri: str, *, mode: str = "overwrite") -> None:
    """Write a Dataset to ``uri`` atomically (tmp dir + rename)."""
    if HAS_LANCE:  # pragma: no cover
        ds.write_lance(uri, mode="overwrite" if mode == "overwrite" else "append")
        return
    tmp = uri + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)  # an empty dataset writes no files
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("{}")
    if mode == "overwrite" and os.path.exists(uri):
        shutil.rmtree(uri)
    os.replace(tmp, uri)


def read_table(uri: str, *, columns: Optional[list[str]] = None) -> ray.data.Dataset:
    if HAS_LANCE:  # pragma: no cover
        return ray.data.read_lance(uri, columns=columns)
    return ray.data.read_parquet(uri, columns=columns, file_extensions=["parquet"])


def read_table_arrow(uri: str, schema: Optional[pa.Schema] = None) -> pa.Table:
    """Driver-side read of a SMALL table (checkpoint state, lineage).
    ``schema`` supplies the result type when the table is empty."""
    if HAS_LANCE:  # pragma: no cover
        import lance

        return lance.dataset(uri).to_table()
    parts = sorted(
        os.path.join(uri, f) for f in os.listdir(uri) if f.endswith(".parquet")
    )
    if not parts:
        return pa.table({f.name: [] for f in schema} if schema else {}, schema=schema)
    return pa.concat_tables([pq.read_table(p) for p in parts])


def write_arrow(table: pa.Table, uri: str) -> None:
    """Driver-side write of a SMALL table, atomic."""
    tmp = uri + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("{}")
    if os.path.exists(uri):
        shutil.rmtree(uri)
    os.replace(tmp, uri)


def is_complete(uri: str) -> bool:
    return os.path.exists(os.path.join(uri, "_SUCCESS")) or (
        HAS_LANCE and os.path.exists(uri)
    )


def write_json(obj, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def read_json(path: str):
    with open(path) as f:
        return json.load(f)
