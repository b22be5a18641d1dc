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


def write_table(
    ds: ray.data.Dataset,
    uri: str,
    *,
    mode: str = "overwrite",
    min_rows_per_file: Optional[int] = None,
) -> None:
    """Write a Dataset to ``uri`` atomically (tmp dir + rename).

    ``min_rows_per_file`` coalesces adjacent small blocks into larger
    files: a 32-CPU crawl wave otherwise writes ~130 files of <1 MB
    each, and at 100 TB the file COUNT (object-store request rate,
    open/close, metadata listing on resume) becomes the cost, not the
    bytes.  Opt-in per artifact: terminal outputs (documents) coalesce;
    tables that are read back into the next wave (frontier,
    checkpoints) keep one-file-per-block so the read-side block layout
    — the map-stage width the wave loop relies on — is preserved."""
    if HAS_LANCE:  # pragma: no cover
        ds.write_lance(uri, mode="overwrite" if mode == "overwrite" else "append")
        return
    tmp = uri + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    kw = {"min_rows_per_file": min_rows_per_file} if min_rows_per_file else {}
    ds.write_parquet(tmp, **kw)
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


RUN_MARKER = "_RUN_COMMITTED"


def committed_runs(uri: str) -> list:
    """Run directories (``run-*``) of an incremental index layout whose
    run-level marker committed — a crashed append stays invisible to
    readers until its resume finishes (used by the MinHash dedup index
    and the persisted IVF index)."""
    if not os.path.isdir(uri):
        return []
    return sorted(
        os.path.join(uri, d)
        for d in os.listdir(uri)
        if d.startswith("run-") and os.path.exists(os.path.join(uri, d, RUN_MARKER))
    )


def commit_run(run_dir: str) -> None:
    with open(os.path.join(run_dir, RUN_MARKER), "w") as f:
        f.write("{}")


MERGED_FROM = "_MERGED_FROM.json"


def merge_runs(uri: str) -> dict:
    """Compact an incremental index's committed ``run-*`` directories
    into ONE merged run — the maintenance pass that keeps probe fan-in
    bounded (a long-lived index otherwise accumulates one directory per
    increment, and every probe lists and reads all of them).  Layout-
    generic: works for any index built on the run-/shard- scheme (the
    MinHash dedup index, the persisted IVF index).

    One Ray task per shard concatenates that shard's parquet files
    across every source run into a single part file (a shard fits a
    worker by the layouts' construction — same assumption as
    ``compact_shards``).

    Crash safety, two windows:

      * BEFORE the merged run's ``_RUN_COMMITTED``: sources are
        untouched and authoritative; the partial merged dir is removed
        and redone on the next call (its name is a deterministic hash
        of the source list, so the retry targets the same dir).
      * AFTER the marker, during source deletion: the merged run is
        authoritative; its ``_MERGED_FROM`` manifest lists the sources,
        and the next ``merge_runs`` call finishes deleting any that
        survived.  A reader in this window may see a row TWICE — both
        index probes tolerate duplicates by construction (minhash:
        identical candidates collapse in the per-doc best reduce; IVF:
        vec_id dedup in the top-k merge).

    Returns {"merged": n_source_runs, "run": merged_dir_name} (a no-op
    when <= 1 committed run exists)."""
    import hashlib

    import ray

    # recovery: finish deleting sources of any already-committed merge
    for r in committed_runs(uri):
        man = os.path.join(r, MERGED_FROM)
        if os.path.exists(man):
            for src_name in read_json(man):
                src_dir = os.path.join(uri, src_name)
                if os.path.abspath(src_dir) != os.path.abspath(r) and os.path.exists(src_dir):
                    shutil.rmtree(src_dir)

    sources = committed_runs(uri)
    if len(sources) <= 1:
        return {"merged": 0, "run": os.path.basename(sources[0]) if sources else None}
    names = [os.path.basename(s) for s in sources]
    tag = hashlib.sha256("|".join(names).encode()).hexdigest()[:8]
    merged_name = f"run-merged-{tag}"
    merged_dir = os.path.join(uri, merged_name)
    if not os.path.exists(os.path.join(merged_dir, RUN_MARKER)):
        if os.path.exists(merged_dir):  # crashed mid-write: redo
            shutil.rmtree(merged_dir)
        shard_ids = sorted(
            int(d.split("-")[1])
            for d in os.listdir(sources[0])
            if d.startswith("shard-")
        )

        @ray.remote
        def _merge_shard(s: int) -> int:
            files = [
                os.path.join(shard_path(src, s), f)
                for src in sources
                for f in sorted(os.listdir(shard_path(src, s)))
                if f.endswith(".parquet")
            ]
            dst = shard_path(merged_dir, s)
            os.makedirs(dst, exist_ok=True)
            t = pa.concat_tables(pq.read_table(f) for f in files)
            pq.write_table(t, os.path.join(dst, "part-00000.parquet"))
            with open(os.path.join(dst, "_SUCCESS"), "w") as f:
                f.write("{}")
            return t.num_rows

        os.makedirs(merged_dir, exist_ok=True)
        ray.get([_merge_shard.remote(s) for s in shard_ids])
        write_json(names, os.path.join(merged_dir, MERGED_FROM))
        commit_run(merged_dir)  # <- the commit point
    for s in sources:  # merged run is authoritative; sources go
        shutil.rmtree(s, ignore_errors=True)
    return {"merged": len(sources), "run": merged_name}


def shard_path(uri: str, shard: int) -> str:
    # NOT key=value naming: Ray's parquet reader would infer hive
    # partition columns from the path and poison the schema
    return os.path.join(uri, f"shard-{shard:04d}")


def write_sharded(
    ds: ray.data.Dataset,
    uri: str,
    *,
    shard_col: str,
    num_shards: int,
) -> dict:
    """Resumable partitioned write: one directory per shard value in
    [0, num_shards), each committed with a ``_SUCCESS`` marker once the
    full input stream has been consumed.  A re-run after a crash SKIPS
    completed shards — their rows are dropped AT THE SCAN by a
    vectorized shard-mask filter, so finished work costs one predicate,
    not a rewrite — and any uncommitted shard directory is cleaned and
    rewritten.  Returns {"written": [...], "skipped": [...]}.

    The write itself is one streaming ``map_batches`` pass: each task
    splits its batch by shard id and appends a uniquely-named parquet
    part file to each touched shard directory (concurrent appends to
    the same directory are safe — names never collide), so no shuffle
    is needed to co-locate shard rows.  Markers are written only after
    the pass finishes; a crash mid-pass leaves markerless directories
    that the next run redoes.  Requires storage shared across workers
    (same assumption as ``Dataset.write_parquet``)."""
    import uuid

    import numpy as np

    os.makedirs(uri, exist_ok=True)
    skipped = [s for s in range(num_shards) if is_complete(shard_path(uri, s))]
    todo = [s for s in range(num_shards) if s not in skipped]
    for s in todo:  # clean partial leftovers from a crashed run
        if os.path.exists(shard_path(uri, s)):
            shutil.rmtree(shard_path(uri, s))
        os.makedirs(shard_path(uri, s))
    if not todo:
        return {"written": [], "skipped": skipped}

    todo_arr = np.array(todo, dtype=np.int64)

    def write_batch(batch: pa.Table) -> pa.Table:
        shards = batch[shard_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(skipped):
            keep = np.isin(shards, todo_arr)
            batch, shards = batch.filter(pa.array(keep)), shards[keep]
        counts = []
        for s in np.unique(shards):
            sub = batch.filter(pa.array(shards == s))
            pq.write_table(
                sub, os.path.join(shard_path(uri, int(s)), f"part-{uuid.uuid4().hex}.parquet")
            )
            counts.append((int(s), sub.num_rows))
        return pa.table(
            {
                "shard": pa.array([c[0] for c in counts], type=pa.int64()),
                "rows": pa.array([c[1] for c in counts], type=pa.int64()),
            }
        )

    # consume the full stream (tiny per-batch count rows), THEN commit
    ds.map_batches(write_batch, batch_format="pyarrow").materialize()
    for s in todo:
        with open(os.path.join(shard_path(uri, s), "_SUCCESS"), "w") as f:
            f.write("{}")
    return {"written": todo, "skipped": skipped}


def read_sharded(
    uri: str, *, columns: Optional[list[str]] = None
) -> ray.data.Dataset:
    """Read back every COMMITTED shard of a ``write_sharded`` layout."""
    dirs = sorted(
        os.path.join(uri, d)
        for d in os.listdir(uri)
        if d.startswith("shard-") and is_complete(os.path.join(uri, d))
    )
    return ray.data.read_parquet(dirs, columns=columns, file_extensions=["parquet"])


def compact_shards(
    uri: str,
    *,
    target_rows: int = 1_000_000,
    concurrency: int | None = None,
) -> dict:
    """Compact every COMMITTED shard of a ``write_sharded`` layout: the
    streaming write appends one part file per (task batch x shard), so a
    long run leaves each shard as hundreds of small files — the classic
    small-files problem a 100 TB table hits within hours.  Each shard is
    rewritten into ceil(rows / target_rows) files named
    ``part-c-NNNNN.parquet``; a shard already in compacted form is
    skipped, so re-running is free.

    Crash safety via a per-shard commit marker: new ``part-c`` files
    land beside the old ones first, then a ``_COMPACTED`` sentinel is
    fsynced into the shard dir, and only then are the originals
    deleted (marker last of all).  Recovery on the next run is
    two-sided:

    * marker ABSENT + both kinds present  -> crashed mid-write; the
      originals are the source of truth: drop the part-c leftovers
      and redo.
    * marker PRESENT -> every part-c file was durable before the
      marker, so part-c is the source of truth even if some originals
      were already deleted: finish deleting originals, remove the
      marker, done (no rewrite).

    Readers between runs may see the mixed state, so compaction
    assumes no concurrent readers — it is a maintenance pass, like
    VACUUM.

    One Ray task per shard (a shard fits a worker by ``write_sharded``
    construction); returns {"compacted": n, "skipped": n,
    "files_before": n, "files_after": n}."""
    import ray
    import ray.data

    shard_dirs = sorted(
        os.path.join(uri, d)
        for d in os.listdir(uri)
        if d.startswith("shard-") and is_complete(os.path.join(uri, d))
    )

    def compact_one(batch: pa.Table) -> pa.Table:
        out = {"compacted": [], "skipped": [], "before": [], "after": []}
        for d in batch["dir"].to_pylist():
            marker = os.path.join(d, "_COMPACTED")
            parts = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
            old = [f for f in parts if not f.startswith("part-c-")]
            new = [f for f in parts if f.startswith("part-c-")]
            if os.path.exists(marker):
                # Crashed mid-delete of a COMMITTED compaction: every
                # part-c file was durable before the marker, so part-c
                # wins — finish deleting originals, clear the marker.
                for f in old:
                    os.remove(os.path.join(d, f))
                os.remove(marker)
                out["compacted"].append(0)
                out["skipped"].append(1)
                out["before"].append(len(old) + len(new))
                out["after"].append(len(new))
                continue
            if not old:  # already compacted (possibly by a prior run)
                out["compacted"].append(0)
                out["skipped"].append(1)
                out["before"].append(len(new))
                out["after"].append(len(new))
                continue
            for f in new:  # crashed mid-write (no marker): originals win, redo
                os.remove(os.path.join(d, f))
            t = pq.read_table([os.path.join(d, f) for f in old])
            n_files = max(1, -(-t.num_rows // target_rows))
            per = -(-t.num_rows // n_files) if t.num_rows else 1
            written = 0
            for i in range(n_files):
                path = os.path.join(d, f"part-c-{i:05d}.parquet")
                pq.write_table(t.slice(i * per, per), path)
                fd = os.open(path, os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
                written += 1
            # Commit point: fsynced marker makes part-c authoritative.
            mfd = os.open(marker, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
            try:
                os.fsync(mfd)
            finally:
                os.close(mfd)
            for f in old:  # committed -> originals go
                os.remove(os.path.join(d, f))
            os.remove(marker)
            out["compacted"].append(1)
            out["skipped"].append(0)
            out["before"].append(len(old))
            out["after"].append(written)
        return pa.table(
            {
                "compacted": pa.array(out["compacted"], type=pa.int64()),
                "skipped": pa.array(out["skipped"], type=pa.int64()),
                "before": pa.array(out["before"], type=pa.int64()),
                "after": pa.array(out["after"], type=pa.int64()),
            }
        )

    if not shard_dirs:
        return {"compacted": 0, "skipped": 0, "files_before": 0, "files_after": 0}
    stats = (
        ray.data.from_items([{"dir": d} for d in shard_dirs])
        .map_batches(
            compact_one,
            batch_format="pyarrow",
            batch_size=1,
            **({"concurrency": concurrency} if concurrency else {}),
        )
        .to_pandas()
    )
    return {
        "compacted": int(stats["compacted"].sum()),
        "skipped": int(stats["skipped"].sum()),
        "files_before": int(stats["before"].sum()),
        "files_after": int(stats["after"].sum()),
    }
