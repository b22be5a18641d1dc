"""The crawl wave loop — the engine's flagship pipeline (SURVEY.md §3.4).

Per wave, everything is Ray Data over Arrow batches:

  frontier (read from checkpoint)
    -> robots gate            stateless map_batches, broadcast rules
    -> salted per-host top-k  groupby(host,salt) + groupby(host) shuffle
                              (hot-host skew bound, SURVEY.md §7.4)
    -> canonical sort+limit   ds.sort(priority desc, discovered_at,
                              url_hash).limit(wave_budget)
    -> politeness admission   groupby(sched_shard).map_groups calling the
                              PolitenessShard actor (min-heap, virtual
                              clock) — one call per shard per wave
    -> fetch                  actor-pool map_batches (SyntheticFetcher)
    -> parse/span-extraction  map_batches (reference semantics)
    -> documents written      partitioned per wave (resumable layout)
    -> chunk -> embed -> index  actor pools (optional per config)
    -> link explosion         map_batches with in-batch pre-dedupe
    -> seen-set anti-join     groupby(seen_shard).map_groups calling the
                              SeenShard cuckoo actor with sorted-unique
                              hashes — deterministic at any parallelism
    -> next frontier = deferred (broadcast anti-join on admitted hashes)
                       ∪ fresh links; written to the wave checkpoint
                       together with actor snapshots + lineage.

The semantics are EXACTLY ``oracle/frontier_sim.py``'s; the conformance
tests compare crawl order, seen-set fingerprints, span sequences and the
final frontier between this loop and the oracle.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .. import synth
from ..config import CrawlConfig
from ..functions.urlnorm import canonical_url, split_host_path
from ..hashing import hash64
from ..state.admission import canonical_order
from ..state.politeness import PolitenessShard
from ..state.seen import SeenShard
from ..storage import is_complete, read_table, read_table_arrow, write_arrow, write_json, write_table
from .ingest import chunk_stage, embed_stage, index_stage, parse_stage

_N_SALTS = 8


@dataclass
class CrawlRunResult:
    out_dir: str
    waves_run: List[int] = field(default_factory=list)
    metrics: List[dict] = field(default_factory=list)
    seen_digest: np.ndarray | None = None


# ---------- small pure helpers (stage bodies) ----------

def _tag_frontier(robots: Dict[str, dict]):
    """Returns a map_batches fn adding blocked/salt/sched_shard columns."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        blocked = [
            synth.robots_blocks(split_host_path(u)[1], robots.get(h, {}).get("disallow", []))
            for u, h in zip(urls, hosts)
        ]
        uh = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return (
            batch.append_column("blocked", pa.array(blocked, type=pa.bool_()))
            .append_column("salt", pa.array((uh % _N_SALTS).astype(np.int32)))
        )

    return fn


def _sort_canonical_pd(df: pd.DataFrame) -> pd.DataFrame:
    idx = canonical_order(
        df["priority"].to_numpy(),
        df["discovered_at"].to_numpy(),
        df["url_hash"].to_numpy().astype(np.uint64),
    )
    return df.iloc[idx]


def _head_per_group(cap: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _sort_canonical_pd(df).head(cap)

    return fn


def _admit_router(actors: List, wave: int):
    """map_groups fn: one PolitenessShard.admit call per sched shard."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sort_canonical_pd(df)
        shard = int(df["sched_shard"].iloc[0])
        dec = ray.get(actors[shard].admit.remote(df["host"].tolist(), wave))
        out = df.copy()
        out["admit"] = dec["admit"]
        out["fetch_ms"] = dec["fetch_ms"]
        out["wave"] = np.int32(wave)
        return out

    return fn


def _probe_router(actors: List, wave: int):
    """map_groups fn: sorted-unique cuckoo probe, min-depth per hash."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        shard = int(df["seen_shard"].iloc[0])
        # min depth per hash; deterministic representative row
        df = df.sort_values(["url_hash", "depth", "url"], kind="mergesort")
        df = df.drop_duplicates("url_hash", keep="first")
        h = np.sort(df["url_hash"].to_numpy().astype(np.uint64))
        fresh = ray.get(actors[shard].check_add.remote(h))
        fresh_set = set(h[fresh].tolist())
        keep = df["url_hash"].map(lambda x: int(x) in fresh_set)
        return df[keep.to_numpy()]

    return fn


def _explode_links(wave: int, num_seen_shards: int):
    def fn(batch: pa.Table) -> pa.Table:
        urls: List[str] = []
        depths: List[int] = []
        parent_depth = batch["depth"].to_pylist() if "depth" in batch.column_names else [0] * batch.num_rows
        for links, pd_ in zip(batch["links"].to_pylist(), parent_depth):
            d = int(pd_ or 0) + 1
            for u in links:
                urls.append(u)
                depths.append(d)
        if urls:
            # in-batch pre-dedupe (cheap combiner before the shuffle)
            seen_local: Dict[str, int] = {}
            for u, d in zip(urls, depths):
                if u not in seen_local or d < seen_local[u]:
                    seen_local[u] = d
            urls = list(seen_local.keys())
            depths = [seen_local[u] for u in urls]
        uh = hash64([canonical_url(u) for u in urls]) if urls else np.zeros(0, dtype=np.uint64)
        hosts = [split_host_path(u)[0] for u in urls]
        dep = np.asarray(depths, dtype=np.int32)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "host": pa.array(hosts, type=pa.string()),
                "depth": pa.array(dep),
                "priority": pa.array((1.0 / (1 + dep.astype(np.float32)))),
                "discovered_at": pa.array(np.full(len(urls), wave + 1, dtype=np.int64)),
                "url_hash": pa.array(uh),
                "seen_shard": pa.array((uh % np.uint64(num_seen_shards)).astype(np.int32)),
            }
        )

    return fn


def _seed_frontier(cfg: CrawlConfig) -> ray.data.Dataset:
    uids = synth.seed_uids(cfg)
    urls, hosts, _ = synth.urls_for(uids, cfg)
    uh = hash64([canonical_url(u) for u in urls])
    t = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "host": pa.array(hosts, type=pa.string()),
            "depth": pa.array(np.zeros(len(urls), dtype=np.int32)),
            "priority": pa.array(np.ones(len(urls), dtype=np.float32)),
            "discovered_at": pa.array(np.zeros(len(urls), dtype=np.int64)),
            "url_hash": pa.array(uh),
        }
    )
    return ray.data.from_arrow(t)


def _add_sched_shard(num_sched_shards: int):
    def fn(batch: pa.Table) -> pa.Table:
        hh = hash64(batch["host"].to_pylist())
        return batch.append_column(
            "sched_shard", pa.array((hh % np.uint64(num_sched_shards)).astype(np.int32))
        )

    return fn


# ---------- the wave loop ----------

def run_crawl(cfg: CrawlConfig, *, fetch_concurrency=(1, 8)) -> CrawlRunResult:
    out = CrawlRunResult(out_dir=cfg.out_dir)
    os.makedirs(cfg.out_dir, exist_ok=True)
    ckpt = cfg.checkpoint_dir or os.path.join(cfg.out_dir, "ckpt")
    os.makedirs(ckpt, exist_ok=True)

    robots = synth.robots_rules(cfg)
    robots_ref = ray.put(robots)
    sched = [
        PolitenessShard.remote(i, robots_ref, cfg.wave_duration_ms, cfg.max_fetches_per_host_per_wave)
        for i in range(cfg.num_sched_shards)
    ]
    seen = [SeenShard.remote(i, cfg.cuckoo_buckets) for i in range(cfg.num_seen_shards)]

    # ---- resume: last wave whose checkpoint committed ----
    start_wave = 0
    last_ok = -1
    for w in range(cfg.max_waves - 1, -1, -1):
        if os.path.exists(os.path.join(ckpt, f"wave-{w:04d}", "_WAVE_DONE")):
            last_ok = w
            break
    if last_ok >= 0:
        wdir = os.path.join(ckpt, f"wave-{last_ok:04d}")
        for i, a in enumerate(seen):
            with open(os.path.join(wdir, f"seen-{i:02d}.bin"), "rb") as f:
                ray.get(a.restore.remote(f.read()))
        import json

        with open(os.path.join(wdir, "politeness.json")) as f:
            snaps = json.load(f)
        ray.get([a.restore.remote(s) for a, s in zip(sched, snaps)])
        frontier = read_table(os.path.join(wdir, "frontier"))
        start_wave = last_ok + 1
    else:
        frontier = _seed_frontier(cfg)
        # seeds enter the seen set before wave 0 (same as the oracle)
        uh = frontier.select_columns(["url_hash"]).to_pandas()["url_hash"].to_numpy().astype(np.uint64)
        sh = (uh % np.uint64(cfg.num_seen_shards)).astype(np.int64)
        ray.get(
            [
                seen[s].check_add.remote(np.unique(uh[sh == s]))
                for s in range(cfg.num_seen_shards)
                if (sh == s).any()
            ]
        )

    for wave in range(start_wave, cfg.max_waves):
        t0 = time.time()
        if frontier.count() == 0:
            break
        m: dict = {"wave": wave, "frontier": frontier.count()}

        tagged = frontier.map_batches(
            _tag_frontier(robots), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        unblocked = tagged.filter(expr="blocked == False")
        m["robots_blocked"] = m["frontier"] - unblocked.count()

        # salted two-phase per-host cap (exact per-host top-cap, skew-safe)
        cap = cfg.max_fetches_per_host_per_wave
        kept = (
            unblocked.groupby(["host", "salt"])
            .map_groups(_head_per_group(cap), batch_format="pandas")
            .groupby("host")
            .map_groups(_head_per_group(cap), batch_format="pandas")
        )
        cand = (
            kept.sort(["priority", "discovered_at", "url_hash"], descending=[True, False, False])
            .limit(cfg.wave_budget)
            .map_batches(_add_sched_shard(cfg.num_sched_shards), batch_format="pyarrow")
        )
        decisions = (
            cand.groupby("sched_shard")
            .map_groups(_admit_router(sched, wave), batch_format="pandas")
            .materialize()
        )
        admitted = decisions.filter(expr="admit == True").drop_columns(
            ["admit", "blocked", "salt", "sched_shard"]
        ).materialize()
        m["admitted"] = admitted.count()

        # deferred = frontier-minus-admitted (broadcast anti-join on hash)
        adm_hashes = (
            set(admitted.select_columns(["url_hash"]).to_pandas()["url_hash"].tolist())
            if m["admitted"]
            else set()
        )
        adm_ref = ray.put(np.array(sorted(adm_hashes), dtype=np.uint64))

        def _drop_admitted(batch: pa.Table, _ref=adm_ref) -> pa.Table:
            hs = ray.get(_ref)
            uh_ = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            mask = ~np.isin(uh_, hs)
            return batch.filter(pa.array(mask))

        deferred = unblocked.drop_columns(["blocked", "salt"]).map_batches(
            _drop_admitted, batch_format="pyarrow"
        )

        # fetch + parse (payload dropped inside parse)
        from ..sources.fetch import SyntheticFetcher

        fetched = admitted.map_batches(
            SyntheticFetcher,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=256,
            concurrency=fetch_concurrency,
        )
        parsed = parse_stage(fetched).materialize()

        docs = parsed.filter(expr="skipped == False").drop_columns(["links", "skipped"])
        write_table(docs, os.path.join(cfg.out_dir, "documents", f"wave-{wave:04d}"))
        m["docs"] = docs.count()

        if cfg.emit_index:
            chunks = chunk_stage(
                docs.select_columns(["doc_id", "ext", "full_content", "spans"]),
                cfg.chunk_max_tokens,
            )
            index = index_stage(embed_stage(chunks, cfg.embed_dim))
            write_table(index, os.path.join(cfg.out_dir, "index", f"wave-{wave:04d}"))

        # crawl-order artifact (deterministic: fetch_ms then url_hash)
        order = parsed.select_columns(["wave", "fetch_ms", "url_hash", "url"]).sort(
            ["fetch_ms", "url_hash"]
        )
        write_table(order, os.path.join(cfg.out_dir, "order", f"wave-{wave:04d}"))

        # link discovery -> seen-set anti-join -> fresh frontier rows
        links = parsed.map_batches(
            _explode_links(wave, cfg.num_seen_shards), batch_format="pyarrow"
        )
        fresh = (
            links.groupby("seen_shard")
            .map_groups(_probe_router(seen, wave), batch_format="pandas")
            .drop_columns(["seen_shard"])
        )
        nxt = deferred.union(fresh)
        wdir = os.path.join(ckpt, f"wave-{wave:04d}")
        os.makedirs(wdir, exist_ok=True)
        write_table(nxt, os.path.join(wdir, "frontier"))

        # checkpoint state + lineage, then commit the wave marker
        snaps = ray.get([a.snapshot.remote() for a in sched])
        write_json(snaps, os.path.join(wdir, "politeness.json"))
        blobs = ray.get([a.snapshot.remote() for a in seen])
        for i, b in enumerate(blobs):
            with open(os.path.join(wdir, f"seen-{i:02d}.bin"), "wb") as f:
                f.write(b)
        frontier = read_table(os.path.join(wdir, "frontier"))
        m["fresh_plus_deferred"] = frontier.count()
        m["wall_s"] = round(time.time() - t0, 3)
        stats = ray.get([a.stats.remote() for a in seen])
        m["seen_total"] = int(sum(s["count"] for s in stats))
        write_json(m, os.path.join(wdir, "lineage.json"))
        with open(os.path.join(wdir, "_WAVE_DONE"), "w") as f:
            f.write("ok")
        out.metrics.append(m)
        out.waves_run.append(wave)

    digests = []
    for i, b in enumerate(ray.get([a.snapshot.remote() for a in seen])):
        from ..state.cuckoo import CuckooFilter

        digests.append(CuckooFilter.deserialize(b).fingerprint_set() + (np.int64(i) << 40))
    out.seen_digest = np.concatenate(digests) if digests else np.zeros(0, dtype=np.int64)

    for a in sched + seen:
        ray.kill(a)
    return out
