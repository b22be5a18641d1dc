"""Oracle crawl simulator: single-process reference for the wave loop.

Defines the CANONICAL per-wave crawl semantics (SURVEY.md §3.4) that the
Ray engine must reproduce at any parallelism level:

  wave w over frontier rows (url, host, depth, priority, discovered_at):
    1. robots filter (drop disallowed paths; counted)
    2. canonical order: priority DESC, discovered_at ASC, url_hash ASC
    3. per-host pre-prune: first `cap` rows per host -> head, rest defer
       (this is the hot-host skew bound — at scale the engine does it as
       a salted two-phase groupby, same result)
    4. global budget: first `wave_budget` rows of head -> candidates,
       rest defer
    5. min-heap politeness admission within the wave's virtual window
       (state/admission.py) -> admitted rows w/ scheduled fetch_ms
    6. fetch + parse admitted (synthetic web; reference extraction
       semantics) -> documents, links
    7. dedupe discovered links: per seen-shard sorted-unique cuckoo
       check_add; duplicate in-wave discoveries collapse to MIN depth
    8. frontier_{w+1} = deferred ∪ fresh links (depth+1,
       priority=1/(1+depth), discovered_at=w+1)

Seed URLs are inserted into the seen set before wave 0. All primitives
(hash, cuckoo, admission, extraction, links, synth web) are the engine's
own modules, so engine == oracle is a statement about ORCHESTRATION
equivalence, which is exactly what the conformance tests check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

from .. import synth
from ..config import CrawlConfig
from ..functions.links import extract_links
from ..functions.urlnorm import canonical_url, clean_url, doc_id_of, split_host_path
from ..hashing import hash64
from ..state.admission import canonical_order, schedule_wave
from ..state.cuckoo import CuckooFilter
from .ref_extract import extract


@dataclass
class SimResult:
    order: List[tuple] = field(default_factory=list)       # (wave, fetch_ms, url)
    documents: List[dict] = field(default_factory=list)    # doc_id,url,wave,spans
    metrics: List[dict] = field(default_factory=list)      # per-wave counters
    seen_digest: np.ndarray | None = None                  # concat fingerprint sets
    final_frontier: List[str] = field(default_factory=list)
    dead_letter: List[tuple] = field(default_factory=list)  # (wave, url, status, attempts)


def _frontier_from_uids(uids: np.ndarray, cfg: CrawlConfig, depth: int, wave: int):
    urls, hosts, _ = synth.urls_for(uids, cfg)
    return {
        "url": list(urls),
        "host": list(hosts),
        "depth": np.full(len(urls), depth, dtype=np.int32),
        "priority": np.full(len(urls), 1.0 / (1 + depth), dtype=np.float32),
        "discovered_at": np.full(len(urls), wave, dtype=np.int64),
        "attempts": np.zeros(len(urls), dtype=np.int32),
    }


def simulate_crawl(cfg: CrawlConfig) -> SimResult:
    robots = synth.robots_rules(cfg)
    shards = [CuckooFilter(cfg.cuckoo_buckets) for _ in range(cfg.num_seen_shards)]

    def seen_add(urls: List[str]) -> np.ndarray:
        """Sorted-unique per-shard probe-and-insert; returns fresh mask."""
        h = hash64([canonical_url(u) for u in urls])
        fresh = np.zeros(len(urls), dtype=bool)
        sh = (h % np.uint64(cfg.num_seen_shards)).astype(np.int64)
        for s in range(cfg.num_seen_shards):
            idx = np.flatnonzero(sh == s)
            if not len(idx):
                continue
            uniq = np.unique(h[idx])  # sorted unique (determinism contract)
            fresh_u = shards[s].add_many(uniq)
            fresh_set = set(uniq[fresh_u].tolist())
            for i in idx:
                if int(h[i]) in fresh_set:
                    fresh[i] = True
                    fresh_set.discard(int(h[i]))  # first occurrence only
        return fresh

    res = SimResult()
    next_vtime: Dict[str, int] = {}
    delay_ms = {h: r["crawl_delay_ms"] for h, r in robots.items()}

    # content-dedup shards (mirror detection): same cuckoo structure and
    # per-wave sorted-unique add as the engine's content actors
    content_shards = (
        [CuckooFilter(cfg.cuckoo_buckets) for _ in range(cfg.num_seen_shards)]
        if cfg.dedup_content
        else None
    )

    def content_probe(fps: List[int]) -> np.ndarray:
        """Keeper mask over fp OCCURRENCES (in admitted order): first
        occurrence of a wave-fresh fingerprint keeps, everything else
        (same-wave repeats, or fps from earlier waves) is a dup."""
        arr = np.array(fps, dtype=np.uint64)
        keeper = np.zeros(len(arr), dtype=bool)
        sh = (arr % np.uint64(cfg.num_seen_shards)).astype(np.int64)
        for s in range(cfg.num_seen_shards):
            idx = np.flatnonzero(sh == s)
            if not len(idx):
                continue
            uniq = np.unique(arr[idx])
            fresh_u = content_shards[s].add_many(uniq)
            fresh_set = set(uniq[fresh_u].tolist())
            for i in idx:
                if int(arr[i]) in fresh_set:
                    keeper[i] = True
                    fresh_set.discard(int(arr[i]))
        return keeper

    seeds = synth.all_seed_uids(cfg, robots)
    frontier = _frontier_from_uids(seeds, cfg, depth=0, wave=0)
    seen_add(frontier["url"])  # seeds are discovered

    trapped: set = set()  # crawler-trap quench state (mirrors run_crawl)

    for wave in range(cfg.max_waves):
        urls = frontier["url"]
        n_trap_blocked = 0
        if cfg.trap_quench and trapped:
            keep_t = [i for i, h in enumerate(frontier["host"]) if h not in trapped]
            n_trap_blocked = len(urls) - len(keep_t)
            frontier = {
                "url": [frontier["url"][i] for i in keep_t],
                "host": [frontier["host"][i] for i in keep_t],
                "depth": np.asarray(frontier["depth"])[keep_t],
                "priority": np.asarray(frontier["priority"])[keep_t],
                "discovered_at": np.asarray(frontier["discovered_at"])[keep_t],
                "attempts": np.asarray(frontier["attempts"])[keep_t],
            }
            urls = frontier["url"]
        if not urls:
            break
        hosts = frontier["host"]
        n = len(urls)
        uh = hash64([canonical_url(u) for u in urls])

        # 1. robots
        blocked = np.array(
            [
                synth.robots_blocks(split_host_path(u)[1], robots.get(h, {}).get("disallow", []))
                for u, h in zip(urls, hosts)
            ],
            dtype=bool,
        )
        # 2. canonical order over unblocked rows
        keep = np.flatnonzero(~blocked)
        order = keep[
            canonical_order(
                np.asarray(frontier["priority"])[keep],
                np.asarray(frontier["discovered_at"])[keep],
                uh[keep],
            )
        ]
        # 3. per-host cap prune
        head: List[int] = []
        tail: List[int] = []
        per_host: Dict[str, int] = {}
        for i in order:
            h = hosts[i]
            c = per_host.get(h, 0)
            (head if c < cfg.max_fetches_per_host_per_wave else tail).append(i)
            per_host[h] = c + 1
        # 4. global budget
        cand = head[: cfg.wave_budget]
        deferred = head[cfg.wave_budget:] + tail
        # 5. politeness admission
        counts: Dict[str, int] = {}
        for i in cand:
            counts[hosts[i]] = counts.get(hosts[i], 0) + 1
        ws, we = wave * cfg.wave_duration_ms, (wave + 1) * cfg.wave_duration_ms
        sched = schedule_wave(
            sorted(counts.items()), next_vtime, delay_ms, ws, we,
            cfg.max_fetches_per_host_per_wave,
        )
        admitted: List[tuple] = []  # (fetch_ms, row_idx)
        taken: Dict[str, int] = {}
        for i in cand:
            h = hosts[i]
            k = taken.get(h, 0)
            times = sched.get(h, [])
            if k < len(times):
                admitted.append((times[k], i))
                taken[h] = k + 1
            else:
                deferred.append(i)
        admitted.sort(key=lambda t: (t[0], int(uh[t[1]])))

        # 6. fetch + parse (with deterministic fault injection — mirrors
        #    sources/fetch.py: transient 503 until fail_threshold attempts,
        #    retry via the next frontier, dead-letter after max attempts)
        wave_links: List[str] = []
        link_depth: Dict[str, int] = {}
        retries: List[tuple] = []  # (url, host, depth, priority, discovered_at, attempts+1)
        n_docs = 0
        n_retried = 0
        n_dead = 0
        n_redirected = 0
        doc_buffer: List[tuple] = []  # (doc dict, content_fp)
        attempts_arr = np.asarray(frontier["attempts"])
        for fetch_ms, i in admitted:
            url = urls[i]
            uid = int(url.rsplit("/", 1)[1].split(".")[0])
            res.order.append((wave, fetch_ms, url))
            att = int(attempts_arr[i])
            k = int(synth.fail_threshold(np.array([uid]), cfg)[0]) if cfg.inject_faults else 0
            if att < k:  # transient failure
                if att + 1 < cfg.max_fetch_attempts:
                    n_retried += 1
                    retries.append(
                        (
                            url,
                            hosts[i],
                            int(np.asarray(frontier["depth"])[i]),
                            float(np.asarray(frontier["priority"])[i]),
                            int(np.asarray(frontier["discovered_at"])[i]),
                            att + 1,
                        )
                    )
                else:
                    n_dead += 1
                    res.dead_letter.append((wave, url, 503, att))
                continue
            uarr = np.array([uid], dtype=np.int64)
            if synth.redirect_mask(uarr, cfg)[0]:
                # 301: no document; the Location target is a link
                # discovery at depth+1 (mirrors stages/parse.py)
                n_redirected += 1
                target = synth.urls_for(synth.redirect_target_uids(uarr, cfg), cfg)[0][0]
                d = int(np.asarray(frontier["depth"])[i]) + 1
                wave_links.append(target)
                if target not in link_depth or d < link_depth[target]:
                    link_depth[target] = d
                continue
            payload, _ct = synth.payload_for(uid, cfg)
            blob_name = url.replace("https://", "").partition("/")[2]
            ex = extract(blob_name, payload, media_ref=url)
            if not ex.skipped and ex.full_content.strip():
                # buffered: content-dedup (if on) needs the whole wave's
                # fingerprints probed in ONE sorted-unique pass per shard
                # (mirrors the engine's per-wave actor call); links are
                # followed regardless of dup status
                doc_buffer.append(
                    (
                        {
                            "doc_id": doc_id_of(blob_name),
                            "url": url,
                            "wave": wave,
                            "spans": ex.spans(),
                        },
                        int(hash64([ex.full_content])[0]),
                        hosts[i],
                    )
                )
                d = int(np.asarray(frontier["depth"])[i]) + 1
                for link in extract_links(ex.full_content):
                    link = clean_url(link)  # variants collapse pre-dedupe
                    wave_links.append(link)
                    if link not in link_depth or d < link_depth[link]:
                        link_depth[link] = d

        # 6b. content dedup: keepers emit documents, dups are counted
        n_content_dups = 0
        if cfg.dedup_content and doc_buffer:
            keep = content_probe([fp for _d, fp, _h in doc_buffer])
            n_content_dups = int((~keep).sum())
            for (d, _fp, _h), k in zip(doc_buffer, keep):
                if k:
                    n_docs += 1
                    res.documents.append(d)
            # crawler-trap detection over this wave's extracted docs:
            # a host with >= trap_min_fetches candidates of which
            # >= trap_dup_ratio are dups is quenched from wave+1 on
            # (same float64 comparison the engine runs)
            if cfg.trap_quench:
                cand_h: Dict[str, int] = {}
                dup_h: Dict[str, int] = {}
                for (_d, _fp, h), k in zip(doc_buffer, keep):
                    cand_h[h] = cand_h.get(h, 0) + 1
                    if not k:
                        dup_h[h] = dup_h.get(h, 0) + 1
                for h, c in cand_h.items():
                    if c >= cfg.trap_min_fetches and float(
                        dup_h.get(h, 0)
                    ) >= cfg.trap_dup_ratio * float(c):
                        trapped.add(h)
        else:
            for d, _fp, _h in doc_buffer:
                n_docs += 1
                res.documents.append(d)

        # 7. dedupe fresh links (first occurrence per url string kept,
        #    depth = min over discoverers); links beyond max_depth are
        #    dropped BEFORE the seen probe (mirrors _explode_links)
        if cfg.max_depth > 0:
            wave_links = [u for u in wave_links if link_depth[u] <= cfg.max_depth]
        # in-wave inlink multiplicity (only consumed when
        # cfg.inlink_priority; mirrors the engine's per-batch
        # return_counts summed per hash in _probe_router)
        link_count: Dict[str, int] = {}
        for u in wave_links:
            link_count[u] = link_count.get(u, 0) + 1
        uniq_links = sorted(set(wave_links), key=lambda u: (int(hash64([canonical_url(u)])[0]), u))
        fresh_mask = seen_add(uniq_links) if uniq_links else np.zeros(0, dtype=bool)
        fresh_links = [u for u, f in zip(uniq_links, fresh_mask) if f]

        # 8. next frontier = deferred ∪ fresh ∪ retries
        nf = {
            "url": [urls[i] for i in deferred],
            "host": [hosts[i] for i in deferred],
            "depth": list(np.asarray(frontier["depth"])[deferred]),
            "priority": list(np.asarray(frontier["priority"])[deferred]),
            "discovered_at": list(np.asarray(frontier["discovered_at"])[deferred]),
            "attempts": list(np.asarray(frontier["attempts"])[deferred]),
        }
        for u in fresh_links:
            d = link_depth[u]
            nf["url"].append(u)
            nf["host"].append(split_host_path(u)[0])
            nf["depth"].append(np.int32(d))
            if cfg.inlink_priority:
                boost = np.float32(1 + min(link_count[u], cfg.inlink_cap))
                nf["priority"].append(np.float32(boost / np.float32(1 + d)))
            else:
                nf["priority"].append(np.float32(1.0 / (1 + d)))
            nf["discovered_at"].append(np.int64(wave + 1))
            nf["attempts"].append(np.int32(0))
        for u, h, d, pr, da, att in retries:
            nf["url"].append(u)
            nf["host"].append(h)
            nf["depth"].append(np.int32(d))
            nf["priority"].append(np.float32(pr))
            nf["discovered_at"].append(np.int64(da))
            nf["attempts"].append(np.int32(att))
        wave_metrics_extra = (
            {"trap_blocked": n_trap_blocked, "trapped_hosts": len(trapped)}
            if cfg.trap_quench
            else {}
        )
        res.metrics.append(
            {
                **wave_metrics_extra,
                "wave": wave,
                "frontier": n,
                "robots_blocked": int(blocked.sum()),
                "admitted": len(admitted),
                "docs": n_docs,
                "links": len(wave_links),
                "fresh": len(fresh_links),
                "deferred": len(deferred),
                "retried": n_retried,
                "dead_lettered": n_dead,
                "redirected": n_redirected,
                "content_dups": n_content_dups,
            }
        )
        frontier = {
            "url": nf["url"],
            "host": nf["host"],
            "depth": np.asarray(nf["depth"], dtype=np.int32),
            "priority": np.asarray(nf["priority"], dtype=np.float32),
            "discovered_at": np.asarray(nf["discovered_at"], dtype=np.int64),
            "attempts": np.asarray(nf["attempts"], dtype=np.int32),
        }

    res.seen_digest = np.concatenate(
        [s.fingerprint_set() + (np.int64(i) << 40) for i, s in enumerate(shards)]
    )
    res.final_frontier = sorted(frontier["url"])
    return res
