"""Deterministic synthetic web: URL universe, link graph, robots, payloads.

The sandbox has no network, so the "fetch" stage (ref
shared/azure_clients/blob_client.py:93-120, the blob GET) is a
deterministic generator: every URL's payload, content-type, out-links,
host and robots rules are pure functions of ``(seed, url_id)`` via
splitmix64 — identical across runs, machines, and parallelism levels
(FIXTURES.md global rule). The oracle crawls the *same* synthetic web, so
engine-vs-oracle equality is meaningful.

Host distribution is Zipf(s≈1.1) over ``n_hosts`` so one host owns a
large share of URLs — this exercises host-hash partitioning + hot-host
salting (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

from .config import CrawlConfig

_U64 = np.uint64

# splitmix64 (public-domain PRNG finalizer; Steele et al., "Fast Splittable
# Pseudorandom Number Generators", OOPSLA 2014)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(_U64) + _SM_GAMMA)
    z = (z ^ (z >> _U64(30))) * _SM_M1
    z = (z ^ (z >> _U64(27))) * _SM_M2
    return z ^ (z >> _U64(31))


def derive(uids: np.ndarray, tag: int, seed: int) -> np.ndarray:
    """Per-uid derived 64-bit stream: mix(uid, tag, seed)."""
    x = uids.astype(_U64) * _U64(0x2545F4914F6CDD1D)
    off = _U64((tag * int(_SM_GAMMA) + seed) & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(x + off)


_EXTS = np.array(["txt", "md", "json", "pdf", "docx", "bin"])
_EXT_CUM = np.cumsum(np.array([0.25, 0.15, 0.15, 0.20, 0.15, 0.10]))

_VOCAB = np.array(
    (
        "crawl frontier fetch parse chunk embed index shard wave host link seed "
        "politeness robots queue filter hash span text media token vector batch "
        "arrow block stream spill shuffle sort group count merge scan write read "
        "lance parquet actor task node cluster memory object store plasma ray "
        "data page section document content binary metadata offset order depth "
        "priority budget delay status payload scheme path anchor title body"
    ).split()
)


@lru_cache(maxsize=8)
def _host_cum(n_hosts: int, zipf_s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n_hosts + 1) ** zipf_s
    return np.cumsum(w / w.sum())


def host_idx_for(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    u = derive(uids, 1, cfg.seed).astype(np.float64) / 2.0**64
    return np.searchsorted(_host_cum(cfg.n_hosts, cfg.zipf_s), u).astype(np.int32)


def host_name(idx: int) -> str:
    return f"h{idx:03d}.example.com"


def ext_for(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    u = derive(uids, 2, cfg.seed).astype(np.float64) / 2.0**64
    return _EXTS[np.searchsorted(_EXT_CUM, u, side="right").clip(0, len(_EXTS) - 1)]


def bucket_for(uids: np.ndarray) -> np.ndarray:
    """First path segment — robots disallow rules are prefixes over it."""
    return (uids % 97).astype(np.int64)


def urls_for(uids: np.ndarray, cfg: CrawlConfig) -> Tuple[List[str], List[str], List[str]]:
    """Returns (urls, hosts, blob_names) for a batch of uids.

    Layout: ``https://{host}/p/{bucket}/{uid}.{ext}``. ``blob_name`` is the
    path without leading slash (the reference's blob analogue: container =
    host, blob = path; ref shared/services/servicebus_processor.py:189-192).
    """
    hi = host_idx_for(uids, cfg)
    ex = ext_for(uids, cfg)
    bk = bucket_for(uids)
    hosts = [host_name(i) for i in hi]
    blobs = [f"p/{b}/{u}.{e}" for b, u, e in zip(bk, uids, ex)]
    urls = [f"https://{h}/{bn}" for h, bn in zip(hosts, blobs)]
    return urls, hosts, blobs


def fanout_for(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    return (derive(uids, 3, cfg.seed) % _U64(cfg.link_fanout_max + 1)).astype(np.int64)


def link_targets_for(uids: np.ndarray, cfg: CrawlConfig) -> List[np.ndarray]:
    """Per-uid out-link target uids (ragged). Vectorized over the batch:
    one (n, fanout_max) matrix masked by per-row fanout."""
    n = len(uids)
    if n == 0:
        return []
    fo = fanout_for(uids, cfg)
    fmax = int(fo.max()) if n else 0
    if fmax == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(n)]
    j = np.arange(fmax, dtype=np.uint64)
    m = splitmix64(
        uids.astype(_U64)[:, None] * _U64(0xD1342543DE82EF95)
        + (j + _U64(1))[None, :] * _SM_GAMMA
        + _U64(cfg.seed) * _U64(7)
    ) % _U64(cfg.universe)
    m = m.astype(np.int64)
    return [m[i, : fo[i]] for i in range(n)]


# ---------------- robots ----------------

def robots_txt(cfg: CrawlConfig) -> Dict[str, str]:
    """Per-host robots.txt TEXT — what a fetch of https://{host}/robots.txt
    would return. Crawl-delay + Disallow prefixes are deterministic
    functions of (seed, host index)."""
    from .functions.robots import render_robots_txt

    out: Dict[str, str] = {}
    for i in range(cfg.n_hosts):
        h = derive(np.array([i], dtype=np.int64), 11, cfg.seed)[0]
        delay = int(50 + h % _U64(950))
        prefixes: List[str] = []
        if i % 5 == 0:  # every 5th host disallows two path buckets
            b1, b2 = int(h % _U64(97)), int((h >> _U64(8)) % _U64(97))
            prefixes = [f"/p/{b1}/", f"/p/{b2}/"]
        rules = {"crawl_delay_ms": delay, "disallow": prefixes}
        if cfg.sitemap_every and i % cfg.sitemap_every == 0:
            rules["sitemaps"] = [f"https://{host_name(i)}/sitemap.xml"]
        out[host_name(i)] = render_robots_txt(rules)
    return out


def robots_rules(cfg: CrawlConfig) -> Dict[str, dict]:
    """Parsed per-host robots rules: the engine AND the oracle both go
    through the real robots.txt text + parser (functions/robots.py), so
    the politeness gate's semantics are the parser's.

    The reference's closest analogue is rate-limit backoff (ref
    shared/utils/retry.py:150-158) + concurrency caps (ref
    shared/config/settings.py:88-89).
    """
    from .functions.robots import parse_all

    return parse_all(robots_txt(cfg))


def robots_blocks(url_path: str, prefixes: List[str]) -> bool:
    return any(url_path.startswith(p) for p in prefixes)


# ---------------- payloads ----------------

def payload_for(uid: int, cfg: CrawlConfig) -> Tuple[bytes, str]:
    """(payload bytes, content_type) for one uid. Deterministic.

    Formats (documented stand-ins for real files, parsed by
    stages/parse.py with the reference's extraction semantics):
      - txt/md:  plain text, sentences + ``LINK: url`` lines
      - json:    {"title":…, "body":[…], "links":[…]}
      - pdf:     pages separated by \\f (stands in for PyPDF2 page texts,
                 ref shared/processing/file_extractor.py:135-149); some
                 pages empty (whitespace) to exercise the skip-quirk
      - docx:    newline-separated paragraphs (ref :176-195)
      - bin:     opaque bytes -> metadata-only doc (ref :103-106)
    """
    uarr = np.array([uid], dtype=np.int64)
    ext = str(ext_for(uarr, cfg)[0])
    # content identity: ext comes from the REAL uid (it is in the URL),
    # but all content derivation (rng stream, embedded links) keys off
    # the effective content uid so mirrored pages are byte-identical
    carr = content_uid_of(uarr, cfg)
    # content versioning: at epoch e >= 1, changed pages (change_mask)
    # draw their prose from an epoch-perturbed stream — links and ext
    # stay fixed, so the web GRAPH is epoch-stable while page text
    # evolves (what an incremental refresh crawl must detect)
    rng_seed = cfg.seed
    if cfg.content_epoch > 0 and change_mask(uarr, cfg)[0]:
        rng_seed = cfg.seed + 1_000_003 * cfg.content_epoch
    rng = np.random.Generator(np.random.PCG64(int(derive(carr, 5, rng_seed)[0])))
    targets = link_targets_for(carr, cfg)[0]
    link_urls = urls_for(targets, cfg)[0] if len(targets) else []
    # link noise: 1/link_noise_every outgoing links carry tracking-query
    # and/or fragment suffixes — duplicate URL VARIANTS of one page, the
    # real-web mess the crawler's clean_url pass must collapse. Keyed by
    # the target uid, so every page referencing a noisy target writes
    # the same variant (and the engine/oracle agree by construction).
    if cfg.link_noise_every > 0 and len(targets):
        noisy = (derive(targets, 61, cfg.seed) % _U64(cfg.link_noise_every)) == 0
        kind = derive(targets, 67, cfg.seed) % _U64(3)
        decorated = []
        for u, t, m, k in zip(link_urls, targets, noisy, kind):
            if not m:
                decorated.append(u)
            elif k == 0:
                decorated.append(f"{u}?utm=s{int(t) % 7}")
            elif k == 1:
                decorated.append(f"{u}#sec{int(t) % 5}")
            else:
                decorated.append(f"{u}?utm=s{int(t) % 7}#sec{int(t) % 5}")
        link_urls = decorated
    # nofollow: 1/nofollow_every TARGETS are advertised with a NOFOLLOW
    # marker (rel=nofollow semantics) — keyed by target uid so every
    # page referencing that target marks it identically, and the link
    # extractor (functions/links.py) drops marked URLs from discovery
    nofollow = (
        (derive(targets, 71, cfg.seed) % _U64(cfg.nofollow_every)) == 0
        if cfg.nofollow_every > 0 and len(targets)
        else np.zeros(len(targets), dtype=bool)
    )
    link_lines = [
        (f"NOFOLLOW: {u}" if m else f"LINK: {u}")
        for u, m in zip(link_urls, nofollow)
    ]
    if cfg.nofollow_every > 0:
        link_urls = [
            (f"NOFOLLOW: {u}" if m else u) for u, m in zip(link_urls, nofollow)
        ]  # json payloads embed the marker inside the list value

    def sentences(n_words: int) -> str:
        words = _VOCAB[rng.integers(0, len(_VOCAB), n_words)]
        parts: List[str] = []
        i = 0
        while i < n_words:
            k = int(rng.integers(5, 14))
            parts.append(" ".join(words[i : i + k]) + ".")
            i += k
        return " ".join(parts)

    if ext in ("txt", "md"):
        body = sentences(int(rng.integers(40, 200)))
        text = body + ("\n" + "\n".join(link_lines) if link_lines else "")
        return text.encode("utf-8"), "text/plain"
    if ext == "json":
        obj = {
            "title": sentences(int(rng.integers(3, 8))),
            "body": [sentences(int(rng.integers(10, 30))) for _ in range(int(rng.integers(1, 4)))],
            "links": link_urls,
        }
        return json.dumps(obj).encode("utf-8"), "application/json"
    if ext == "pdf":
        n_pages = int(rng.integers(2, 7))
        pages = []
        for p in range(n_pages):
            if rng.random() < 0.15:
                pages.append("   ")  # whitespace-only page -> skipped by parser
            else:
                pages.append(sentences(int(rng.integers(20, 80))))
        if link_lines:
            pages.append("\n".join(link_lines))
        return "\f".join(pages).encode("utf-8"), "application/pdf"
    if ext == "docx":
        n_par = int(rng.integers(5, 55))
        paras = [sentences(int(rng.integers(5, 20))) for _ in range(n_par)]
        paras += link_lines
        return "\n".join(paras).encode("utf-8"), "application/docx"
    # bin: opaque bytes, no links
    raw = rng.integers(0, 256, int(rng.integers(64, 2048)), dtype=np.uint8)
    return raw.tobytes(), "application/octet-stream"


def change_mask(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    """Deterministic 1/``change_every`` subset of pages whose content
    DIFFERS at content_epoch >= 1 — the synthetic analogue of pages
    edited between crawl runs. Keyed off the CONTENT uid so mirrored
    pages change in lockstep (a syndicated page edits everywhere).
    All-False when the web is static (change_every <= 0)."""
    if cfg.change_every <= 0 or len(uids) == 0:
        return np.zeros(len(uids), dtype=bool)
    c = content_uid_of(uids, cfg)
    return (derive(c, 53, cfg.seed) % _U64(cfg.change_every)) == 0


def content_uid_of(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    """Effective content identity per uid: mirrored uids (1/``mirror_every``
    of the universe) share one of ``mirror_groups`` representatives, so two
    mirrored URLs with the same (group, ext) serve byte-identical payloads
    — the synthetic analogue of mirror sites / syndicated pages that a
    content-dedup stage must catch.  Representatives live ABOVE the real
    universe so a mirror never collides with a real page's content.
    Identity (uids unchanged) when ``mirror_every`` <= 0."""
    if cfg.mirror_every <= 0 or len(uids) == 0:
        return uids
    m = (derive(uids, 47, cfg.seed) % _U64(cfg.mirror_every)) == 0
    grp = (derive(uids, 49, cfg.seed) % _U64(max(cfg.mirror_groups, 1))).astype(np.int64)
    return np.where(m, np.int64(cfg.universe) + grp, uids)


def redirect_mask(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    """True for uids that 301-redirect instead of serving content —
    1/``redirect_every`` of the universe, deterministic in (seed, uid).
    Disabled (all False) when ``redirect_every`` <= 0, so default-config
    conformance digests are unchanged."""
    if cfg.redirect_every <= 0 or len(uids) == 0:
        return np.zeros(len(uids), dtype=bool)
    return (derive(uids, 41, cfg.seed) % _U64(cfg.redirect_every)) == 0


def redirect_target_uids(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    """Deterministic redirect target per uid, never the uid itself."""
    t = (derive(uids, 43, cfg.seed) % _U64(cfg.universe - 1)).astype(np.int64)
    return np.where(t >= uids, t + 1, t)


def fail_threshold(uids: np.ndarray, cfg: CrawlConfig) -> np.ndarray:
    """Deterministic per-URL failure profile for fetch fault injection:
    number of leading attempts that fail with a transient 503.

      ~90% of URLs: 0 (first fetch succeeds)
      ~6%:          1    ~2%: 2         (transient; retry succeeds)
      ~2%:          255  (permanently failing -> dead-letter after
                          max_fetch_attempts tries)

    Pure function of (seed, uid) — the oracle sees identical outcomes.
    """
    r = (derive(uids, 31, cfg.seed) % _U64(100)).astype(np.int64)
    k = np.zeros(len(uids), dtype=np.int64)
    k[(r >= 90) & (r < 96)] = 1
    k[(r >= 96) & (r < 98)] = 2
    k[r >= 98] = 255
    return k


def seed_uids(cfg: CrawlConfig) -> np.ndarray:
    """Deterministic seed list: ~seeds_per_host × n_hosts distinct uids."""
    n = cfg.seeds_per_host * cfg.n_hosts
    i = np.arange(n * 3, dtype=np.int64)  # oversample, dedupe, trim
    cand = (derive(i, 21, cfg.seed) % _U64(cfg.universe)).astype(np.int64)
    _, first = np.unique(cand, return_index=True)
    return cand[np.sort(first)][:n]


def sitemap_seed_uids(cfg: CrawlConfig, robots: Dict[str, dict]) -> np.ndarray:
    """URLs advertised via ``Sitemap:`` lines of the PARSED robots — the
    directive gates contribution (a host whose robots text carries no
    Sitemap line contributes nothing, whatever cfg says), so the engine
    and the oracle share the semantics through the parser exactly like
    the Disallow/Crawl-delay gates.  Each advertising host contributes
    ``sitemap_urls_per_host`` deterministic uids (tag-22 derive stream,
    offset by host index); order-preserving dedupe across hosts."""
    enabled = [
        i for i in range(cfg.n_hosts) if robots.get(host_name(i), {}).get("sitemaps")
    ]
    if not enabled:
        return np.zeros(0, dtype=np.int64)
    k = cfg.sitemap_urls_per_host
    idx = np.concatenate(
        [np.arange(i * k, (i + 1) * k, dtype=np.int64) for i in enabled]
    )
    cand = (derive(idx, 22, cfg.seed) % _U64(cfg.universe)).astype(np.int64)
    _, first = np.unique(cand, return_index=True)
    return cand[np.sort(first)]


def all_seed_uids(cfg: CrawlConfig, robots: Dict[str, dict]) -> np.ndarray:
    """seed list ∪ sitemap-advertised uids, order-preserving dedupe —
    the wave-0 frontier BOTH the engine and the oracle start from."""
    seeds = seed_uids(cfg)
    if not cfg.sitemap_every:
        return seeds
    cand = np.concatenate([seeds, sitemap_seed_uids(cfg, robots)])
    _, first = np.unique(cand, return_index=True)
    return cand[np.sort(first)]
