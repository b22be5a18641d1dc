"""Engine defaults.

Mirrors the knobs of the reference's ``shared/config/settings.py`` (ref
settings.py:32-38, 92-105, 144-146) where a knob has a reference analogue,
plus crawl-engine knobs (shards, waves, politeness) that the reference
lacks but the target architecture requires.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

# ---- chunking / tokens (ref settings.py:32-36) ----
CHUNK_MAX_TOKENS = 4000
EMBEDDING_MAX_TOKENS = 8000
OVERLAP_TOKENS = 200
EMBEDDING_FALLBACK_TOKEN_RATIO = 4  # 1 token ~ 4 chars (ref settings.py:78)

# ---- file handling (ref settings.py:38, 92-105) ----
MAX_FILE_SIZE_MB = 100
SUPPORTED_TEXT_EXTENSIONS = ("txt", "md", "csv")
SUPPORTED_STRUCTURED_EXTENSIONS = ("json",)
SUPPORTED_DOCUMENT_EXTENSIONS = ("pdf", "docx", "doc")
PARAGRAPHS_PER_PAGE = 20
PAGE_PREFIX = "--- Page "
SECTION_PREFIX = "--- Section "
PAGE_SUFFIX = " ---"
TEXT_ENCODING = "utf-8"
TEXT_ENCODING_ERRORS = "ignore"

# ---- embedding (ref settings.py:77) ----
EMBEDDING_VECTOR_DIMENSION = 1536

# ---- query layer (ref settings.py:144-146) ----
SEARCH_DEFAULT_TOP = 10
SEARCH_MAX_TOP = 100
SEARCH_ALL_DOCS_MAX = 100_000
EXCLUDED_FIELDS = ("vector",)

# ---- crawl engine (target-side; fixed so results are independent of
#      parallelism level — determinism requires shard counts NOT to scale
#      with num_cpus) ----
NUM_SEEN_SHARDS = 32          # cuckoo-filter shards (hash % NUM_SEEN_SHARDS)
NUM_SCHED_SHARDS = 16         # politeness scheduler shards (host-hash)
HASH_SEED = 1729              # seed for the 64-bit string hash
CUCKOO_BUCKETS_PER_SHARD = 1 << 16   # 64Ki buckets x 4 slots ~ 250k keys/shard
WAVE_DURATION_MS = 60_000     # virtual-clock length of one wave
DEFAULT_MAX_WAVES = 4

# ---- bench / env ----
def bench_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass(frozen=True)
class CrawlConfig:
    """All knobs a crawl run needs; a pure value object (picklable)."""

    universe: int = 10_000          # size of the synthetic URL id space
    n_hosts: int = 50               # hosts, Zipf-skewed (FIXTURES.md F2)
    zipf_s: float = 1.1
    seed: int = 42
    max_waves: int = DEFAULT_MAX_WAVES
    wave_budget: int = 4_000        # global max fetches per wave
    max_fetches_per_host_per_wave: int = 256
    wave_duration_ms: int = WAVE_DURATION_MS
    num_seen_shards: int = NUM_SEEN_SHARDS
    num_sched_shards: int = NUM_SCHED_SHARDS
    cuckoo_buckets: int = CUCKOO_BUCKETS_PER_SHARD
    link_fanout_max: int = 20
    embed_dim: int = 64             # small by default; 1536 reserved for conformance
    chunk_max_tokens: int = CHUNK_MAX_TOKENS
    checkpoint_dir: str = ""        # "" -> no checkpointing
    out_dir: str = "/tmp/abc_ray_out"
    seeds_per_host: int = 2
    emit_index: bool = True         # run chunk->embed->index stages per wave
    inject_faults: bool = True      # deterministic transient/permanent fetch failures
    max_fetch_attempts: int = 3     # then dead-letter (ref retry defaults, settings.py:42)
    redirect_every: int = 0         # 1/N URLs 301-redirect to a derived target (0 = off)
    max_depth: int = 0              # drop discovered links deeper than this (0 = unlimited)
    mirror_every: int = 0           # 1/N URLs serve mirrored (group-shared) content (0 = off)
    mirror_groups: int = 16         # distinct mirror content groups
    dedup_content: bool = False     # cross-wave content-fingerprint dedup of documents
    inlink_priority: bool = False   # frontier priority boosted by in-wave inlink count
    inlink_cap: int = 100           # cap on the inlink boost (skew bound)
    content_epoch: int = 0          # synthetic-web version; changed pages differ per epoch
    change_every: int = 0           # 1/N of content uids change each epoch (0 = static web)
    link_noise_every: int = 0       # 1/N links carry ?utm=/#fragment noise (0 = clean links)
    sitemap_every: int = 0          # every Nth host advertises a sitemap (0 = off)
    sitemap_urls_per_host: int = 8  # URLs each advertised sitemap contributes
    nofollow_every: int = 0         # 1/N link targets marked rel=nofollow (0 = off)
    # crawler-trap quench: a host whose wave yields >= trap_min_fetches
    # extracted documents of which >= trap_dup_ratio are content dups
    # (mirror/calendar/session-id traps) is dropped from every later
    # frontier. Requires dedup_content (the dup signal).
    trap_quench: bool = False
    trap_min_fetches: int = 32
    trap_dup_ratio: float = 0.5

    def __post_init__(self) -> None:
        # trap detection is driven by the content-dup signal; without
        # dedup_content the engine would never emit the trapped_hosts
        # wave metric while the oracle emits trapped_hosts: 0 — enforce
        # the documented requirement instead of diverging silently
        if self.trap_quench and not self.dedup_content:
            raise ValueError(
                "trap_quench=True requires dedup_content=True (the trap "
                "signal is the per-host content-dup ratio)"
            )
