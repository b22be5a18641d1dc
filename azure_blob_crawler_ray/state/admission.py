"""Pure politeness-admission logic, shared by the scheduler actors and
the oracle crawl simulator — a single definition so engine == oracle by
construction.

The reference's politeness analogue is concurrency semaphores + rate-limit
backoff (ref shared/services/servicebus_processor.py:113-121,
shared/utils/retry.py:150-158). The target replaces wall-clock sleeps with
a VIRTUAL clock: each host has a next-fetch-time; a wave spans
``[wave_start, wave_end)`` virtual ms; fetches are scheduled on a min-heap
of (next_fetch_time, host) until the window, per-host cap, or candidate
supply runs out. Deferred rows stay in the frontier for the next wave.

Canonical frontier order (SURVEY.md §2.9): priority DESC,
discovered_at ASC, url_hash ASC — ordering comes from data, never from
execution timing.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Sequence, Tuple

import numpy as np


def canonical_order(priority: np.ndarray, discovered_at: np.ndarray, url_hash: np.ndarray) -> np.ndarray:
    """Indices that sort rows into canonical frontier order."""
    return np.lexsort(
        (url_hash.astype(np.uint64), discovered_at.astype(np.int64), -priority.astype(np.float64))
    )


def schedule_wave(
    host_counts: Sequence[Tuple[str, int]],
    next_vtime: Dict[str, int],
    crawl_delay_ms: Dict[str, int],
    wave_start: int,
    wave_end: int,
    per_host_cap: int,
) -> Dict[str, List[int]]:
    """Min-heap fetch scheduling for one wave.

    ``host_counts``: (host, number of candidate rows) — candidates are
    assumed pre-sorted in canonical order; the first k rows of a host are
    the k admitted. Returns host -> list of scheduled virtual fetch times
    (len = admitted count). Mutates ``next_vtime``.
    """
    heap: List[Tuple[int, str, int, int]] = []  # (t, host, remaining, delay)
    for host, cnt in host_counts:
        if cnt <= 0:
            continue
        delay = crawl_delay_ms.get(host, 1000)
        t = max(next_vtime.get(host, 0), wave_start)
        if t < wave_end:
            heapq.heappush(heap, (t, host, min(cnt, per_host_cap), delay))
        next_vtime[host] = t  # normalize state even if nothing admitted
    out: Dict[str, List[int]] = {}
    while heap:
        t, host, remaining, delay = heapq.heappop(heap)
        out.setdefault(host, []).append(t)
        next_vtime[host] = t + delay
        if remaining > 1 and t + delay < wave_end:
            heapq.heappush(heap, (t + delay, host, remaining - 1, delay))
    return out
