"""Fetch stage: the blob GET re-expressed as an actor-pool map_batches.

The reference downloads one blob per message over HTTP (ref
shared/azure_clients/blob_client.py:93-120, S5/S6 in SURVEY.md §2.1).
Here the network is replaced by the deterministic synthetic web
(synth.payload_for): an actor-pool stage whose per-actor state is the
crawl config + compiled URL pattern (the analogue of the per-process
HTTP session, T3 in SURVEY.md §2.3). Batches are Arrow in / Arrow out.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..config import CrawlConfig
from .. import synth

_UID_RE = re.compile(r"/p/\d+/(\d+)\.\w+$")


def uid_of_url(url: str) -> int:
    m = _UID_RE.search(url)
    return int(m.group(1)) if m else -1


def make_fetcher(cfg: CrawlConfig):
    """Task-pool fetch fn: ``ds.map_batches(make_fetcher(cfg), ...)``.

    The synthetic fetch is a pure function of (cfg, url), so plain tasks
    beat an actor pool: no per-wave actor startup, and the streaming
    executor scales tasks to whatever blocks exist. A REAL network
    fetcher holds per-worker state (HTTP session pool, DNS cache) and
    should use the ``SyntheticFetcher`` actor-pool form below instead."""
    fetcher = SyntheticFetcher(cfg)

    def fetch(batch: pa.Table) -> pa.Table:
        return fetcher(batch)

    return fetch


class SyntheticFetcher:
    """Actor-pool form: map_batches(SyntheticFetcher,
    fn_constructor_args=(cfg,), concurrency=(m,n), batch_format='pyarrow')
    — per-actor state is the analogue of the reference's per-process blob
    HTTP client (ref shared/azure_clients/blob_client.py:34-55, T3)."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        uids = np.array([uid_of_url(u) for u in urls], dtype=np.int64)
        # fault injection: rows whose attempt count is below the URL's
        # deterministic failure threshold fail with a transient 503; an
        # unparsable uid is a permanent 404 (ref BlobNotFoundError,
        # blob_client.py:94-120 -> ack-and-skip)
        if "attempts" in batch.column_names and self.cfg.inject_faults:
            attempts = batch["attempts"].to_numpy(zero_copy_only=False).astype(np.int64)
            k = synth.fail_threshold(uids, self.cfg)
            transient_fail = attempts < k
        else:
            transient_fail = np.zeros(len(uids), dtype=bool)
        # 301 redirects: deterministic subset of the universe serves a
        # Location header instead of content (checked after the fault
        # gate — a flaky redirect 503s first, redirects once reachable)
        redirected = synth.redirect_mask(uids, self.cfg) & (uids >= 0) & ~transient_fail
        redirect_to = np.full(len(uids), "", dtype=object)
        if redirected.any():
            tgt = synth.redirect_target_uids(uids[redirected], self.cfg)
            redirect_to[redirected] = synth.urls_for(tgt, self.cfg)[0]
        payloads = []
        ctypes = []
        for uid, fail, redir in zip(uids, transient_fail, redirected):
            if uid < 0 or fail or redir:
                payloads.append(b"")
                ctypes.append("")
                continue
            p, ct = synth.payload_for(int(uid), self.cfg)
            payloads.append(p)
            ctypes.append(ct)
        status = np.where(
            uids < 0,
            404,
            np.where(transient_fail, 503, np.where(redirected, 301, 200)),
        ).astype(np.int32)
        # blob_name = URL path without leading slash (container≡host):
        # the reference's (container, blob) split, ref servicebus_processor.py:189-192
        blobs = [u.replace("https://", "").partition("/")[2] for u in urls]
        return batch.append_column("uid", pa.array(uids)) \
            .append_column("status", pa.array(status)) \
            .append_column("content_type", pa.array(ctypes, type=pa.string())) \
            .append_column("blob_name", pa.array(blobs, type=pa.string())) \
            .append_column("payload", pa.array(payloads, type=pa.large_binary())) \
            .append_column("redirect_to", pa.array(redirect_to.tolist(), type=pa.string()))
