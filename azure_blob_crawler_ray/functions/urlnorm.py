"""URL / blob-event canonicalization (operator O1 in SURVEY.md §2.2).

The reference parses three wire formats and canonicalizes a blob URL by
naive splitting (ref shared/services/servicebus_processor.py:181-203 and
services/indexer_app/app/api/handlers.py:152-182):
``url.replace('https://','').split('/')`` -> container = parts[1],
blob = '/'.join(parts[2:]). That exact quirky split is kept for blob
events; crawl URLs get the natural host/path split on the same principle.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np

# same RE2-compatible pattern as the Arrow twin (clean_urls_arrow)
_TRACKING_RE = re.compile(r"\?utm[^#]*$")


def parse_blob_url(url: str) -> Optional[Tuple[str, str]]:
    """(container, blob) via the reference's split — ref
    servicebus_processor.py:189-192. Returns None when unparsable (the
    reference completes-and-skips such messages, ref :204-210)."""
    parts = url.replace("https://", "").split("/")
    if len(parts) >= 3:
        return parts[1], "/".join(parts[2:])
    return None


def parse_blob_event(message: object) -> Optional[Tuple[str, str]]:
    """All three wire formats — ref servicebus_processor.py:181-203."""
    if isinstance(message, list) and message:
        data = message[0]
        if isinstance(data, dict) and "data" in data and "url" in data["data"]:
            return parse_blob_url(data["data"]["url"])
        return None
    if not isinstance(message, dict):
        return None
    if "blob_name" in message and "container_name" in message:
        return message["container_name"], message["blob_name"]
    if "data" in message and "url" in message.get("data", {}):
        return parse_blob_url(message["data"]["url"])
    return None


def split_host_path(url: str) -> Tuple[str, str]:
    """Crawl-side canonical split: (host, '/path'). Scheme-stripped the
    same naive way as the reference (https:// then http://)."""
    trimmed = url.replace("https://", "").replace("http://", "")
    host, _, path = trimmed.partition("/")
    return host, "/" + path


def canonical_url(url: str) -> str:
    """Canonical form used for the seen-set hash: host + path, no scheme,
    no fragment, trailing-slash trimmed (except root)."""
    host, path = split_host_path(url)
    path = path.split("#", 1)[0]
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    return host + path


def clean_url(url: str) -> str:
    """Link-discovery URL cleaning (real-crawler semantics the reference
    never needed — its queue carries exact blob URLs): drop the fragment,
    and drop a tracking query (one starting with a ``utm`` param) wholly.
    Scheme and semantic paths are preserved; idempotent; identity on
    noise-free URLs, so crawls over clean webs are byte-identical with
    or without this pass."""
    url = url.split("#", 1)[0]
    return _TRACKING_RE.sub("", url)


def clean_urls_arrow(urls):
    """Arrow-kernel twin of ``clean_url`` for the link-explosion hot
    path (RE2, no per-URL Python). Property-tested equal to the scalar
    form."""
    import pyarrow.compute as pc

    out = pc.replace_substring_regex(urls, pattern="(?s)#.*$", replacement="")
    return pc.replace_substring_regex(out, pattern=r"\?utm[^#]*$", replacement="")


def doc_id_of(blob_name: str) -> str:
    """ref document_processor.py:328 — NOTE the collision hazard: both
    'a/b.txt' and 'a.b_txt' map to 'a_b_txt' (SURVEY.md §2.7 D1)."""
    return blob_name.replace("/", "_").replace(".", "_")


def canonical_urls_np(urls) -> np.ndarray:
    """Vectorized canonicalization for hot paths (object ndarray in/out)."""
    return np.array([canonical_url(u) for u in urls], dtype=object)


def split_canonical_arrow(urls):
    """Arrow-kernel twin of (``split_host_path``, ``canonical_url``) for
    the link-explosion hot path: (host array, canonical array) computed
    with RE2 string kernels, no per-URL Python. Property-tested equal to
    the scalar pair (tests/test_properties.py)."""
    import pyarrow.compute as pc

    trimmed = pc.replace_substring(urls, pattern="https://", replacement="")
    trimmed = pc.replace_substring(trimmed, pattern="http://", replacement="")
    # host = everything before the first '/'; (?s) so '.' crosses any
    # newline bytes exactly like the scalar str ops do
    host = pc.replace_substring_regex(trimmed, pattern="(?s)/.*$", replacement="")
    # rest = after host (+ one '/'), fragment-stripped, ONE trailing '/'
    # trimmed — the same order of operations as canonical_url
    rest = pc.replace_substring_regex(trimmed, pattern="(?s)^[^/]*/?", replacement="")
    rest = pc.replace_substring_regex(rest, pattern="(?s)#.*$", replacement="")
    rest = pc.replace_substring_regex(rest, pattern="/$", replacement="")
    # separator typed to the inputs: a plain python "/" is a `string`
    # scalar and the join kernel has no (large_string, large_string,
    # string) overload — large_string columns are routine at scale
    import pyarrow as pa

    sep = pa.scalar("/", type=host.type)
    canon = pc.binary_join_element_wise(host, rest, sep)
    return host, canon


def allowed_extension(blob_name: str) -> bool:
    """Webhook-path extension allowlist (O3) — ref
    services/indexer_app/app/api/handlers.py:188-192: only the supported
    text/structured/document extensions pass; everything else is skipped
    with a response. NOTE the queue path deliberately does NOT apply this
    filter (unknown extensions become metadata-only docs, O8) — callers
    choose the behavior, matching the reference's split."""
    from ..config import (
        SUPPORTED_DOCUMENT_EXTENSIONS,
        SUPPORTED_STRUCTURED_EXTENSIONS,
        SUPPORTED_TEXT_EXTENSIONS,
    )

    ext = blob_name.lower().split(".")[-1] if "." in blob_name else ""
    return ext in (
        SUPPORTED_TEXT_EXTENSIONS
        + SUPPORTED_STRUCTURED_EXTENSIONS
        + SUPPORTED_DOCUMENT_EXTENSIONS
    )
