"""Wire-format parsing (O1/O3) and retry-policy (ref retry.py) semantics."""

from __future__ import annotations

import pytest

from azure_blob_crawler_ray.functions.retry import (
    Action,
    decide,
    parse_retry_after,
    should_dead_letter,
)
from azure_blob_crawler_ray.functions.urlnorm import (
    canonical_url,
    parse_blob_event,
    parse_blob_url,
)

URL = "https://acct.blob.core.windows.net/container1/path/to/blob.pdf"


def test_event_grid_array_format():
    # ref servicebus_processor.py:183-192
    msg = [{"data": {"url": URL}}]
    assert parse_blob_event(msg) == ("container1", "path/to/blob.pdf")


def test_direct_format():
    # ref servicebus_processor.py:193-196
    msg = {"blob_name": "a/b.txt", "container_name": "c"}
    assert parse_blob_event(msg) == ("c", "a/b.txt")


def test_single_event_grid_format():
    # ref servicebus_processor.py:197-203
    msg = {"data": {"url": URL}}
    assert parse_blob_event(msg) == ("container1", "path/to/blob.pdf")


def test_unparsable_returns_none():
    # ref servicebus_processor.py:204-210 — complete-and-skip
    assert parse_blob_event({"nope": 1}) is None
    assert parse_blob_event([]) is None
    assert parse_blob_event("garbage") is None
    assert parse_blob_url("https://host-only") is None


def test_naive_url_split_quirk():
    # ref :189-192 — the container is parts[1] of the scheme-stripped split
    assert parse_blob_url("https://h/c/b") == ("c", "b")


def test_canonical_url():
    assert canonical_url("https://h.com/a/b/") == "h.com/a/b"
    assert canonical_url("https://h.com/a#frag") == "h.com/a"
    assert canonical_url("https://h.com/") == "h.com/"


# ---- retry policy (ref shared/utils/retry.py) ----


def test_permanent_codes_never_retried():
    for code in (400, 401, 403, 404, 405, 409, 422):
        assert decide(code, attempt=1).action is Action.FAIL_PERMANENT


def test_rate_limit_does_not_consume_attempt():
    d = decide(429, attempt=3)
    assert d.action is Action.RATE_LIMIT_WAIT
    assert d.wait_s == 60  # default min wait


def test_retry_after_parse_and_clamp():
    # ref retry.py:54-89, 150-158
    assert parse_retry_after("please retry after 90 seconds") == 90
    # ref retry.py:70,83 only upper-clamps; a short advertised wait is honored
    assert parse_retry_after("retry after 5 seconds") == 5
    assert parse_retry_after("retry after 900 seconds") == 300  # clamp down
    assert parse_retry_after("no hint") is None
    # 60 s is the no-hint default (429 with no parseable message)
    assert decide(429, attempt=1).wait_s == 60
    assert decide(429, "retry after 5 seconds", attempt=1).wait_s == 5
    d = decide(500, "Server busy, retry after 120 seconds", attempt=2)
    assert d.action is Action.RATE_LIMIT_WAIT and d.wait_s == 120


def test_transient_retries_then_dead_letter():
    assert decide(500, attempt=1).action is Action.RETRY
    assert decide(500, attempt=1).wait_s == 2.0
    assert decide(500, attempt=2).action is Action.RETRY
    assert decide(500, attempt=3).action is Action.DEAD_LETTER


def test_queue_poison_threshold():
    # ref deploy-infrastructure.ps1:257-259 — max-delivery-count 10
    assert not should_dead_letter(9)
    assert should_dead_letter(10)


def test_extension_allowlist_webhook_vs_queue_path():
    # ref handlers.py:188-192 (webhook filters) vs servicebus_processor.py
    # (queue path does not) — O3 in SURVEY.md §2.2
    from azure_blob_crawler_ray.functions.urlnorm import allowed_extension
    from azure_blob_crawler_ray.oracle.ref_extract import extract

    assert allowed_extension("a/b.txt")
    assert allowed_extension("x.PDF")
    assert not allowed_extension("archive.zip")
    assert not allowed_extension("noext")
    # queue path still produces a metadata-only doc for the same blob
    ex = extract("archive.zip", b"\x00\x01")
    assert ex.full_content.startswith("Binary file: archive.zip")
