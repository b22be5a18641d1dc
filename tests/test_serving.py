"""HTTP serving surface semantics — ref handlers.py:48-201 (health,
ready, manual process, webhook: Event Grid array + direct formats,
URL split, extension allowlist, error codes)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from azure_blob_crawler_ray.serving import ApiHandlers, ProcessorCore, serve

BLOBS = {
    ("docs", "a/b.txt"): b"hello world. LINK: https://h/x",
    ("docs", "a/big.txt"): b"x" * (101 * 1024 * 1024),  # oversize -> skip
}


def _core(**kw) -> ProcessorCore:
    def fetch(blob_name, container):
        try:
            return BLOBS[(container, blob_name)]
        except KeyError:
            raise FileNotFoundError(f"BlobNotFound: {container}/{blob_name}")

    return ProcessorCore(fetch_fn=fetch, **kw)


@pytest.fixture()
def api() -> ApiHandlers:
    return ApiHandlers(_core())


def test_health_reports_config(api):
    status, body = api.health()
    assert status == 200 and body["status"] == "healthy"
    assert body["configuration"]["chunk_max_tokens"] == 4000
    assert body["configuration"]["max_file_size_mb"] == 100


def test_ready_503_until_clients_initialized():
    core = _core(clients={"blob_client": True, "search_client": False,
                          "openai_client": True})
    status, body = ApiHandlers(core).ready()
    assert status == 503
    assert body["clients"]["search_client"] is False
    status, body = ApiHandlers(_core()).ready()
    assert status == 200 and body["clients_initialized"] is True


def test_manual_process_validates_and_processes(api):
    assert api.manual_process({})[0] == 400
    assert api.manual_process({"blob_name": "a/b.txt"})[0] == 400
    status, body = api.manual_process(
        {"blob_name": "a/b.txt", "container_name": "docs"}
    )
    assert status == 200 and body["status"] == "success"
    # missing blob -> 500 with the error string (ref handlers.py:140-142)
    status, body = api.manual_process(
        {"blob_name": "nope.txt", "container_name": "docs"}
    )
    assert status == 500 and "BlobNotFound" in body["error"]


def test_webhook_event_grid_array_and_direct_formats(api):
    eg = [{"data": {"url": "https://acct.blob.core.windows.net/docs/a/b.txt"}}]
    status, body = api.webhook(eg)
    assert status == 200 and body["status"] == "success"

    status, body = api.webhook({"blob_name": "a/b.txt", "container_name": "docs"})
    assert status == 200 and body["status"] == "success"


def test_webhook_error_paths(api):
    # invalid URL (fewer than 3 parts after scheme strip) -> 400
    assert api.webhook({"data": {"url": "https://host-only"}})[0] == 400
    assert api.webhook({})[0] == 400
    assert api.webhook("not a dict")[0] == 400
    # unsupported extension -> skipped, NOT an error (ref :190-194)
    status, body = api.webhook({"blob_name": "a/b.exe", "container_name": "docs"})
    assert status == 200 and body["status"] == "skipped"
    assert "exe" in body["reason"]


def test_webhook_filters_but_queue_path_does_not(api):
    # O3 contrast: the same .bin blob is skipped by the webhook but the
    # queue-path extractor turns it into a metadata-only doc
    from azure_blob_crawler_ray.oracle.ref_extract import extract

    status, body = api.webhook({"blob_name": "x.bin", "container_name": "docs"})
    assert body["status"] == "skipped"
    ex = extract("x.bin", b"\x00\x01")
    assert not ex.skipped and ex.full_content.startswith("Binary file:")


def test_oversize_blob_processes_as_skip_not_fail(api):
    status, body = api.manual_process(
        {"blob_name": "a/big.txt", "container_name": "docs"}
    )
    assert status == 200  # skip-not-fail (ref file_extractor.py:68-76)


def test_index_sink_receives_processed_doc():
    got = []
    core = _core(index_sink=got.append)
    ApiHandlers(core).manual_process(
        {"blob_name": "a/b.txt", "container_name": "docs"}
    )
    assert len(got) == 1
    assert got[0].doc_id == "a_b_txt"
    assert got[0].index_ids == ["a_b_txt_chunk_0"]


def test_live_server_round_trip(api):
    server = serve(api, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.status == 200
            assert json.loads(r.read())["status"] == "healthy"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/process",
            data=json.dumps(
                {"blob_name": "a/b.txt", "container_name": "docs"}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["status"] == "success"
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/nope", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
