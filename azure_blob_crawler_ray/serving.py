"""HTTP serving surface — the reference's indexer microservice endpoints
(ref services/indexer_app/app/api/handlers.py:48-201) over the engine's
single-blob pipeline:

  GET  /health   -> service status + configuration echo (ref :49-71)
  GET  /ready    -> client-initialization readiness, 503 when any
                    required client is missing (ref :73-112)
  POST /process  -> manual processing: {"blob_name", "container_name"}
                    (ref :114-142)
  POST /webhook  -> blob-created events, Event Grid array OR direct
                    format, URL-parse + extension allowlist + process
                    (ref :144-201)

Handlers are PURE functions on (method, path, body) -> (status, dict) so
they are testable without sockets; ``serve()`` wraps them in a stdlib
ThreadingHTTPServer for the real deployment shape (the reference uses
aiohttp — an implementation detail, not semantics). Framework-free by
design: the sandbox has no aiohttp/flask, and the handler semantics are
what the conformance surface checks.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Callable, Dict, Optional

from .config import (
    CHUNK_MAX_TOKENS,
    EMBEDDING_MAX_TOKENS,
    MAX_FILE_SIZE_MB,
    SUPPORTED_DOCUMENT_EXTENSIONS,
    SUPPORTED_STRUCTURED_EXTENSIONS,
    SUPPORTED_TEXT_EXTENSIONS,
)
from .functions.retry import MAX_ATTEMPTS, RATE_LIMIT_MAX_WAIT_S, RETRY_DELAY_S
from .oracle.ref_pipeline import process_blob

ALL_SUPPORTED_EXTENSIONS = (
    SUPPORTED_TEXT_EXTENSIONS
    + SUPPORTED_STRUCTURED_EXTENSIONS
    + SUPPORTED_DOCUMENT_EXTENSIONS
)


@dataclass
class ProcessorCore:
    """The document_processor seam (ref DocumentProcessor): fetch a blob's
    bytes, run the single-blob pipeline, hand index rows to a sink.

    ``fetch_fn(blob_name, container_name) -> bytes`` raises on a missing
    blob (the reference's blob client raises BlobNotFoundError).
    ``clients`` mirrors the reference's readiness probe surface
    (ref handlers.py:84-106): every value must be truthy to be ready."""

    fetch_fn: Callable[[str, str], bytes]
    index_sink: Optional[Callable[[object], None]] = None
    embed_dim: int = 64
    clients: Dict[str, bool] = field(
        default_factory=lambda: {
            "blob_client": True,
            "search_client": True,
            "openai_client": True,
        }
    )

    def process_file(self, blob_name: str, container_name: str) -> dict:
        payload = self.fetch_fn(blob_name, container_name)
        doc = process_blob(blob_name, payload, embed_dim=self.embed_dim)
        if doc is None:  # oversize skip or empty content
            return {"doc_id": None, "chunks": 0, "indexed": 0}
        if self.index_sink is not None:
            self.index_sink(doc)
        return {"doc_id": doc.doc_id, "chunks": len(doc.chunks),
                "indexed": len(doc.index_ids)}


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


class ApiHandlers:
    """(status_code, payload) handler quartet — ref handlers.py:31-201."""

    def __init__(self, core: ProcessorCore):
        self.core = core

    def health(self) -> tuple[int, dict]:
        """ref handlers.py:49-71 — always 200 with the config echo."""
        return 200, {
            "status": "healthy",
            "timestamp": _now(),
            "configuration": {
                "chunk_max_tokens": CHUNK_MAX_TOKENS,
                "embedding_max_tokens": EMBEDDING_MAX_TOKENS,
                "max_file_size_mb": MAX_FILE_SIZE_MB,
                "max_retries": MAX_ATTEMPTS,
                "retry_delay_seconds": RETRY_DELAY_S,
                "rate_limit_max_wait": RATE_LIMIT_MAX_WAIT_S,
            },
        }

    def ready(self) -> tuple[int, dict]:
        """ref handlers.py:73-112 — 503 with per-client booleans when any
        required client is uninitialized."""
        missing = {k: bool(v) for k, v in self.core.clients.items()}
        if not all(missing.values()):
            return 503, {
                "status": "not ready",
                "message": "Clients not initialized",
                "clients": missing,
            }
        return 200, {
            "status": "ready",
            "timestamp": _now(),
            "clients_initialized": True,
        }

    def manual_process(self, body: dict) -> tuple[int, dict]:
        """ref handlers.py:114-142 — 400 on missing fields, 500 on any
        processing error, 200 with a success message."""
        blob_name = body.get("blob_name")
        container_name = body.get("container_name")
        if not blob_name or not container_name:
            return 400, {"error": "blob_name and container_name are required"}
        try:
            self.core.process_file(blob_name, container_name)
        except Exception as e:  # ref :140-142
            return 500, {"status": "error", "error": str(e)}
        return 200, {
            "status": "success",
            "message": f"Processed {blob_name} from {container_name}",
            "timestamp": _now(),
        }

    def webhook(self, body) -> tuple[int, dict]:
        """ref handlers.py:144-201 — Event Grid array or direct format;
        URL split container/blob; extension allowlist (the WEBHOOK path
        filters, the queue path does not — O3); 400 on bad URL/fields,
        'skipped' for unsupported types, 500 on processing error."""
        event = body[0] if isinstance(body, list) and body else body
        if not isinstance(event, dict):
            return 400, {"error": "blob_name and container_name are required"}
        blob_name = container_name = None
        url = event.get("data", {}).get("url") if isinstance(event.get("data"), dict) else None
        if url:
            # ref :181-188 — the reference's exact naive split
            parts = url.replace("https://", "").split("/")
            if len(parts) >= 3:
                container_name, blob_name = parts[1], "/".join(parts[2:])
            else:
                return 400, {"error": "Invalid blob URL format"}
        elif "blob_name" in event and "container_name" in event:
            blob_name = event["blob_name"]
            container_name = event["container_name"]
        if not blob_name or not container_name:
            return 400, {"error": "blob_name and container_name are required"}
        ext = blob_name.lower().split(".")[-1] if "." in blob_name else ""
        if ext not in ALL_SUPPORTED_EXTENSIONS:  # ref :190-194
            return 200, {
                "status": "skipped",
                "reason": f"Unsupported file type: {ext}",
            }
        try:
            self.core.process_file(blob_name, container_name)
        except Exception as e:
            return 500, {"status": "error", "error": str(e)}
        return 200, {
            "status": "success",
            "message": f"Processed {blob_name} from {container_name}",
        }

    # -- transport-level dispatch (shared by the stdlib server and tests) --

    def dispatch(self, method: str, path: str, body: Optional[dict] = None) -> tuple[int, dict]:
        route = (method.upper(), path.rstrip("/") or "/")
        if route == ("GET", "/health"):
            return self.health()
        if route == ("GET", "/ready"):
            return self.ready()
        if route == ("POST", "/process"):
            return self.manual_process(body or {})
        if route == ("POST", "/webhook"):
            return self.webhook(body if body is not None else {})
        return 404, {"error": "not found"}


def serve(handlers: ApiHandlers, host: str = "127.0.0.1", port: int = 0):
    """Wrap the handlers in a stdlib ThreadingHTTPServer. Returns the
    server object (call ``.serve_forever()`` / ``.shutdown()``; the bound
    port is ``server.server_address[1]`` when ``port=0``)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, status: int, payload: dict) -> None:
            raw = json.dumps(payload).encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_GET(self):  # noqa: N802 (stdlib API)
            self._reply(*handlers.dispatch("GET", self.path))

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._reply(400, {"error": "invalid JSON"})
                return
            self._reply(*handlers.dispatch("POST", self.path, body))

        def log_message(self, *a):  # silent in tests
            pass

    return ThreadingHTTPServer((host, port), Handler)
