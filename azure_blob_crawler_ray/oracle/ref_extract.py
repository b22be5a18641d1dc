"""Oracle extraction: the reference's FileExtractor semantics, exactly.

Reimplements the observable behavior of
``shared/processing/file_extractor.py``. Two parser paths feed the SAME
downstream semantics (markers, skips, strips, joins):

* REAL path — when the public ``PyPDF2`` / ``python-docx`` libraries are
  importable AND the payload carries the real file magic (``%PDF-`` /
  zip ``PK\\x03\\x04``), pages come from ``PdfReader(...).pages[*]
  .extract_text()`` (ref file_extractor.py:118-153) and paragraphs from
  ``Document(...).paragraphs`` (ref :155-204), including the reference's
  failure behavior (failed page -> skipped, unparsable file ->
  "PDF/DOCX processing failed");
* SYNTHETIC path — otherwise the "pdf" payload is form-feed-separated
  page texts standing in for the per-page extract_text() results and
  the "docx" payload is newline-separated paragraphs. The sandbox lacks
  both libraries, so tests exercise the real path only where available
  (pytest skip markers).

Output is the interleaved span model (BASELINE.json input_hint):
``full_content`` (text), plus ``spans`` = list of
``(kind, text, media_ref, offset)`` — text spans are the reference's
``pages`` list; binary files additionally yield one media span, the
target-side generalization of the reference's metadata-only row
(ref :103-106).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, List, Tuple

from ..config import (
    MAX_FILE_SIZE_MB,
    PAGE_PREFIX,
    PAGE_SUFFIX,
    PARAGRAPHS_PER_PAGE,
    SECTION_PREFIX,
    SUPPORTED_DOCUMENT_EXTENSIONS,
    SUPPORTED_STRUCTURED_EXTENSIONS,
    SUPPORTED_TEXT_EXTENSIONS,
    TEXT_ENCODING,
    TEXT_ENCODING_ERRORS,
)


try:  # real parsers — public libs, absent in this sandbox
    import PyPDF2 as _pypdf2
except ImportError:  # pragma: no cover
    _pypdf2 = None
try:
    import docx as _docx
except ImportError:  # pragma: no cover
    _docx = None


@dataclass
class Extracted:
    full_content: str
    pages: List[str]                      # text spans, reference order
    media_refs: List[str] = field(default_factory=list)
    skipped: bool = False
    skip_reason: str = ""

    def spans(self) -> List[dict]:
        """Interleaved span rows: text pages first (reference order), then
        media spans — offsets strictly increasing."""
        rows = [
            {"kind": "text", "text": p, "media_ref": "", "offset": i}
            for i, p in enumerate(self.pages)
        ]
        base = len(rows)
        rows += [
            {"kind": "media", "text": "", "media_ref": m, "offset": base + j}
            for j, m in enumerate(self.media_refs)
        ]
        return rows


def extension_of(blob_name: str) -> str:
    """ref file_extractor.py:82"""
    return blob_name.lower().split(".")[-1] if "." in blob_name else ""


def flatten_json(data: Any) -> str:
    """ref file_extractor.py:206-234 — keys as context, falsy values dropped."""
    if isinstance(data, dict):
        lines = []
        for k, v in data.items():
            s = flatten_json(v)
            if s:
                lines.append(f"{k}: {s}")
        return "\n".join(lines)
    if isinstance(data, list):
        lines = []
        for i, item in enumerate(data):
            s = flatten_json(item)
            if s:
                lines.append(f"[{i}] {s}")
        return "\n".join(lines)
    if isinstance(data, str):
        return data
    return str(data)


def _pdf_pages(raw_pages: List[str]) -> Tuple[str, List[str]]:
    """ref file_extractor.py:128-153 — empty pages skipped but numbering
    advances; spans carry '--- Page N ---' markers; full joined '\\n\\n'."""
    pages: List[str] = []
    full = ""
    for num, text in enumerate(raw_pages):
        if text.strip():
            span = f"{PAGE_PREFIX}{num + 1}{PAGE_SUFFIX}\n{text.strip()}"
            pages.append(span)
            full += span + "\n\n"
    if not pages:
        return "No readable text found in PDF", []
    return full.strip(), pages


def _docx_sections(paragraphs: List[str]) -> Tuple[str, List[str]]:
    """ref file_extractor.py:166-200 — 20 non-empty paragraphs per
    artificial section, remainder as a final section."""
    pages: List[str] = []
    full = ""
    acc = ""
    count = 0
    for para in paragraphs:
        p = para.strip()
        if not p:
            continue
        acc += p + "\n"
        count += 1
        if count >= PARAGRAPHS_PER_PAGE:
            if acc.strip():
                span = f"{SECTION_PREFIX}{len(pages) + 1}{PAGE_SUFFIX}\n{acc.strip()}"
                pages.append(span)
                full += span + "\n\n"
            acc = ""
            count = 0
    if acc.strip():
        span = f"{SECTION_PREFIX}{len(pages) + 1}{PAGE_SUFFIX}\n{acc.strip()}"
        pages.append(span)
        full += span + "\n\n"
    if not pages:
        return "No readable text found in document", []
    return full.strip(), pages


def _pdf_pages_real(payload: bytes) -> Tuple[str, List[str]]:
    """REAL PyPDF2 path (ref file_extractor.py:118-153): per-page
    extract_text with failed pages skipped (numbering still advances,
    ref :142-145), unparsable file -> ('PDF processing failed', [])."""
    import io

    try:
        reader = _pypdf2.PdfReader(io.BytesIO(payload))
        raw: List[str] = []
        for page in reader.pages:
            try:
                raw.append(page.extract_text())
            except Exception:
                raw.append("")  # skipped page; enumeration advances
        return _pdf_pages(raw)
    except Exception:
        return "PDF processing failed", []


def _docx_sections_real(payload: bytes) -> Tuple[str, List[str]]:
    """REAL python-docx path (ref file_extractor.py:155-204): paragraph
    texts through the same 20-per-section packing; unparsable file ->
    ('DOCX processing failed', [])."""
    import io

    try:
        doc = _docx.Document(io.BytesIO(payload))
        return _docx_sections([p.text for p in doc.paragraphs])
    except Exception:
        return "DOCX processing failed", []


def extract(blob_name: str, payload: bytes, media_ref: str = "") -> Extracted:
    """Full extraction dispatch — ref file_extractor.py:44-106 + size gate
    :68-76 (oversize -> ProcessingSkippedError, treated as skip-not-fail,
    ref servicebus_processor.py:221-231)."""
    size_mb = len(payload) / (1024 * 1024)
    if size_mb > MAX_FILE_SIZE_MB:
        return Extracted(
            "", [], skipped=True,
            skip_reason=f"File size ({size_mb:.2f}MB) exceeds limit ({MAX_FILE_SIZE_MB}MB)",
        )
    ext = extension_of(blob_name)

    if ext in SUPPORTED_TEXT_EXTENSIONS:
        text = payload.decode(TEXT_ENCODING, errors=TEXT_ENCODING_ERRORS)
        return Extracted(text, [text])  # single page (ref :84-86)

    if ext in SUPPORTED_STRUCTURED_EXTENSIONS:
        try:
            text = flatten_json(json.loads(payload.decode(TEXT_ENCODING)))
            return Extracted(text, [text])
        except json.JSONDecodeError:  # ref :93-95 — fall back to raw decode
            text = payload.decode(TEXT_ENCODING, errors=TEXT_ENCODING_ERRORS)
            return Extracted(text, [text])

    if ext in SUPPORTED_DOCUMENT_EXTENSIONS:
        if ext == "pdf":
            if _pypdf2 is not None and payload[:5] == b"%PDF-":
                full, pages = _pdf_pages_real(payload)
            else:
                decoded = payload.decode(TEXT_ENCODING, errors=TEXT_ENCODING_ERRORS)
                full, pages = _pdf_pages(decoded.split("\f"))
        else:  # docx / doc
            if _docx is not None and payload[:4] == b"PK\x03\x04":
                full, pages = _docx_sections_real(payload)
            else:
                decoded = payload.decode(TEXT_ENCODING, errors=TEXT_ENCODING_ERRORS)
                full, pages = _docx_sections(decoded.split("\n"))
        return Extracted(full, pages)

    # unknown extension -> metadata-only doc (ref :103-106), generalized
    # with a media span carrying the reference to the raw bytes
    meta = f"Binary file: {blob_name} (Size: {size_mb:.2f}MB, Type: {ext})"
    return Extracted(meta, [meta], media_refs=[media_ref] if media_ref else [])
