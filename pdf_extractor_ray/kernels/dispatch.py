"""Single-document dispatch: sniff -> route to the matching kernel.

Reference analog: ``get_reader(file_type)`` factory routing
(``/root/reference/backend/src/factory.py:34-42``) + the worker task body
(``backend/src/tasks.py:154-264``), collapsed to one pure function shared
by the Ray stages and the oracle.
"""

from __future__ import annotations

from .result import ExtractResult
from .sniff import sniff_bytes
from .html_extract import extract_html
from .image_ocr import extract_image_ocr
from .pdf_extract import extract_pdf


def extract_document(payload: bytes | None) -> tuple[str, ExtractResult]:
    """Return (content_type, ExtractResult) for one document payload."""
    ctype = sniff_bytes(payload)
    return ctype, extract_routed(ctype, payload)


def extract_routed(ctype: str, payload: bytes | None) -> ExtractResult:
    """Kernel routing for an already-sniffed content type (the vectorized
    stage sniff is property-tested equal to ``sniff_bytes``, so routing on
    its column skips a second per-row sniff of every payload)."""
    if ctype == "pdf":
        return extract_pdf(payload)
    if ctype == "html":
        return extract_html(payload)
    if ctype == "empty":
        return ExtractResult(text="", pages=[""], status="empty")
    if ctype == "image":
        # the reference routes images to OCR/vision engines
        # (``main.py:367-379``); real OCR is environment-blocked, so the
        # pathway runs the clearly-marked DETERMINISTIC fake kernel —
        # golden byte-identity coverage like html/pdf (kernels/image_ocr)
        return extract_image_ocr(payload)
    return ExtractResult(text="", pages=[""], status="unknown")
