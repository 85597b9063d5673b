"""Content-type sniffing.

Reference analog: extension-based routing + magic-byte validation at ingest
(``/root/reference/backend/src/main.py:366-379`` and ``:394-399`` — rejects
PDFs whose bytes don't start with ``b'%PDF'``). Here there are no filenames,
only payload bytes, so the sniff is purely magic-based and never rejects —
unknown payloads flow through flagged (``content_type='unknown'``) so one
bad row can't fail a block.
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF-"
_HTML_PREFIXES = (b"<!doctype", b"<html", b"<head", b"<body", b"<!--", b"<?xml")


def sniff_bytes(payload: bytes | None) -> str:
    """Classify payload bytes -> 'pdf' | 'html' | 'empty' | 'unknown'."""
    if not payload:
        return "empty"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    head = payload[:256].lstrip(b" \t\r\n\f")
    if head[:1] == b"<":
        low = head[:16].lower()
        if low.startswith(_HTML_PREFIXES) or low[:1] == b"<":
            return "html"
    return "unknown"
