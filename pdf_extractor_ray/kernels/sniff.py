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
_BOM = b"\xef\xbb\xbf"


def sniff_bytes(payload: bytes | None) -> str:
    """Classify payload bytes -> 'pdf' | 'html' | 'empty' | 'unknown'.
    Rule: %PDF- magic wins; else optional UTF-8 BOM + optional ASCII
    whitespace + '<' within the first 256 bytes is HTML."""
    if not payload:
        return "empty"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    head = payload[:256]
    if head.startswith(_BOM):  # BOM-prefixed HTML is common on the web
        head = head[3:]
    if head.lstrip(b" \t\r\n\f")[:1] == b"<":
        return "html"
    return "unknown"
