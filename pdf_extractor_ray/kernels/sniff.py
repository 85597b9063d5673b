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

# image magics — the reference accepts jpg/jpeg/png/gif/bmp/tiff/webp
# (``main.py:367-379``, extension-based there; magic-based here)
_IMAGE_PREFIXES = (
    b"\xff\xd8\xff",            # jpeg
    b"\x89PNG\r\n\x1a\n",       # png
    b"GIF87a",                  # gif
    b"GIF89a",
    b"II*\x00",                 # tiff little-endian
    b"MM\x00*",                 # tiff big-endian
)


def _is_image(payload: bytes) -> bool:
    if payload.startswith(_IMAGE_PREFIXES):
        return True
    if payload.startswith(b"RIFF") and payload[8:12] == b"WEBP":
        return True
    # BMP: 'BM' alone is a weak 2-byte magic; require the 4 reserved zero
    # bytes at offset 6 to avoid classifying text that starts with "BM"
    if payload.startswith(b"BM") and payload[6:10] == b"\x00\x00\x00\x00":
        return True
    return False


def sniff_bytes(payload: bytes | None) -> str:
    """Classify payload bytes -> 'pdf' | 'image' | 'html' | 'empty' |
    'unknown'. Rule: %PDF- magic wins; then image magics; else optional
    UTF-8 BOM + optional ASCII whitespace + '<' within the first 256 bytes
    is HTML."""
    if not payload:
        return "empty"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    if _is_image(payload):
        return "image"
    head = payload[:256]
    if head.startswith(_BOM):  # BOM-prefixed HTML is common on the web
        head = head[3:]
    if head.lstrip(b" \t\r\n\f")[:1] == b"<":
        return "html"
    return "unknown"
