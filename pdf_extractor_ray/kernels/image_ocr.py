"""Deterministic FAKE OCR kernel for image payloads.

Real OCR (the reference's tesseract path,
``/root/reference/backend/src/extractors/tesseract_extractor.py:22-53``:
rasterize -> ``pytesseract.image_to_string`` -> strip) is
environment-blocked — no tesseract binary, no PIL (SURVEY.md §0). Per the
task brief the decode step is stubbed behind a CLEARLY-MARKED
deterministic fake while the Ray-side plumbing stays real: this kernel
derives reproducible pseudo-text from the payload bytes (format from the
magic, a word sequence seeded by the payload's md5, length scaled to the
payload size), so the image pathway — the reference's accepted
jpg/jpeg/png/gif/bmp/tiff/webp ingest types, ``main.py:367-379`` — has
end-to-end golden byte-identity coverage exactly like html/pdf. The
leading ``[ocr:<format>]`` token marks the output as fake; swapping in a
real OCR engine means replacing only ``_fake_words`` (the signature,
spans, and status contract stay).
"""

from __future__ import annotations

import hashlib

from .result import ExtractResult, Span

_MAGICS = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF8", "gif"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"BM", "bmp"),
]

# fixed 64-word OCR vocabulary (frozen: golden byte-identity depends on it)
_OCR_WORDS = (
    "ledger invoice total amount date page scan copy draft figure table "
    "caption note heading margin line item sum tax net gross due paid "
    "ref code серия номер kanji glyph stamp seal sign mark form field box "
    "row column cell header footer title index annex appendix exhibit "
    "clause section article paragraph term sheet memo brief report audit "
    "balance credit debit entry folio quire leaf verso"
).split()
assert len(_OCR_WORDS) == 64


def _image_format(payload: bytes) -> str:
    for magic, name in _MAGICS:
        if payload.startswith(magic):
            return name
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return "image"


def _fake_words(payload: bytes) -> list[str]:
    digest = hashlib.md5(payload).digest()
    n_words = min(48, 4 + len(payload) // 32)
    return [
        _OCR_WORDS[(digest[i % 16] + 31 * i) % 64] for i in range(n_words)
    ]


def extract_image_ocr(payload: bytes | None) -> ExtractResult:
    """bytes -> deterministic fake-OCR ExtractResult. Never raises; an
    empty payload yields status='empty' like the other kernels."""
    if not payload:
        return ExtractResult(text="", pages=[""], status="empty")
    fmt = _image_format(payload)
    text = f"[ocr:{fmt}] " + " ".join(_fake_words(payload))
    return ExtractResult(
        text=text,
        pages=[text],
        spans=[Span(0, len(text), "ocr")],
        status="ok",
    )
