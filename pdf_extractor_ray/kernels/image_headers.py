"""Real image-dimension parsing from container headers, stdlib-only.

The reference routes image uploads (jpg/jpeg/png/gif/bmp/tiff/webp,
``/root/reference/backend/src/main.py:367-379``) to OCR/vision engines.
Pixel decode needs codec libraries this environment lacks, but WIDTH and
HEIGHT live in the container header of every one of those formats and are
parseable with ``struct`` — so the multimodal ImageDecode stage reports
real dimensions wherever the bytes allow and falls back to its
deterministic fake only for unrecognized payloads.

All parsers are bounds-checked and never raise: malformed input returns
``None`` (the caller decides the fallback), matching the engine-wide
"kernels never throw" contract.
"""

from __future__ import annotations

import struct

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG SOF markers carrying frame dims: C0-CF minus C4 (DHT), C8 (JPG
# extension), CC (DAC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _png(p: bytes):
    # 8-byte signature, 4-byte length, b"IHDR", then BE u32 width/height
    if len(p) >= 24 and p.startswith(_PNG_SIG) and p[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", p, 16)
        return "png", w, h
    return None


def _gif(p: bytes):
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", p, 6)
        return "gif", w, h
    return None


def _bmp(p: bytes):
    if len(p) >= 26 and p[:2] == b"BM":
        hdr_size = struct.unpack_from("<I", p, 14)[0]
        if hdr_size == 12:  # BITMAPCOREHEADER: u16 dims
            w, h = struct.unpack_from("<HH", p, 18)
            return "bmp", w, h
        if hdr_size >= 40:  # BITMAPINFOHEADER+: i32 dims, height may be
            w, h = struct.unpack_from("<ii", p, 18)  # negative (top-down)
            return "bmp", abs(w), abs(h)
    return None


def _jpeg(p: bytes):
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(p)
    while i + 4 <= n:
        if p[i] != 0xFF:  # resync on stray bytes between segments
            i += 1
            continue
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: give up
            return None  # (scanning past SOS would walk entropy data)
        seg_len = struct.unpack_from(">H", p, i + 2)[0]
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return None
            h, w = struct.unpack_from(">HH", p, i + 5)
            return "jpeg", w, h
        i += 2 + seg_len
    return None


def _webp(p: bytes):
    if len(p) < 30 or p[:4] != b"RIFF" or p[8:12] != b"WEBP":
        return None
    chunk = p[12:16]
    if chunk == b"VP8X":  # extended: canvas = 24-bit LE minus one
        w = int.from_bytes(p[24:27], "little") + 1
        h = int.from_bytes(p[27:30], "little") + 1
        return "webp", w, h
    if chunk == b"VP8L":  # lossless: 14-bit packed after 0x2F byte
        if p[20] != 0x2F:
            return None
        bits = int.from_bytes(p[21:25], "little")
        return "webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if chunk == b"VP8 ":  # lossy: dims after the 3-byte start code
        if p[23:26] != b"\x9d\x01\x2a":
            return None
        w, h = struct.unpack_from("<HH", p, 26)
        return "webp", w & 0x3FFF, h & 0x3FFF
    return None


def _tiff(p: bytes):
    if len(p) < 8:
        return None
    if p[:4] == b"II*\x00":
        end = "<"
    elif p[:4] == b"MM\x00*":
        end = ">"
    else:
        return None
    try:
        ifd = struct.unpack_from(end + "I", p, 4)[0]
        n_entries = struct.unpack_from(end + "H", p, ifd)[0]
        w = h = None
        for k in range(n_entries):
            off = ifd + 2 + 12 * k
            tag, typ = struct.unpack_from(end + "HH", p, off)
            if tag not in (256, 257):
                continue
            if typ == 3:  # SHORT (stored in the first 2 value bytes)
                val = struct.unpack_from(end + "H", p, off + 8)[0]
            elif typ == 4:  # LONG
                val = struct.unpack_from(end + "I", p, off + 8)[0]
            else:
                continue
            if tag == 256:
                w = val
            else:
                h = val
        if w is not None and h is not None:
            return "tiff", w, h
    except struct.error:
        return None
    return None


_PARSERS = (_png, _jpeg, _gif, _bmp, _webp, _tiff)


def image_dims(payload: bytes | None) -> tuple[str, int, int] | None:
    """``(format, width, height)`` parsed from the container header, or
    ``None`` when the bytes are not a recognized/well-formed image."""
    if not payload:
        return None
    for parse in _PARSERS:
        try:
            got = parse(payload)
        except Exception:
            got = None
        if got is not None:
            return got
    return None
