"""Stdlib PNG pixel decode/encode (zlib + unfilter) — makes the image
pathway end-to-end real for PNG payloads without PIL/libvips.

Scope (documented, validated by tests/test_registry_multimodal.py):
- decode: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette,
  gray+alpha, RGBA), all five scanline filters (None/Sub/Up/Average/
  Paeth), non-interlaced. Palette images expand through PLTE to RGB.
  Anything else (16-bit, 1/2/4-bit packed, Adam7) raises ``ValueError``
  — the caller surfaces that as the honest unsupported-codec seam.
- encode: filter-0 + zlib, 8-bit, gray/gray+alpha/RGB/RGBA — enough to
  emit real thumbnails as valid PNG bytes.

Reference analog: the rasterize step feeding OCR/vision
(``tesseract_extractor.py:22-53`` renders pages to pixel buffers before
recognition); here the decode feeds the thumbnail/feature stages of
``stages/multimodal.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (palette expanded to RGB).

    Raises ``ValueError`` on non-PNG bytes or unsupported variants."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    plte: np.ndarray | None = None
    idat: list[bytes] = []
    n = len(data)
    while pos + 8 <= n:
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        if len(chunk) != ln:
            raise ValueError("truncated chunk")
        pos += ln + 4  # skip CRC (integrity is the transport's problem)
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if interlace:
        raise ValueError("Adam7 interlace unsupported")
    if comp or filt:
        raise ValueError("nonstandard compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"unknown color type {ctype}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension image")
    c = _CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("pixel data length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftype = rows[:, 0]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for yi in range(h):
        f = int(ftype[yi])
        line = rows[yi, 1:]
        if f == 0:  # None
            cur = line.copy()
        elif f == 1:  # Sub: per-channel prefix sum along the row, mod 256
            cur = (
                np.cumsum(line.reshape(w, c).astype(np.uint32), axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average: sequential along the row
            cur = np.zeros(stride, np.uint8)
            ln_ = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                cur[i] = (ln_[i] + ((left + pv[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth: sequential along the row
            cur = np.zeros(stride, np.uint8)
            ln_ = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                left = int(cur[i - c]) if i >= c else 0
                ul = int(pv[i - c]) if i >= c else 0
                cur[i] = (ln_[i] + _paeth(left, int(pv[i]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f}")
        out[yi] = cur
        prev = cur
    img = out.reshape(h, w, c)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        img = plte[idx]
    return img


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 -> PNG bytes (filter 0, 8-bit)."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError("png_encode expects uint8")
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise ValueError(f"unsupported channel count {c}")
    body = np.zeros((h, w * c + 1), np.uint8)
    body[:, 1:] = img.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def thumbnail(img: np.ndarray, max_side: int) -> np.ndarray:
    """Deterministic nearest-neighbor downsample so max(h, w) <= max_side
    (identity when already small). Pure index arithmetic — bit-stable
    across platforms, unlike float resampling."""
    h, w = img.shape[:2]
    m = max(h, w)
    if m <= max_side:
        return img
    nh = max(1, (h * max_side) // m)
    nw = max(1, (w * max_side) // m)
    yi = (np.arange(nh, dtype=np.int64) * h) // nh
    xi = (np.arange(nw, dtype=np.int64) * w) // nw
    return img[yi][:, xi]
