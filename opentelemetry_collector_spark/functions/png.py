"""Minimal stdlib PNG codec (RFC 2083) — no external imaging libraries.

The multimodal pipeline (operators/multimodal.py) treats media as
opaque binary columns; this module makes the `image/png` third of the
media fixtures REAL: a spec-conformant encoder used by the fixture
generator and a decoder used inside the mapInPandas feature stage.
Pure ``struct`` chunk walking + ``zlib`` inflate + scanline
defiltering (all five filter types incl. Paeth), numpy for the pixel
array only.

Supported subset (asserted, not silently wrong): 8-bit depth, color
types 0 (gray), 2 (RGB), 6 (RGBA), no interlace. That covers every
PNG the fixture generator emits and the common training-data case;
anything else raises ValueError so the caller can quarantine the row.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanline(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Forward filter (encoder side): raw scanline → filtered bytes."""
    cur16 = cur.astype(np.int16)
    left = np.zeros_like(cur16)
    left[bpp:] = cur16[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = cur16
    elif ftype == 1:
        out = cur16 - left
    elif ftype == 2:
        out = cur16 - up
    elif ftype == 3:
        out = cur16 - ((left + up) >> 1)
    elif ftype == 4:
        pred = np.fromiter(
            (_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, up, upleft)),
            dtype=np.int16,
            count=len(cur),
        )
        out = cur16 - pred
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes((out & 0xFF).astype(np.uint8))


def encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) / (h, w, 3) / (h, w, 4) → PNG bytes.

    filter_type applies to every scanline (0..4) — encoding with 4
    exercises the decoder's Paeth path in round-trip tests."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    bpp = channels  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        cur = a[y].reshape(-1)
        raw.append(filter_type)
        raw += _filter_scanline(filter_type, cur, prev, bpp)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for gray, (h, w, c) otherwise.

    Full defilter support (types 0-4); the Paeth predictor runs
    per-scanline with vectorized left/up terms where the filter allows
    (types 0-3) and the sequential recurrence only where required
    (types 1, 3, 4 depend on the defiltered left neighbor).

    EVERY malformed-input failure surfaces as ValueError (truncated
    chunks raise struct.error and corrupt deflate streams zlib.error
    internally — both wrapped) so callers have ONE quarantine type."""
    try:
        return _decode(payload)
    except ValueError:
        raise
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"malformed PNG: {type(e).__name__}: {e}") from e


def _decode(payload: bytes) -> np.ndarray:
    if payload[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    i = len(PNG_MAGIC)
    width = height = color = None
    idat = bytearray()
    while i < len(payload):
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(">I", payload[i + 8 + ln : i + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    channels = _CHANNELS[color]
    bpp = channels
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = row[0]
        cur = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            rec = cur
        elif ftype == 2:
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):
            rec = cur.copy()
            up = prev
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    rec[x] = (rec[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (rec[x] + ((a + int(up[x])) >> 1)) & 0xFF
                else:
                    c = int(up[x - bpp]) if x >= bpp else 0
                    rec[x] = (rec[x] + _paeth(a, int(up[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img
