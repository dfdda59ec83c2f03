"""RIFF/AVI rawvideo (uncompressed RGB24 DIB) codec — pure stdlib.

The video sibling of functions/png.py / functions/wav.py: closes the
last multimodal stub (VERDICT r4 "next round" #10 — video decode was a
deterministic fake). Scope: the classic AVI 1.0 container with ONE
'vids' stream of uncompressed bottom-up RGB24 DIB frames ('00db'
chunks) — the `rawvideo` codec the fixture metadata declares. This is
a container WALK plus a pixel-layout transform, the same class of
stdlib-only codec as the PNG/WAV siblings; compressed codecs (h264
etc.) genuinely need external libraries and stay out of scope, so
anything not rawvideo RGB24 raises ValueError and decode_media
degrades to the deterministic stub exactly like a malformed PNG.

Layout notes (all public container knowledge — msdn AVI RIFF form):
  RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
             LIST('movi' 00db...) idx1)
- avih: dwMicroSecPerFrame, dwTotalFrames, dwWidth, dwHeight (+ flags)
- strh: fccType 'vids', fccHandler 'DIB ', dwRate/dwScale = fps
- strf: BITMAPINFOHEADER (biWidth, biHeight>0 → bottom-up rows,
  biBitCount=24, biCompression=0/BI_RGB)
- frames: rows bottom-up, pixels BGR, rows padded to 4 bytes — the
  DIB conventions; decode returns top-down RGB (h, w, 3) uint8.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """top-down RGB (h, w, 3) → bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # flip rows, swap channels
    stride = (w * 3 + 3) & ~3
    if stride == w * 3:
        return bgr.tobytes()
    out = np.zeros((h, stride), dtype=np.uint8)
    out[:, : w * 3] = bgr.reshape(h, w * 3)
    return out.tobytes()


def encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 frames (n, h, w, 3) RGB top-down → AVI bytes."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"frames must be (n, h, w, 3) uint8, got {arr.shape}")
    n, h, w, _ = arr.shape
    frame_bytes = [_frame_to_dib(f) for f in arr]
    buf_size = max(len(b) for b in frame_bytes)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            buf_size * fps,    # dwMaxBytesPerSec
            0,                 # dwPaddingGranularity
            0x10,              # dwFlags: AVIF_HASINDEX
            n,                 # dwTotalFrames
            0,                 # dwInitialFrames
            1,                 # dwStreams
            buf_size,          # dwSuggestedBufferSize
            w, h, 0, 0, 0, 0,  # dwWidth, dwHeight, reserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"DIB "
        + struct.pack(
            "<10I4H",
            0, 0, 0,           # dwFlags, wPriority+wLanguage, dwInitialFrames
            1, fps,            # dwScale, dwRate → fps
            0, n,              # dwStart, dwLength
            buf_size, 0xFFFFFFFF, 0,  # dwSuggestedBufferSize, dwQuality, dwSampleSize
            0, 0, w, h,        # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHHIIiiII",
            40, w, h,          # biSize, biWidth, biHeight (>0: bottom-up)
            1, 24,             # biPlanes, biBitCount
            0,                 # biCompression = BI_RGB
            len(frame_bytes[0]),  # biSizeImage
            0, 0, 0, 0,        # biXPels, biYPels, biClrUsed, biClrImportant
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_payload = b"".join(_chunk(b"00db", fb) for fb in frame_bytes)
    movi = _list(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to 'movi' fourcc
    idx_entries = []
    off = 4
    for fb in frame_bytes:
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, len(fb))  # AVIIF_KEYFRAME
        )
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for chunks in
    [start, end); LIST chunks yield their list-type as fourcc with the
    inner payload."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i : i + 4]
        (size,) = struct.unpack_from("<I", buf, i + 4)
        payload_start = i + 8
        if payload_start + size > end:
            raise ValueError("truncated RIFF chunk")
        yield fourcc, payload_start, size
        i = payload_start + size + (size % 2)


def decode(payload: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes → (uint8 frames (n, h, w, 3) RGB top-down, fps).
    ValueError on anything that is not rawvideo RGB24 AVI (one
    exception type so callers degrade uniformly)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    w = h = n = None
    usec_per_frame = 100_000
    bm_w = bm_h = bitcount = compression = None
    frame_chunks: list[tuple[int, int]] = []
    try:
        for fourcc, ps, sz in _walk(payload, 12, len(payload)):
            if fourcc != b"LIST":
                continue
            listtype = payload[ps : ps + 4]
            if listtype == b"hdrl":
                for f2, ps2, sz2 in _walk(payload, ps + 4, ps + sz):
                    if f2 == b"avih":
                        vals = struct.unpack_from("<14I", payload, ps2)
                        usec_per_frame, n, w, h = vals[0], vals[4], vals[8], vals[9]
                    elif f2 == b"LIST" and payload[ps2 : ps2 + 4] == b"strl":
                        for f3, ps3, _sz3 in _walk(payload, ps2 + 4, ps2 + sz2):
                            if f3 == b"strf":
                                (_bs, bm_w, bm_h, _pl, bitcount, compression) = (
                                    struct.unpack_from("<IiiHHI", payload, ps3)
                                )
            elif listtype == b"movi":
                for f2, ps2, sz2 in _walk(payload, ps + 4, ps + sz):
                    if f2 == b"00db" or f2 == b"00dc":
                        frame_chunks.append((ps2, sz2))
    except struct.error as e:
        raise ValueError(f"malformed AVI structure: {e}") from e
    if not (w and h and frame_chunks):
        raise ValueError("no video stream found")
    if bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported format (biBitCount={bitcount}, "
            f"biCompression={compression}; rawvideo RGB24 only)"
        )
    # strf's BITMAPINFOHEADER is the authoritative pixel layout:
    # biHeight < 0 is the legal top-down DIB variant (no row flip);
    # a width mismatch vs avih would silently mis-stride every row —
    # reject it rather than emit garbage frames
    top_down = bm_h is not None and bm_h < 0
    if bm_w is not None and (bm_w != w or abs(bm_h) != h):
        raise ValueError(
            f"strf dimensions {bm_w}×{bm_h} disagree with avih {w}×{h}"
        )
    stride = (w * 3 + 3) & ~3
    frames = np.empty((len(frame_chunks), h, w, 3), dtype=np.uint8)
    for i, (ps, sz) in enumerate(frame_chunks):
        if sz < stride * h:
            raise ValueError(f"frame {i}: {sz} bytes < expected {stride * h}")
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=ps)
        bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        frames[i] = bgr[:, :, ::-1] if top_down else bgr[::-1, :, ::-1]
    fps = round(1_000_000 / usec_per_frame) if usec_per_frame else 10
    return frames, fps
