"""RIFF/WAVE PCM s16le codec — stdlib `wave` + numpy.

The audio sibling of functions/png.py: real bytes in the media
fixtures, real decode in operators/multimodal.decode_media (the r3
audio path was a documented stub). Scope: PCM 16-bit little-endian,
mono or interleaved multi-channel — the `pcm_s16le` codec the fixture
metadata already declared. Anything else (compressed, float, 24-bit)
raises ValueError, which decode_media degrades to the deterministic
stub exactly like a malformed PNG.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples, shape (n,) mono or (n, channels) → WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    channels = 1 if arr.ndim == 1 else arr.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples, sample_rate). Mono decodes to (n,),
    multi-channel to (n, channels). ValueError on anything that is not
    readable PCM s16le (one exception type so callers degrade
    uniformly)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"unsupported sample width {w.getsampwidth()} (PCM s16le only)"
                )
            channels = w.getnchannels()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a readable WAV payload: {e}") from e
    arr = np.frombuffer(raw, dtype="<i2")
    if channels > 1:
        arr = arr[: (len(arr) // channels) * channels].reshape(-1, channels)
    return arr, rate
