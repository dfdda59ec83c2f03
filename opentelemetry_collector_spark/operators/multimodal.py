"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing for a training-data pipeline's media handling:
- media columns are `binary` with a typed metadata struct
  (media_type, width/height or sample_rate/duration, codec);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — the schema, partitioning, UDF signature and
  batch shape are real and tested;
- image/png rows decode for REAL via the stdlib codec
  (functions/png.py: struct chunk walk + zlib inflate + 0-4 defilter);
- audio/wav rows decode for REAL via the stdlib codec
  (functions/wav.py: `wave` + numpy → PCM s16le samples);
- video/avi rows decode for REAL via the stdlib codec (r5;
  functions/avi.py: RIFF walk → rawvideo RGB24 frames). Compressed
  video (h264 etc.) genuinely needs external codec libraries and
  degrades to ``_decode_stub``, the documented deterministic fake.

Scale notes: mapInPandas streams Arrow batches (no full-partition
materialization); media work is embarrassingly parallel so the only
plan concern is batch sizing (spark.sql.execution.arrow.
maxRecordsPerBatch) and skew from very large blobs — both handled by
repartitioning on a size bucket before the decode stage
(``partition_by_size``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha256 string, "
    "feature array<float>, decoded_shape array<int>, "
    "decoded_duration_ms int, sample_sum long, "
    "n_frames int, pixel_sum long"
)

RESIZE_SCHEMA = "media_id long, payload binary, width int, height int"


def _png_pixels(i: int, seed: int, width: int, height: int) -> np.ndarray:
    """Deterministic test image i: seeded noise + gradient; every third
    image grayscale, the rest RGB — exercises both decoder color types."""
    rng = np.random.RandomState(seed * 100_003 + i)
    if i % 3 == 0:
        grad = np.add.outer(np.arange(height), np.arange(width)) % 251
        return ((grad + rng.randint(0, 64, size=(height, width))) % 256).astype(
            np.uint8
        )
    return rng.randint(0, 256, size=(height, width, 3)).astype(np.uint8)


def _wav_samples(i: int, seed: int, n_samples: int) -> np.ndarray:
    """Deterministic test audio i: seeded int16 noise; every third
    audio row stereo — exercises both channel layouts."""
    rng = np.random.RandomState(seed * 100_003 + i)
    shape = (n_samples, 2) if i % 9 == 1 else (n_samples,)
    return rng.randint(-(2**15), 2**15, size=shape).astype("<i2")


AVI_FPS = 10


def _avi_frames(i: int, seed: int, n_frames: int, h: int, w: int) -> np.ndarray:
    """Deterministic test video i: seeded RGB noise + a per-frame
    gradient so frames differ (frame sampling has real content)."""
    rng = np.random.RandomState(seed * 100_003 + i)
    frames = rng.randint(0, 256, size=(n_frames, h, w, 3)).astype(np.uint8)
    grad = (np.add.outer(np.arange(h), np.arange(w)) % 128).astype(np.uint8)
    for f in range(n_frames):
        frames[f, :, :, 0] = (frames[f, :, :, 0] // 2 + grad + f) % 256
    return frames


def media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """Deterministic media rows — the pdata/testdata GenerateLogs analog
    for media. image/png rows carry REAL spec-conformant PNG bytes
    (functions/png.py encoder, filter type i%5 so all five filters
    appear in the fixtures); audio/wav rows carry REAL RIFF/WAVE PCM
    s16le bytes (functions/wav.py, mono + stereo, duration matching
    the metadata); video/avi rows carry REAL RIFF/AVI rawvideo RGB24
    bytes (functions/avi.py, r5 — frame count matching the metadata
    duration at 10 fps). Shared by synthetic_media (in-memory tests)
    and fixtures.ensure_media (the parquet the DuckDB oracle reads)."""
    from opentelemetry_collector_spark.functions import avi, png, wav

    rows = []
    for i in range(n):
        mt = ("image/png", "audio/wav", "video/avi")[i % 3]
        n_frames = 4 + i % 7
        meta = {
            "width": (
                64 + (i % 8) * 16
                if mt.startswith("image")
                else 16 + (i % 3) * 4 if mt.startswith("video") else None
            ),
            "height": (
                64 + (i % 5) * 16
                if mt.startswith("image")
                else 12 + (i % 2) * 4 if mt.startswith("video") else None
            ),
            "sample_rate": 16000 if mt.startswith("audio") else None,
            "duration_ms": (
                1000 + i * 10
                if mt.startswith("audio")
                else n_frames * 1000 // AVI_FPS if mt.startswith("video") else None
            ),
            "codec": {
                "image/png": "png",
                "audio/wav": "pcm_s16le",
                "video/avi": "rawvideo",
            }[mt],
        }
        if mt == "image/png":
            payload = png.encode(
                _png_pixels(i, seed, meta["width"], meta["height"]),
                filter_type=i % 5,
            )
        elif mt == "audio/wav":
            n_samples = meta["sample_rate"] * meta["duration_ms"] // 1000
            payload = wav.encode(
                _wav_samples(i, seed, n_samples), meta["sample_rate"]
            )
        else:
            payload = avi.encode(
                _avi_frames(i, seed, n_frames, meta["height"], meta["width"]),
                fps=AVI_FPS,
            )
        rows.append((i, mt, bytearray(payload), meta))
    return rows


def synthetic_media(
    spark: SparkSession, n: int = 64, seed: int = 42
) -> DataFrame:
    return spark.createDataFrame(media_rows(n, seed), MEDIA_SCHEMA)


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """STUB for the video decoder (and the degrade path for malformed
    image/audio payloads).

    Real implementation would be e.g.:
        import av  # frame decode
    The library does not ship in this container, so we derive a
    deterministic pseudo-decode from the payload bytes: same
    signature, same dtype/shape contract, fully testable plumbing.
    """
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        # empty blob: decode to a 1×1 zero frame instead of crashing the
        # whole Spark task inside mapInPandas
        return np.zeros((1, 1), dtype=np.float32)
    if media_type.startswith("image"):
        side = max(1, int(len(raw) ** 0.5) // 2)
        if raw.size < side * side:
            side = 1
        return raw[: side * side].reshape(side, side).astype(np.float32)
    return raw.astype(np.float32)


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """Media decode dispatch: PNG images decode for REAL (stdlib codec,
    functions/png.py — zlib inflate + full 0-4 defilter incl. Paeth),
    WAV audio decodes for REAL (functions/wav.py — PCM s16le samples),
    AVI rawvideo decodes for REAL (r5, functions/avi.py — RIFF walk →
    (n, h, w, 3) frames); compressed video falls through to the
    documented _decode_stub.

    A malformed/unsupported payload (truncated PNG, compressed WAV,
    h264 AVI — dirty corpora have all of them) must NOT kill the Spark
    task from inside mapInPandas: it degrades to the deterministic
    stub decode, exactly how the row would have been treated before
    the codec existed."""
    from opentelemetry_collector_spark.functions import avi, png, wav

    if media_type == "image/png" and payload[: len(png.PNG_MAGIC)] == png.PNG_MAGIC:
        try:
            return png.decode(payload).astype(np.float32)
        except ValueError:
            return _decode_stub(payload, media_type)
    if media_type == "audio/wav" and payload[:4] == b"RIFF":
        try:
            return wav.decode(payload)[0].astype(np.float32)
        except ValueError:
            return _decode_stub(payload, media_type)
    if media_type.startswith("video") and payload[:4] == b"RIFF":
        try:
            return avi.decode(payload)[0].astype(np.float32)
        except ValueError:
            return _decode_stub(payload, media_type)
    return _decode_stub(payload, media_type)


def extract_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: payload → small float vector.

    Arrow batches in, Arrow batches out; pure function of payload bytes.
    """

    from opentelemetry_collector_spark.functions import avi, wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shapes, hashes, nbytes = [], [], [], []
            durations, sample_sums = [], []
            frame_counts, pixel_sums = [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                arr = decode_media(bytes(payload), mt)
                flat = arr.ravel()
                chunks = np.array_split(flat, feature_dim)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
                shapes.append(list(arr.shape))
                hashes.append(hashlib.sha256(bytes(payload)).hexdigest())
                nbytes.append(len(bytes(payload)))
                # audio/video: duration + exact integer content sums
                # from the DECODED stream (the oracle checks them
                # against generation-time ground truth — a real decode
                # check, not the decoder checking itself)
                dur = ssum = nfr = psum = None
                if mt == "audio/wav":
                    try:
                        samples, rate = wav.decode(bytes(payload))
                        dur = round(1000 * samples.shape[0] / rate)
                        ssum = int(samples.sum(dtype="int64"))
                    except ValueError:
                        pass
                elif mt.startswith("video"):
                    try:
                        frames, fps = avi.decode(bytes(payload))
                        nfr = frames.shape[0]
                        # fps can legally decode to 0 (sub-1fps
                        # timelapse) — a ZeroDivision here would kill
                        # the task, not degrade (r5 review finding)
                        dur = round(1000 * nfr / fps) if fps else None
                        psum = int(frames.sum(dtype="int64"))
                    except ValueError:
                        pass
                durations.append(dur)
                sample_sums.append(ssum)
                frame_counts.append(nfr)
                pixel_sums.append(psum)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": nbytes,
                    "sha256": hashes,
                    "feature": feats,
                    "decoded_shape": shapes,
                    "decoded_duration_ms": pd.array(durations, dtype="Int32"),
                    "sample_sum": pd.array(sample_sums, dtype="Int64"),
                    "n_frames": pd.array(frame_counts, dtype="Int32"),
                    "pixel_sum": pd.array(pixel_sums, dtype="Int64"),
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """mapInPandas resize: nearest-neighbor over the stubbed decode
    (real impl: PIL Image.resize). Non-images pass through untouched
    dimensions (None)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, ws, hs = [], [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                if mt.startswith("image"):
                    arr = decode_media(bytes(payload), mt)
                    yi = (np.linspace(0, arr.shape[0] - 1, height)).astype(int)
                    xi = (np.linspace(0, arr.shape[1] - 1, width)).astype(int)
                    small = arr[np.ix_(yi, xi)].astype(np.uint8)
                    out_payload.append(small.tobytes())
                    ws.append(width)
                    hs.append(height)
                else:
                    out_payload.append(bytes(payload))
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return df.mapInPandas(gen, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    at every_ms intervals, carrying the REAL decoded frame's RGB bytes
    (r5, functions/avi.py; undecodable video — e.g. compressed —
    degrades to the hash-chain stub frame so dirty corpora never kill
    the task). Explodes rows — the canonical fan-out shape."""
    from opentelemetry_collector_spark.functions import avi

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, frames = [], [], []
            for mid, payload, mt, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"], pdf["meta"]
            ):
                if not mt.startswith("video"):
                    continue
                decoded = fps = None
                try:
                    decoded, fps = avi.decode(bytes(payload))
                except ValueError:
                    pass
                dur = (meta or {}).get("duration_ms") or 0
                if decoded is not None and fps:
                    dur = 1000 * decoded.shape[0] // fps
                for t in range(0, int(dur), every_ms):
                    ids.append(mid)
                    ts.append(t)
                    if decoded is not None and fps:
                        idx = min(t * fps // 1000, decoded.shape[0] - 1)
                        frames.append(decoded[idx].tobytes())
                    else:
                        frames.append(
                            hashlib.sha256(
                                bytes(payload) + t.to_bytes(4, "big")
                            ).digest()
                        )
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": ts, "frame": frames}
            )

    return df.mapInPandas(gen, "media_id long, frame_ms int, frame binary")


def partition_by_size(df: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Spread blobs uniformly by row-id hash before heavy decode work.

    Plain uniform spread (not size-stratified): repartition re-hashes
    the partitioning expression, so a derived 'size bucket' value
    collides buckets into partitions anyway; a per-row hash of the
    unique id gives the same expected balance without pretending
    otherwise. True size stratification would need repartitionByRange
    over octet_length — worth it only when blob sizes are heavy-tailed
    beyond what row-level balance absorbs."""
    return df.repartition(n_buckets, F.xxhash64(F.col("media_id")))
