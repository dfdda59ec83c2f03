"""Multimodal plumbing: schema, Arrow batch shape, determinism.

The decode is a documented deterministic stub (no media libs in this
container); everything Spark-side — mapInPandas signatures, schemas,
explode shape, partitioning — is real.
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
    assert kinds == {"image/png", "audio/wav", "video/mp4"}


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
    n_videos = media.filter(F.col("media_type") == "video/mp4").count()
    out = frames.collect()
    assert len(out) > n_videos  # multiple frames per video
    assert {r["media_id"] for r in out} == {
        r["media_id"] for r in media.filter(F.col("media_type") == "video/mp4").collect()
    }
    for r in out[:5]:
        assert len(bytes(r["frame"])) == 32  # sha256 stub frame


def test_no_row_at_a_time_python(media):
    plan = mm.extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # mapInPandas is Arrow-batched
