"""Attribute-map transforms (pcommon.Map semantics, map.go:65-319)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import parse
from opentelemetry_collector_spark.operators import transform


def _attrs_df(transcripts):
    return transform.attrs_from_parsed(parse.with_parsed(transcripts, "native"))


def test_attrs_from_parsed_omits_nulls(transcripts):
    df = _attrs_df(transcripts)
    bad = df.filter(~F.col("valid")).select(F.size("attrs").alias("n")).distinct().collect()
    assert [r["n"] for r in bad] == [0]  # malformed rows → empty map
    good = df.filter(F.col("valid")).select(F.size("attrs").alias("n")).distinct().collect()
    assert [r["n"] for r in good] == [5]


def test_put_upserts(transcripts):
    df = _attrs_df(transcripts).filter(F.col("valid")).limit(10)
    out = df.select(
        transform.get(transform.put(F.col("attrs"), "svc", F.lit("override")), "svc").alias("v"),
        transform.get(transform.put(F.col("attrs"), "newkey", F.lit("nv")), "newkey").alias("w"),
    ).collect()
    assert all(r["v"] == "override" for r in out)
    assert all(r["w"] == "nv" for r in out)


def test_remove_and_remove_if(transcripts):
    df = _attrs_df(transcripts).filter(F.col("valid")).limit(10)
    out = df.select(
        transform.get(transform.remove(F.col("attrs"), "msg"), "msg").alias("gone"),
        F.size(
            transform.remove_if(F.col("attrs"), lambda k, v: k.startswith("lat"))
        ).alias("n"),
    ).collect()
    assert all(r["gone"] is None for r in out)
    assert all(r["n"] == 4 for r in out)


def test_rename_key(transcripts):
    df = _attrs_df(transcripts).filter(F.col("valid")).limit(5)
    out = df.select(
        transform.get(transform.rename_key(F.col("attrs"), "svc", "service"), "service").alias("v"),
        transform.get(transform.rename_key(F.col("attrs"), "svc", "service"), "svc").alias("old"),
    ).collect()
    assert all(r["v"] is not None and r["old"] is None for r in out)


def test_hash_attr_scrubs(transcripts):
    df = _attrs_df(transcripts).filter(F.col("valid")).limit(5)
    out = df.select(
        transform.get(transform.hash_attr(F.col("attrs"), "req_id"), "req_id").alias("h"),
        transform.get(F.col("attrs"), "req_id").alias("orig"),
    ).collect()
    for r in out:
        assert r["h"] != r["orig"] and len(r["h"]) == 64  # sha256 hex


def test_json_roundtrip(transcripts):
    df = _attrs_df(transcripts).filter(F.col("valid")).limit(20)
    out = df.select(
        F.col("attrs"),
        transform.from_raw_json(transform.as_raw_json(F.col("attrs"))).alias("back"),
    ).collect()
    for r in out:
        assert dict(r["attrs"]) == dict(r["back"])


def test_memorylimiter_contract(spark, transcripts):
    import pytest

    from opentelemetry_collector_spark.operators import memorylimiter as ml

    cfg = ml.MemoryLimiterConfig(limit_rows=10_000, spike_limit_rows=2_000)
    small = transcripts.limit(100)
    assert ml.check_admission(small, cfg) == (100, 0)
    assert ml.check_admission(transcripts, cfg) == (transcripts.count(), 0)
    with pytest.raises(ml.DataRefusedError):
        # tracked total pushes past the soft limit → whole batch refused
        ml.check_admission(transcripts, cfg, current_rows=7_000)
    # tighter config: whole batch refused, nothing partially admitted
    tight = ml.MemoryLimiterConfig(limit_rows=1_000, spike_limit_rows=500)
    with pytest.raises(ml.DataRefusedError):
        ml.check_admission(transcripts, tight)
    waves = ml.admit_in_chunks(transcripts, tight)
    per_wave = waves.groupBy("admission_wave").count().collect()
    assert sum(r["count"] for r in per_wave) == transcripts.count()
    assert len(per_wave) >= 12  # 6000 rows / 500 soft-limit
