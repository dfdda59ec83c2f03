"""OTLP protobuf wire format (pdata/plog/encoding.go analog)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import protowire as W


def test_golden_bytes():
    """Exact wire bytes for a hand-computed LogRecord — pins field
    numbers, wire types, varint and length-delimited framing."""
    got = W.encode_log_record(
        ts_ns=1,
        severity_number=9,
        severity_text="INFO",
        body="hi",
        attributes=[("role", W._any_str("user"))],
    )
    want = (
        b"\x09\x01\x00\x00\x00\x00\x00\x00\x00"  # 1: fixed64 ts=1
        b"\x10\x09"  # 2: varint severity 9
        b"\x1a\x04INFO"  # 3: severity_text
        b"\x2a\x04\x0a\x02hi"  # 5: body AnyValue{string "hi"}
        b"\x32\x0e\x0a\x04role\x12\x06\x0a\x04user"  # 6: KeyValue role=user
    )
    assert got == want


def test_varint_boundaries():
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        buf = W._varint(n)
        back, i = W._read_varint(buf, 0)
        assert back == n and i == len(buf)


@settings(max_examples=200, deadline=None)
@given(
    ts=st.integers(min_value=0, max_value=2**63 - 1),
    sev=st.integers(min_value=0, max_value=24),
    text=st.text(max_size=200),
    level=st.sampled_from(["", "DEBUG", "INFO", "WARN", "ERROR"]),
    svc=st.one_of(st.none(), st.text(min_size=1, max_size=20)),
)
def test_roundtrip_property(ts, sev, text, level, svc):
    attrs = [("role", W._any_str("tool"))]
    if svc:
        attrs.append(("svc", W._any_str(svc)))
    buf = W.encode_log_record(ts, sev, level, text, attrs)
    rec = W.decode_log_record(buf)
    assert rec.get("ts_ns") == ts
    assert rec.get("severity_number", 0) == sev
    assert rec.get("severity_text", "") == level
    assert rec["body"] == text
    assert rec["attributes"].get("svc") == svc if svc else "svc" not in rec["attributes"]


def test_spark_roundtrip_and_sizer(spark, sf_dir):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.functions import parse as parse_mod
    from opentelemetry_collector_spark.functions import pdata
    from opentelemetry_collector_spark.sources import tables

    df = tables.read_transcripts(spark, sf_dir).limit(500)
    parsed = parse_mod.with_parsed(df, "native").withColumn(
        "severity_number", pdata.severity_number(F.col("level"))
    )
    enc = W.encode_records(parsed).cache()
    try:
        # the Sizer: proto_bytes is the true serialized size
        bad = enc.filter(F.octet_length("proto") != F.col("proto_bytes"))
        assert bad.count() == 0
        dec = W.decode_records(enc)
        joined = dec.join(
            df.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
        )
        assert joined.filter(F.col("body") != F.col("text")).count() == 0
        assert joined.count() == 500
    finally:
        enc.unpersist()


def test_negative_and_null_robustness():
    """Negative ints encode as 10-byte two's-complement varints (real
    protobuf semantics) instead of hanging; pre-1970 fixed64 wraps."""
    buf = W._varint(-1)
    assert len(buf) == 10
    n, i = W._read_varint(buf, 0)
    assert n == 2**64 - 1 and i == 10
    rec = W.encode_log_record(-5, 0, "", "x", [("n", W._any_int(-7))])
    d = W.decode_log_record(rec)
    # int64 round trip: two's-complement encode + sign-extending decode
    assert d["ts_ns"] == -5
    assert d["attributes"]["n"] == -7


def test_batch_encoder_matches_per_record(spark, sf_dir):
    """_encode_batch (the vectorized marshal) must emit byte-identical
    wire records to the per-record encode_log_record reference."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2", "c3", "c4"],
            "turn_idx": [0, 1, 0, 0, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:01", None,
                 "1969-12-31 23:59:59", "2024-06-01 12:00:00"]
            ),
            "severity_number": [9, 0, 17, 13, 5],
            "level": ["INFO", None, "ERROR", "WARN", ""],
            "text": ["hello", None, "", "body with ünïcode", "x" * 300],
            "role": ["user", "tool", None, "assistant", "user"],
            "svc": [None, "svc-a", "", "svc-a", "svc-b"],
        }
    )
    got = W._encode_batch(pdf)
    for i, row in pdf.iterrows():
        attrs = [("role", W._any_str(row["role"] if isinstance(row["role"], str) else ""))]
        if isinstance(row["svc"], str):  # '' is PRESENT, None is absent
            attrs.append(("svc", W._any_str(row["svc"])))
        want = W.encode_log_record(
            ts_ns=int(row["ts"].value) if pd.notna(row["ts"]) else 0,
            severity_number=int(row["severity_number"]),
            severity_text=row["level"] if isinstance(row["level"], str) else "",
            body=row["text"],
            attributes=attrs,
        )
        assert got[i] == want, f"row {i}"


def test_null_body_and_empty_svc_roundtrip():
    """Presence fidelity (the r2 divergence): NULL body must decode as
    NULL (field omitted), and an empty-string svc attribute must
    survive as '' — not flip to NULL."""
    buf = W.encode_log_record(7, 0, "", None, [("svc", W._any_str(""))])
    rec = W.decode_log_record(buf)
    assert "body" not in rec
    assert rec["attributes"]["svc"] == ""
    buf2 = W.encode_log_record(7, 0, "", "", [])
    rec2 = W.decode_log_record(buf2)
    assert rec2["body"] == ""


def test_correlation_fields_golden_bytes():
    """r5 log↔trace correlation tail: flags (8, fixed32), trace_id (9),
    span_id (10), observed_time (11, fixed64), event_name (12) —
    hand-derived from logs.proto field numbers; legacy 5-arg calls
    stay byte-identical (fields absent)."""
    base = W.encode_log_record(7, 0, "", None, [])
    ext = W.encode_log_record(
        7, 0, "", None, [],
        flags=1, trace_id_hex="ab" * 16, span_id_hex="cd" * 8,
        observed_ts_ns=9, event_name="tool:db",
    )
    assert ext.startswith(base)
    assert ext[len(base):].hex() == (
        "4501000000"            # 8: fixed32 flags=1
        + "4a10" + "ab" * 16    # 9: trace_id (16 bytes)
        + "5208" + "cd" * 8     # 10: span_id (8 bytes)
        + "590900000000000000"  # 11: fixed64 observed=9
        + "6207" + b"tool:db".hex()  # 12: event_name
    )
    rec = W.decode_log_record(ext)
    assert rec["flags"] == 1 and rec["trace_id"] == "ab" * 16
    assert rec["span_id"] == "cd" * 8 and rec["observed_ts_ns"] == 9
    assert rec["event_name"] == "tool:db"


def test_batch_encoder_correlation_matches_scalar():
    """The vectorized tail (memoized flags/event_name, fixed id
    prefixes, shared ts buffer for observed_time) must equal the
    scalar encoder for tool and non-tool rows alike."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": [0, 1],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", None]),
            "severity_number": [9, 17],
            "level": ["INFO", "ERROR"],
            "text": ["hello", None],
            "role": ["tool", "user"],
            "svc": ["svc-a", None],
            "trace_id": ["ab" * 16, None],
            "span_id": ["cd" * 8, None],
            "flags": [1, 0],
            "event_name": ["tool:db", "user"],
        }
    )
    got = W._encode_batch(pdf)
    for i, row in pdf.iterrows():
        attrs = [("role", W._any_str(row["role"]))]
        if isinstance(row["svc"], str):
            attrs.append(("svc", W._any_str(row["svc"])))
        ts_ns = int(row["ts"].value) if pd.notna(row["ts"]) else 0
        want = W.encode_log_record(
            ts_ns=ts_ns,
            severity_number=int(row["severity_number"]),
            severity_text=row["level"],
            body=row["text"],
            attributes=attrs,
            flags=int(row["flags"]),
            trace_id_hex=row["trace_id"] if isinstance(row["trace_id"], str) else None,
            span_id_hex=row["span_id"] if isinstance(row["span_id"], str) else None,
            observed_ts_ns=ts_ns,
            event_name=row["event_name"],
        )
        assert got[i] == want, f"row {i}"


def test_partial_correlation_columns_fail_loud():
    """A frame carrying trace_id but not span_id/flags/event_name must
    raise at the batch boundary, not KeyError mid-executor (r5 review
    finding, confirmed)."""
    import pandas as pd
    import pytest

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"], "turn_idx": [0],
            "ts": pd.to_datetime(["2024-01-01"]),
            "severity_number": [9], "level": ["INFO"], "text": ["x"],
            "role": ["tool"], "svc": ["a"], "trace_id": ["ab" * 16],
        }
    )
    with pytest.raises(ValueError, match="correlation columns incomplete"):
        W._encode_batch(pdf)


def test_encode_records_without_tool_column(spark):
    """The documented minimal input contract (no tool column) must
    still work — event_name degrades to the role alone (r5 review
    finding: the derivation referenced a column outside the
    contract)."""
    from opentelemetry_collector_spark.functions import pdata

    df = spark.createDataFrame(
        [("c1", 0, "tool", "body", "2024-01-01 00:00:00", "INFO", "api")],
        "conv_id string, turn_idx int, role string, text string, "
        "ts string, level string, svc string",
    ).withColumn("severity_number", pdata.severity_number(F.col("level")))
    rows = W.decode_records(W.encode_records(df)).collect()
    assert rows[0]["event_name"] == "tool"
    assert rows[0]["trace_id"] is not None and rows[0]["flags"] == 1


def test_batch_encoder_non_hex_ids_degrade_per_row():
    """A non-hex or odd-length trace_id/span_id must not kill the whole
    Arrow batch (r5 advice): the row degrades to a generic
    length-delimited field carrying the raw utf-8 bytes, mirroring the
    span batch encoder's non-canonical-id path; sibling rows are
    untouched."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c1"],
            "turn_idx": [0, 1, 2],
            "ts": pd.to_datetime(["2024-01-01"] * 3),
            "severity_number": [9, 9, 9],
            "level": ["INFO"] * 3,
            "text": ["a", "b", "c"],
            "role": ["user"] * 3,
            "svc": ["svc-a"] * 3,
            "trace_id": ["not-hex-at-all", "abc", "ab" * 16],
            "span_id": ["cd" * 8, "zz", "cd" * 8],
            "flags": [0, 0, 0],
            "event_name": ["user"] * 3,
        }
    )
    got = W._encode_batch(pdf)  # must not raise
    assert len(got) == 3
    # the canonical row still decodes with its ids intact
    rec = W.decode_log_record(got[2])
    assert rec["trace_id"] == "ab" * 16 and rec["span_id"] == "cd" * 8
    # degraded rows carry the raw bytes in the id fields
    from opentelemetry_collector_spark.functions.protowire import _fields

    f9 = {f: v for f, _w, v in _fields(got[0])}
    assert f9[9] == b"not-hex-at-all"
