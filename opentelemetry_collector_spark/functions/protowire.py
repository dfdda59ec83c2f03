"""OTLP/protobuf wire format for log records — the proto Marshaler +
Sizer surface (pdata/plog/encoding.go:6-31, pdata/plog/json.go's
binary sibling).

Round 1 shipped JSON-only encoding with octet_length(text) standing in
for the proto Sizer; this module adds the REAL protobuf wire format so
byte-based batching can size on actual serialized bytes. Field numbers
and wire types follow the public opentelemetry-proto logs schema
(opentelemetry/proto/logs/v1/logs.proto):

    LogRecord:  1 time_unix_nano (fixed64), 2 severity_number (varint),
                3 severity_text (len), 5 body (AnyValue, len),
                6 attributes (repeated KeyValue, len)
    AnyValue:   oneof 1 string_value, 2 bool_value, 3 int_value (varint)
    KeyValue:   1 key (len), 2 value (AnyValue, len)

Encoding is per-record CPU work in the reference too (proto marshal is
a per-message loop); here it runs as Arrow-batched ``mapInPandas`` at
the export boundary — never in the analytic hot path. The decoder is a
full wire-format parser for the subset above, used to prove the round
trip is lossless (the CORRECTNESS gate compares decoded output against
the raw table).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ------------------------------------------------------------ primitives

def _varint(n: int) -> bytes:
    # protobuf semantics: negative int64 is encoded as its unsigned
    # 64-bit two's complement (always 10 bytes) — without the mask a
    # negative Python int never reaches 0 and the loop would spin
    n &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _fixed64(field: int, n: int) -> bytes:
    # two's-complement wrap for negative values (pre-1970 timestamps)
    return _tag(field, 1) + (int(n) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")


def _varint_field(field: int, n: int) -> bytes:
    return _tag(field, 0) + _varint(int(n))


# -------------------------------------------------------------- messages

def _any_str(s: str) -> bytes:
    return _len_delim(1, s.encode("utf-8"))


def _any_int(n: int) -> bytes:
    return _varint_field(3, n)


def _kv(key: str, any_value: bytes) -> bytes:
    return _len_delim(1, key.encode("utf-8")) + _len_delim(2, any_value)


def _fixed32(field: int, n: int) -> bytes:
    return _tag(field, 5) + (int(n) & 0xFFFFFFFF).to_bytes(4, "little")


def encode_log_record(
    ts_ns: int,
    severity_number: int,
    severity_text: str,
    body: str | None,
    attributes: list[tuple[str, bytes]],
    flags: int = 0,
    trace_id_hex: str | None = None,
    span_id_hex: str | None = None,
    observed_ts_ns: int = 0,
    event_name: str | None = None,
) -> bytes:
    """One LogRecord message (logs.proto field numbers, incl. the
    log↔trace correlation surface the reference treats first-class —
    generated_logrecord.go:52-158: 8 flags fixed32, 9 trace_id,
    10 span_id, 11 observed_time fixed64, 12 event_name; r5).

    Presence is encoded faithfully: a NULL body OMITS field 5 (proto
    message-field presence) instead of encoding '', so NULL round-trips
    as NULL — the r2 encoder normalized NULL→'' and the oracle gate
    could not see it (fixtures had no NULL bodies). The new fields
    default to absent, so legacy 5-arg calls emit byte-identical
    output."""
    out = bytearray()
    out += _fixed64(1, ts_ns)
    if severity_number:
        out += _varint_field(2, severity_number)
    if severity_text:
        out += _len_delim(3, severity_text.encode("utf-8"))
    if body is not None:
        out += _len_delim(5, _any_str(body))
    for key, av in attributes:
        out += _len_delim(6, _kv(key, av))
    if flags:
        out += _fixed32(8, flags)
    if trace_id_hex:
        out += _len_delim(9, bytes.fromhex(trace_id_hex))
    if span_id_hex:
        out += _len_delim(10, bytes.fromhex(span_id_hex))
    if observed_ts_ns:
        out += _fixed64(11, observed_ts_ns)
    if event_name:
        out += _len_delim(12, event_name.encode("utf-8"))
    return bytes(out)


# --------------------------------------------------------------- decoder

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _sext64(n: int) -> int:
    """Sign-extend a 64-bit wire value — int64 fields encode negatives
    as two's complement, so decode must mirror it (the encoder-side
    mask in _varint/_fixed64) or negative values fail to round-trip.

    Documented divergence: logs.proto declares time_unix_nano as
    UNSIGNED fixed64; this engine carries every 64-bit field as int64
    (the Arrow/Spark long schema), so a spec-conformant external value
    ≥ 2^63 (year ≥ 2262) would decode negative. Self-consistent with
    our own encoder and irrelevant within the int64 time range."""
    return n - (1 << 64) if n >= (1 << 63) else n


def _packed_varints(field: int, vals) -> bytes:
    """Packed repeated varints (uint64 or two's-complement int64 —
    _varint masks). Shared by the metric and pprof codecs."""
    return _len_delim(field, b"".join(_varint(int(v)) for v in vals))


def _unpack_varints(buf: bytes, signed: bool = False) -> list[int]:
    """Inverse; signed=True sign-extends each 64-bit value (int64
    fields — e.g. pprof Sample.value — encode negatives as two's
    complement, and an unsigned read would return 2^64+v)."""
    out, i = [], 0
    while i < len(buf):
        n, i = _read_varint(buf, i)
        out.append(_sext64(n) if signed else n)
    return out


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
            val = _sext64(val)
        elif wire == 1:
            val = _sext64(int.from_bytes(buf[i : i + 8], "little"))
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        else:  # wire 5 (fixed32) — e.g. the r5 LogRecord flags field
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        yield field, wire, val


def _decode_any(buf: bytes) -> object:
    for field, _w, val in _fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 2:
            return bool(val)
        if field == 3:
            return int(val)
    return None


def decode_log_record(buf: bytes) -> dict:
    rec: dict = {"attributes": {}}
    for field, _w, val in _fields(buf):
        if field == 1:
            rec["ts_ns"] = val
        elif field == 2:
            rec["severity_number"] = val
        elif field == 3:
            rec["severity_text"] = val.decode("utf-8")
        elif field == 5:
            rec["body"] = _decode_any(val)
        elif field == 6:
            k = v = None
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    k = v2.decode("utf-8")
                elif f2 == 2:
                    v = _decode_any(v2)
            rec["attributes"][k] = v
        elif field == 8:
            rec["flags"] = val
        elif field == 9:
            rec["trace_id"] = val.hex()
        elif field == 10:
            rec["span_id"] = val.hex()
        elif field == 11:
            rec["observed_ts_ns"] = val
        elif field == 12:
            rec["event_name"] = val.decode("utf-8")
    return rec


# ---------------------------------------------------------- Spark stages

PROTO_SCHEMA = "conv_id string, turn_idx int, proto binary, proto_bytes long"
ROUNDTRIP_SCHEMA = (
    "conv_id string, turn_idx int, body string, severity_text string, "
    "ts_ns long, svc string, flags int, trace_id string, span_id string, "
    "observed_ts_ns long, event_name string"
)


_TS_TAG = _tag(1, 1)  # field 1, fixed64


def _encode_batch(pdf: pd.DataFrame) -> list[bytes]:
    """Vectorized-per-Arrow-batch LogRecord marshal.

    Replaces the r2 per-row encode_log_record loop (≈15 Python calls +
    bytearray appends per record): the fixed64 timestamps are one numpy
    byte-buffer, and every low-cardinality field (severity number/text,
    role attr, svc attr) is a per-batch memo of its complete wire bytes
    — per row only the body utf-8 encode, two varints and one
    b''.join remain. Byte output is pinned identical to
    encode_log_record by tests/test_protowire.py.
    """
    import numpy as np

    n = len(pdf)
    # fixed64 timestamps: one vectorized ns buffer (NaT → 0, the proto
    # absent-timestamp default); pandas Timestamp.value is ns regardless
    # of the Arrow unit, to_numpy(datetime64[ns]) matches it
    ts = pdf["ts"]
    i8 = ts.to_numpy(dtype="datetime64[ns]").view("i8").astype("<i8")
    i8[ts.isna().to_numpy()] = 0
    tsbuf = i8.view("u1").reshape(n, 8).tobytes()

    sev_memo: dict = {}
    sevt_memo: dict = {}
    role_memo: dict = {}
    svc_memo: dict = {}

    def sev_field(v) -> bytes:
        key = int(v) if pd.notna(v) else 0
        got = sev_memo.get(key)
        if got is None:
            got = sev_memo[key] = _varint_field(2, key) if key else b""
        return got

    def sevt_field(v) -> bytes:
        got = sevt_memo.get(v)
        if got is None:
            got = sevt_memo[v] = (
                _len_delim(3, v.encode("utf-8")) if isinstance(v, str) and v else b""
            )
        return got

    def attr_field(key: str, v, memo: dict, skip_none: bool) -> bytes:
        got = memo.get(v)
        if got is None:
            if not isinstance(v, str):
                # role: encoded as '' (column is non-null by schema);
                # svc: OMITTED when absent — '' stays '' (presence fix)
                got = b"" if skip_none else _len_delim(6, _kv(key, _any_str("")))
            else:
                got = _len_delim(6, _kv(key, _any_str(v)))
            memo[v] = got
        return got

    # r5: log↔trace correlation tail (flags 8 fixed32, trace_id 9,
    # span_id 10, observed_time 11, event_name 12). flags/event_name
    # are low-cardinality memos; ids are per-row hex→bytes; observed ==
    # ts reuses the fixed64 buffer under tag 11. Columns are optional —
    # legacy callers emit byte-identical subset records.
    corr_cols = ("trace_id", "span_id", "flags", "event_name")
    has_corr = all(c in pdf.columns for c in corr_cols)
    if any(c in pdf.columns for c in corr_cols) and not has_corr:
        # a partially-present set would KeyError inside the executor
        # mid-batch (r5 review finding) — fail loud at the boundary
        missing = [c for c in corr_cols if c not in pdf.columns]
        raise ValueError(
            f"correlation columns incomplete: missing {missing} "
            f"(supply all of {corr_cols} or none)"
        )
    if has_corr:
        tids, sids = pdf["trace_id"], pdf["span_id"]
        flags_col, ev_col = pdf["flags"], pdf["event_name"]
    flag_memo: dict = {}
    ev_memo: dict = {}

    def flag_field(v) -> bytes:
        key = int(v) if pd.notna(v) else 0
        got = flag_memo.get(key)
        if got is None:
            got = flag_memo[key] = _fixed32(8, key) if key else b""
        return got

    def ev_field(v) -> bytes:
        got = ev_memo.get(v)
        if got is None:
            got = ev_memo[v] = (
                _len_delim(12, v.encode("utf-8"))
                if isinstance(v, str) and v
                else b""
            )
        return got

    tag5, tag1 = _tag(5, 2), _tag(1, 2)
    obs_tag = _tag(11, 1)
    tid_tag = _tag(9, 2) + bytes([16])
    sid_tag = _tag(10, 2) + bytes([8])
    out: list[bytes] = []
    for i, (sev_n, sev_t, text, role, svc) in enumerate(
        zip(pdf["severity_number"], pdf["level"], pdf["text"], pdf["role"], pdf["svc"])
    ):
        if text is None:
            body = b""
        else:
            enc = text.encode("utf-8")
            inner = tag1 + _varint(len(enc)) + enc
            body = tag5 + _varint(len(inner)) + inner
        if has_corr:
            t, sp = tids.iloc[i], sids.iloc[i]
            # non-hex / odd-length ids must degrade per-row, not kill the
            # whole Arrow batch: carry the raw utf-8 bytes through the
            # generic length-delimited path (same contract as the span
            # batch encoder's non-canonical-id branch)
            try:
                tb = bytes.fromhex(t) if isinstance(t, str) else None
            except ValueError:
                tb = t.encode("utf-8")
            try:
                sb = bytes.fromhex(sp) if isinstance(sp, str) else None
            except ValueError:
                sb = sp.encode("utf-8")
            tail = b"".join(
                (
                    flag_field(flags_col.iloc[i]),
                    # fixed tag+len prefixes assume canonical 16/8-byte
                    # ids; anything else goes through the generic
                    # length-delimited builder (same rule as the span
                    # batch encoder)
                    (tid_tag + tb if len(tb) == 16 else _len_delim(9, tb))
                    if tb is not None
                    else b"",
                    (sid_tag + sb if len(sb) == 8 else _len_delim(10, sb))
                    if sb is not None
                    else b"",
                    (obs_tag + tsbuf[i * 8 : i * 8 + 8])
                    if i8[i] != 0
                    else b"",
                    ev_field(ev_col.iloc[i]),
                )
            )
        else:
            tail = b""
        out.append(
            b"".join(
                (
                    _TS_TAG,
                    tsbuf[i * 8 : i * 8 + 8],
                    sev_field(sev_n),
                    sevt_field(sev_t),
                    body,
                    attr_field("role", role, role_memo, False),
                    attr_field("svc", svc, svc_memo, True),
                    tail,
                )
            )
        )
    return out


def encode_records(df: DataFrame, with_correlation: bool = True) -> DataFrame:
    """parsed transcript rows → OTLP LogRecord wire bytes + proto Sizer.

    Input needs conv_id, turn_idx, role, text, ts, level, svc,
    severity_number (pdata.severity_number). Arrow-batched; per-batch
    marshal is _encode_batch (numpy timestamps + memoized fields).

    with_correlation (r5): tool turns carry the log↔trace correlation
    fields via signals.with_log_correlation — ONE shared derivation
    with the span queries and the JSON envelope, so a log record
    always joins its span; flags = 1 (W3C sampled), event_name =
    role[:tool] (the tool column is optional), observed_time = ts.
    All derived Catalyst-side (JVM md5), not in Python."""
    if with_correlation and "trace_id" not in df.columns:
        from opentelemetry_collector_spark.functions.signals import (
            with_log_correlation,
        )

        df = with_log_correlation(df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            protos = _encode_batch(pdf)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "proto": protos,
                    "proto_bytes": [len(p) for p in protos],
                }
            )

    return df.mapInPandas(gen, PROTO_SCHEMA)


def decode_records(df: DataFrame) -> DataFrame:
    """LogRecord wire bytes → fields (round-trip verification stage)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_log_record(bytes(p)) for p in pdf["proto"]]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "body": [r.get("body") for r in rows],
                    "severity_text": [r.get("severity_text", "") for r in rows],
                    "ts_ns": [r.get("ts_ns", 0) for r in rows],
                    "svc": [r["attributes"].get("svc") for r in rows],
                    "flags": [r.get("flags", 0) for r in rows],
                    "trace_id": [r.get("trace_id") for r in rows],
                    "span_id": [r.get("span_id") for r in rows],
                    "observed_ts_ns": [r.get("observed_ts_ns", 0) for r in rows],
                    "event_name": [r.get("event_name", "") for r in rows],
                }
            )

    return df.mapInPandas(gen, ROUNDTRIP_SCHEMA)
