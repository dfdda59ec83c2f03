"""OTLP/protobuf + OTLP/JSON wire formats for metrics and traces.

Closes the r3 gap: `otlp_roundtrip` / `proto_roundtrip` covered logs
only — a user landing metrics or traces as OTLP files had no
ingest/egress codec. Mirrors the reference's per-signal marshal
surface (pdata/pmetric/json.go:15, pdata/ptrace/json.go,
pdata/pmetric/encoding.go + pdata/ptrace/encoding.go Sizers) on top of
the primitives in functions/protowire.py. Field numbers and wire types
follow the public opentelemetry-proto schemas
(opentelemetry/proto/metrics/v1/metrics.proto,
opentelemetry/proto/trace/v1/trace.proto):

    NumberDataPoint:       7 attributes, 2 start_time_unix_nano (f64),
                           3 time_unix_nano (f64), 4 as_double (f64),
                           5 exemplars, 6 as_int (sfixed64)
    HistogramDataPoint:    9 attributes, 2 start, 3 time, 4 count (f64),
                           5 sum (double), 6 bucket_counts (packed f64),
                           7 explicit_bounds (packed double),
                           8 exemplars, 11 min, 12 max (double)
    Exemplar:              7 filtered_attributes, 2 time (f64),
                           3 as_double, 4 span_id (8 bytes),
                           5 trace_id (16 bytes), 6 as_int (sfixed64)
    ExpHistogramDataPoint: 1 attributes, 2 start, 3 time, 4 count (f64),
                           6 scale (sint32), 7 zero_count (f64),
                           8 positive Buckets{1 offset sint32,
                                              2 counts packed varint}
    SummaryDataPoint:      7 attributes, 2 start, 3 time, 4 count (f64),
                           5 sum (double), 6 quantile_values
                           {1 quantile double, 2 value double}
    Span:                  1 trace_id (16 bytes), 2 span_id (8 bytes),
                           4 parent_span_id, 5 name, 6 kind (varint),
                           7 start (f64), 8 end (f64),
                           15 status{3 code varint}

Like the logs codec, encoding runs as Arrow-batched ``mapInPandas`` at
the export boundary, never in the analytic hot path; decoders are full
wire parsers for the subset above so the CORRECTNESS gate can prove
round trips lossless. OTLP/JSON for these signals is Catalyst-side
(`to_json`/`from_json` over the typed datapoint structs — IDs hex,
like pdata/ptrace/json.go) and is exercised inline by the
`spans_roundtrip` / `metrics_roundtrip` driver queries.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from opentelemetry_collector_spark.functions.protowire import (
    _fields,
    _fixed32,
    _fixed64,
    _len_delim,
    _packed_varints,
    _tag,
    _unpack_varints,
    _varint,
    _varint_field,
)

# W3C trace-context bit layout of Span.Flags / Link.Flags
# (ptrace/generated_span.go:90-97; trace.proto SpanFlags enum):
# low byte = W3C trace flags (bit 0 sampled), bit 8 = context
# HAS_IS_REMOTE known, bit 9 = context IS_REMOTE.
SPAN_FLAGS_SAMPLED = 0x1
SPAN_FLAGS_HAS_IS_REMOTE = 0x100
SPAN_FLAGS_IS_REMOTE = 0x200

# ------------------------------------------------------------ primitives

SPAN_KINDS = (
    "SPAN_KIND_UNSPECIFIED",
    "SPAN_KIND_INTERNAL",
    "SPAN_KIND_SERVER",
    "SPAN_KIND_CLIENT",
    "SPAN_KIND_PRODUCER",
    "SPAN_KIND_CONSUMER",
)
STATUS_CODES = ("STATUS_CODE_UNSET", "STATUS_CODE_OK", "STATUS_CODE_ERROR")


def _double_field(field: int, v: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", float(v))


def _decode_double(raw: int) -> float:
    """wire-1 payloads arrive from _fields as sign-extended ints —
    reinterpret the 8 bytes as IEEE double."""
    return struct.unpack("<d", (raw & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))[0]


def _zigzag(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF


def _unzigzag(n: int) -> int:
    n &= 0xFFFFFFFFFFFFFFFF
    return (n >> 1) ^ -(n & 1)


def _sint_field(field: int, n: int) -> bytes:
    return _tag(field, 0) + _varint(_zigzag(int(n)))


def _packed_fixed64(field: int, vals: list[int]) -> bytes:
    return _len_delim(
        field,
        b"".join(
            (int(v) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little") for v in vals
        ),
    )


def _packed_doubles(field: int, vals: list[float]) -> bytes:
    return _len_delim(field, b"".join(struct.pack("<d", float(v)) for v in vals))


def _unpack_fixed64(buf: bytes) -> list[int]:
    return [
        int.from_bytes(buf[i : i + 8], "little") for i in range(0, len(buf), 8)
    ]


def _unpack_doubles(buf: bytes) -> list[float]:
    return [
        struct.unpack("<d", buf[i : i + 8])[0] for i in range(0, len(buf), 8)
    ]


def _str_attr(key: str, val: str) -> bytes:
    """KeyValue{key, AnyValue{string_value}} — metrics/span attribute."""
    return _len_delim(1, key.encode("utf-8")) + _len_delim(
        2, _len_delim(1, val.encode("utf-8"))
    )


def _decode_attrs(bufs: list[bytes]) -> dict[str, str]:
    out: dict[str, str] = {}
    for buf in bufs:
        k = v = None
        for f, _w, val in _fields(buf):
            if f == 1:
                k = val.decode("utf-8")
            elif f == 2:
                for f2, _w2, v2 in _fields(val):
                    if f2 == 1:
                        v = v2.decode("utf-8")
        out[k] = v
    return out


# ------------------------------------------------------------ Exemplar

def encode_exemplar(
    ts_ns: int,
    as_int: int | None = None,
    as_double: float | None = None,
    span_id_hex: str | None = None,
    trace_id_hex: str | None = None,
    filtered_attrs: list[tuple[str, str]] | None = None,
) -> bytes:
    """Exemplar message (metrics.proto: 2 time fixed64, 3 as_double,
    4 span_id bytes, 5 trace_id bytes, 6 as_int sfixed64,
    7 filtered_attributes KeyValue) — the metric→trace correlation
    record datapoints carry (pdata/pmetric/generated_exemplar.go)."""
    out = bytearray()
    out += _fixed64(2, ts_ns)
    if as_double is not None:
        out += _double_field(3, as_double)
    if span_id_hex:
        out += _len_delim(4, bytes.fromhex(span_id_hex))
    if trace_id_hex:
        out += _len_delim(5, bytes.fromhex(trace_id_hex))
    if as_double is None and as_int is not None:
        out += _fixed64(6, as_int)
    for k, v in filtered_attrs or []:
        out += _len_delim(7, _str_attr(k, v))
    return bytes(out)


def decode_exemplar(buf: bytes) -> dict:
    rec: dict = {"ts_ns": 0, "as_int": None, "as_double": None,
                 "span_id": None, "trace_id": None, "filtered_attributes": {}}
    attr_bufs = []
    for f, _w, val in _fields(buf):
        if f == 2:
            rec["ts_ns"] = val
        elif f == 3:
            rec["as_double"] = _decode_double(val)
        elif f == 4:
            rec["span_id"] = val.hex()
        elif f == 5:
            rec["trace_id"] = val.hex()
        elif f == 6:
            rec["as_int"] = val
        elif f == 7:
            attr_bufs.append(val)
    rec["filtered_attributes"] = _decode_attrs(attr_bufs)
    return rec


# ----------------------------------------------------- NumberDataPoint

def encode_number_point(
    attrs: list[tuple[str, str]],
    start_ns: int,
    ts_ns: int,
    as_int: int | None = None,
    as_double: float | None = None,
    exemplars: list[bytes] | None = None,
    flags: int = 0,
) -> bytes:
    out = bytearray()
    if start_ns:
        out += _fixed64(2, start_ns)
    out += _fixed64(3, ts_ns)
    if as_double is not None:
        out += _double_field(4, as_double)
    elif as_int is not None:
        out += _fixed64(6, as_int)  # as_int is sfixed64 on the wire
    for ex in exemplars or []:  # field 5 repeated Exemplar
        out += _len_delim(5, ex)
    for k, v in attrs:
        out += _len_delim(7, _str_attr(k, v))
    if flags:  # field 8 varint (generated_proto_numberdatapoint.go 0x40)
        out += _varint_field(8, flags)
    return bytes(out)


def decode_number_point(buf: bytes) -> dict:
    rec: dict = {"attributes": {}, "as_int": None, "as_double": None,
                 "start_ns": 0, "ts_ns": 0, "exemplars": [], "flags": 0}
    attr_bufs = []
    for f, _w, val in _fields(buf):
        if f == 2:
            rec["start_ns"] = val
        elif f == 3:
            rec["ts_ns"] = val
        elif f == 4:
            rec["as_double"] = _decode_double(val)
        elif f == 5:
            rec["exemplars"].append(decode_exemplar(val))
        elif f == 6:
            rec["as_int"] = val
        elif f == 7:
            attr_bufs.append(val)
        elif f == 8:
            rec["flags"] = val
    rec["attributes"] = _decode_attrs(attr_bufs)
    return rec


# -------------------------------------------------- HistogramDataPoint

def encode_histogram_point(
    attrs: list[tuple[str, str]],
    start_ns: int,
    ts_ns: int,
    count: int,
    bucket_counts: list[int],
    explicit_bounds: list[float],
    value_sum: float | None = None,
    value_min: float | None = None,
    value_max: float | None = None,
    exemplars: list[bytes] | None = None,
    flags: int = 0,
) -> bytes:
    out = bytearray()
    if start_ns:
        out += _fixed64(2, start_ns)
    out += _fixed64(3, ts_ns)
    out += _fixed64(4, count)
    if value_sum is not None:
        out += _double_field(5, value_sum)
    out += _packed_fixed64(6, bucket_counts)
    out += _packed_doubles(7, explicit_bounds)
    for ex in exemplars or []:  # field 8 repeated Exemplar
        out += _len_delim(8, ex)
    for k, v in attrs:
        out += _len_delim(9, _str_attr(k, v))
    if flags:  # field 10 varint (generated_proto_histogramdatapoint.go 0x50)
        out += _varint_field(10, flags)
    if value_min is not None:
        out += _double_field(11, value_min)
    if value_max is not None:
        out += _double_field(12, value_max)
    return bytes(out)


def decode_histogram_point(buf: bytes) -> dict:
    rec: dict = {
        "attributes": {}, "start_ns": 0, "ts_ns": 0, "count": 0,
        "sum": None, "min": None, "max": None,
        "bucket_counts": [], "explicit_bounds": [], "exemplars": [],
        "flags": 0,
    }
    attr_bufs = []
    for f, _w, val in _fields(buf):
        if f == 2:
            rec["start_ns"] = val
        elif f == 3:
            rec["ts_ns"] = val
        elif f == 4:
            rec["count"] = val
        elif f == 5:
            rec["sum"] = _decode_double(val)
        elif f == 6:
            rec["bucket_counts"] = _unpack_fixed64(val)
        elif f == 7:
            rec["explicit_bounds"] = _unpack_doubles(val)
        elif f == 8:
            rec["exemplars"].append(decode_exemplar(val))
        elif f == 9:
            attr_bufs.append(val)
        elif f == 10:
            rec["flags"] = val
        elif f == 11:
            rec["min"] = _decode_double(val)
        elif f == 12:
            rec["max"] = _decode_double(val)
    rec["attributes"] = _decode_attrs(attr_bufs)
    return rec


# ----------------------------------- ExponentialHistogramDataPoint

def encode_exp_histogram_point(
    attrs: list[tuple[str, str]],
    start_ns: int,
    ts_ns: int,
    count: int,
    scale: int,
    zero_count: int,
    positive_offset: int,
    positive_counts: list[int],
    flags: int = 0,
) -> bytes:
    out = bytearray()
    for k, v in attrs:
        out += _len_delim(1, _str_attr(k, v))
    if start_ns:
        out += _fixed64(2, start_ns)
    out += _fixed64(3, ts_ns)
    out += _fixed64(4, count)
    out += _sint_field(6, scale)
    out += _fixed64(7, zero_count)
    buckets = _sint_field(1, positive_offset) + _packed_varints(2, positive_counts)
    out += _len_delim(8, buckets)
    if flags:  # field 10 varint (generated_proto_exponentialhistogramdatapoint.go)
        out += _varint_field(10, flags)
    return bytes(out)


def decode_exp_histogram_point(buf: bytes) -> dict:
    rec: dict = {
        "attributes": {}, "start_ns": 0, "ts_ns": 0, "count": 0,
        "scale": 0, "zero_count": 0, "positive_offset": 0,
        "positive_counts": [], "flags": 0,
    }
    attr_bufs = []
    for f, w, val in _fields(buf):
        if f == 1:
            attr_bufs.append(val)
        elif f == 2:
            rec["start_ns"] = val
        elif f == 3:
            rec["ts_ns"] = val
        elif f == 4:
            rec["count"] = val
        elif f == 6:
            rec["scale"] = _unzigzag(val)
        elif f == 7:
            rec["zero_count"] = val
        elif f == 8:
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    rec["positive_offset"] = _unzigzag(v2)
                elif f2 == 2:
                    rec["positive_counts"] = _unpack_varints(v2)
        elif f == 10:
            rec["flags"] = val
    rec["attributes"] = _decode_attrs(attr_bufs)
    return rec


# ---------------------------------------------------- SummaryDataPoint

def encode_summary_point(
    attrs: list[tuple[str, str]],
    start_ns: int,
    ts_ns: int,
    count: int,
    value_sum: float,
    quantiles: list[tuple[float, float]],
    flags: int = 0,
) -> bytes:
    out = bytearray()
    if start_ns:
        out += _fixed64(2, start_ns)
    out += _fixed64(3, ts_ns)
    out += _fixed64(4, count)
    out += _double_field(5, value_sum)
    for q, v in quantiles:
        out += _len_delim(6, _double_field(1, q) + _double_field(2, v))
    for k, v in attrs:
        out += _len_delim(7, _str_attr(k, v))
    if flags:  # field 8 varint (generated_proto_summarydatapoint.go 0x40)
        out += _varint_field(8, flags)
    return bytes(out)


def decode_summary_point(buf: bytes) -> dict:
    rec: dict = {
        "attributes": {}, "start_ns": 0, "ts_ns": 0, "count": 0,
        "sum": 0.0, "quantiles": [], "flags": 0,
    }
    attr_bufs = []
    for f, _w, val in _fields(buf):
        if f == 2:
            rec["start_ns"] = val
        elif f == 3:
            rec["ts_ns"] = val
        elif f == 4:
            rec["count"] = val
        elif f == 5:
            rec["sum"] = _decode_double(val)
        elif f == 6:
            q = v = None
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:
                    q = _decode_double(v2)
                elif f2 == 2:
                    v = _decode_double(v2)
            rec["quantiles"].append((q, v))
        elif f == 7:
            attr_bufs.append(val)
        elif f == 8:
            rec["flags"] = val
    rec["attributes"] = _decode_attrs(attr_bufs)
    return rec


# ---------------------------------------------------------------- Span

def _aslist(v) -> list:
    """Normalize an Arrow list cell (None / list / numpy object array)
    to a plain list — numpy arrays poison truthiness (`arr or []`
    raises on len>1), so every repeated-field consumer goes through
    this."""
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return list(v)
    if hasattr(v, "tolist"):
        return v.tolist()
    return list(v)


def _attrs_field(field: int, attrs) -> bytes:
    """repeated KeyValue at the given field number (Span:9, Event:3,
    Link:4). Accepts [{'key':k,'value':v}] (the Arrow struct form) or
    [(k, v)] tuples; empty/None emits nothing (proto3 presence)."""
    if attrs is None or len(attrs) == 0:
        return b""
    out = bytearray()
    for a in attrs:
        k, v = (a["key"], a["value"]) if isinstance(a, dict) else (a[0], a[1])
        out += _len_delim(field, _str_attr(k, "" if v is None else v))
    return bytes(out)


def _encode_event(ev) -> bytes:
    """Span.Event: 1 time_unix_nano (fixed64), 2 name, 3 attributes
    (trace.proto Span.Event)."""
    ts = ev["ts_ns"] if isinstance(ev, dict) else ev[0]
    name = ev["name"] if isinstance(ev, dict) else ev[1]
    attrs = ev["attrs"] if isinstance(ev, dict) else ev[2]
    out = bytearray()
    if ts:
        out += _fixed64(1, int(ts))
    if name:
        out += _len_delim(2, name.encode("utf-8"))
    out += _attrs_field(3, attrs)
    return bytes(out)


def _encode_link(ln) -> bytes:
    """Span.Link: 1 trace_id, 2 span_id, 3 trace_state, 4 attributes,
    6 flags (fixed32 — generated_proto_spanlink.go tag 0x35;
    zero omitted, proto3 default)."""
    if isinstance(ln, dict):
        t, s, st, attrs = ln["trace_id"], ln["span_id"], ln["trace_state"], ln["attrs"]
        flags = ln.get("flags") or 0
    else:
        t, s, st, attrs = ln[0], ln[1], ln[2], ln[3]
        flags = (ln[4] if len(ln) > 4 and ln[4] is not None else 0)
    out = bytearray()
    if t:
        out += _len_delim(1, bytes.fromhex(t))
    if s:
        out += _len_delim(2, bytes.fromhex(s))
    if isinstance(st, str) and st:
        out += _len_delim(3, st.encode("utf-8"))
    out += _attrs_field(4, attrs)
    if flags:
        out += _fixed32(6, int(flags))
    return bytes(out)


def _status_field(code: str, message) -> bytes:
    """Status{2 message, 3 code} — field 2 before 3, canonical
    ascending order; empty status emits nothing."""
    payload = bytearray()
    if isinstance(message, str) and message:
        payload += _len_delim(2, message.encode("utf-8"))
    code_n = STATUS_CODES.index(code)
    if code_n:
        payload += _varint_field(3, code_n)
    return _len_delim(15, bytes(payload)) if payload else b""


def encode_span(
    trace_id_hex: str,
    span_id_hex: str,
    parent_span_id_hex: str | None,
    name: str,
    kind: str,
    start_ns: int,
    end_ns: int,
    status: str,
    trace_state: str | None = None,
    attrs=None,
    events=None,
    links=None,
    status_message: str | None = None,
    flags: int = 0,
) -> bytes:
    """Full Span content surface (trace.proto fields 1-9,11,13,15,16;
    pdata/ptrace/generated_span.go:53-199 + :90-97 Flags — fixed32
    field 16, W3C trace-flags byte + HAS/IS_REMOTE context bits, zero
    omitted) in canonical ascending field order. Legacy 8-arg calls
    emit byte-identical output to the r4 subset codec (the extended
    fields are absent → omitted)."""
    out = bytearray()
    out += _len_delim(1, bytes.fromhex(trace_id_hex))
    out += _len_delim(2, bytes.fromhex(span_id_hex))
    if isinstance(trace_state, str) and trace_state:
        out += _len_delim(3, trace_state.encode("utf-8"))
    if parent_span_id_hex is not None:
        out += _len_delim(4, bytes.fromhex(parent_span_id_hex))
    if name:
        out += _len_delim(5, name.encode("utf-8"))
    kind_n = SPAN_KINDS.index(kind)
    if kind_n:
        out += _varint_field(6, kind_n)
    out += _fixed64(7, start_ns)
    out += _fixed64(8, end_ns)
    out += _attrs_field(9, attrs)
    for ev in _aslist(events):
        out += _len_delim(11, _encode_event(ev))
    for ln in _aslist(links):
        out += _len_delim(13, _encode_link(ln))
    out += _status_field(status, status_message)
    if flags:
        out += _fixed32(16, int(flags))
    return bytes(out)


def _decode_attr_list(bufs: list[bytes], memo: dict | None = None) -> list[dict]:
    """KeyValue list preserving order + duplicates (the Span
    attrs/events/links form; _decode_attrs' dict collapses both). An
    optional per-batch memo short-circuits repeated byte-identical
    lists — span attrs are low-cardinality label sets (svc × tool) and
    link attrs are constant labels, so the batch decoder pays the parse
    once per distinct value set instead of once per row."""
    if memo is not None:
        key = tuple(bufs)
        got = memo.get(key)
        if got is not None:
            # copy-on-hit: rows must never alias the cached dicts — a
            # post-decode in-place edit would otherwise corrupt every
            # row sharing the entry (and only with a memo in play)
            return [dict(d) for d in got]
    out = []
    for buf in bufs:
        k = v = None
        for f, _w, val in _fields(buf):
            if f == 1:
                k = val.decode("utf-8")
            elif f == 2:
                for f2, _w2, v2 in _fields(val):
                    if f2 == 1:
                        v = v2.decode("utf-8")
        out.append({"key": k, "value": v})
    if memo is not None:
        memo[key] = out
    return out


def _decode_event(buf: bytes, memo: dict | None = None) -> dict:
    ev = {"ts_ns": 0, "name": "", "attrs": []}
    attr_bufs = []
    for f, _w, val in _fields(buf):
        if f == 1:
            ev["ts_ns"] = val
        elif f == 2:
            ev["name"] = val.decode("utf-8")
        elif f == 3:
            attr_bufs.append(val)
    ev["attrs"] = _decode_attr_list(attr_bufs, memo)
    return ev


def _decode_link(buf: bytes, memo: dict | None = None) -> dict:
    ln = {"trace_id": "", "span_id": "", "trace_state": None, "attrs": [],
          "flags": 0}
    attr_bufs = []
    for f, _w, val in _fields(buf):
        if f == 1:
            ln["trace_id"] = val.hex()
        elif f == 2:
            ln["span_id"] = val.hex()
        elif f == 3:
            ln["trace_state"] = val.decode("utf-8")
        elif f == 4:
            attr_bufs.append(val)
        elif f == 6:
            ln["flags"] = val
    ln["attrs"] = _decode_attr_list(attr_bufs, memo)
    return ln


def decode_span(buf: bytes, _memo: dict | None = None) -> dict:
    rec: dict = {
        "trace_id": "", "span_id": "", "parent_span_id": None,
        "name": "", "kind": SPAN_KINDS[0], "start_ns": 0, "end_ns": 0,
        "status": STATUS_CODES[0], "trace_state": None, "attrs": [],
        "events": [], "links": [], "status_message": None, "flags": 0,
    }
    attr_bufs: list[bytes] = []
    for f, _w, val in _fields(buf):
        if f == 1:
            rec["trace_id"] = val.hex()
        elif f == 2:
            rec["span_id"] = val.hex()
        elif f == 3:
            rec["trace_state"] = val.decode("utf-8")
        elif f == 4:
            rec["parent_span_id"] = val.hex()
        elif f == 5:
            rec["name"] = val.decode("utf-8")
        elif f == 6:
            rec["kind"] = SPAN_KINDS[val]
        elif f == 7:
            rec["start_ns"] = val
        elif f == 8:
            rec["end_ns"] = val
        elif f == 9:
            attr_bufs.append(val)
        elif f == 11:
            # events carry per-row attrs (unique exception messages /
            # latency values) — a memo there is all overhead, no hits
            rec["events"].append(_decode_event(val))
        elif f == 13:
            rec["links"].append(_decode_link(val, _memo))
        elif f == 15:
            for f2, _w2, v2 in _fields(val):
                if f2 == 2:
                    rec["status_message"] = v2.decode("utf-8")
                elif f2 == 3:
                    rec["status"] = STATUS_CODES[v2]
        elif f == 16:
            rec["flags"] = val
    rec["attrs"] = _decode_attr_list(attr_bufs, _memo)
    return rec


# ---------------------------------------------------------- Spark stages

SPAN_PROTO_SCHEMA = "conv_id string, turn_idx int, proto binary, proto_bytes long"
_ATTRS_DDL = "array<struct<key:string,value:string>>"
SPAN_ROUNDTRIP_SCHEMA = (
    "conv_id string, turn_idx int, trace_id string, span_id string, "
    "parent_span_id string, name string, kind string, status string, "
    "start_ns long, end_ns long, trace_state string, "
    f"attrs {_ATTRS_DDL}, "
    f"events array<struct<ts_ns:bigint,name:string,attrs:{_ATTRS_DDL}>>, "
    "links array<struct<trace_id:string,span_id:string,trace_state:string,"
    f"attrs:{_ATTRS_DDL},flags:int>>, "
    "status_message string, flags int"
)


_SPAN_TRACE_TAG = _tag(1, 2) + bytes([16])
_SPAN_ID_TAG = _tag(2, 2) + bytes([8])
_SPAN_PARENT_TAG = _tag(4, 2) + bytes([8])
_SPAN_START_TAG = _tag(7, 1)
_SPAN_END_TAG = _tag(8, 1)


def _encode_span_batch(pdf: pd.DataFrame) -> list[bytes]:
    """Vectorized-per-Arrow-batch Span marshal (the _encode_batch
    pattern): start/end timestamps become two numpy little-endian
    buffers; the low-cardinality (name, kind, status) tail fields are
    per-batch memos of complete wire bytes; per row only the three
    hex→bytes id conversions and one b''.join remain. Byte output
    pinned identical to encode_span by test_signalwire."""
    import numpy as np

    n = len(pdf)
    if pdf["start_ns"].isna().any() or pdf["end_ns"].isna().any():
        # same loud contract as _encode_number_batch: a silent NaN cast
        # would emit INT64_MIN on the wire (and demote the column to
        # float64, rounding valid ns epochs)
        raise ValueError("encode_spans: NULL start_ns/end_ns in batch")
    sbuf = (
        pdf["start_ns"].to_numpy(dtype="int64").astype("<i8").view("u1").reshape(n, 8).tobytes()
    )
    ebuf = (
        pdf["end_ns"].to_numpy(dtype="int64").astype("<i8").view("u1").reshape(n, 8).tobytes()
    )
    name_memo: dict = {}
    kind_memo: dict = {}
    status_memo: dict = {}

    def name_field(v) -> bytes:
        got = name_memo.get(v)
        if got is None:
            got = name_memo[v] = (
                _len_delim(5, v.encode("utf-8")) if isinstance(v, str) and v else b""
            )
        return got

    def kind_field(v) -> bytes:
        got = kind_memo.get(v)
        if got is None:
            k = SPAN_KINDS.index(v)
            got = kind_memo[v] = _varint_field(6, k) if k else b""
        return got

    def status_field(v) -> bytes:
        got = status_memo.get(v)
        if got is None:
            c = STATUS_CODES.index(v)
            got = status_memo[v] = _len_delim(15, _varint_field(3, c)) if c else b""
        return got

    # extended Span content (r5: TraceState, attrs, events, links,
    # Status.message) — per-row encoded; columns may be absent for
    # legacy subset callers (then every segment is b"")
    has_ext = "trace_state" in pdf.columns
    if has_ext:
        # plain object ndarrays: Series.iloc costs ~1 µs/row of pandas
        # indexing machinery — at 150k spans × 5 columns that's real
        # wall time in the export stage
        tstates = pdf["trace_state"].to_numpy(dtype=object)
        attrs_col = pdf["attrs"].to_numpy(dtype=object)
        events_col = pdf["events"].to_numpy(dtype=object)
        links_col = pdf["links"].to_numpy(dtype=object)
        smsg_col = pdf["status_message"].to_numpy(dtype=object)
        ts_memo: dict = {}
    # Span.Flags (fixed32 field 16) — low-cardinality, memoized; the
    # column may be absent for legacy subset callers (then flags=0 and
    # the field is omitted everywhere)
    has_flags = "flags" in pdf.columns
    if has_flags:
        flags_col = pdf["flags"].to_numpy(dtype=object)
        flags_memo: dict = {}

        def flags_field(i) -> bytes:
            v = flags_col[i]
            got = flags_memo.get(v)
            if got is None:
                n = int(v) if pd.notna(v) else 0
                got = flags_memo[v] = _fixed32(16, n) if n else b""
            return got
    else:

        def flags_field(i) -> bytes:
            return b""

    if has_ext:
        # r6 vectorization pass (the r5 content expansion cost +25% on
        # spans_roundtrip): span attrs are low-cardinality value sets →
        # memoize the COMPLETE field-9 bytes by (k, v) tuple; links get
        # constant 2-byte tag+length prefixes for the canonical 16/8-
        # byte ids plus a memoized (trace_state, flags) suffix — field
        # order 1,2,3,4,6 makes the suffix row-invariant. Non-canonical
        # ids or non-empty link attrs fall back to the scalar encoder
        # (parity pinned by test_signalwire).
        attrs_memo: dict = {}
        link_suffix_memo: dict = {}
        ev_name_memo: dict = {}

    def span_attrs_field(i) -> bytes:
        lst = _aslist(attrs_col[i])
        key = tuple(
            (a["key"], a["value"]) if isinstance(a, dict) else (a[0], a[1])
            for a in lst
        )
        got = attrs_memo.get(key)
        if got is None:
            got = attrs_memo[key] = _attrs_field(9, lst)
        return got

    def encode_links_fast(lst) -> bytes:
        parts = []
        for ln in lst:
            if isinstance(ln, dict):
                t, s, st = ln["trace_id"], ln["span_id"], ln["trace_state"]
                attrs, fl = ln["attrs"], (ln.get("flags") or 0)
            else:
                t, s, st, attrs = ln[0], ln[1], ln[2], ln[3]
                fl = ln[4] if len(ln) > 4 and ln[4] is not None else 0
            try:
                tb = bytes.fromhex(t) if isinstance(t, str) and t else b""
                sb = bytes.fromhex(s) if isinstance(s, str) and s else b""
                canonical = (not tb or len(tb) == 16) and (
                    not sb or len(sb) == 8
                )
            except ValueError:
                canonical = False
            if not canonical:
                parts.append(_len_delim(13, _encode_link(ln)))
                continue
            # link attrs are low-cardinality label sets (link.type=
            # parent/root here) — memoized with trace_state+flags as
            # ONE suffix (fields 3,4,6 are all row-position-invariant
            # after the ids)
            lst_a = _aslist(attrs)
            sk = (
                st,
                tuple(
                    (a["key"], a["value"]) if isinstance(a, dict) else (a[0], a[1])
                    for a in lst_a
                ),
                fl,
            )
            suf = link_suffix_memo.get(sk)
            if suf is None:
                b = (
                    _len_delim(3, st.encode("utf-8"))
                    if isinstance(st, str) and st
                    else b""
                )
                b += _attrs_field(4, lst_a)
                if fl:
                    b += _fixed32(6, int(fl))
                suf = link_suffix_memo[sk] = b
            payload = (
                (b"\x0a\x10" + tb if tb else b"")
                + (b"\x12\x08" + sb if sb else b"")
                + suf
            )
            parts.append(_len_delim(13, payload))
        return b"".join(parts)

    def encode_events_fast(lst) -> bytes:
        parts = []
        for ev in lst:
            if isinstance(ev, dict):
                ts, name, attrs = ev["ts_ns"], ev["name"], ev["attrs"]
            else:
                ts, name, attrs = ev[0], ev[1], ev[2]
            nb = ev_name_memo.get(name)
            if nb is None:
                nb = ev_name_memo[name] = (
                    _len_delim(2, name.encode("utf-8")) if name else b""
                )
            body = (
                # two's-complement mask: pre-1970 ts must not OverflowError
                # the whole batch (scalar _encode_event parity via _fixed64)
                (
                    b"\x09"
                    + (int(ts) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
                    if ts
                    else b""
                )
                + nb
                + _attrs_field(3, attrs)
            )
            parts.append(_len_delim(11, body))
        return b"".join(parts)

    def ext_segments(i) -> tuple[bytes, bytes, bytes, bytes, str | None]:
        if not has_ext:
            return b"", b"", b"", b"", None
        ts = tstates[i]
        tsb = ts_memo.get(ts)
        if tsb is None:
            tsb = ts_memo[ts] = (
                _len_delim(3, ts.encode("utf-8"))
                if isinstance(ts, str) and ts
                else b""
            )
        ab = span_attrs_field(i)
        ev = _aslist(events_col[i])
        evb = encode_events_fast(ev) if ev else b""
        lk = _aslist(links_col[i])
        lkb = encode_links_fast(lk) if lk else b""
        sm = smsg_col[i]
        return tsb, ab, evb, lkb, (sm if isinstance(sm, str) else None)

    out: list[bytes] = []
    for i, (t, s, p, nm, k, st) in enumerate(
        zip(
            pdf["trace_id"], pdf["span_id"], pdf["parent_span_id"],
            pdf["name"], pdf["kind"], pdf["status"],
        )
    ):
        try:
            tb, sb = bytes.fromhex(t), bytes.fromhex(s)
            pb = bytes.fromhex(p) if isinstance(p, str) else None
            canonical = (
                len(tb) == 16 and len(sb) == 8 and (pb is None or len(pb) == 8)
            )
        except ValueError:
            canonical = False
        tsb, ab, evb, lkb, sm = ext_segments(i)
        if not canonical:
            # foreign/malformed ids: the length-prefix constants assume
            # canonical 16/8-BYTE ids (validated on the DECODED bytes —
            # fromhex skips whitespace, so a length-32 STRING check
            # would under-fill the fixed prefix) — scalar encoder instead
            out.append(
                encode_span(t, s, p, nm, k,
                            int(pdf["start_ns"].iloc[i]),
                            int(pdf["end_ns"].iloc[i]), st,
                            trace_state=tstates[i] if has_ext else None,
                            attrs=_aslist(attrs_col[i]) if has_ext else None,
                            events=_aslist(events_col[i]) if has_ext else None,
                            links=_aslist(links_col[i]) if has_ext else None,
                            status_message=sm,
                            flags=int(flags_col[i])
                            if has_flags and pd.notna(flags_col[i]) else 0)
            )
            continue
        parent = _SPAN_PARENT_TAG + pb if pb is not None else b""
        status_seg = _status_field(st, sm) if sm else status_field(st)
        out.append(
            b"".join(
                (
                    _SPAN_TRACE_TAG, tb,
                    _SPAN_ID_TAG, sb,
                    tsb,
                    parent,
                    name_field(nm),
                    kind_field(k),
                    _SPAN_START_TAG, sbuf[i * 8 : i * 8 + 8],
                    _SPAN_END_TAG, ebuf[i * 8 : i * 8 + 8],
                    ab, evb, lkb,
                    status_seg,
                    flags_field(i),
                )
            )
        )
    return out


def encode_spans(df: DataFrame) -> DataFrame:
    """spans_from_turns rows → Span wire bytes + proto Sizer. Input
    needs conv_id, turn_idx, trace_id, span_id, parent_span_id, name,
    kind, status and PRE-CONVERTED start_ns/end_ns longs (Catalyst
    unix-nanos — timestamp handling stays JVM-side)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            protos = _encode_span_batch(pdf)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "proto": protos,
                    "proto_bytes": [len(p) for p in protos],
                }
            )

    return df.mapInPandas(gen, SPAN_PROTO_SCHEMA)


def decode_spans(df: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # shared per-batch attr-list memo: span/link attrs are
            # low-cardinality label sets, parsed once per distinct
            # byte-identical list instead of once per row
            memo: dict = {}
            rows = [decode_span(bytes(p), memo) for p in pdf["proto"]]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "trace_id": [r["trace_id"] for r in rows],
                    "span_id": [r["span_id"] for r in rows],
                    "parent_span_id": [r["parent_span_id"] for r in rows],
                    "name": [r["name"] for r in rows],
                    "kind": [r["kind"] for r in rows],
                    "status": [r["status"] for r in rows],
                    "start_ns": [r["start_ns"] for r in rows],
                    "end_ns": [r["end_ns"] for r in rows],
                    "trace_state": [r["trace_state"] for r in rows],
                    "attrs": [r["attrs"] for r in rows],
                    "events": [r["events"] for r in rows],
                    "links": [r["links"] for r in rows],
                    "status_message": [r["status_message"] for r in rows],
                    "flags": [r["flags"] for r in rows],
                }
            )

    return df.mapInPandas(gen, SPAN_ROUNDTRIP_SCHEMA)


NUMBER_PROTO_SCHEMA = "conv_id string, turn_idx int, proto binary, proto_bytes long"
NUMBER_ROUNDTRIP_SCHEMA = (
    "conv_id string, turn_idx int, svc string, ts_ns long, value long, "
    "flags int"
)


_NUM_TS_TAG = _tag(3, 1)
_NUM_VAL_TAG = _tag(6, 1)


def _encode_number_batch(pdf: pd.DataFrame) -> list[bytes]:
    """Vectorized-per-Arrow-batch NumberDataPoint marshal (the
    protowire._encode_batch pattern): timestamps and values become two
    numpy little-endian byte buffers, the low-cardinality svc
    attribute is a per-batch memo of complete wire bytes — per row
    only slicing and one b''.join remain. Byte output is pinned
    identical to encode_number_point by test_signalwire."""
    import numpy as np

    n = len(pdf)
    if pdf["ts_ns"].isna().any():
        # the scalar path failed loudly on NULL timestamps (int(None));
        # a silent na_value=0 would corrupt time_unix_nano instead
        raise ValueError("encode_number_points: NULL ts_ns in batch")
    ts = pdf["ts_ns"].to_numpy(dtype="int64").astype("<i8")
    tsbuf = ts.view("u1").reshape(n, 8).tobytes()
    if "_val_filled" in pdf.columns:
        # exact path: encode_number_points pre-split the nullable long
        # into a NON-NULL filled column + a null flag Spark-side, so the
        # Arrow batch never demotes to float64 and magnitudes past 2^53
        # stay bit-exact (the demotion happens at the Arrow→pandas
        # boundary — any in-batch repair would already be lossy)
        null_mask = pdf["_val_null"].to_numpy(dtype="bool")
        vals_np = pdf["_val_filled"].to_numpy(dtype="int64")
    else:
        vals = pdf["value"]
        null_mask = vals.isna().to_numpy()
        if null_mask.any() and vals.dtype.kind == "f":
            # mixed-null Arrow batch demoted long→float64; past 2^53 the
            # doubles are already rounded — fail loud like ts_ns does
            # rather than emit silently-corrupted sfixed64 payloads
            if np.abs(np.nan_to_num(vals.to_numpy())).max() >= 2**53:
                raise ValueError(
                    "encode_number_points: NULL-demoted float64 batch with "
                    "values beyond 2^53 — use the pre-split filled/flag path"
                )
        vals_np = vals.to_numpy(dtype="int64", na_value=0)
    vbuf = vals_np.astype("<i8").view("u1").reshape(n, 8).tobytes()
    svc_memo: dict = {}

    def svc_field(s) -> bytes:
        got = svc_memo.get(s)
        if got is None:
            got = svc_memo[s] = (
                _len_delim(7, _str_attr("svc", s)) if isinstance(s, str) else b""
            )
        return got

    # DataPointFlags (field 8 varint) — optional column, memoized; the
    # flagged rows are the rare gap points so the memo stays tiny
    if "flags" in pdf.columns:
        flags_np = pdf["flags"].to_numpy(dtype=object)
        flags_memo: dict = {}

        def flags_field(i) -> bytes:
            v = flags_np[i]
            got = flags_memo.get(v)
            if got is None:
                fn = int(v) if pd.notna(v) else 0
                got = flags_memo[v] = _varint_field(8, fn) if fn else b""
            return got
    else:

        def flags_field(i) -> bytes:
            return b""

    out: list[bytes] = []
    for i, s in enumerate(pdf["svc"]):
        val = b"" if null_mask[i] else _NUM_VAL_TAG + vbuf[i * 8 : i * 8 + 8]
        out.append(
            b"".join(
                (_NUM_TS_TAG, tsbuf[i * 8 : i * 8 + 8], val, svc_field(s),
                 flags_field(i))
            )
        )
    return out


def encode_number_points(df: DataFrame) -> DataFrame:
    """Gauge/Sum NumberDataPoints (as_int) with one svc attribute.
    Input: conv_id, turn_idx, svc, ts_ns (long), value (long).

    The nullable value column is split Spark-side into a non-null
    filled column + a null flag so Arrow batches carrying NULLs keep
    int64 dtype — a demoted float64 batch silently rounds magnitudes
    past 2^53 (sfixed64 losslessness would break on exactly the mixed
    NULL/huge-value batches the codec claims to handle)."""
    from pyspark.sql import functions as F

    df = df.withColumn(
        "_val_filled", F.coalesce(F.col("value"), F.lit(0).cast("long"))
    ).withColumn("_val_null", F.col("value").isNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            protos = _encode_number_batch(pdf)
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "proto": protos,
                    "proto_bytes": [len(p) for p in protos],
                }
            )

    return df.mapInPandas(gen, NUMBER_PROTO_SCHEMA)


def _decode_number_batch(protos) -> tuple[list, list, list, list]:
    """(svc, ts_ns, value, flags) per record. Fast path: records
    emitted by _encode_number_batch have the fixed layout [ts tag+8]
    [val tag+8][svc attr bytes][flags varint] — parsed by slicing,
    with the low-cardinality suffix memoized bytes→(svc, flags);
    anything else falls back to the generic wire parser (parity pinned
    by test)."""
    # memo value: ("ok", svc) when the suffix is PURE field-7
    # attributes (the canonical layout this codec emits), else
    # ("foreign", None) → the row takes the generic parser. Without
    # the full-layout validation a legal protobuf with non-canonical
    # field order (e.g. attributes before as_int) would silently lose
    # its value field (r4 review finding).
    suffix_memo: dict[bytes, tuple[str, str | None, int]] = {
        b"": ("ok", None, 0)
    }
    svcs: list = []
    tss: list = []
    vals: list = []
    flgs: list = []
    for p in protos:
        buf = bytes(p)
        fast = buf[:1] == _NUM_TS_TAG
        if fast:
            ts = int.from_bytes(buf[1:9], "little", signed=True)
            if buf[9:10] == _NUM_VAL_TAG:
                val = int.from_bytes(buf[10:18], "little", signed=True)
                rest = buf[18:]
            else:
                val = None
                rest = buf[9:]
            got = suffix_memo.get(rest)
            if got is None:
                try:
                    fields = list(_fields(rest))
                    # canonical layout: field-7 attrs, then at most ONE
                    # trailing field-8 flags varint
                    attr_fields = [x for x in fields if x[0] == 7]
                    flag_fields = [x for x in fields if x[0] == 8]
                    canonical = (
                        len(attr_fields) + len(flag_fields) == len(fields)
                        and len(flag_fields) <= 1
                        and all(f == 7 for f, _w, _v in fields[: len(attr_fields)])
                    )
                    if canonical:
                        got = (
                            "ok",
                            _decode_attrs([v for _f, _w, v in attr_fields]).get("svc"),
                            int(flag_fields[0][2]) if flag_fields else 0,
                        )
                    else:
                        got = ("foreign", None, 0)
                except Exception:  # noqa: BLE001 — malformed suffix: generic path decides
                    got = ("foreign", None, 0)
                suffix_memo[rest] = got
            if got[0] == "ok":
                svcs.append(got[1])
                tss.append(ts)
                vals.append(val)
                flgs.append(got[2])
                continue
        # foreign record shape (or non-attr suffix): full wire parse
        rec = decode_number_point(buf)
        svcs.append(rec["attributes"].get("svc"))
        tss.append(rec["ts_ns"])
        vals.append(rec["as_int"])
        flgs.append(rec["flags"])
    return svcs, tss, vals, flgs


def decode_number_points(df: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            svcs, tss, vals, flgs = _decode_number_batch(pdf["proto"])
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "svc": svcs,
                    "ts_ns": tss,
                    "value": pd.array(vals, dtype="Int64"),
                    "flags": flgs,
                }
            )

    return df.mapInPandas(gen, NUMBER_ROUNDTRIP_SCHEMA)
