"""pdata model mapping: severity, OTLP-JSON nesting, counts.

Concretely reproduces the reference's data-model surface on flat rows:

- severity: 24-level SeverityNumber enum (pdata/plog/severity_number.go:
  10-17 — Trace1..Fatal4; text levels map to the first slot of their
  band: DEBUG→5, INFO→9, WARN→13, ERROR→17).
- OTLP/JSON: plog's nested Resource→Scope→LogRecord envelope
  (pdata/plog/generated_logs.go hierarchy, JSON codec pdata/plog/
  json.go:13-56). ``nest_to_otlp`` rebuilds the envelope from flat rows
  (resource = conversation, scope = role, record = turn);
  ``flatten_from_otlp`` inverts it. Round-trip is lossless
  (tested), mirroring the generated proto↔pdata↔JSON round-trip tests
  (pdata/plog/json_test.go).
- record counts: LogRecordCount's triple-nested loop
  (pdata/plog/logs.go:16-29) is count(*) on flat rows; per-envelope
  counts fall out of the nesting aggregation.

Scale note: nesting uses collect_list per (conv_id, role) — bounded by
conversation size (the same bound the reference's in-memory batches
have), never a global collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.signals import (
    span_id_expr,
    trace_id_expr,
)

# text → SeverityNumber (first slot of each band)
SEVERITY_NUMBER = {
    "TRACE": 1,
    "DEBUG": 5,
    "INFO": 9,
    "WARN": 13,
    "ERROR": 17,
    "FATAL": 21,
}


def severity_number(level: Column) -> Column:
    expr = F.lit(0)  # SEVERITY_NUMBER_UNSPECIFIED
    out = None
    for text, num in SEVERITY_NUMBER.items():
        out = (out.when if out is not None else F.when)(
            level == text, F.lit(num)
        )
    return out.otherwise(expr).cast("int")


def oracle_severity_number(col: str = "level") -> str:
    whens = " ".join(
        f"WHEN {col} = '{t}' THEN {n}" for t, n in SEVERITY_NUMBER.items()
    )
    return f"cast(CASE {whens} ELSE 0 END AS int)"


def _cmp(*key_fns):
    """THE array_sort comparator builder (structs holding maps are not
    naturally orderable): lexicographic over the extracted keys, each
    key_fn mapping an element to an orderable Column. One definition —
    five sort sites previously hand-rolled the when/when/otherwise
    chain."""

    def comparator(l, r):  # noqa: E741 — l/r are the array_sort operands
        expr = None
        for fn in key_fns:
            lk, rk = fn(l), fn(r)
            step = F.when(lk < rk, -1).when(lk > rk, 1)
            expr = step if expr is None else expr.when(lk < rk, -1).when(lk > rk, 1)
        return expr.otherwise(0).cast("int")

    return comparator


def log_record(df_cols: dict[str, Column]) -> Column:
    """One LogRecord struct (generated_logrecord.go:52-158 fields,
    incl. the r5 log↔trace correlation tail: flags/traceId/spanId —
    hex IDs, the OTLP/JSON encoding; absent on non-tool records so
    to_json omits them)."""
    return F.struct(
        df_cols["ts"].alias("timeUnixNano"),
        df_cols["observed_ts"].alias("observedTimeUnixNano"),
        df_cols["severity_number"].alias("severityNumber"),
        df_cols["severity_text"].alias("severityText"),
        df_cols["body"].alias("body"),
        df_cols["attributes"].alias("attributes"),
        df_cols["event_name"].alias("eventName"),
        df_cols["flags"].alias("flags"),
        df_cols["trace_id"].alias("traceId"),
        df_cols["span_id"].alias("spanId"),
    )


def nest_to_otlp(parsed: DataFrame) -> DataFrame:
    """Flat parsed turns → one OTLP-JSON document per conversation.

    resource = conversation (conv_id as resource attribute), scope =
    role (instrumentation-scope analog), logRecords = turns in stable
    turn_idx order (arrival order within a pdata slice).

    Round-trip fidelity: body/ids/timestamps are lossless (tested). A
    NULL level maps to severityText "" — intentionally matching proto3,
    where string fields have no null and "" is the zero value the
    reference emits for unset severity.

    r5: the envelope carries the full ResourceLogs/ScopeLogs surface —
    schemaUrl at both levels (generated_resourcelogs.go:61-68,
    generated_scopelogs.go:61-68) and the complete InstrumentationScope
    {name, version, attributes, droppedAttributesCount}
    (pcommon/generated_instrumentationscope.go:44-90); the scope
    attributes are data-derived (the role-scope's distinct tool set),
    so the scope round trip proves the codec, not literal echoing.
    """
    rec = log_record(
        {
            "ts": F.unix_micros(F.col("ts").cast("timestamp")) * 1000,
            "observed_ts": F.unix_micros(F.col("ts").cast("timestamp")) * 1000,
            "severity_number": severity_number(F.col("level")),
            "severity_text": F.coalesce(F.col("level"), F.lit("")),
            "body": F.col("text"),
            "attributes": F.map_filter(
                F.create_map(
                    F.lit("svc"), F.col("svc"),
                    F.lit("latency_ms"), F.col("latency_ms").cast("string"),
                    F.lit("req_id"), F.col("req_id"),
                ),
                lambda k, v: v.isNotNull(),
            ),
            "event_name": F.concat_ws(":", F.col("role"), F.col("tool")),
            # correlation: tool turns join their span — THE shared
            # derivation (signals.trace_id_expr/span_id_expr), so the
            # envelope, the wire codec and the span queries cannot
            # drift (r5 review finding). NULL elsewhere → key omitted.
            "flags": F.when(F.col("role") == "tool", F.lit(1)),
            "trace_id": F.when(F.col("role") == "tool", trace_id_expr()),
            "span_id": F.when(F.col("role") == "tool", span_id_expr()),
        }
    )
    with_rec = parsed.select(
        "conv_id", "role", "turn_idx", "tool", rec.alias("record")
    )
    scopes = (
        with_rec.groupBy("conv_id", "role")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("record"))),
                _cmp(lambda e: e["turn_idx"]),
            ).alias("_recs"),
            # collect_set skips NULLs — the non-tool turns of the scope
            F.array_sort(F.collect_set("tool")).alias("_tools"),
        )
        .select(
            "conv_id",
            F.struct(
                F.struct(
                    F.col("role").alias("name"),
                    F.lit(SCOPE_VERSION).alias("version"),
                    # presence-faithful: a scope with no tool turns omits
                    # the key entirely (never "" — '' must stay distinct)
                    F.map_filter(
                        F.create_map(
                            F.lit("tools"),
                            F.when(
                                F.size("_tools") > 0,
                                F.concat_ws(",", F.col("_tools")),
                            ),
                        ),
                        lambda k, v: v.isNotNull(),
                    ).alias("attributes"),
                    F.lit(0).alias("droppedAttributesCount"),
                ).alias("scope"),
                F.transform(F.col("_recs"), lambda r: r["record"]).alias(
                    "logRecords"
                ),
                F.lit(SCHEMA_URL).alias("schemaUrl"),
            ).alias("scopeLogs"),
        )
    )
    return (
        scopes.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list("scopeLogs"), _cmp(lambda e: e["scope"]["name"])
            ).alias("scopeLogs")
        )
        .select(
            "conv_id",
            F.to_json(
                F.struct(
                    F.struct(
                        F.create_map(
                            F.lit("conv_id"), F.col("conv_id")
                        ).alias("attributes")
                    ).alias("resource"),
                    F.col("scopeLogs"),
                    F.lit(SCHEMA_URL).alias("schemaUrl"),
                )
            ).alias("otlp_json"),
        )
    )


# the OTel semantic-conventions schema family the fixture pipeline
# declares (ResourceLogs.schema_url / ScopeLogs.schema_url contract —
# the URL is a version pin, not a fetched resource)
SCHEMA_URL = "https://opentelemetry.io/schemas/1.21.0"
SCOPE_VERSION = "1.0.0"

OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "schemaUrl:string,"
    "scopeLogs:array<struct<schemaUrl:string,"
    "scope:struct<name:string,version:string,"
    "attributes:map<string,string>,droppedAttributesCount:int>,"
    "logRecords:array<struct<timeUnixNano:bigint,"
    "observedTimeUnixNano:bigint,severityNumber:int,severityText:string,"
    "body:string,attributes:map<string,string>,eventName:string,"
    "flags:int,traceId:string,spanId:string>>>>>"
)


def flatten_from_otlp(nested: DataFrame, json_col: str = "otlp_json") -> DataFrame:
    """Inverse of nest_to_otlp: OTLP-JSON docs → flat records."""
    d = nested.select(F.from_json(F.col(json_col), OTLP_SCHEMA).alias("d"))
    sl = d.select(
        F.col("d.resource.attributes")["conv_id"].alias("conv_id"),
        F.explode("d.scopeLogs").alias("s"),
    )
    recs = sl.select(
        "conv_id",
        F.col("s.scope.name").alias("role"),
        F.explode("s.logRecords").alias("r"),
    )
    return recs.select(
        "conv_id",
        "role",
        # integer division: `/ 1000` goes through double, whose 2^53
        # exact-integer range corrupts ~1.6% of ns-era timestamps by 1µs
        F.timestamp_micros(F.expr("r.timeUnixNano div 1000")).alias("ts"),
        F.col("r.severityNumber").alias("severity_number"),
        F.col("r.severityText").alias("severity_text"),
        F.col("r.body").alias("text"),
        F.col("r.attributes").alias("attributes"),
        F.col("r.eventName").alias("event_name"),
        F.col("r.flags").alias("flags"),
        F.col("r.traceId").alias("trace_id"),
        F.col("r.spanId").alias("span_id"),
    )


def flatten_scopes_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Scope-level inverse: one row per ScopeLogs with the full
    InstrumentationScope surface (name/version/attributes/
    droppedAttributesCount — pcommon/generated_instrumentationscope.go)
    and both schemaUrl levels, read back out of the document."""
    d = nested.select(F.from_json(F.col(json_col), OTLP_SCHEMA).alias("d"))
    sl = d.select(
        F.col("d.resource.attributes")["conv_id"].alias("conv_id"),
        F.col("d.schemaUrl").alias("resource_schema_url"),
        F.explode("d.scopeLogs").alias("s"),
    )
    return sl.select(
        "conv_id",
        "resource_schema_url",
        F.col("s.schemaUrl").alias("scope_schema_url"),
        F.col("s.scope.name").alias("role"),
        F.col("s.scope.version").alias("scope_version"),
        F.col("s.scope.attributes")["tools"].alias("scope_tools"),
        F.col("s.scope.droppedAttributesCount").alias("dropped_attrs"),
        F.size("s.logRecords").alias("n_records"),
    )


def log_record_count(nested: DataFrame) -> int:
    """LogRecordCount over the nested form (logs.go:16-29 triple loop →
    one sum of array sizes)."""
    d = nested.select(F.from_json(F.col("otlp_json"), OTLP_SCHEMA).alias("d"))
    n = d.select(
        F.aggregate(
            F.col("d.scopeLogs"),
            F.lit(0),
            lambda acc, s: acc + F.size(s["logRecords"]),
        ).alias("n")
    )
    # coalesce: sum over zero rows is NULL, but LogRecordCount() == 0
    return n.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]


# --------------------------------------------- ptrace OTLP/JSON envelope

_KVLIST_JSON_DDL = (
    "array<struct<key:string,value:struct<stringValue:string>>>"
)
SPANS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeSpans:array<struct<scope:struct<name:string>,"
    "spans:array<struct<traceId:string,spanId:string,traceState:string,"
    "parentSpanId:string,name:string,kind:string,"
    "startTimeUnixNano:bigint,endTimeUnixNano:bigint,"
    f"attributes:{_KVLIST_JSON_DDL},"
    "events:array<struct<timeUnixNano:bigint,name:string,"
    f"attributes:{_KVLIST_JSON_DDL}>>,"
    "links:array<struct<traceId:string,spanId:string,traceState:string,"
    f"attributes:{_KVLIST_JSON_DDL},flags:int>>,"
    "status:struct<message:string,code:string>,flags:int>>>>>"
)
_FLAT_ATTRS_DDL = "array<struct<key:string,value:string>>"
_FLAT_EVENTS_DDL = (
    f"array<struct<ts_ns:bigint,name:string,attrs:{_FLAT_ATTRS_DDL}>>"
)
_FLAT_LINKS_DDL = (
    "array<struct<trace_id:string,span_id:string,trace_state:string,"
    f"attrs:{_FLAT_ATTRS_DDL},flags:int>>"
)


def _attrs_to_json_form(attrs: Column) -> Column:
    """flat [(key, value)] → protojson [{key, value:{stringValue}}]
    (pdata/pcommon/value.go JSON encoding, string branch); empty →
    NULL so to_json omits the field (presence-faithful)."""
    return F.when(
        F.size(attrs) > 0,
        F.transform(
            attrs,
            lambda x: F.struct(
                x["key"].alias("key"),
                F.struct(x["value"].alias("stringValue")).alias("value"),
            ),
        ),
    )


def _attrs_from_json_form(attrs: Column) -> Column:
    """Inverse: absent → [] (the canonical flat form)."""
    return F.coalesce(
        F.transform(
            attrs,
            lambda x: F.struct(
                x["key"].alias("key"),
                x["value"]["stringValue"].alias("value"),
            ),
        ),
        F.array().cast(_FLAT_ATTRS_DDL),
    )


def nest_spans_to_otlp(spans: DataFrame) -> DataFrame:
    """Flat span rows → one ResourceSpans OTLP-JSON document per
    conversation (pdata/ptrace/json.go envelope: Resource → ScopeSpans
    → Span; resource = conversation, scope = the span's tool — the
    instrumentation-scope analog, mirroring nest_to_otlp's role
    scoping). Input: rich_spans_from_turns output (or the lean
    spans_from_turns shape — absent content columns are filled empty).
    IDs stay hex strings (OTLP/JSON ID encoding); the full Span
    content surface — traceState, attributes, events, links,
    status.message (pdata/ptrace/generated_span.go:53-199) — is
    carried with proto3 presence (empty/NULL → key omitted)."""
    for c, ddl in (
        ("trace_state", "string"),
        ("status_message", "string"),
        ("attrs", _FLAT_ATTRS_DDL),
        ("events", _FLAT_EVENTS_DDL),
        ("links", _FLAT_LINKS_DDL),
        ("flags", "int"),
    ):
        if c not in spans.columns:
            spans = spans.withColumn(c, F.lit(None).cast(ddl))
    span_struct = F.struct(
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        F.col("trace_state").alias("traceState"),
        F.col("parent_span_id").alias("parentSpanId"),
        F.col("name").alias("name"),
        F.col("kind").alias("kind"),
        F.col("start_ns").alias("startTimeUnixNano"),
        F.col("end_ns").alias("endTimeUnixNano"),
        _attrs_to_json_form(F.col("attrs")).alias("attributes"),
        F.when(
            F.size("events") > 0,
            F.transform(
                F.col("events"),
                lambda e: F.struct(
                    e["ts_ns"].alias("timeUnixNano"),
                    e["name"].alias("name"),
                    _attrs_to_json_form(e["attrs"]).alias("attributes"),
                ),
            ),
        ).alias("events"),
        F.when(
            F.size("links") > 0,
            F.transform(
                F.col("links"),
                lambda ln: F.struct(
                    ln["trace_id"].alias("traceId"),
                    ln["span_id"].alias("spanId"),
                    ln["trace_state"].alias("traceState"),
                    _attrs_to_json_form(ln["attrs"]).alias("attributes"),
                    # zero flags → key omitted (proto3 default, json.go)
                    F.when(ln["flags"] != 0, ln["flags"]).alias("flags"),
                ),
            ),
        ).alias("links"),
        F.struct(
            F.col("status_message").alias("message"),
            F.col("status").alias("code"),
        ).alias("status"),
        F.when(F.col("flags") != 0, F.col("flags")).alias("flags"),
    )
    scopes = (
        spans.withColumn("_tool", F.split(F.col("name"), "/").getItem(0))
        .groupBy("conv_id", "_tool")
        .agg(
            F.array_sort(
                F.collect_list(span_struct), _cmp(lambda e: e["spanId"])
            ).alias("_spans")
        )
        .select(
            "conv_id",
            F.struct(
                F.struct(
                    F.col("_tool").alias("name"),
                    F.lit(SCOPE_VERSION).alias("version"),
                ).alias("scope"),
                F.col("_spans").alias("spans"),
                F.lit(SCHEMA_URL).alias("schemaUrl"),
            ).alias("scopeSpans"),
        )
    )
    return (
        scopes.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list("scopeSpans"), _cmp(lambda e: e["scope"]["name"])
            ).alias("scopeSpans")
        )
        .select(
            "conv_id",
            F.to_json(
                F.struct(
                    F.struct(
                        F.create_map(F.lit("conv_id"), F.col("conv_id")).alias(
                            "attributes"
                        )
                    ).alias("resource"),
                    F.col("scopeSpans"),
                    F.lit(SCHEMA_URL).alias("schemaUrl"),
                )
            ).alias("otlp_json"),
        )
    )


def flatten_spans_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse of nest_spans_to_otlp: ResourceSpans docs → flat spans."""
    d = nested.select(F.from_json(F.col(json_col), SPANS_OTLP_SCHEMA).alias("d"))
    sc = d.select(
        F.col("d.resource.attributes")["conv_id"].alias("conv_id"),
        F.explode("d.scopeSpans").alias("s"),
    )
    sp = sc.select("conv_id", F.explode("s.spans").alias("p"))
    return sp.select(
        "conv_id",
        F.col("p.traceId").alias("trace_id"),
        F.col("p.spanId").alias("span_id"),
        F.col("p.parentSpanId").alias("parent_span_id"),
        F.col("p.name").alias("name"),
        F.col("p.kind").alias("kind"),
        F.col("p.status.code").alias("status"),
        F.col("p.startTimeUnixNano").alias("start_ns"),
        F.col("p.endTimeUnixNano").alias("end_ns"),
        F.col("p.traceState").alias("trace_state"),
        _attrs_from_json_form(F.col("p.attributes")).alias("attrs"),
        F.coalesce(
            F.transform(
                F.col("p.events"),
                lambda e: F.struct(
                    e["timeUnixNano"].alias("ts_ns"),
                    e["name"].alias("name"),
                    _attrs_from_json_form(e["attributes"]).alias("attrs"),
                ),
            ),
            F.array().cast(_FLAT_EVENTS_DDL),
        ).alias("events"),
        F.coalesce(
            F.transform(
                F.col("p.links"),
                lambda ln: F.struct(
                    ln["traceId"].alias("trace_id"),
                    ln["spanId"].alias("span_id"),
                    ln["traceState"].alias("trace_state"),
                    _attrs_from_json_form(ln["attributes"]).alias("attrs"),
                    F.coalesce(ln["flags"], F.lit(0)).alias("flags"),
                ),
            ),
            F.array().cast(_FLAT_LINKS_DDL),
        ).alias("links"),
        F.col("p.status.message").alias("status_message"),
        # absent key = proto3 zero (mirror of the nest's omit-on-zero)
        F.coalesce(F.col("p.flags"), F.lit(0)).alias("flags"),
    )


def span_count(nested: DataFrame, json_col: str = "otlp_json") -> int:
    """Traces.SpanCount() over the nested form (the logs.go triple-loop
    analog — one sum of array sizes)."""
    d = nested.select(F.from_json(F.col(json_col), SPANS_OTLP_SCHEMA).alias("d"))
    n = d.select(
        F.aggregate(
            F.col("d.scopeSpans"), F.lit(0), lambda acc, s: acc + F.size(s["spans"])
        ).alias("n")
    )
    return n.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]


# -------------------------------------------- pmetric OTLP/JSON envelope

METRICS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "gauge:struct<dataPoints:array<struct<timeUnixNano:bigint,"
    "asInt:bigint,attributes:map<string,string>,flags:int>>>>>>>>"
)


def _resource_envelope(svc_col: Column, metrics_array: Column) -> Column:
    """THE ResourceMetrics envelope wrapper (shared by every metric-type
    nest): resource attrs OMIT the svc key when NULL
    (presence-faithful), one 'otelcol-spark' scope (with version),
    schemaUrl at both levels (generated_resourcemetrics.go /
    generated_scopemetrics.go SchemaUrl)."""
    return F.to_json(
        F.struct(
            F.struct(
                F.map_filter(
                    F.create_map(F.lit("svc"), svc_col),
                    lambda k, v: v.isNotNull(),
                ).alias("attributes")
            ).alias("resource"),
            F.array(
                F.struct(
                    F.struct(
                        F.lit("otelcol-spark").alias("name"),
                        F.lit(SCOPE_VERSION).alias("version"),
                    ).alias("scope"),
                    metrics_array.alias("metrics"),
                    F.lit(SCHEMA_URL).alias("schemaUrl"),
                )
            ).alias("scopeMetrics"),
            F.lit(SCHEMA_URL).alias("schemaUrl"),
        )
    )


def _explode_to_metrics(nested: DataFrame, schema: str, json_col: str) -> DataFrame:
    """THE envelope explode chain (both flattens): document → (svc
    from resource attrs, one row per metric)."""
    d = nested.select(F.from_json(F.col(json_col), schema).alias("d"))
    sm = d.select(
        F.col("d.resource.attributes")["svc"].alias("_svc"),
        F.explode("d.scopeMetrics").alias("s"),
    )
    return sm.select("_svc", F.explode("s.metrics").alias("m"))


def _nest_windowed_points(
    points: DataFrame,
    metric_struct_fn,
    doc_window_ns: int,
) -> DataFrame:
    """THE (service × time-window) NumberDataPoint document machinery,
    shared by the gauge and sum nests (they differ only in the metric
    wrapper struct — metric_struct_fn maps the sorted datapoint array
    column to it). Window assignment uses integer `div`, not double
    division: ns epochs exceed double's 2^53 exact-integer range, so
    `floor(ts_ns / w)` can misplace points within ~128 ns of an hour
    boundary into the adjacent document (r5 review finding — for the
    sum branch that would break cumulative-restart/document
    alignment)."""
    flags_src = (
        F.col("flags") if "flags" in points.columns else F.lit(None).cast("int")
    )
    dp = F.struct(
        F.col("ts_ns").alias("timeUnixNano"),
        F.col("value").alias("asInt"),
        F.map_filter(
            F.create_map(
                F.lit("conv_id"), F.col("conv_id"),
                F.lit("turn_idx"), F.col("turn_idx").cast("string"),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("attributes"),
        # DataPointFlags (number_data_point_flags.go) — zero omitted
        F.when(flags_src != 0, flags_src).alias("flags"),
    )
    # unique (conv, turn) orders datapoints deterministically. The sort
    # keys ride NEXT TO the datapoint struct (r7): comparing via
    # e["attributes"][k] cost two map element_at probes per comparison
    # in the O(n log n) sort; plain struct fields are direct reads. The
    # keys are stripped after the sort, so the document is unchanged.
    by_key = _cmp(lambda e: e["c"], lambda e: e["t"])
    keyed_dp = F.struct(
        F.col("conv_id").alias("c"), F.col("turn_idx").alias("t"), dp.alias("p")
    )
    sorted_dps = F.transform(
        F.array_sort(F.collect_list(keyed_dp), by_key), lambda e: e["p"]
    )
    return (
        points.groupBy(
            F.col("svc").alias("_svc"),
            F.expr(f"ts_ns div {int(doc_window_ns)}").alias("_win"),
        )
        .agg(sorted_dps.alias("_dps"))
        .select(
            F.col("_svc").alias("svc"),
            F.col("_win").alias("doc_window"),
            _resource_envelope(
                F.col("_svc"), F.array(metric_struct_fn(F.col("_dps")))
            ).alias("otlp_json"),
        )
    )


def nest_metrics_to_otlp(
    points: DataFrame,
    metric_name: str = "turn_latency_ms",
    doc_window_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """Flat gauge points → ResourceMetrics OTLP-JSON documents, one per
    (service, time window) (pdata/pmetric/json.go envelope: Resource →
    ScopeMetrics → Metric → Gauge → NumberDataPoint; resource = the
    service — the natural metrics resource — datapoint attributes
    carry conv/turn). The doc_window_ns bound is load-bearing at
    scale: one-document-per-service would collect_list the service's
    ENTIRE point history onto a single reducer (measured 3× slower at
    600k points even locally); real OTLP producers batch per export
    interval for the same reason. OTLP permits many ResourceMetrics
    documents per resource, so the flatten is unchanged.
    Input: (conv_id, turn_idx, svc, ts_ns, value); NULL value maps to
    the omitted oneof (asInt null in JSON), NULL svc to a document
    whose resource attribute map simply OMITS the key (presence-
    faithful: svc='' stays distinct from NULL through the round
    trip)."""
    return _nest_windowed_points(
        points,
        lambda dps: F.struct(
            F.lit(metric_name).alias("name"),
            F.struct(dps.alias("dataPoints")).alias("gauge"),
        ),
        doc_window_ns,
    )


def flatten_metrics_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse of nest_metrics_to_otlp: documents → flat gauge points.
    A resource map without the svc key flattens back to NULL svc;
    svc='' round-trips as ''."""
    m = _explode_to_metrics(nested, METRICS_OTLP_SCHEMA, json_col)
    dp = m.select("_svc", F.explode("m.gauge.dataPoints").alias("p"))
    return dp.select(
        F.col("p.attributes")["conv_id"].alias("conv_id"),
        F.col("p.attributes")["turn_idx"].cast("int").alias("turn_idx"),
        F.col("_svc").alias("svc"),
        F.col("p.timeUnixNano").alias("ts_ns"),
        F.col("p.asInt").alias("value"),
        F.coalesce(F.col("p.flags"), F.lit(0)).alias("flags"),
    )


COMBINED_METRICS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "gauge:struct<dataPoints:array<struct<timeUnixNano:bigint>>>,"
    "histogram:struct<dataPoints:array<struct<count:bigint>>>,"
    "sum:struct<dataPoints:array<struct<timeUnixNano:bigint>>>,"
    "exponentialHistogram:struct<dataPoints:array<struct<count:bigint>>>,"
    "summary:struct<dataPoints:array<struct<count:bigint>>>>>>>>"
)


def data_point_count(nested: DataFrame, json_col: str = "otlp_json") -> int:
    """Metrics.DataPointCount() over the nested form — counts EVERY
    metric branch (real pdata counts all datapoint slices, so a
    gauge-only parse would silently return 0 on histogram docs)."""
    d = nested.select(
        F.from_json(F.col(json_col), COMBINED_METRICS_OTLP_SCHEMA).alias("d")
    )
    branch = lambda m, name: F.coalesce(  # noqa: E731
        F.size(m[name]["dataPoints"]), F.lit(0)
    )
    n = d.select(
        F.aggregate(
            F.col("d.scopeMetrics"),
            F.lit(0),
            lambda acc, s: acc
            + F.aggregate(
                s["metrics"],
                F.lit(0),
                lambda a2, m: a2
                + branch(m, "gauge")
                + branch(m, "histogram")
                + branch(m, "sum")
                + branch(m, "exponentialHistogram")
                + branch(m, "summary"),
            ),
        ).alias("n")
    )
    return n.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]


# ------------------------------------- histogram metrics in the envelope

def _bucket_vector_exprs(bounds: tuple[int, ...]):
    """Shared HistogramDataPoint machinery over the per-svc aggregate
    columns ``_bc`` (bucket_idx→count map), ``_count``, ``_minb``,
    ``_maxb``: returns (guarded count, complete bucketCounts vector,
    explicitBounds literal array).

    A bucket_idx outside [0, len(bounds)] would silently corrupt the
    document — high indexes truncate the counts vector, negative ones
    inflate count past sum(bucketCounts) while the row vanishes from
    the vector — so both ends fail the job loud. The guard must live
    INSIDE a retained output expression — a standalone assert column
    gets pruned by Catalyst and never runs."""
    n_buckets = len(bounds) + 1
    # NULL _maxb = a gap series (zero recorded values, noRecordedValue
    # datapoint): no buckets to range-check, count is the genuine 0
    guarded_count = F.when(
        F.col("_maxb").isNull()
        | ((F.col("_maxb") <= n_buckets - 1) & (F.col("_minb") >= 0)),
        F.col("_count"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "bucket_idx outside bounds-derived vector "
                    f"({n_buckets} slots): "
                ),
                F.col("_minb").cast("string"),
                F.lit(".."),
                F.col("_maxb").cast("string"),
            )
        )
    ).cast("long")
    full_counts = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(F.try_element_at(F.col("_bc"), i), F.lit(0).cast("long")),
    )
    explicit_bounds = F.array(*[F.lit(int(b)).cast("long") for b in bounds])
    return guarded_count, full_counts, explicit_bounds


HIST_METRICS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "histogram:struct<aggregationTemporality:string,"
    "dataPoints:array<struct<count:bigint,sum:bigint,min:bigint,"
    "max:bigint,bucketCounts:array<bigint>,"
    "explicitBounds:array<bigint>,flags:int>>>>>>>>"
)


def nest_histogram_metrics_to_otlp(
    hist_dps: DataFrame,
    bounds: tuple[int, ...],
    metric_name: str = "turn_latency_ms",
) -> DataFrame:
    """signals.histogram_datapoints rows (per svc × bucket) → one
    ResourceMetrics document per service with a complete
    HistogramDataPoint: the full bucketCounts vector (zeros for empty
    buckets — the wire form carries len(bounds)+1 slots), svc-level
    count/sum/min/max aggregated from the per-bucket rows, and the
    explicitBounds list (pdata/pmetric/json.go Histogram branch)."""
    per_svc = hist_dps.groupBy("svc").agg(
        # gap-series rows (NULL bucket_idx) can't be map keys —
        # collect_list drops the NULLed-out entry wholesale
        F.map_from_entries(
            F.collect_list(
                F.when(
                    F.col("bucket_idx").isNotNull(),
                    F.struct(F.col("bucket_idx"), F.col("bucket_count")),
                )
            )
        ).alias("_bc"),
        F.sum("bucket_count").alias("_count"),
        F.sum("value_sum").alias("_sum"),
        F.min("value_min").alias("_min"),
        F.max("value_max").alias("_max"),
        F.max("bucket_idx").alias("_maxb"),
        F.min("bucket_idx").alias("_minb"),
    )
    guarded_count, full_counts, explicit_bounds = _bucket_vector_exprs(bounds)
    dp = F.struct(
        guarded_count.alias("count"),
        F.col("_sum").cast("long").alias("sum"),
        F.col("_min").cast("long").alias("min"),
        F.col("_max").cast("long").alias("max"),
        full_counts.alias("bucketCounts"),
        explicit_bounds.alias("explicitBounds"),
        # DataPointFlags.noRecordedValue (number_data_point_flags.go):
        # a series with zero recorded values; omitted (NULL) otherwise
        F.when(F.col("_count") == 0, F.lit(1)).alias("flags"),
    )
    return per_svc.select(
        F.col("svc"),
        _resource_envelope(
            F.col("svc"),
            F.array(
                F.struct(
                    F.lit(metric_name).alias("name"),
                    F.struct(
                        F.lit("AGGREGATION_TEMPORALITY_DELTA").alias(
                            "aggregationTemporality"
                        ),
                        F.array(dp).alias("dataPoints"),
                    ).alias("histogram"),
                )
            ),
        ).alias("otlp_json"),
    )


def flatten_histogram_metrics_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse: documents → per (svc, bucket_idx) rows with the
    svc-level count/sum/min/max carried on every row (empty buckets —
    zero count — are dropped, matching histogram_datapoints' sparse
    row form). A noRecordedValue datapoint (flags bit 0, all-zero
    vector) survives as ONE row with NULL bucket_idx and zero counts —
    dropping it would erase exactly the gap marker the flag exists to
    carry (pmetric/number_data_point_flags.go)."""
    m = _explode_to_metrics(nested, HIST_METRICS_OTLP_SCHEMA, json_col)
    dp = m.select(
        F.col("_svc").alias("svc"), F.explode("m.histogram.dataPoints").alias("p")
    )
    flags = F.coalesce(F.col("p.flags"), F.lit(0))
    # ONE pass (r7, guide §2.4): the r6 recorded/gap union re-evaluated
    # the whole upstream (parse → nest → from_json) once per branch;
    # assemble both row kinds per datapoint and explode once instead
    empty = F.array().cast("array<struct<bucket_idx:int,bucket_count:bigint>>")
    ent = lambda idx, cnt: F.struct(  # noqa: E731
        idx.cast("int").alias("bucket_idx"), cnt.cast("bigint").alias("bucket_count")
    )
    recorded = F.coalesce(
        F.filter(
            F.transform(F.col("p.bucketCounts"), lambda c, i: ent(i, c)),
            lambda x: x["bucket_count"] > 0,
        ),
        empty,
    )
    # gap row ONLY for truly empty datapoints: a foreign document may
    # legally set noRecordedValue on a point that still carries stale
    # buckets — those rows survive through the recorded entries above
    # and must not ALSO spawn a synthetic gap row
    gaps = F.when(
        (flags == 1) & (F.col("p.count") == 0),
        F.array(ent(F.lit(None).cast("int"), F.lit(0))),
    ).otherwise(empty)
    rows = dp.select(
        "svc",
        F.col("p.count").alias("count"),
        F.col("p.sum").alias("value_sum"),
        F.col("p.min").alias("value_min"),
        F.col("p.max").alias("value_max"),
        flags.alias("flags"),
        F.explode(F.concat(recorded, gaps)).alias("x"),
    )
    return rows.select(
        "svc", F.col("x.bucket_idx"), F.col("x.bucket_count"), "count",
        "value_sum", "value_min", "value_max", "flags",
    )


HIST_EXEMPLAR_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "histogram:struct<aggregationTemporality:string,"
    "dataPoints:array<struct<count:bigint,bucketCounts:array<bigint>,"
    "explicitBounds:array<bigint>,"
    "exemplars:array<struct<timeUnixNano:bigint,asInt:bigint,"
    "spanId:string,traceId:string,"
    "filteredAttributes:map<string,string>>>>>>>>>>>"
)


def nest_histogram_exemplars_to_otlp(
    dps: DataFrame,
    bounds: tuple[int, ...],
    metric_name: str = "turn_latency_ms",
) -> DataFrame:
    """histogram_datapoints_with_exemplars rows → one ResourceMetrics
    document per service whose HistogramDataPoint carries the
    exemplars list (pdata/pmetric/generated_exemplar.go;
    pdata/pmetric/json.go Exemplar branch): protojson shape
    {timeUnixNano, asInt, spanId, traceId, filteredAttributes} — one
    exemplar per non-empty bucket, sorted for document determinism.
    The exemplar deliberately does NOT carry its bucket index: OTLP
    exemplars don't — the inverse re-derives it from explicitBounds,
    which is what makes the round trip a real codec proof."""
    per_svc = dps.groupBy("svc").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket_idx"), F.col("bucket_count")))
        ).alias("_bc"),
        F.sum("bucket_count").alias("_count"),
        F.max("bucket_idx").alias("_maxb"),
        F.min("bucket_idx").alias("_minb"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("ex_ts_ns").alias("timeUnixNano"),
                    F.col("ex_value").alias("asInt"),
                    F.col("ex_span_id").alias("spanId"),
                    F.col("ex_trace_id").alias("traceId"),
                    F.create_map(F.lit("conv_id"), F.col("ex_conv")).alias(
                        "filteredAttributes"
                    ),
                )
            ),
            # asInt alone is a total order here: bucket ranges are
            # disjoint, so two exemplars of one service can't collide
            _cmp(lambda e: e["asInt"]),
        ).alias("_ex"),
    )
    guarded_count, full_counts, explicit_bounds = _bucket_vector_exprs(bounds)
    dp = F.struct(
        guarded_count.alias("count"),
        full_counts.alias("bucketCounts"),
        explicit_bounds.alias("explicitBounds"),
        F.col("_ex").alias("exemplars"),
    )
    return per_svc.select(
        F.col("svc"),
        _resource_envelope(
            F.col("svc"),
            F.array(
                F.struct(
                    F.lit(metric_name).alias("name"),
                    F.struct(
                        F.lit("AGGREGATION_TEMPORALITY_DELTA").alias(
                            "aggregationTemporality"
                        ),
                        F.array(dp).alias("dataPoints"),
                    ).alias("histogram"),
                )
            ),
        ).alias("otlp_json"),
    )


def flatten_histogram_exemplars_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse: one row per exemplar, with its bucket re-derived from
    the document's OWN explicitBounds (bucket = #bounds the value
    exceeds — upper-inclusive, overflow last) and that bucket's count
    read back out of bucketCounts."""
    m = _explode_to_metrics(nested, HIST_EXEMPLAR_OTLP_SCHEMA, json_col)
    dp = m.select(
        F.col("_svc").alias("svc"), F.explode("m.histogram.dataPoints").alias("p")
    )
    ex = dp.select(
        "svc",
        F.col("p.bucketCounts").alias("_bc"),
        F.col("p.explicitBounds").alias("_eb"),
        F.explode("p.exemplars").alias("e"),
    )
    # asInt is the only value branch this envelope's schema carries; an
    # exemplar parsing NULL there (e.g. an asDouble document) must fail
    # loud — "value exceeds no bounds" would silently file it in bucket 0
    bucket_idx = F.when(
        F.col("e.asInt").isNotNull(),
        F.size(F.filter(F.col("_eb"), lambda b: F.col("e.asInt") > b)),
    ).otherwise(
        F.raise_error(F.lit(
            "exemplar without asInt (asDouble exemplars are outside "
            "this envelope's schema)"
        ))
    ).cast("int")
    return ex.select(
        "svc",
        bucket_idx.alias("bucket_idx"),
        F.element_at(F.col("_bc"), bucket_idx + 1).alias("bucket_count"),
        F.col("e.asInt").alias("ex_value"),
        F.col("e.timeUnixNano").alias("ex_ts_ns"),
        F.col("e.traceId").alias("ex_trace_id"),
        F.col("e.spanId").alias("ex_span_id"),
        F.col("e.filteredAttributes")["conv_id"].alias("ex_conv"),
    )


# ----------------------- Sum / ExponentialHistogram / Summary envelopes
# (r5: the metrics OTLP/JSON document form is uniform over all 5 metric
# types — pdata/pmetric/metric_type.go:10-16; gauge + histogram landed
# in r4, these close the envelope matrix. Flat codecs for the same
# shapes live in signals.py / signalwire.py.)

SUM_METRICS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "sum:struct<aggregationTemporality:string,isMonotonic:boolean,"
    "dataPoints:array<struct<timeUnixNano:bigint,asInt:bigint,"
    "attributes:map<string,string>,flags:int>>>>>>>>"
)


def nest_sum_metrics_to_otlp(
    points: DataFrame,
    metric_name: str = "turn_latency_total",
    temporality: str = "AGGREGATION_TEMPORALITY_CUMULATIVE",
    is_monotonic: bool = True,
    doc_window_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """Sum branch of the ResourceMetrics document
    (pdata/pmetric/json.go Sum: aggregationTemporality + isMonotonic
    ride the metric, not the datapoint). Shares the gauge nest's
    (service × window) machinery — _nest_windowed_points — so the
    window rule (integer div) and datapoint shape can't drift apart."""
    return _nest_windowed_points(
        points,
        lambda dps: F.struct(
            F.lit(metric_name).alias("name"),
            F.struct(
                F.lit(temporality).alias("aggregationTemporality"),
                F.lit(is_monotonic).alias("isMonotonic"),
                dps.alias("dataPoints"),
            ).alias("sum"),
        ),
        doc_window_ns,
    )


def flatten_sum_metrics_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse: documents → flat cumulative points, with the
    metric-level temporality/isMonotonic carried onto every row (so a
    green oracle proves the flags survive the round trip)."""
    m = _explode_to_metrics(nested, SUM_METRICS_OTLP_SCHEMA, json_col)
    dp = m.select(
        "_svc",
        F.col("m.sum.aggregationTemporality").alias("temporality"),
        F.col("m.sum.isMonotonic").alias("is_monotonic"),
        F.explode("m.sum.dataPoints").alias("p"),
    )
    return dp.select(
        F.col("p.attributes")["conv_id"].alias("conv_id"),
        F.col("p.attributes")["turn_idx"].cast("int").alias("turn_idx"),
        F.col("_svc").alias("svc"),
        F.col("p.timeUnixNano").alias("ts_ns"),
        F.col("p.asInt").alias("value"),
        "temporality",
        "is_monotonic",
        F.coalesce(F.col("p.flags"), F.lit(0)).alias("flags"),
    )


EXP_METRICS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "exponentialHistogram:struct<aggregationTemporality:string,"
    "dataPoints:array<struct<count:bigint,scale:int,zeroCount:bigint,"
    "positive:struct<offset:int,bucketCounts:array<bigint>>,"
    "flags:int>>>>>>>>"
)


def nest_exp_histogram_metrics_to_otlp(
    exp_dps: DataFrame,
    metric_name: str = "turn_latency_ms",
) -> DataFrame:
    """ExponentialHistogram branch: signals.exp_histogram_datapoints
    rows (svc × scale-0 bucket_idx; NULL idx = the zero bucket) → one
    document per service with a complete ExponentialHistogramDataPoint
    (pdata/pmetric/generated_exponentialhistogramdatapoint.go):
    positive.offset = min index, bucketCounts dense from offset with
    zero slots, zeroCount from the NULL-idx rows, count = total."""
    per_svc = exp_dps.groupBy("svc").agg(
        F.map_from_entries(
            F.collect_list(
                # the zero bucket (NULL idx) keys under int-min — the
                # dense sequence below never reaches it
                F.struct(
                    F.coalesce(F.col("bucket_idx"), F.lit(-(2**31))).alias("k"),
                    F.col("bucket_count").alias("v"),
                )
            )
        ).alias("_bc"),
        F.min("bucket_idx").alias("_lo"),
        F.max("bucket_idx").alias("_hi"),
        F.sum("bucket_count").alias("_count"),
        F.sum(
            F.when(F.col("bucket_idx").isNull(), F.col("bucket_count")).otherwise(
                F.lit(0)
            )
        ).alias("_zero"),
    )
    # _dense_vec("") reads the same _bc/_lo/_hi columns — ONE dense-
    # reconstruction contract shared with the signed nest (r6 review)
    dp = F.struct(
        F.col("_count").cast("long").alias("count"),
        F.lit(0).alias("scale"),
        F.col("_zero").cast("long").alias("zeroCount"),
        F.struct(
            F.coalesce(F.col("_lo"), F.lit(0)).alias("offset"),
            _dense_vec("").alias("bucketCounts"),
        ).alias("positive"),
        # noRecordedValue: zero recorded values in the series (a gap
        # row contributes bucket_count 0, so _count stays 0)
        F.when(F.col("_count") == 0, F.lit(1)).alias("flags"),
    )
    return per_svc.select(
        F.col("svc"),
        _resource_envelope(
            F.col("svc"),
            F.array(
                F.struct(
                    F.lit(metric_name).alias("name"),
                    F.struct(
                        F.lit("AGGREGATION_TEMPORALITY_DELTA").alias(
                            "aggregationTemporality"
                        ),
                        F.array(dp).alias("dataPoints"),
                    ).alias("exponentialHistogram"),
                )
            ),
        ).alias("otlp_json"),
    )


def flatten_exp_histogram_metrics_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse: documents → sparse (svc, bucket_idx, bucket_count)
    rows (zero slots dropped; zeroCount>0 restores the NULL-idx
    row), matching exp_histogram_datapoints' form. A noRecordedValue
    datapoint (flags bit 0) survives as one zero-count NULL-idx row —
    distinguishable from a genuine zero bucket by bucket_count 0 +
    flags 1."""
    m = _explode_to_metrics(nested, EXP_METRICS_OTLP_SCHEMA, json_col)
    dp = m.select(
        F.col("_svc").alias("svc"),
        F.explode("m.exponentialHistogram.dataPoints").alias("p"),
    )
    flags = F.coalesce(F.col("p.flags"), F.lit(0))
    # ONE pass (r7, guide §2.4): the r6 three-way union re-evaluated the
    # whole upstream (parse → nest → from_json) once per branch; the
    # sparse rows + zero bucket + gap marker are assembled per datapoint
    # as arrays and exploded once instead
    empty = F.array().cast("array<struct<bucket_idx:int,bucket_count:bigint>>")
    ent = lambda idx, cnt: F.struct(  # noqa: E731
        idx.cast("int").alias("bucket_idx"), cnt.cast("bigint").alias("bucket_count")
    )
    pos = F.coalesce(
        F.filter(
            F.transform(
                F.col("p.positive.bucketCounts"),
                lambda c, i: ent(F.col("p.positive.offset") + i, c),
            ),
            lambda x: x["bucket_count"] > 0,
        ),
        empty,
    )
    zero = F.when(
        F.col("p.zeroCount") > 0,
        F.array(ent(F.lit(None).cast("int"), F.col("p.zeroCount"))),
    ).otherwise(empty)
    # count==0 guard mirrors the histogram flatten: a foreign flagged
    # datapoint with residual buckets keeps its rows, no synthetic gap
    gaps = F.when(
        (flags == 1) & (F.col("p.count") == 0),
        F.array(ent(F.lit(None).cast("int"), F.lit(0))),
    ).otherwise(empty)
    rows = dp.select(
        "svc", flags.alias("flags"), F.explode(F.concat(pos, zero, gaps)).alias("x")
    )
    return rows.select(
        "svc", F.col("x.bucket_idx"), F.col("x.bucket_count"), "flags"
    )


SUMMARY_METRICS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "summary:struct<dataPoints:array<struct<count:bigint,sum:bigint,"
    "quantileValues:array<struct<quantile:double,value:double>>,"
    "flags:int>>>>>>>>"
)

SUMMARY_QUANTILES = (0.5, 0.9, 0.99)


def nest_summary_metrics_to_otlp(
    summary_dps: DataFrame,
    metric_name: str = "turn_latency_ms",
    quantiles: tuple[float, ...] = SUMMARY_QUANTILES,
) -> DataFrame:
    """Summary branch: signals.summary_datapoints rows (svc, n,
    value_sum, q5/q9/q99) → one document per service with a
    SummaryDataPoint carrying quantileValues
    (pdata/pmetric/json.go Summary / ValueAtQuantile)."""
    qcols = [f"q{str(q).replace('0.', '')}" for q in quantiles]
    qv = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("quantile"), F.col(c).alias("value")
            )
            for q, c in zip(quantiles, qcols)
        ]
    )
    dp = F.struct(
        F.col("n").cast("long").alias("count"),
        F.col("value_sum").cast("long").alias("sum"),
        qv.alias("quantileValues"),
        # noRecordedValue for the zero-observation series; NULL sum and
        # NULL quantile values are omitted by the JSON writer alongside
        F.when(F.col("n") == 0, F.lit(1)).alias("flags"),
    )
    return summary_dps.select(
        F.col("svc"),
        _resource_envelope(
            F.col("svc"),
            F.array(
                F.struct(
                    F.lit(metric_name).alias("name"),
                    F.struct(F.array(dp).alias("dataPoints")).alias("summary"),
                )
            ),
        ).alias("otlp_json"),
    )


def flatten_summary_metrics_from_otlp(
    nested: DataFrame,
    json_col: str = "otlp_json",
    quantiles: tuple[float, ...] = SUMMARY_QUANTILES,
) -> DataFrame:
    """Inverse: documents → (svc, n, value_sum, q5, q9, q99) rows —
    quantile values matched BY the quantile field, not position."""
    m = _explode_to_metrics(nested, SUMMARY_METRICS_OTLP_SCHEMA, json_col)
    dp = m.select(
        F.col("_svc").alias("svc"), F.explode("m.summary.dataPoints").alias("p")
    )
    cols = [
        F.col("p.count").alias("n"),
        F.col("p.sum").alias("value_sum"),
        F.coalesce(F.col("p.flags"), F.lit(0)).alias("flags"),
    ]
    for q in quantiles:
        cols.append(
            F.try_element_at(
                F.filter(
                    F.col("p.quantileValues"),
                    lambda x: x["quantile"] == F.lit(float(q)),
                ),
                F.lit(1),
            )["value"].alias(f"q{str(q).replace('0.', '')}")
        )
    return dp.select("svc", *cols)


# ------------------------------------- nested AnyValue attributes (r5)
# pdata/pcommon/value.go:18-29: attribute values are a 7-typed union —
# string/bool/int/double/bytes plus NESTED arrayValue and kvlistValue.
# The r4 envelopes carried map<string,string> attrs only; this path is
# the protojson-faithful KeyValue-list form with one nesting level
# (pcommon JSON: {"intValue":"123"} — int64 rides as a STRING,
# {"bytesValue": base64}, {"arrayValue":{"values":[...]}},
# {"kvlistValue":{"values":[{"key":...,"value":...}]}}).

ANYVALUE_LEAF_DDL = (
    "struct<stringValue:string,intValue:string,doubleValue:double,"
    "boolValue:boolean,bytesValue:string>"
)
ANYVALUE_DDL = (
    "struct<stringValue:string,intValue:string,doubleValue:double,"
    "boolValue:boolean,bytesValue:string,"
    f"arrayValue:struct<values:array<{ANYVALUE_LEAF_DDL}>>,"
    f"kvlistValue:struct<values:array<struct<key:string,"
    f"value:{ANYVALUE_LEAF_DDL}>>>>"
)
LOGS_ANYVALUE_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeLogs:array<struct<scope:struct<name:string>,"
    "logRecords:array<struct<timeUnixNano:bigint,turnIdx:int,"
    f"attributes:array<struct<key:string,value:{ANYVALUE_DDL}>>>>>>>"
)

_LEAF_FIELDS = ("stringValue", "intValue", "doubleValue", "boolValue", "bytesValue")
_LEAF_TYPES = ("string", "string", "double", "boolean", "string")


def _av_leaf(**kw: Column) -> Column:
    """5-branch AnyValue leaf struct: the named branch set, the rest
    NULL (to_json omits them — the oneof)."""
    return F.struct(
        *[
            (kw[f] if f in kw else F.lit(None).cast(t)).alias(f)
            for f, t in zip(_LEAF_FIELDS, _LEAF_TYPES)
        ]
    )


def _av(**kw: Column) -> Column:
    """Full 7-branch AnyValue struct (leaf branches + arrayValue /
    kvlistValue)."""
    cols = [
        (kw[f] if f in kw else F.lit(None).cast(t)).alias(f)
        for f, t in zip(_LEAF_FIELDS, _LEAF_TYPES)
    ]
    cols.append(
        (
            kw["arrayValue"]
            if "arrayValue" in kw
            else F.lit(None).cast(f"struct<values:array<{ANYVALUE_LEAF_DDL}>>")
        ).alias("arrayValue")
    )
    cols.append(
        (
            kw["kvlistValue"]
            if "kvlistValue" in kw
            else F.lit(None).cast(
                f"struct<values:array<struct<key:string,value:{ANYVALUE_LEAF_DDL}>>>"
            )
        ).alias("kvlistValue")
    )
    return F.struct(*cols)


def nest_attrs_anyvalue_to_otlp(parsed: DataFrame) -> DataFrame:
    """One ResourceLogs document per conversation whose records carry
    the full AnyValue attribute union (one per branch, data-derived):

    - ``svc``        stringValue (NULL svc → attribute ABSENT),
    - ``latency_ms`` intValue (protojson string form; NULL → absent),
    - ``score``      doubleValue = latency_ms · 0.5 (NULL → absent),
    - ``valid``      boolValue (NULL → absent),
    - ``req_b64``    bytesValue = base64(req_id bytes) (NULL → absent),
    - ``tools``      arrayValue of stringValues [tool, role] with NULL
                     members skipped — ALWAYS present, so an empty
                     array round-trips as empty (≠ absent),
    - ``ctx``        kvlistValue {conv: conv_id, turn: turn_idx}.
    """
    leaf_str = lambda c: _av_leaf(stringValue=c)  # noqa: E731
    attr = lambda k, v: F.struct(F.lit(k).alias("key"), v.alias("value"))  # noqa: E731
    attrs = F.filter(
        F.array(
            attr("svc", _av(stringValue=F.col("svc"))),
            attr("latency_ms", _av(intValue=F.col("latency_ms").cast("string"))),
            attr("score", _av(doubleValue=F.col("latency_ms") * F.lit(0.5))),
            attr("valid", _av(boolValue=F.col("valid"))),
            attr(
                "req_b64",
                _av(bytesValue=F.base64(F.col("req_id").cast("binary"))),
            ),
            attr(
                "tools",
                _av(
                    arrayValue=F.struct(
                        F.transform(
                            F.filter(
                                F.array(F.col("tool"), F.col("role")),
                                lambda x: x.isNotNull(),
                            ),
                            leaf_str,
                        ).alias("values")
                    )
                ),
            ),
            attr(
                "ctx",
                _av(
                    kvlistValue=F.struct(
                        F.array(
                            F.struct(
                                F.lit("conv").alias("key"),
                                leaf_str(F.col("conv_id")).alias("value"),
                            ),
                            F.struct(
                                F.lit("turn").alias("key"),
                                leaf_str(F.col("turn_idx").cast("string")).alias(
                                    "value"
                                ),
                            ),
                        ).alias("values")
                    )
                ),
            ),
        ),
        # an attribute whose every branch is NULL is ABSENT (presence);
        # array/kvlist attrs are always present (their struct is set)
        lambda a: (
            a["value"]["stringValue"].isNotNull()
            | a["value"]["intValue"].isNotNull()
            | a["value"]["doubleValue"].isNotNull()
            | a["value"]["boolValue"].isNotNull()
            | a["value"]["bytesValue"].isNotNull()
            | a["value"]["arrayValue"].isNotNull()
            | a["value"]["kvlistValue"].isNotNull()
        ),
    )
    rec = F.struct(
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("timeUnixNano"),
        F.col("turn_idx").alias("turnIdx"),
        attrs.alias("attributes"),
    )
    with_rec = parsed.select("conv_id", "turn_idx", rec.alias("record"))
    return (
        with_rec.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list("record"), _cmp(lambda e: e["turnIdx"])
            ).alias("_recs")
        )
        .select(
            "conv_id",
            F.to_json(
                F.struct(
                    F.struct(
                        F.create_map(F.lit("conv_id"), F.col("conv_id")).alias(
                            "attributes"
                        )
                    ).alias("resource"),
                    F.array(
                        F.struct(
                            F.struct(F.lit("otelcol-spark").alias("name")).alias(
                                "scope"
                            ),
                            F.col("_recs").alias("logRecords"),
                        )
                    ).alias("scopeLogs"),
                )
            ).alias("otlp_json"),
        )
    )


def flatten_attrs_anyvalue_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse → flat typed columns (one per AnyValue branch; nested
    array/kvlist flattened to signature strings — the oracle-portable
    form). Absent attributes come back NULL; an EMPTY arrayValue comes
    back '' (present-but-empty ≠ absent, pinned by test)."""
    d = nested.select(
        F.from_json(F.col(json_col), LOGS_ANYVALUE_OTLP_SCHEMA).alias("d")
    )
    sl = d.select(
        F.col("d.resource.attributes")["conv_id"].alias("conv_id"),
        F.explode("d.scopeLogs").alias("s"),
    )
    recs = sl.select("conv_id", F.explode("s.logRecords").alias("r"))
    # Per-key first-match over the short attribute list. This is the
    # generic OTLP/JSON inverse, and wild documents carry duplicate or
    # null attribute keys — map_from_entries throws under the default
    # EXCEPTION dedup policy, and a first-match fold-to-map pays a
    # map_concat accumulator copy per element (measured 2.5 s vs
    # 1.3 s at sf0.1 — the filter scans sit at the from_json parse
    # floor). `key == lit(k)` is NULL for null keys, so they are
    # skipped; try_element_at(…, 1) takes the FIRST match and yields
    # NULL for absent keys (r5 review finding preserved).
    get = lambda k: F.try_element_at(  # noqa: E731
        F.filter(F.col("r.attributes"), lambda a: a["key"] == F.lit(k)),
        F.lit(1),
    )["value"]
    return recs.select(
        "conv_id",
        F.col("r.turnIdx").alias("turn_idx"),
        get("svc")["stringValue"].alias("svc"),
        get("latency_ms")["intValue"].cast("long").alias("latency_ms"),
        get("score")["doubleValue"].alias("score"),
        get("valid")["boolValue"].alias("valid"),
        get("req_b64")["bytesValue"].alias("req_b64"),
        F.array_join(
            F.transform(
                get("tools")["arrayValue"]["values"], lambda v: v["stringValue"]
            ),
            ";",
        ).alias("tools_sig"),
        F.array_join(
            F.transform(
                get("ctx")["kvlistValue"]["values"],
                lambda e: F.concat(e["key"], F.lit("="), e["value"]["stringValue"]),
            ),
            ";",
        ).alias("ctx_sig"),
    )


# ------------------------- signed exponential histogram in the envelope

SIGNED_EXP_METRICS_OTLP_SCHEMA = (
    "struct<resource:struct<attributes:map<string,string>>,"
    "scopeMetrics:array<struct<scope:struct<name:string>,"
    "metrics:array<struct<name:string,"
    "exponentialHistogram:struct<aggregationTemporality:string,"
    "dataPoints:array<struct<count:bigint,sum:bigint,min:bigint,"
    "max:bigint,scale:int,zeroCount:bigint,"
    "positive:struct<offset:int,bucketCounts:array<bigint>>,"
    "negative:struct<offset:int,bucketCounts:array<bigint>>>>>>>>>>"
)


def _signed_dense(sign: int, prefix: str):
    """(map, lo, hi) aggregate expressions + the dense vector/offset
    pair for ONE sign's bucket list."""
    is_sign = F.col("bucket_sign") == sign
    entries = F.map_from_entries(
        F.collect_list(
            F.when(
                is_sign,
                F.struct(F.col("bucket_idx").alias("k"),
                         F.col("bucket_count").alias("v")),
            )
        )
    ).alias(f"_{prefix}bc")
    lo = F.min(F.when(is_sign, F.col("bucket_idx"))).alias(f"_{prefix}lo")
    hi = F.max(F.when(is_sign, F.col("bucket_idx"))).alias(f"_{prefix}hi")
    return entries, lo, hi


def _dense_vec(prefix: str):
    return F.when(
        F.col(f"_{prefix}lo").isNotNull(),
        F.transform(
            F.sequence(F.col(f"_{prefix}lo"), F.col(f"_{prefix}hi")),
            lambda i: F.coalesce(
                F.try_element_at(F.col(f"_{prefix}bc"), i), F.lit(0).cast("long")
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def nest_signed_exp_metrics_to_otlp(
    dps: DataFrame,
    metric_name: str = "turn_latency_delta_ms",
) -> DataFrame:
    """signals.signed_exp_histogram_datapoints rows → one document per
    service with BOTH bucket lists of the
    ExponentialHistogramDataPoint (generated_...go:138-146
    Positive()/Negative() — same dense contract per list, indexed over
    |v|) plus the OPTIONAL sum/min/max fields (generated_...go:93-110
    HasSum presence: emitted whenever the series recorded values,
    which a count>0 datapoint always did)."""
    pos_entries, plo, phi = _signed_dense(1, "p")
    neg_entries, nlo, nhi = _signed_dense(-1, "n")
    per_svc = dps.groupBy("svc").agg(
        pos_entries, plo, phi,
        neg_entries, nlo, nhi,
        F.sum("bucket_count").alias("_count"),
        F.sum(
            F.when(F.col("bucket_sign") == 0, F.col("bucket_count")).otherwise(
                F.lit(0)
            )
        ).alias("_zero"),
        F.sum("value_sum").alias("_sum"),
        F.min("value_min").alias("_min"),
        F.max("value_max").alias("_max"),
    )
    dp = F.struct(
        F.col("_count").cast("long").alias("count"),
        F.col("_sum").cast("long").alias("sum"),
        F.col("_min").cast("long").alias("min"),
        F.col("_max").cast("long").alias("max"),
        F.lit(0).alias("scale"),
        F.col("_zero").cast("long").alias("zeroCount"),
        F.struct(
            F.coalesce(F.col("_plo"), F.lit(0)).alias("offset"),
            _dense_vec("p").alias("bucketCounts"),
        ).alias("positive"),
        F.struct(
            F.coalesce(F.col("_nlo"), F.lit(0)).alias("offset"),
            _dense_vec("n").alias("bucketCounts"),
        ).alias("negative"),
    )
    return per_svc.select(
        F.col("svc"),
        _resource_envelope(
            F.col("svc"),
            F.array(
                F.struct(
                    F.lit(metric_name).alias("name"),
                    F.struct(
                        F.lit("AGGREGATION_TEMPORALITY_DELTA").alias(
                            "aggregationTemporality"
                        ),
                        F.array(dp).alias("dataPoints"),
                    ).alias("exponentialHistogram"),
                )
            ),
        ).alias("otlp_json"),
    )


def flatten_signed_exp_metrics_from_otlp(
    nested: DataFrame, json_col: str = "otlp_json"
) -> DataFrame:
    """Inverse: documents → sparse (svc, bucket_sign, bucket_idx,
    bucket_count) rows with the svc-level count/sum/min/max carried on
    every row (bucket-level stats are not in the OTLP form). zeroCount
    restores the sign-0 NULL-idx row."""
    m = _explode_to_metrics(nested, SIGNED_EXP_METRICS_OTLP_SCHEMA, json_col)
    dp = m.select(
        F.col("_svc").alias("svc"),
        F.explode("m.exponentialHistogram.dataPoints").alias("p"),
    )
    carried = [
        F.col("p.count").alias("count"),
        F.col("p.sum").alias("value_sum"),
        F.col("p.min").alias("value_min"),
        F.col("p.max").alias("value_max"),
    ]

    # ONE pass (r7, guide §2.4): the r6 positive/negative/zero union
    # re-evaluated the whole upstream (lag-window deltas → nest →
    # from_json) once per branch; assemble all three row kinds per
    # datapoint and explode once instead
    empty = F.array().cast(
        "array<struct<bucket_sign:int,bucket_idx:int,bucket_count:bigint>>"
    )
    ent = lambda sign, idx, cnt: F.struct(  # noqa: E731
        sign.cast("int").alias("bucket_sign"),
        idx.cast("int").alias("bucket_idx"),
        cnt.cast("bigint").alias("bucket_count"),
    )

    def side(field: str, sign: int):
        return F.coalesce(
            F.filter(
                F.transform(
                    F.col(f"p.{field}.bucketCounts"),
                    lambda c, i: ent(
                        F.lit(sign), F.col(f"p.{field}.offset") + i, c
                    ),
                ),
                lambda x: x["bucket_count"] > 0,
            ),
            empty,
        )

    zero = F.when(
        F.col("p.zeroCount") > 0,
        F.array(ent(F.lit(0), F.lit(None).cast("int"), F.col("p.zeroCount"))),
    ).otherwise(empty)
    rows = dp.select(
        "svc",
        *carried,
        F.explode(
            F.concat(side("positive", 1), side("negative", -1), zero)
        ).alias("x"),
    )
    return rows.select(
        "svc", F.col("x.bucket_sign"), F.col("x.bucket_idx"),
        F.col("x.bucket_count"),
        "count", "value_sum", "value_min", "value_max",
    )
