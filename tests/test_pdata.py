"""pdata mapping: severity enum, OTLP-JSON nesting round-trip, counts
(pdata/plog generated round-trip test analog, json_test.go/pb_test.go)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import parse, pdata


def _parsed(transcripts):
    return parse.with_parsed(transcripts, "native")


def test_severity_mapping(transcripts):
    df = _parsed(transcripts).select(
        "level", pdata.severity_number(F.col("level")).alias("sn")
    )
    rows = {(r["level"], r["sn"]) for r in df.distinct().collect()}
    assert ("DEBUG", 5) in rows and ("INFO", 9) in rows
    assert ("WARN", 13) in rows and ("ERROR", 17) in rows
    assert (None, 0) in rows  # malformed → UNSPECIFIED


def test_otlp_roundtrip_lossless(transcripts):
    parsed = _parsed(transcripts)
    nested = pdata.nest_to_otlp(parsed)
    flat = pdata.flatten_from_otlp(nested)
    # body (the original text) survives byte-exactly per (conv, ts-derived id)
    want = parsed.select("conv_id", "role", "text", F.col("ts").cast("timestamp").alias("ts"))
    got = flat.select("conv_id", "role", "text", "ts")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_log_record_count(transcripts):
    nested = pdata.nest_to_otlp(_parsed(transcripts))
    assert pdata.log_record_count(nested) == transcripts.count()


def test_envelope_shape(transcripts):
    nested = pdata.nest_to_otlp(_parsed(transcripts))
    assert nested.count() == transcripts.select("conv_id").distinct().count()
    one = nested.limit(1).collect()[0]["otlp_json"]
    assert '"resource"' in one and '"scopeLogs"' in one and '"logRecords"' in one


def test_spans_otlp_envelope_roundtrip_and_count(spark, sf_dir):
    """ResourceSpans envelope: nest → flatten is lossless on every
    field (incl. NULL parent for scope-first spans), and SpanCount
    over the nested form equals the flat count."""
    from opentelemetry_collector_spark.functions import parse as parse_mod
    from opentelemetry_collector_spark.functions import signals
    from opentelemetry_collector_spark.sources import tables

    parsed = parse_mod.with_parsed(
        tables.read_transcripts(spark, sf_dir).limit(2000), "native"
    )
    spans = signals.spans_from_turns(parsed).select(
        "conv_id", "trace_id", "span_id", "parent_span_id", "name", "kind",
        "status",
        (F.unix_micros(F.col("start_ts").cast("timestamp")) * 1000).alias("start_ns"),
        (F.unix_micros(F.col("end_ts").cast("timestamp")) * 1000).alias("end_ns"),
    )
    nested = pdata.nest_spans_to_otlp(spans).cache()
    back = pdata.flatten_spans_from_otlp(nested)
    cols = spans.columns
    assert back.select(cols).exceptAll(spans.select(cols)).count() == 0
    assert spans.select(cols).exceptAll(back.select(cols)).count() == 0
    assert pdata.span_count(nested) == spans.count()


def test_metrics_otlp_envelope_roundtrip_and_count(spark, sf_dir):
    """ResourceMetrics envelope: nest → flatten lossless including NULL
    value (omitted oneof) and NULL svc (empty-resource doc), and
    DataPointCount over the nested form equals the flat count."""
    from opentelemetry_collector_spark.functions import parse as parse_mod
    from opentelemetry_collector_spark.sources import tables

    parsed = parse_mod.with_parsed(
        tables.read_transcripts(spark, sf_dir).limit(2000), "native"
    )
    points = parsed.select(
        "conv_id", "turn_idx", "svc",
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("ts_ns"),
        F.col("latency_ms").cast("long").alias("value"),
    )
    nested = pdata.nest_metrics_to_otlp(points).cache()
    back = pdata.flatten_metrics_from_otlp(nested)
    cols = points.columns
    assert back.select(cols).exceptAll(points.select(cols)).count() == 0
    assert points.select(cols).exceptAll(back.select(cols)).count() == 0
    assert pdata.data_point_count(nested) == points.count()
    assert points.filter("svc IS NULL").count() > 0  # edge actually hit
    assert points.filter("value IS NULL").count() > 0


def test_scope_surface_and_schema_url_roundtrip(transcripts):
    """r5: schemaUrl at both envelope levels and the full
    InstrumentationScope {name, version, attributes,
    droppedAttributesCount} survive the document round trip; the scope
    attributes are DATA-derived (the role's distinct tool set), and a
    tool-less scope omits the key rather than emitting ''."""
    import json

    parsed = _parsed(transcripts)
    nested = pdata.nest_to_otlp(parsed).cache()
    doc = json.loads(nested.first()["otlp_json"])
    assert doc["schemaUrl"] == pdata.SCHEMA_URL
    sl = doc["scopeLogs"][0]
    assert sl["schemaUrl"] == pdata.SCHEMA_URL
    assert set(sl["scope"]) >= {"name", "version", "droppedAttributesCount"}
    assert sl["scope"]["version"] == pdata.SCOPE_VERSION
    back = pdata.flatten_scopes_from_otlp(nested)
    # scope_tools equals the per-(conv, role) distinct tool set; the
    # presence edge: non-tool roles must come back NULL, not ''
    want = parsed.groupBy("conv_id", "role").agg(
        F.when(
            F.size(F.array_sort(F.collect_set("tool"))) > 0,
            F.concat_ws(",", F.array_sort(F.collect_set("tool"))),
        ).alias("scope_tools"),
        F.count(F.lit(1)).cast("int").alias("n_records"),
    )
    cols = ["conv_id", "role", "scope_tools", "n_records"]
    assert back.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(back.select(cols)).count() == 0
    nested.unpersist()
    # presence edge (constructed — fixture turns always carry a tool):
    # a tool-less scope must omit the attribute key, flattening to NULL
    toolless = parsed.withColumn(
        "tool",
        F.when(F.col("role") == "system", F.lit(None)).otherwise(F.col("tool")),
    )
    back2 = pdata.flatten_scopes_from_otlp(pdata.nest_to_otlp(toolless))
    sys_rows = back2.filter(F.col("role") == "system")
    assert sys_rows.count() > 0
    assert sys_rows.filter(F.col("scope_tools").isNotNull()).count() == 0


def test_histogram_envelope_full_vector_and_sparse_inverse(spark, sf_dir):
    """The nested HistogramDataPoint must carry the COMPLETE
    bucketCounts vector (zeros included) and explicitBounds; the
    flatten drops empty buckets back to the sparse row form equal to
    the input."""
    import json

    from opentelemetry_collector_spark.functions import parse as parse_mod
    from opentelemetry_collector_spark.functions import signals
    from opentelemetry_collector_spark.sources import tables

    parsed = parse_mod.with_parsed(
        tables.read_transcripts(spark, sf_dir), "native"
    )
    dps = signals.histogram_datapoints(parsed).cache()
    nested = pdata.nest_histogram_metrics_to_otlp(dps, signals.DEFAULT_BOUNDS)
    doc = json.loads(nested.first()["otlp_json"])
    dp = doc["scopeMetrics"][0]["metrics"][0]["histogram"]["dataPoints"][0]
    assert len(dp["bucketCounts"]) == len(signals.DEFAULT_BOUNDS) + 1
    assert dp["explicitBounds"] == list(signals.DEFAULT_BOUNDS)
    assert dp["count"] == sum(dp["bucketCounts"])
    back = pdata.flatten_histogram_metrics_from_otlp(nested)
    # expected rows incl. the carried svc-level aggregates (all 7 cols
    # — alias swaps in the flatten must not survive pytest)
    from pyspark.sql import Window

    w = Window.partitionBy("svc")
    want = dps.select(
        "svc", "bucket_idx", "bucket_count",
        F.sum("bucket_count").over(w).alias("count"),
        F.sum("value_sum").over(w).alias("value_sum"),
        F.min("value_min").over(w).alias("value_min"),
        F.max("value_max").over(w).alias("value_max"),
    )
    cols = ["svc", "bucket_idx", "bucket_count", "count",
            "value_sum", "value_min", "value_max"]
    assert back.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(back.select(cols)).count() == 0
    # DataPointCount counts the histogram branch too (gauge-only parse
    # would read 0)
    assert pdata.data_point_count(nested) == nested.count()


def test_histogram_envelope_overflow_guard_raises(spark):
    """bucket_idx beyond the bounds-derived vector must fail LOUD, not
    emit a truncated all-zero bucketCounts (r4 advice: the original
    assert lived in a pruned column and never ran)."""
    import pytest

    dps = spark.createDataFrame(
        [("api", 9, 3, 100, 1, 50)],
        "svc string, bucket_idx int, bucket_count long, value_sum long,"
        " value_min long, value_max long",
    )
    nested = pdata.nest_histogram_metrics_to_otlp(dps, bounds=(10, 100))
    with pytest.raises(Exception, match="outside bounds-derived"):
        nested.collect()


def test_histogram_envelope_negative_bucket_idx_raises(spark):
    """A NEGATIVE bucket_idx must also fail loud: it would inflate
    count past sum(bucketCounts) while its row silently vanishes from
    the vector (the r5 review's mirror of the overflow hole)."""
    import pytest

    dps = spark.createDataFrame(
        [("api", -1, 3, 100, 1, 50), ("api", 0, 1, 5, 5, 5)],
        "svc string, bucket_idx int, bucket_count long, value_sum long,"
        " value_min long, value_max long",
    )
    nested = pdata.nest_histogram_metrics_to_otlp(dps, bounds=(10, 100))
    with pytest.raises(Exception, match="outside bounds-derived"):
        nested.collect()


def test_histogram_envelope_guard_passes_in_range(spark):
    dps = spark.createDataFrame(
        [("api", 2, 3, 100, 1, 50), ("api", 0, 1, 5, 5, 5)],
        "svc string, bucket_idx int, bucket_count long, value_sum long,"
        " value_min long, value_max long",
    )
    nested = pdata.nest_histogram_metrics_to_otlp(dps, bounds=(10, 100))
    import json

    doc = json.loads(nested.first()["otlp_json"])
    dp = doc["scopeMetrics"][0]["metrics"][0]["histogram"]["dataPoints"][0]
    assert dp["bucketCounts"] == [1, 0, 3] and dp["count"] == 4


def test_histogram_exemplar_envelope_roundtrip(spark, sf_dir):
    """Exemplars ride the HistogramDataPoint document and the inverse
    re-derives each exemplar's bucket from explicitBounds alone (OTLP
    exemplars carry no bucket index — the round trip is a codec proof,
    not column smuggling)."""
    import json

    from opentelemetry_collector_spark.functions import parse as parse_mod
    from opentelemetry_collector_spark.functions import signals
    from opentelemetry_collector_spark.sources import tables

    parsed = parse_mod.with_parsed(
        tables.read_transcripts(spark, sf_dir), "native"
    )
    dps = signals.histogram_datapoints_with_exemplars(parsed).cache()
    nested = pdata.nest_histogram_exemplars_to_otlp(dps, signals.DEFAULT_BOUNDS)
    doc = json.loads(nested.first()["otlp_json"])
    dp = doc["scopeMetrics"][0]["metrics"][0]["histogram"]["dataPoints"][0]
    exs = dp["exemplars"]
    # protojson shape: each exemplar carries ids + filteredAttributes,
    # never a bucket index
    assert exs and all(
        set(e) == {"timeUnixNano", "asInt", "spanId", "traceId",
                   "filteredAttributes"}
        for e in exs
    )
    assert [e["asInt"] for e in exs] == sorted(e["asInt"] for e in exs)
    back = pdata.flatten_histogram_exemplars_from_otlp(nested)
    cols = ["svc", "bucket_idx", "bucket_count", "ex_value", "ex_ts_ns",
            "ex_trace_id", "ex_span_id", "ex_conv"]
    assert back.select(cols).exceptAll(dps.select(cols)).count() == 0
    assert dps.select(cols).exceptAll(back.select(cols)).count() == 0
    dps.unpersist()


def test_histogram_exemplar_envelope_overflow_guard_raises(spark):
    """Same loud-guard contract as the plain histogram envelope: an
    exemplar row whose bucket_idx exceeds the bounds-derived vector must
    raise, not truncate (the guard is threaded through the retained
    count expression so Catalyst cannot prune it)."""
    import pytest

    dps = spark.createDataFrame(
        [("api", 9, 3, 50, 1, "ab" * 16, "cd" * 8, "c1")],
        "svc string, bucket_idx int, bucket_count long, ex_value long,"
        " ex_ts_ns long, ex_trace_id string, ex_span_id string,"
        " ex_conv string",
    )
    nested = pdata.nest_histogram_exemplars_to_otlp(dps, bounds=(10, 100))
    with pytest.raises(Exception, match="outside bounds-derived"):
        nested.collect()


def test_data_point_count_covers_all_five_branches(spark, sf_dir):
    """Metrics.DataPointCount must count sum/exponentialHistogram/
    summary documents too (r5 — the envelope is uniform over all 5
    metric types; a gauge+histogram-only count reads 0 on them)."""
    from opentelemetry_collector_spark.functions import parse as parse_mod
    from opentelemetry_collector_spark.functions import signals
    from opentelemetry_collector_spark.sources import tables

    parsed = parse_mod.with_parsed(
        tables.read_transcripts(spark, sf_dir), "native"
    ).cache()
    exp_docs = pdata.nest_exp_histogram_metrics_to_otlp(
        signals.exp_histogram_datapoints(parsed)
    )
    sum_docs = pdata.nest_summary_metrics_to_otlp(
        signals.summary_datapoints(parsed)
    )
    # one datapoint per document for both branches
    assert pdata.data_point_count(exp_docs) == exp_docs.count()
    assert pdata.data_point_count(sum_docs) == sum_docs.count()


def test_anyvalue_envelope_presence_edges(spark):
    """The AnyValue envelope's presence contract (r5): an attribute
    whose value is NULL is ABSENT from the document and comes back
    NULL; an EMPTY arrayValue is PRESENT and comes back '' (≠ absent);
    int64 rides as a protojson STRING; bytes as base64."""
    import json

    rows = [
        # all branches present
        ("c1", 0, "2025-01-01 00:00:00", "api", 100, True, "r-1", "db", "tool"),
        # svc/latency/valid/req NULL → those attrs absent; tool+role
        # NULL → arrayValue PRESENT but empty
        ("c1", 1, "2025-01-01 00:00:01", None, None, None, None, None, None),
    ]
    parsed = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ts string, svc string, "
        "latency_ms long, valid boolean, req_id string, tool string, "
        "role string",
    )
    nested = pdata.nest_attrs_anyvalue_to_otlp(parsed)
    doc = json.loads(nested.first()["otlp_json"])
    recs = doc["scopeLogs"][0]["logRecords"]
    by_turn = {r["turnIdx"]: {a["key"]: a["value"] for a in r["attributes"]} for r in recs}
    assert by_turn[0]["latency_ms"] == {"intValue": "100"}  # int64-as-string
    assert by_turn[0]["score"] == {"doubleValue": 50.0}
    assert by_turn[0]["valid"] == {"boolValue": True}
    assert "bytesValue" in by_turn[0]["req_b64"]
    assert by_turn[0]["tools"] == {
        "arrayValue": {"values": [{"stringValue": "db"}, {"stringValue": "tool"}]}
    }
    assert by_turn[0]["ctx"]["kvlistValue"]["values"][0] == {
        "key": "conv", "value": {"stringValue": "c1"}
    }
    # absent vs empty
    assert "svc" not in by_turn[1] and "latency_ms" not in by_turn[1]
    assert "valid" not in by_turn[1] and "req_b64" not in by_turn[1]
    assert by_turn[1]["tools"] == {"arrayValue": {"values": []}}
    flat = {r["turn_idx"]: r for r in pdata.flatten_attrs_anyvalue_from_otlp(nested).collect()}
    assert flat[0]["svc"] == "api" and flat[0]["latency_ms"] == 100
    assert flat[0]["tools_sig"] == "db;tool" and flat[0]["req_b64"]
    assert flat[1]["svc"] is None and flat[1]["latency_ms"] is None
    assert flat[1]["valid"] is None and flat[1]["req_b64"] is None
    assert flat[1]["tools_sig"] == ""  # present-but-empty, not NULL
    assert flat[1]["ctx_sig"] == "conv=c1;turn=1"


def test_anyvalue_flatten_tolerates_duplicate_and_null_keys(spark):
    """The generic OTLP/JSON inverse must resolve duplicate attribute
    keys first-match and skip null keys — wild documents carry both;
    map_from_entries would throw under the default EXCEPTION dedup
    policy (r5 review finding)."""
    doc = (
        '{"resource":{"attributes":{"conv_id":"c1"}},'
        '"scopeLogs":[{"scope":{"name":"otelcol-spark"},'
        '"logRecords":[{"timeUnixNano":1,"turnIdx":0,"attributes":['
        '{"key":"svc","value":{"stringValue":"first"}},'
        '{"key":"svc","value":{"stringValue":"second"}},'
        '{"value":{"stringValue":"keyless"}}]}]}]}'
    )
    nested = spark.createDataFrame([(doc,)], "otlp_json string")
    row = pdata.flatten_attrs_anyvalue_from_otlp(nested).collect()[0]
    assert row["svc"] == "first"  # first occurrence wins, no throw


def test_gap_series_norecordedvalue_all_three_aggregate_branches(spark):
    """DataPointFlags.noRecordedValue through the aggregate envelopes
    (pmetric/number_data_point_flags.go bit 0): a series with ZERO
    recorded values must survive nest→flatten as a flags=1 datapoint —
    count 0, value oneofs omitted — not vanish. The recorded series on
    the same frame must come back flags=0."""
    import json

    from opentelemetry_collector_spark.functions import signals

    rows = [
        ("c1", 0, "2025-01-01 00:00:00", "api", 7),
        ("c1", 1, "2025-01-01 00:00:01", "api", 120),
        # the gap series: every row NULL
        ("c2", 0, "2025-01-01 00:00:02", None, None),
        ("c2", 1, "2025-01-01 00:00:03", None, None),
    ]
    parsed = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, ts string, svc string, latency_ms long",
    )

    # histogram
    dps = signals.histogram_datapoints(parsed, include_gap_series=True)
    nested = pdata.nest_histogram_metrics_to_otlp(dps, bounds=(10, 100))
    docs = {}
    for r in nested.collect():
        d = json.loads(r["otlp_json"])
        dp = d["scopeMetrics"][0]["metrics"][0]["histogram"]["dataPoints"][0]
        docs[r["svc"]] = dp
    assert docs[None]["flags"] == 1 and docs[None]["count"] == 0
    assert docs[None]["bucketCounts"] == [0, 0, 0]
    assert "sum" not in docs[None] and "min" not in docs[None]
    assert "flags" not in docs["api"] and docs["api"]["count"] == 2
    back = pdata.flatten_histogram_metrics_from_otlp(nested).collect()
    gap = [r for r in back if r["flags"] == 1]
    assert len(gap) == 1 and gap[0]["svc"] is None
    assert gap[0]["bucket_idx"] is None and gap[0]["bucket_count"] == 0
    assert all(r["svc"] == "api" for r in back if r["flags"] == 0)

    # exponential histogram
    edps = signals.exp_histogram_datapoints(parsed, include_gap_series=True)
    enested = pdata.nest_exp_histogram_metrics_to_otlp(edps)
    eback = pdata.flatten_exp_histogram_metrics_from_otlp(enested).collect()
    egap = [r for r in eback if r["flags"] == 1]
    assert len(egap) == 1 and egap[0]["svc"] is None
    assert egap[0]["bucket_count"] == 0 and egap[0]["bucket_idx"] is None
    assert sum(r["bucket_count"] for r in eback if r["flags"] == 0) == 2

    # summary
    sdps = signals.summary_datapoints(parsed, include_gap_series=True)
    snested = pdata.nest_summary_metrics_to_otlp(sdps)
    sback = pdata.flatten_summary_metrics_from_otlp(snested).collect()
    sgap = [r for r in sback if r["flags"] == 1]
    assert len(sgap) == 1 and sgap[0]["svc"] is None
    assert sgap[0]["n"] == 0 and sgap[0]["value_sum"] is None
    assert sgap[0]["q5"] is None
    rec = [r for r in sback if r["flags"] == 0]
    assert len(rec) == 1 and rec[0]["n"] == 2 and rec[0]["value_sum"] == 127


def test_foreign_flagged_datapoint_with_residual_buckets_no_double_flatten(spark):
    """A foreign OTLP document may legally set noRecordedValue on a
    datapoint that still carries stale buckets (r6 review): the bucket
    rows survive with flags=1 and NO synthetic gap row is added — the
    gap row is only for truly empty (count=0) datapoints."""
    import json

    doc = json.dumps(
        {
            "resource": {"attributes": {"svc": "api"}},
            "scopeMetrics": [
                {
                    "scope": {"name": "x"},
                    "metrics": [
                        {
                            "name": "m",
                            "histogram": {
                                "aggregationTemporality": "AGGREGATION_TEMPORALITY_DELTA",
                                "dataPoints": [
                                    {
                                        "count": 2,
                                        "bucketCounts": [2, 0],
                                        "explicitBounds": [10],
                                        "flags": 1,
                                    }
                                ],
                            },
                        }
                    ],
                }
            ],
        }
    )
    nested = spark.createDataFrame([(doc,)], "otlp_json string")
    rows = pdata.flatten_histogram_metrics_from_otlp(nested).collect()
    assert len(rows) == 1  # the bucket row only, no synthetic gap
    assert rows[0]["bucket_idx"] == 0 and rows[0]["flags"] == 1

    edoc = json.dumps(
        {
            "resource": {"attributes": {"svc": "api"}},
            "scopeMetrics": [
                {
                    "scope": {"name": "x"},
                    "metrics": [
                        {
                            "name": "m",
                            "exponentialHistogram": {
                                "aggregationTemporality": "AGGREGATION_TEMPORALITY_DELTA",
                                "dataPoints": [
                                    {
                                        "count": 3,
                                        "scale": 0,
                                        "zeroCount": 0,
                                        "positive": {"offset": 1, "bucketCounts": [3]},
                                        "flags": 1,
                                    }
                                ],
                            },
                        }
                    ],
                }
            ],
        }
    )
    enested = spark.createDataFrame([(edoc,)], "otlp_json string")
    erows = pdata.flatten_exp_histogram_metrics_from_otlp(enested).collect()
    assert len(erows) == 1 and erows[0]["bucket_idx"] == 1


def test_signed_exp_envelope_negative_buckets_and_optional_stats(spark):
    """Negative bucket list + optional sum/min/max
    (generated_exponentialhistogramdatapoint.go:93-146): a signed
    series round-trips both dense lists, zero values restore as the
    sign-0 row, and the svc-level stats ride every flattened row."""
    import json

    from opentelemetry_collector_spark.functions import signals

    rows = [
        ("api", 3), ("api", 5), ("api", -2), ("api", -16), ("api", 0),
    ]
    df = spark.createDataFrame(rows, "svc string, delta long")
    dps = signals.signed_exp_histogram_datapoints(df)
    nested = pdata.nest_signed_exp_metrics_to_otlp(dps)
    doc = json.loads(nested.first()["otlp_json"])
    dp = doc["scopeMetrics"][0]["metrics"][0]["exponentialHistogram"][
        "dataPoints"
    ][0]
    assert dp["count"] == 5 and dp["zeroCount"] == 1
    assert dp["sum"] == -10 and dp["min"] == -16 and dp["max"] == 5
    # +3 → idx 1, +5 → idx 2 (ceil(log2(v))-1); dense [idx1..idx2]
    assert dp["positive"] == {"offset": 1, "bucketCounts": [1, 1]}
    # |-2| → idx 0, |-16| → idx 3; dense with zero slots between
    assert dp["negative"] == {"offset": 0, "bucketCounts": [1, 0, 0, 1]}
    back = pdata.flatten_signed_exp_metrics_from_otlp(nested).collect()
    by = {(r["bucket_sign"], r["bucket_idx"]): r for r in back}
    assert by[(1, 1)]["bucket_count"] == 1
    assert by[(-1, 3)]["bucket_count"] == 1
    assert by[(0, None)]["bucket_count"] == 1
    assert all(
        r["value_sum"] == -10 and r["value_min"] == -16 and r["count"] == 5
        for r in back
    )


def test_flatten_single_pass_absent_bucket_lists(spark):
    """r7 single-pass flattens (array-concat + one explode): a foreign
    datapoint with an ABSENT bucketCounts list must still emit its
    zero-bucket / gap rows — under the r6 union shape posexplode of the
    null list simply produced no rows in that branch; the r7 concat
    must coalesce the null piece to empty instead of nulling the whole
    concat (concat(NULL, x) is NULL, which would swallow the zero row
    and the gap marker with it)."""
    import json

    edoc = json.dumps(
        {
            "resource": {"attributes": {"svc": "api"}},
            "scopeMetrics": [
                {
                    "scope": {"name": "x"},
                    "metrics": [
                        {
                            "name": "m",
                            "exponentialHistogram": {
                                "aggregationTemporality": "AGGREGATION_TEMPORALITY_DELTA",
                                "dataPoints": [
                                    # zero-only point, no positive list
                                    {"count": 4, "scale": 0, "zeroCount": 4},
                                    # truly empty flagged point, no lists
                                    {"count": 0, "scale": 0, "zeroCount": 0,
                                     "flags": 1},
                                ],
                            },
                        }
                    ],
                }
            ],
        }
    )
    enested = spark.createDataFrame([(edoc,)], "otlp_json string")
    erows = sorted(
        pdata.flatten_exp_histogram_metrics_from_otlp(enested).collect(),
        key=lambda r: (r["flags"], r["bucket_count"]),
    )
    assert len(erows) == 2
    zero = [r for r in erows if r["bucket_count"] == 4]
    gap = [r for r in erows if r["flags"] == 1]
    assert zero and zero[0]["bucket_idx"] is None and zero[0]["flags"] == 0
    assert gap and gap[0]["bucket_idx"] is None and gap[0]["bucket_count"] == 0

    hdoc = json.dumps(
        {
            "resource": {"attributes": {"svc": "api"}},
            "scopeMetrics": [
                {
                    "scope": {"name": "x"},
                    "metrics": [
                        {
                            "name": "m",
                            "histogram": {
                                "aggregationTemporality": "AGGREGATION_TEMPORALITY_DELTA",
                                "dataPoints": [
                                    {"count": 0, "flags": 1}  # no vector
                                ],
                            },
                        }
                    ],
                }
            ],
        }
    )
    hnested = spark.createDataFrame([(hdoc,)], "otlp_json string")
    hrows = pdata.flatten_histogram_metrics_from_otlp(hnested).collect()
    assert len(hrows) == 1
    assert hrows[0]["bucket_idx"] is None and hrows[0]["flags"] == 1


def test_dictionary_flatten_malformed_entries_surface_as_null_rows(spark):
    """r7 flatten_dictionary_locations (single-pass element_at form,
    ADVICE r6 #3): a foreign dictionary whose location references a
    missing function or an out-of-range strindex yields a
    NULL-symbolized row rather than silently vanishing (the r6 inner
    joins dropped it); a negative (malformed) index must not wrap into
    end-relative array access."""
    import json

    from opentelemetry_collector_spark.functions import profiles_otlp

    doc = json.dumps(
        {
            "stringTable": ["", "fn_a", "file_a"],
            "functionTable": [
                {},
                {"nameStrindex": 1, "filenameStrindex": 2},
                {"nameStrindex": 99, "filenameStrindex": -3},  # dangling
            ],
            "locationTable": [
                {},
                {"lines": [{"functionIndex": 1, "line": 10}]},   # resolves
                {"lines": [{"functionIndex": 2, "line": 20}]},   # dangling strs
                {"lines": [{"functionIndex": 77, "line": 30}]},  # missing fn
                {"mappingIndex": 0},                              # absent lines
            ],
            "stackTable": [{}],
            "linkTable": [{}],
            "attributeTable": [{}],
            "mappingTable": [{"filenameStrindex": 0}],
        }
    )
    nested = spark.createDataFrame([(doc,)], "otlp_json string")
    rows = {r["location_id"]: r
            for r in profiles_otlp.flatten_dictionary_locations(nested).collect()}
    assert set(rows) == {0, 1, 2, 3}  # every real location survives
    assert rows[0]["name"] == "fn_a" and rows[0]["filename"] == "file_a"
    # dangling strindexes (99 out of range, -3 negative) → NULL, not a
    # wrapped end-relative string
    assert rows[1]["name"] is None and rows[1]["filename"] is None
    # missing function entry → NULL symbolization, row kept
    assert rows[2]["name"] is None and rows[2]["function_id"] == 76
    # absent lines array → NULL function/line, reserved mapping carried
    assert rows[3]["function_id"] is None and rows[3]["line"] is None
    assert rows[3]["mapping_id"] == 0 and rows[3]["memory_start"] == 0
