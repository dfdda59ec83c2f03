"""Metrics & traces signal shapes over the transcript stream.

The reference carries three signal types. Our pipeline input is
logs-shaped; this module provides the pmetric/ptrace mappings:

- **temporality conversion** (pdata/pmetric/aggregation_temporality.go):
  delta→cumulative is a running sum over (series, time) — a window
  cumsum; cumulative→delta is value - lag(value). These are the two
  real computations behind the enum.
- **histogram datapoints** (pdata/pmetric/generated_histogramdatapoint.go):
  explicit-bounds bucketing of the parsed latency attribute → per-series
  bucket counts + sum/min/max.
- **exponential histogram** (pdata/pmetric/generated_exponentialhistogramdatapoint.go):
  scale-0 base-2 buckets: index = floor(log2(value)).
- **spans from turns** (pdata/ptrace/generated_span.go:53-199): each
  tool turn becomes a span — TraceID from conv_id (16-byte hex),
  SpanID from (conv_id, turn_idx) (8-byte hex), kind from role,
  start/end timestamps.

All pure Catalyst; every one has a DuckDB-oracle-checkable shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BOUNDS = (10, 100, 500, 1000, 5000)


def trace_id_expr() -> Column:
    """THE TraceID derivation (md5(conv_id) → 32 hex = 16 bytes) —
    shared by spans, the log envelope and the log wire codec so the
    log↔trace join can never drift (r5 review finding: three
    hand-copies)."""
    return F.md5(F.col("conv_id"))


def span_id_expr() -> Column:
    """THE SpanID derivation (first 16 hex of md5(conv:turn) = 8
    bytes)."""
    return F.substring(
        F.md5(F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))), 1, 16
    )


def with_log_correlation(df: DataFrame) -> DataFrame:
    """Add the log↔trace correlation columns to a parsed frame: tool
    turns carry trace_id/span_id (the SAME derivation spans use) and
    flags=1 (W3C sampled); event_name = role[:tool] (tool column
    optional — degrades to role alone)."""
    is_tool = F.col("role") == "tool"
    ev = (
        F.concat_ws(":", F.col("role"), F.col("tool"))
        if "tool" in df.columns
        else F.col("role")
    )
    return (
        df.withColumn("trace_id", F.when(is_tool, trace_id_expr()))
        .withColumn("span_id", F.when(is_tool, span_id_expr()))
        .withColumn("flags", F.when(is_tool, F.lit(1)).otherwise(F.lit(0)))
        .withColumn("event_name", ev)
    )


# ----------------------------------------------------- temporality

def delta_to_cumulative(
    df: DataFrame,
    series_keys: tuple[str, ...] = ("svc",),
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """AGGREGATION_TEMPORALITY_DELTA → CUMULATIVE: running sum per series."""
    w = (
        Window.partitionBy(*series_keys)
        .orderBy(F.col(time_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cumulative", F.sum(value_col).over(w))


def cumulative_to_delta(
    df: DataFrame,
    series_keys: tuple[str, ...] = ("svc",),
    time_col: str = "ts",
    value_col: str = "cumulative",
) -> DataFrame:
    """CUMULATIVE → DELTA: first point of a series keeps its value
    (reset semantics: a fresh cumulative series starts at its value)."""
    w = Window.partitionBy(*series_keys).orderBy(F.col(time_col))
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(
        "delta", F.col(value_col) - F.coalesce(prev, F.lit(0))
    )


# ------------------------------------------------------- histograms

def _bucket_expr(v, bounds: tuple[int, ...]):
    """Upper-inclusive explicit-bounds bucket index: bucket i holds
    value <= bounds[i], overflow bucket last — the HistogramDataPoint
    contract. ONE when-fold shared by every bucketing caller (and
    mirrored literally in the oracle SQL) so the thresholds can never
    drift between the plain and exemplar-carrying datapoint builders."""
    bucket = F.lit(len(bounds))  # overflow
    for i in reversed(range(len(bounds))):
        bucket = F.when(v <= bounds[i], F.lit(i)).otherwise(bucket)
    return bucket.cast("int")


def gap_series(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
) -> DataFrame:
    """Series (key groups) whose rows carry ZERO recorded values — the
    groups a metrics producer marks with DataPointFlags.noRecordedValue
    (pmetric/metric_data_point_flags.go) instead of dropping, so a
    consumer can distinguish "no samples" from "series gone". One
    map-side-combined agg over the series keys; the result cardinality
    is bounded by the key space, never the row count."""
    v = F.col(value_col)
    return (
        df.groupBy(*series_keys)
        .agg(F.count(v).alias("_recorded"))
        .filter(F.col("_recorded") == 0)
        .drop("_recorded")
    )


def histogram_datapoints(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
    bounds: tuple[int, ...] = DEFAULT_BOUNDS,
    include_gap_series: bool = False,
) -> DataFrame:
    """Explicit-bounds histogram: bucket i = count(value ≤ bounds[i]),
    overflow bucket last — the HistogramDataPoint contract. With
    include_gap_series, series with no recorded values survive as one
    no-bucket row (NULL bucket_idx, zero count) that the envelope
    marks noRecordedValue."""
    v = F.col(value_col)
    if not include_gap_series:
        return (
            df.filter(v.isNotNull())
            .withColumn("bucket_idx", _bucket_expr(v, bounds))
            .groupBy(*series_keys, "bucket_idx")
            .agg(
                F.count(F.lit(1)).alias("bucket_count"),
                F.sum(v).cast("long").alias("value_sum"),
                F.min(v).alias("value_min"),
                F.max(v).alias("value_max"),
            )
        )
    # Gap rows in the SAME aggregation pass (r7, guide §2.3 "aggregate
    # before you shuffle" / one scan not two): NULL values bucket under
    # a NULL idx; count(v)/sum/min/max all skip NULLs, so that group is
    # exactly (0, NULL, NULL, NULL). Keep it only for series whose total
    # recorded count is zero — the genuine gap — via a window over the
    # bounded per-series aggregate (cardinality = key space, never the
    # row count). The r6 shape union'd a second full corpus scan.
    from pyspark.sql import Window

    out = (
        df.withColumn(
            "bucket_idx", F.when(v.isNotNull(), _bucket_expr(v, bounds))
        )
        .groupBy(*series_keys, "bucket_idx")
        .agg(
            F.count(v).alias("bucket_count"),
            F.sum(v).cast("long").alias("value_sum"),
            F.min(v).alias("value_min"),
            F.max(v).alias("value_max"),
        )
    )
    w = Window.partitionBy(*series_keys)
    return (
        out.withColumn("_tot", F.sum("bucket_count").over(w))
        .filter(F.col("bucket_idx").isNotNull() | (F.col("_tot") == 0))
        .drop("_tot")
    )


def histogram_datapoints_with_exemplars(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
    bounds: tuple[int, ...] = DEFAULT_BOUNDS,
) -> DataFrame:
    """Sparse histogram rows where each non-empty bucket carries its
    exemplar — the max-value measurement that landed in the bucket,
    with the recording span's context (pdata/pmetric/generated_exemplar.go;
    the aligned-bucket reservoir shape the OTel SDKs use). One
    aggregation: the exemplar is a lexicographic struct-max over
    (value, ts, trace_id, span_id, conv_id), so ties resolve
    deterministically and identically to the oracle's ORDER BY ... DESC
    window."""
    v = F.col(value_col)
    ex = F.max(
        F.struct(
            v.cast("long").alias("value"),
            (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("ts_ns"),
            trace_id_expr().alias("trace_id"),
            span_id_expr().alias("span_id"),
            F.col("conv_id").alias("conv"),
        )
    ).alias("_ex")
    return (
        df.filter(v.isNotNull())
        .withColumn("bucket_idx", _bucket_expr(v, bounds))
        .groupBy(*series_keys, "bucket_idx")
        .agg(F.count(F.lit(1)).alias("bucket_count"), ex)
        .select(
            *series_keys,
            "bucket_idx",
            "bucket_count",
            F.col("_ex.value").alias("ex_value"),
            F.col("_ex.ts_ns").alias("ex_ts_ns"),
            F.col("_ex.trace_id").alias("ex_trace_id"),
            F.col("_ex.span_id").alias("ex_span_id"),
            F.col("_ex.conv").alias("ex_conv"),
        )
    )


def exp_histogram_datapoints(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
    include_gap_series: bool = False,
) -> DataFrame:
    """Scale-0 exponential histogram, OTel bucket contract: buckets are
    lower-EXCLUSIVE / upper-INCLUSIVE, index = ceil(log2(v)) - 1 (the
    reference's MapToIndex; floor(log2) would put exact powers of two —
    common for integer latencies — one bucket too high). Zero values
    are the separate zerocount bucket."""
    v = F.col(value_col)
    idx = (F.ceil(F.log2(v)) - 1).cast("int")
    if not include_gap_series:
        return (
            df.filter(v.isNotNull())
            .withColumn("bucket_idx", F.when(v > 0, idx).otherwise(F.lit(None)))
            .groupBy(*series_keys, "bucket_idx")
            .agg(F.count(F.lit(1)).alias("bucket_count"))
        )
    # One scan, not two (r7 — same single-pass shape as
    # histogram_datapoints): NULL values fold into the NULL-idx group
    # alongside the zero bucket; count(v) counts only recorded values,
    # so the NULL-idx row's count is the zero-bucket total (or 0 for an
    # all-NULL series). Keep the NULL-idx row when it holds real zeros
    # OR the whole series recorded nothing (the gap marker); drop the
    # empty artifact a partially-NULL series would otherwise add.
    from pyspark.sql import Window

    out = (
        df.withColumn("bucket_idx", F.when(v.isNotNull() & (v > 0), idx))
        .groupBy(*series_keys, "bucket_idx")
        .agg(F.count(v).alias("bucket_count"))
    )
    w = Window.partitionBy(*series_keys)
    return (
        out.withColumn("_tot", F.sum("bucket_count").over(w))
        .filter(
            F.col("bucket_idx").isNotNull()
            | (F.col("bucket_count") > 0)
            | (F.col("_tot") == 0)
        )
        .drop("_tot")
    )


def summary_datapoints(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    include_gap_series: bool = False,
) -> DataFrame:
    """SummaryDataPoint: exact interpolated quantiles per series. With
    include_gap_series, no-recorded-value series survive as one
    zero-count row (NULL sum/quantiles) for the noRecordedValue path —
    computed in the SAME single aggregation pass: count/sum/percentile
    all skip NULLs, so the unfiltered agg yields exactly (0, NULL,
    NULL…) for an all-NULL group and the recorded values elsewhere (a
    gap_series union here doubled the corpus scan and read 2.3× on the
    bench; the histogram builders can't use this trick because their
    NULL-value rows would collide with the NULL-idx zero/gap bucket)."""
    v = F.col(value_col)
    aggs = [F.count(v).alias("n"), F.sum(v).cast("long").alias("value_sum")]
    qnames = [f"q{str(q).replace('0.', '')}" for q in quantiles]
    for q, qn in zip(quantiles, qnames):
        aggs.append(F.round(F.expr(f"percentile({value_col}, {q})"), 4).alias(qn))
    if include_gap_series:
        return df.groupBy(*series_keys).agg(*aggs)
    return df.filter(v.isNotNull()).groupBy(*series_keys).agg(*aggs)


# ----------------------------------------------------------- traces

def spans_from_turns(parsed: DataFrame) -> DataFrame:
    """Tool turns → ptrace.Span rows.

    TraceID = md5(conv_id) (32 hex = 16 bytes), SpanID = first 16 hex
    of md5(conv_id:turn_idx) (8 bytes), parent = previous tool turn in
    the conversation, kind mirrors SpanKind (client for tool calls).
    """
    spans = parsed.filter(F.col("role") == "tool").select(
        trace_id_expr().alias("trace_id"),
        span_id_expr().alias("span_id"),
        F.col("conv_id"),
        F.col("turn_idx"),
        # NB: concat (not concat_ws) — concat_ws silently skips NULL
        # operands and their separators; both sides coalesced so a NULL
        # in either never nulls the whole name
        F.concat(
            F.coalesce(F.col("tool"), F.lit("")),
            F.lit("/"),
            F.coalesce(F.col("svc"), F.lit("")),
        ).alias("name"),
        F.lit("SPAN_KIND_CLIENT").alias("kind"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.make_interval(secs=F.coalesce(F.col("latency_ms"), F.lit(0)) / 1000.0)).alias("end_ts"),
        F.when(F.col("level") == "ERROR", F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_OK"))
        .alias("status"),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return spans.withColumn("parent_span_id", F.lag("span_id").over(w))


SLOW_EVENT_THRESHOLD_MS = 8000

# W3C flag words the span derivations emit, COMPOSED from the wire
# codec's bit constants (one definition of the layout): every fixture
# span is sampled with a known is-remote bit; roots are remote (context
# arrived from the client), children are local.
from opentelemetry_collector_spark.functions.signalwire import (  # noqa: E402
    SPAN_FLAGS_HAS_IS_REMOTE,
    SPAN_FLAGS_IS_REMOTE,
    SPAN_FLAGS_SAMPLED,
)

CHILD_SPAN_FLAGS = SPAN_FLAGS_SAMPLED | SPAN_FLAGS_HAS_IS_REMOTE  # 257
ROOT_SPAN_FLAGS = CHILD_SPAN_FLAGS | SPAN_FLAGS_IS_REMOTE  # 769


def _kv(k: Column, v: Column) -> Column:
    return F.struct(k.alias("key"), v.alias("value"))


def rich_spans_from_turns(parsed: DataFrame) -> DataFrame:
    """spans_from_turns plus the full Span content surface
    (pdata/ptrace/generated_span.go:53-199): TraceState, span
    Attributes, Events, Links and Status.message — the r4 verdict gap
    (a subset codec silently drops exceptions-as-events / span links).

    Deterministic data-derived enrichment, all Catalyst and all
    DuckDB-mirrorable:
    - ``trace_state``: even turns carry ``ot=<svc|none>`` (odd turns
      NULL → absent on the wire, exercising presence);
    - ``attrs``: [(svc), (tool)] sorted by key, NULL values skipped —
      an empty set stays ``[]`` (canonical flat form; wire/JSON omit);
    - ``events``: ``exception`` (with ``exception.message`` = first 32
      body chars) when level=ERROR, plus ``slow`` (latency as string)
      when latency_ms > 8000 — an ERROR∧slow span carries BOTH
      (multi-event, non-vacuous in the fixtures);
    - ``links``: one to the parent span and one to the conversation's
      root span when they exist (turn ≥ 2 carries both — multi-link);
    - ``status_message``: first 48 body chars on ERROR spans with a
      non-empty body, else NULL (Status.message is error context);
    - ``flags`` (span and per-link; generated_span.go:90-97 W3C bits):
      sampled|has-is-remote everywhere, plus is-remote on root
      contexts — ROOT_SPAN_FLAGS (769) vs CHILD_SPAN_FLAGS (257).

    start_ns/end_ns are ns longs (end = start + latency_ms·10⁶) so the
    wire stage receives Catalyst-computed epochs.
    """
    tool_turns = parsed.filter(F.col("role") == "tool")
    start_ns = F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    end_ns = (
        start_ns
        + (F.coalesce(F.col("latency_ms"), F.lit(0)) * F.lit(1_000_000)).cast("long")
    )
    spans = tool_turns.select(
        trace_id_expr().alias("trace_id"),
        span_id_expr().alias("span_id"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.concat(
            F.coalesce(F.col("tool"), F.lit("")),
            F.lit("/"),
            F.coalesce(F.col("svc"), F.lit("")),
        ).alias("name"),
        F.lit("SPAN_KIND_CLIENT").alias("kind"),
        start_ns.alias("start_ns"),
        end_ns.alias("end_ns"),
        F.when(F.col("level") == "ERROR", F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_OK"))
        .alias("status"),
        F.col("svc"),
        F.col("tool"),
        F.col("level"),
        F.col("latency_ms"),
        F.coalesce(F.col("text"), F.lit("")).alias("_body"),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    spans = spans.withColumn("parent_span_id", F.lag("span_id").over(w)).withColumn(
        "_root_span_id", F.first("span_id").over(w)
    )
    attrs = F.filter(
        F.array(
            _kv(F.lit("svc"), F.col("svc")), _kv(F.lit("tool"), F.col("tool"))
        ),
        lambda x: x["value"].isNotNull(),
    )
    # candidate events/links carry a _keep flag so the filtered array
    # keeps ONE struct type (Spark can't type a bare empty array), then
    # transform strips the flag
    ev_candidates = F.array(
        F.struct(
            F.col("end_ns").alias("ts_ns"),
            F.lit("exception").alias("name"),
            F.array(
                _kv(F.lit("exception.message"), F.substring(F.col("_body"), 1, 32))
            ).alias("attrs"),
            (F.col("level") == "ERROR").alias("_keep"),
        ),
        F.struct(
            F.col("end_ns").alias("ts_ns"),
            F.lit("slow").alias("name"),
            F.array(
                _kv(F.lit("latency_ms"), F.col("latency_ms").cast("string"))
            ).alias("attrs"),
            (F.col("latency_ms") > SLOW_EVENT_THRESHOLD_MS).alias("_keep"),
        ),
    )
    events = F.transform(
        F.filter(ev_candidates, lambda e: F.coalesce(e["_keep"], F.lit(False))),
        lambda e: F.struct(
            e["ts_ns"].alias("ts_ns"), e["name"].alias("name"), e["attrs"].alias("attrs")
        ),
    )
    # Link.Flags mirror the LINKED context's W3C bits
    # (ptrace/generated_spanlink.go Flags, same mask semantics as
    # Span.Flags): sampled + has-is-remote always; is-remote when the
    # linked span is the trace root (the root context arrived from the
    # remote client) — non-vacuous: parent links to the root get
    # ROOT_SPAN_FLAGS, deeper parent links get CHILD_SPAN_FLAGS.
    link_candidates = F.array(
        F.struct(
            F.col("trace_id").alias("trace_id"),
            F.col("parent_span_id").alias("span_id"),
            F.lit(None).cast("string").alias("trace_state"),
            F.array(_kv(F.lit("link.type"), F.lit("parent"))).alias("attrs"),
            F.when(
                F.col("parent_span_id") == F.col("_root_span_id"),
                F.lit(ROOT_SPAN_FLAGS),
            ).otherwise(F.lit(CHILD_SPAN_FLAGS)).alias("flags"),
            F.col("parent_span_id").isNotNull().alias("_keep"),
        ),
        F.struct(
            F.col("trace_id").alias("trace_id"),
            F.col("_root_span_id").alias("span_id"),
            F.lit(None).cast("string").alias("trace_state"),
            F.array(_kv(F.lit("link.type"), F.lit("root"))).alias("attrs"),
            F.lit(ROOT_SPAN_FLAGS).alias("flags"),
            (F.col("_root_span_id") != F.col("span_id")).alias("_keep"),
        ),
    )
    links = F.transform(
        F.filter(link_candidates, lambda e: F.coalesce(e["_keep"], F.lit(False))),
        lambda e: F.struct(
            e["trace_id"].alias("trace_id"),
            e["span_id"].alias("span_id"),
            e["trace_state"].alias("trace_state"),
            e["attrs"].alias("attrs"),
            e["flags"].alias("flags"),
        ),
    )
    return spans.select(
        "conv_id",
        "turn_idx",
        "trace_id",
        "span_id",
        "parent_span_id",
        "name",
        "kind",
        "status",
        "start_ns",
        "end_ns",
        F.when(
            F.col("turn_idx") % 2 == 0,
            F.concat(F.lit("ot="), F.coalesce(F.col("svc"), F.lit("none"))),
        ).alias("trace_state"),
        attrs.alias("attrs"),
        events.alias("events"),
        links.alias("links"),
        F.when(
            (F.col("level") == "ERROR") & (F.length("_body") > 0),
            F.substring(F.col("_body"), 1, 48),
        ).alias("status_message"),
        # Span.Flags (generated_span.go:90-97, W3C semantics in
        # trace.proto SpanFlags): sampled + has-is-remote on every
        # span; is-remote on roots (their context arrived from the
        # remote client) — two distinct non-zero values in the fixture
        F.when(
            F.col("parent_span_id").isNull(), F.lit(ROOT_SPAN_FLAGS)
        ).otherwise(F.lit(CHILD_SPAN_FLAGS)).alias("flags"),
    )


def span_content_signatures(df: DataFrame) -> DataFrame:
    """Flatten the nested Span content (attrs/events/links) into
    deterministic signature strings covering EVERY field the wire and
    JSON codecs carry — the oracle-portable form (DuckDB rebuilds the
    same strings from the source table with window functions + CASE;
    hashing nested list<struct> values across engines is not
    portable). Empty lists sign as '' (never NULL)."""
    attr_sig = lambda a: F.array_join(  # noqa: E731
        F.transform(
            a,
            lambda x: F.concat(
                x["key"], F.lit("="), F.coalesce(x["value"], F.lit(""))
            ),
        ),
        ";",
    )
    return (
        df.withColumn("attrs_sig", attr_sig(F.col("attrs")))
        .withColumn(
            "events_sig",
            F.array_join(
                F.transform(
                    F.col("events"),
                    lambda e: F.concat(
                        e["name"], F.lit("@"), e["ts_ns"].cast("string"),
                        F.lit("{"), attr_sig(e["attrs"]), F.lit("}"),
                    ),
                ),
                "|",
            ),
        )
        .withColumn(
            "links_sig",
            F.array_join(
                F.transform(
                    F.col("links"),
                    lambda ln: F.concat(
                        ln["span_id"], F.lit("#"),
                        F.coalesce(ln["trace_state"], F.lit("")),
                        F.lit("~"), ln["flags"].cast("string"),
                        F.lit("{"), attr_sig(ln["attrs"]), F.lit("}"),
                    ),
                ),
                "|",
            ),
        )
        .drop("attrs", "events", "links")
    )


def signed_exp_histogram_datapoints(
    df: DataFrame,
    value_col: str = "delta",
    series_keys: tuple[str, ...] = ("svc",),
) -> DataFrame:
    """Scale-0 exponential histogram over a SIGNED series — the
    Negative/Positive bucket pair
    (pmetric/generated_exponentialhistogramdatapoint.go:138-146: both
    lists share the bucket contract, indexed over |v|): index =
    ceil(log2(|v|)) - 1 in the sign's own list, v == 0 → the zeroCount
    bucket. Per-bucket sum/min/max ride each row (the
    histogram_datapoints convention) so the envelope can reassemble the
    datapoint's OPTIONAL sum/min/max fields (generated_...go:93-110
    Sum/HasSum/RemoveSum) without a second scan. One shuffle on
    (keys, sign, bucket)."""
    v = F.col(value_col)
    av = F.abs(v)
    idx = (F.ceil(F.log2(av)) - 1).cast("int")
    sign = (
        F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .withColumn("bucket_sign", sign)
        .withColumn("bucket_idx", F.when(av > 0, idx))
        .groupBy(*series_keys, "bucket_sign", "bucket_idx")
        .agg(
            F.count(F.lit(1)).alias("bucket_count"),
            F.sum(v).cast("long").alias("value_sum"),
            F.min(v).alias("value_min"),
            F.max(v).alias("value_max"),
        )
    )
