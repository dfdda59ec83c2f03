"""Structured Streaming mode: the pull/push receiver loop.

Reference semantics covered here:
- scraperhelper controller (scraper/scraperhelper/controller.go:88-182):
  periodic pull → forward. Spark-first: a file-source readStream with a
  processing-time or availableNow trigger — each trigger is one scrape.
- otlpreceiver push boundary: new files landing in the source dir are
  the arriving requests; the checkpoint dir gives the durable-resume
  contract natively (persistent_queue.go analog — Spark tracks consumed
  files exactly-once).
- batchprocessor timeout dimension (batch_processor.go:218-223): the
  trigger interval IS the flush timeout; send_batch_size maps to
  maxFilesPerTrigger/maxRecordsPerFile.

The stateless stages (parse → enrich → route) are the same code as
batch mode — one definition, two execution modes. The aggregate stage
uses event-time windows with a watermark for late data (a Spark
capability the reference lacks; documented divergence SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from opentelemetry_collector_spark.functions import parse as parse_mod
from opentelemetry_collector_spark.operators import enrich as enrich_mod
from opentelemetry_collector_spark.operators import route as route_mod
from opentelemetry_collector_spark.sources.tables import transcript_ddl


def stream_transcripts(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(transcript_ddl())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def routed_stream(spark: SparkSession, src_dir: str, **src_kw) -> DataFrame:
    """parse → enrich → route on a stream (same stage code as batch)."""
    df = stream_transcripts(spark, src_dir, **src_kw)
    df = parse_mod.with_parsed(df, method="native")
    df = enrich_mod.enrich_with_defaults(df, spark)
    return route_mod.with_sink(df)


def windowed_counts_stream(
    routed: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed per-sink counts with late-data watermark.

    NB: group by the window STRUCT and project .start afterwards —
    grouping by `.start` directly strips the watermark metadata, which
    breaks append mode and leaks state forever in update mode
    (verified on PySpark 4.1.2).
    """
    return (
        routed.withWatermark("ts", watermark)
        .groupBy("sink", F.window("ts", window))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select("sink", F.col("window.start").alias("window_start"), "n_turns")
    )


def run_to_sinks(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    trigger_seconds: int | None = None,
    **src_kw,
) -> StreamingQuery:
    """Fan-out sink writes per micro-batch via foreachBatch.

    Exactly-once: the streaming checkpoint records consumed files; each
    micro-batch write is an append of that batch's rows partitioned by
    sink (partition-by-sink append ≙ per-sink routed tables). A replayed
    epoch overwrites its own files (epoch_id in the path), mirroring the
    idempotent replace-where of batch mode.
    """
    routed = routed_stream(spark, src_dir, **src_kw)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy("sink")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    writer = routed.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        # scrape controller: collection_interval = processing-time trigger
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


# ------------------------------------------------------- hot config reload
#
# The reference supports partial graph reload on config change
# (service/internal/graph/graph.go:515-711: rebuild only the affected
# components, keep running on a failed reload). A Spark streaming plan
# is immutable once started, so the safe swap point is the micro-batch
# boundary: the foreachBatch body re-reads a watched config file
# between triggers, VALIDATES the new spec, and applies the reloadable
# stage (the filter rules) to subsequent batches — an invalid new
# config is recorded and the last-good one keeps serving, exactly the
# reference's failed-reload contract.


class ReloadableConfig:
    """Watch a YAML config file; swap the validated spec at poll time.

    Reloadable surface: the ``processors.filter`` rules (column +
    strict/regexp OR-set, operators/filter.py). The structural plan
    (parse/enrich/route) is fixed for the life of the stream — changing
    it requires a restart, as in a collector full-graph rebuild.
    """

    def __init__(self, path: str):
        self.path = path
        self._digest: str | None = None
        self.filter_set = None
        self.errors: list[str] = []
        self.reloads = 0
        # the INITIAL config must be valid — the collector refuses to
        # START on a bad config; only RELOADS fall back to last-good.
        # Read ONCE: digest and parsed spec must come from the same
        # bytes, or a write landing between two reads pins a digest
        # whose content was never applied.
        data = self._read_bytes()
        self.filter_set = self._load(data)
        self._digest = self._hash(data)

    def _read_bytes(self) -> bytes:
        with open(self.path, "rb") as f:
            return f.read()

    @staticmethod
    def _hash(data: bytes) -> str:
        import hashlib

        return hashlib.md5(data).hexdigest()

    def _load(self, data: bytes):
        import yaml

        from opentelemetry_collector_spark.operators.filter import FilterSet
        from opentelemetry_collector_spark.plans.config import ConfigError

        raw = yaml.safe_load(data.decode("utf-8")) or {}
        if not isinstance(raw, dict):
            raise ConfigError(f"config root must be a mapping, got {raw!r}")
        spec = (raw.get("processors") or {}).get("filter")
        if spec is None:
            return None
        if not isinstance(spec, dict) or "column" not in spec:
            raise ConfigError(f"processors.filter needs a column: {spec!r}")
        unknown = set(spec) - {"column", "strict", "regexp"}
        if unknown:
            raise ConfigError(f"unknown filter keys {sorted(unknown)}")
        return FilterSet(
            column=spec["column"],
            strict=tuple(spec.get("strict") or ()),
            regexp=tuple(spec.get("regexp") or ()),
        )

    def poll(self) -> bool:
        """Swap on a valid CONTENT change (digest of the SAME bytes
        that get parsed — mtime is unreliable for same-second rewrites,
        and a second read could race a writer). Returns True when a new
        config took effect. A failed load/validate keeps the last-good
        spec and appends to ``errors`` (the collector's failed-reload
        behavior); the broken version's digest is recorded so it is
        not re-logged every trigger."""
        from opentelemetry_collector_spark.plans.config import ConfigError

        try:
            data = self._read_bytes()
        except OSError:
            return False  # config file gone: keep serving last-good
        d = self._hash(data)
        if d == self._digest:
            return False
        self._digest = d
        try:
            new = self._load(data)
        except (ConfigError, ValueError) as e:
            self.errors.append(str(e))
            return False
        self.filter_set = new
        self.reloads += 1
        return True


def run_to_sinks_reloadable(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    config_path: str,
    available_now: bool = False,
    trigger_seconds: int | None = 1,
    **src_kw,
) -> tuple[StreamingQuery, ReloadableConfig]:
    """run_to_sinks with a hot-reloadable filter stage (see
    ReloadableConfig). Returns (query, reloader) so callers can inspect
    reload state/errors."""
    from opentelemetry_collector_spark.operators import filter as filter_mod

    rc = ReloadableConfig(config_path)
    routed = routed_stream(spark, src_dir, **src_kw)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        rc.poll()
        df = (
            filter_mod.include(batch_df, rc.filter_set)
            if rc.filter_set is not None
            else batch_df
        )
        (
            df.write.mode("overwrite")
            .partitionBy("sink")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    writer = routed.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start(), rc


def dedup_stream(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming ingest dedup: suppress re-delivered rows (retried
    requests, at-least-once sources) by unique key within a watermark
    horizon — dropDuplicatesWithinWatermark keeps the dedup state
    BOUNDED (keys older than the watermark are evicted), which is the
    only admissible shape for an unbounded stream; an unwatermarked
    dropDuplicates would grow state forever.

    This is the streaming face of the exactly-once contract the batch
    side gets from idempotent writes + the lineage manifest: the
    reference relies on the persistent queue's consumed-offset
    tracking, Spark's analog is checkpointed source offsets PLUS this
    key-level guard for duplicates the source itself re-sends."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
