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
