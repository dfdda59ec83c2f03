"""Batch processor semantics, Spark-first.

The reference's batchprocessor (processor/batchprocessor/
batch_processor.go:38-58) regroups a stream into batches: emit at
``send_batch_size`` items, hard-cap ``send_batch_max_size`` via
structure-preserving split (splitlogs.go:11-67), optionally sharded by
client-metadata keys with a cardinality cap (batch_processor.go:299-366).

In Spark the *physical* regrouping is a write-shaping concern
(repartition + maxRecordsPerFile — see shape_for_write), but the
*logical* contract — which rows land in which batch, and batch count
parity — is testable. ``assign_batches`` reproduces it deterministically:
within each shard (metadata keys, default role+tool per
batch_processor.go:326-339), rows are ordered by the stable unique id
(conv_id, turn_idx) and chunked into ⌈n/size⌉ batches. Byte-based
sizing (the proto Sizer, pdata/plog/encoding.go:6-31) maps to
octet_length(text) — see with_byte_size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, DataFrameWriter, Window
from pyspark.sql import functions as F

DEFAULT_SEND_BATCH_SIZE = 8192  # factory.go:19-20 defaults
DEFAULT_METADATA_CARDINALITY_LIMIT = 1000  # config.go:43-46 default


class CardinalityLimitError(ValueError):
    """batch_processor.go:299-366 errTooManyBatchers analog."""


def with_byte_size(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Item byte size — the Sizer analog (octet_length of the payload)."""
    return df.withColumn("size_bytes", F.octet_length(F.col(text_col)))


def enforce_metadata_cardinality(
    df: DataFrame,
    shard_keys: tuple[str, ...] = ("role", "tool"),
    limit: int = DEFAULT_METADATA_CARDINALITY_LIMIT,
) -> int:
    """metadata_cardinality_limit (processor/batchprocessor/config.go:
    43-46): refuse to shard on a key set whose distinct-combination
    count exceeds the limit — unbounded cardinality silently explodes
    batch bookkeeping. The reference errors when a NEW combination
    arrives past the limit (batch_processor.go:330-339); batch-side we
    validate the whole input up front. Returns the observed cardinality.
    """
    n = df.select(*shard_keys).distinct().count()
    if n > limit:
        raise CardinalityLimitError(
            f"too many metadata-key combinations for {shard_keys}: "
            f"{n} > metadata_cardinality_limit {limit}"
        )
    return n


def _two_level_running(
    df: DataFrame,
    shard_keys: tuple[str, ...],
    order_keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    weight: Column | None = None,
) -> tuple[DataFrame, Column]:
    """Scale-safe per-shard inclusive running total of ``weight``
    (default 1 → the row's 1-based sequence) under order_keys order.

    A single window over partitionBy(shard_keys) is a scale-killer when
    the shard cardinality is low (~16 here): each shard's running total
    sorts its ENTIRE shard on one reducer. Instead (zipWithIndex-style):

    1. repartitionByRange on (shard_keys…, order_keys…): each shard's
       rows occupy a contiguous run of partitions, each locally ordered;
    2. tiny per-(partition, shard) sum aggregate → per-shard running
       offsets via a window over that aggregate (≤ partitions × shards
       rows — driver-small, never the data);
    3. partition-local running sum over (partition_id, shard) — group
       size is bounded by the PARTITION size (maxPartitionBytes), not
       the shard size — plus the broadcast offset.

    The total is a pure function of row columns (range boundaries only
    move WHICH partition computes a row, never its rank), so derived
    batch ids stay replay-stable. No collect; the offsets frame stays a
    lazy broadcast branch. Cost note: like zipWithIndex this is two
    passes over the shuffled data (~1.5-2× the naive window at sf0.1
    local[32], measured) — the price of removing the full-shard
    single-reducer sort that would never finish at 10^12 rows. A
    sampled-boundary CASE-expression bucketing was tried and rejected:
    the O(buckets) comparison chain falls out of codegen and costs more
    than the extra exchange. The returned frame carries the per-row
    weight as ``_w`` (callers drop it).
    """
    shard_cols = [F.col(k) for k in shard_keys]
    order_cols = [F.col(k) for k in order_keys]
    w = (weight if weight is not None else F.lit(1)).cast("long")
    # ONE materialization of the ranged frame (r7). `rp` feeds TWO plan
    # subtrees (the offsets aggregate and the probe side of the join),
    # and _pid = spark_partition_id() is only meaningful if both see
    # the SAME partitioning. Two independent evaluations do not
    # guarantee that: AQE re-optimizes each range exchange separately
    # (byte-based coalescing can differ), and RangePartitioner's
    # boundary sampling is seeded from the RDD id, which differs per
    # evaluation — either desyncs _pid and lands offsets on the wrong
    # shard slices (caught by tests/test_batch.py as flaky batch-size
    # violations when scan-split configs changed). The eager
    # localCheckpoint pins one partitioning for both consumers AND
    # replaces the second range exchange with a block read — one
    # shuffle of the data instead of two. The explicit partition count
    # keeps _pid replay-stable (user-specified counts are exempt from
    # AQE coalescing); blocks are ContextCleaner-reclaimed when the
    # frame is dereferenced (the lsh_candidate_pairs convention).
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    rp = (
        df.repartitionByRange(n_parts, *shard_cols, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_w", w)
        .localCheckpoint()
    )
    sums = rp.groupBy("_pid", *shard_cols).agg(F.sum("_w").alias("_s"))
    w_off = Window.partitionBy(*shard_cols).orderBy("_pid")
    offsets = sums.withColumn("_off", F.sum("_s").over(w_off) - F.col("_s")).drop(
        "_s"
    )
    w_local = (
        Window.partitionBy(F.col("_pid"), *shard_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = rp.join(F.broadcast(offsets), on=["_pid", *shard_keys])
    return joined, F.col("_off") + F.sum("_w").over(w_local)


def assign_batches(
    df: DataFrame,
    send_batch_size: int = DEFAULT_SEND_BATCH_SIZE,
    shard_keys: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """Deterministic batch assignment: per-shard sequence → batch_id.

    batch_id = floor((seq-1) / send_batch_size) where seq is the row's
    1-based position within its shard under (conv_id, turn_idx) order.
    Pure function of row columns → replay-stable. Sequencing is the
    two-level scheme in _per_shard_sequence (no full-shard windows).
    """
    joined, seq = _two_level_running(df, shard_keys)
    return joined.withColumn(
        "batch_id", ((seq - F.lit(1)) / F.lit(send_batch_size)).cast("long")
    ).select(*df.columns, "batch_id")


def serialized_size(df: DataFrame, cols: tuple[str, ...] | None = None) -> Column:
    """Serialized row size in bytes: octet_length of the row's OTLP-JSON
    encoding — the honest stand-in for the reference's proto Sizer
    (pdata/plog/encoding.go:6-31, exporterhelper/internal/sizer)."""
    names = list(cols) if cols else df.columns
    return F.octet_length(F.to_json(F.struct(*[F.col(c) for c in names])))


def assign_batches_by_bytes(
    df: DataFrame,
    max_batch_bytes: int,
    shard_keys: tuple[str, ...] = ("role", "tool"),
    size: Column | None = None,
) -> DataFrame:
    """Byte-capped batch assignment (the Sizer-driven MergeSplit path,
    exporterhelper/internal/queuebatch sizer=bytes).

    batch_id = floor(start_offset / max_batch_bytes) where start_offset
    is the shard's byte count BEFORE this row under (conv_id, turn_idx)
    order. Items are never split (MergeSplit moves whole items), so a
    batch may overshoot the cap by less than one item — same contract
    as the reference's item-preserving split. Default size is
    octet_length(text); pass serialized_size(df) for full-row JSON
    sizing.
    """
    sz = size if size is not None else F.octet_length(F.col("text"))
    joined, cum = _two_level_running(df, shard_keys, weight=sz)
    start = cum - F.col("_w")
    return joined.withColumn(
        "batch_id", (start / F.lit(max_batch_bytes)).cast("long")
    ).select(*df.columns, "batch_id")


def batch_counts(
    df: DataFrame,
    send_batch_size: int = DEFAULT_SEND_BATCH_SIZE,
    shard_keys: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """Batch count parity check: rows per (shard, batch_id).

    Invariants (batch_processor_test.go count-parity tests): every batch
    has ≤ send_batch_size rows; only the last batch of a shard may be
    smaller; sum over batches == shard row count.

    Column-pruned up front (r7, guide §2.3): batch_id is a pure
    function of (shard_keys, conv_id, turn_idx), and the two-level
    sequencer materializes its ranged frame (localCheckpoint) — an
    opaque boundary Catalyst cannot prune through — so the count path
    must not drag the payload columns (`text` is ~90% of the row) into
    that materialization.
    """
    slim = df.select(*dict.fromkeys([*shard_keys, "conv_id", "turn_idx"]))
    return (
        assign_batches(slim, send_batch_size, shard_keys)
        .groupBy(*shard_keys, "batch_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def shape_for_write(
    df: DataFrame,
    writer_rows_per_file: int = DEFAULT_SEND_BATCH_SIZE,
    shard_keys: tuple[str, ...] = ("sink",),
) -> tuple[DataFrame, dict[str, str]]:
    """Physical batching for the sink write path.

    repartition on the shard keys co-locates each shard (metadata-keyed
    batching, queuebatch/multi_batcher.go); maxRecordsPerFile is the
    send_batch_max_size split. Returns (df, writer options).
    """
    return (
        df.repartition(*[F.col(k) for k in shard_keys]),
        {"maxRecordsPerFile": str(writer_rows_per_file)},
    )


def shape_for_write_bytes(
    df: DataFrame,
    max_file_bytes: int = 128 * 1024 * 1024,
    shard_keys: tuple[str, ...] = ("sink",),
) -> tuple[DataFrame, dict[str, str]]:
    """Byte-capped physical batching: calibrate maxRecordsPerFile from
    the mean serialized row size (one tiny aggregate job — the only
    eager step) so output files land near the byte cap. Parquet has no
    native maxBytesPerFile; rows-per-file over the measured mean is the
    deterministic equivalent for near-uniform rows (heavy-tailed rows
    should size on percentile instead — callers can pass their own
    measurement through shape_for_write)."""
    row = df.agg(F.avg(serialized_size(df)).alias("avg")).first()
    avg = max(1.0, float(row["avg"] or 1.0))
    rows_per_file = max(1, int(max_file_bytes / avg))
    return shape_for_write(df, rows_per_file, shard_keys)


def apply_write_options(writer: DataFrameWriter, opts: dict[str, str]) -> DataFrameWriter:
    for k, v in opts.items():
        writer = writer.option(k, v)
    return writer
