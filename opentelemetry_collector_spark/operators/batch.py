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

from pyspark.sql import DataFrame, DataFrameWriter, Window
from pyspark.sql import functions as F

DEFAULT_SEND_BATCH_SIZE = 8192  # factory.go:19-20 defaults


def with_byte_size(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Item byte size — the Sizer analog (octet_length of the payload)."""
    return df.withColumn("size_bytes", F.octet_length(F.col(text_col)))


def assign_batches(
    df: DataFrame,
    send_batch_size: int = DEFAULT_SEND_BATCH_SIZE,
    shard_keys: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """Deterministic batch assignment: per-shard sequence → batch_id.

    batch_id = floor((seq-1) / send_batch_size) where seq is the row's
    1-based position within its shard under (conv_id, turn_idx) order.
    Pure function of row columns → replay-stable.
    """
    w = Window.partitionBy(*[F.col(k) for k in shard_keys]).orderBy(
        F.col("conv_id"), F.col("turn_idx")
    )
    seq = F.row_number().over(w)
    return df.withColumn(
        "batch_id", ((seq - F.lit(1)) / F.lit(send_batch_size)).cast("long")
    )


def batch_counts(
    df: DataFrame,
    send_batch_size: int = DEFAULT_SEND_BATCH_SIZE,
    shard_keys: tuple[str, ...] = ("role", "tool"),
) -> DataFrame:
    """Batch count parity check: rows per (shard, batch_id).

    Invariants (batch_processor_test.go count-parity tests): every batch
    has ≤ send_batch_size rows; only the last batch of a shard may be
    smaller; sum over batches == shard row count.
    """
    return (
        assign_batches(df, send_batch_size, shard_keys)
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


def apply_write_options(writer: DataFrameWriter, opts: dict[str, str]) -> DataFrameWriter:
    for k, v in opts.items():
        writer = writer.option(k, v)
    return writer
