"""Batch processor count-parity invariants
(processor/batchprocessor/batch_processor_test.go analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import batch


def test_batch_size_invariants(transcripts):
    size = 100
    counts = batch.batch_counts(transcripts, send_batch_size=size).collect()
    per_shard: dict[tuple, list] = {}
    for r in counts:
        per_shard.setdefault((r["role"], r["tool"]), []).append(r)
    total = 0
    for shard, rows in per_shard.items():
        rows.sort(key=lambda r: r["batch_id"])
        ns = [r["n_rows"] for r in rows]
        total += sum(ns)
        assert all(n <= size for n in ns)
        # only the last batch may be smaller (emit-at-size contract)
        assert all(n == size for n in ns[:-1]), shard
        # batch ids are dense 0..k-1
        assert [r["batch_id"] for r in rows] == list(range(len(rows)))
    assert total == transcripts.count()


def test_assignment_deterministic_under_repartition(transcripts):
    a = batch.assign_batches(transcripts, 64).select("conv_id", "turn_idx", "batch_id")
    b = batch.assign_batches(transcripts.repartition(7), 64).select(
        "conv_id", "turn_idx", "batch_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_two_level_sequence_matches_global_window(transcripts):
    """The scale-safe scheme must equal the specification window
    (row_number over partitionBy(shard) orderBy(conv_id, turn_idx))
    batch-for-batch."""
    from pyspark.sql import Window

    w = Window.partitionBy("role", "tool").orderBy("conv_id", "turn_idx")
    spec = transcripts.withColumn(
        "batch_id", ((F.row_number().over(w) - F.lit(1)) / F.lit(64)).cast("long")
    ).select("conv_id", "turn_idx", "batch_id")
    got = batch.assign_batches(transcripts, 64).select("conv_id", "turn_idx", "batch_id")
    assert got.exceptAll(spec).count() == 0 and spec.exceptAll(got).count() == 0


def test_no_full_shard_window(transcripts):
    """Plan evidence: no Window partitioned ONLY by the (low-cardinality)
    shard keys — every window spec must include the partition-local _pid
    key, so group size is bounded by partition size, not shard size."""
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        batch.assign_batches(transcripts, 64).explain("formatted")
    plan = buf.getvalue()
    # offsets window runs over the tiny counts aggregate (partitions ×
    # shards rows); the data-sized window must carry _pid
    data_windows = [
        ln for ln in plan.splitlines()
        if "row_number()" in ln and "windowspecdefinition" in ln
    ]
    assert data_windows, "expected the local-rank window in the plan"
    assert all("_pid" in ln for ln in data_windows), data_windows


def test_metadata_cardinality_limit(transcripts):
    """config.go:43-46 / batch_processor.go errTooManyBatchers analog."""
    import pytest

    n = batch.enforce_metadata_cardinality(transcripts, ("role", "tool"), limit=1000)
    assert 0 < n <= 16
    with pytest.raises(batch.CardinalityLimitError, match="metadata_cardinality_limit"):
        batch.enforce_metadata_cardinality(transcripts, ("conv_id",), limit=10)


def test_byte_sizer(transcripts):
    sized = batch.with_byte_size(transcripts)
    bad = sized.filter(F.octet_length("text") != F.col("size_bytes"))
    assert bad.count() == 0
