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


def test_byte_sizer(transcripts):
    sized = batch.with_byte_size(transcripts)
    bad = sized.filter(F.octet_length("text") != F.col("size_bytes"))
    assert bad.count() == 0
