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
    # the full-shard window shape would be
    # windowspecdefinition(role, tool, conv_id ASC, turn_idx ASC, …) —
    # partitioned ONLY by the shard keys, ordered by the row keys
    bad = re.findall(r"windowspecdefinition\(role#\d+, tool#\d+, conv_id#\d+", plan)
    assert not bad, bad
    # the data-sized running-total window must carry the partition-local
    # key; the remaining window (per-shard offsets) runs over the tiny
    # counts aggregate ordered by _pid
    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert specs and all("_pid" in s for s in specs), specs


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


def test_byte_batches_cap_with_one_item_overshoot(transcripts):
    """Sizer=bytes MergeSplit contract: items are never split, so each
    batch's byte sum stays under cap + (its last item); every non-final
    batch crosses the cap boundary only via its last item."""
    cap = 8 * 1024
    out = batch.assign_batches_by_bytes(transcripts, cap)
    agg = out.groupBy("role", "tool", "batch_id").agg(
        F.sum(F.octet_length("text")).alias("bytes_sum"),
        F.max(F.octet_length("text")).alias("max_item"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    per_shard: dict[tuple, list] = {}
    for r in agg:
        per_shard.setdefault((r["role"], r["tool"]), []).append(r)
    for shard, rows in per_shard.items():
        rows.sort(key=lambda r: r["batch_id"])
        assert [r["batch_id"] for r in rows] == list(range(len(rows))), shard
        for r in rows[:-1]:
            # start-offset rule: a batch ends because its last item
            # crossed the cap → sum < cap + last item ≤ cap + max item
            assert r["bytes_sum"] < cap + r["max_item"], shard


def test_byte_batches_deterministic(transcripts):
    a = batch.assign_batches_by_bytes(transcripts, 4096).select(
        "conv_id", "turn_idx", "batch_id"
    )
    b = batch.assign_batches_by_bytes(transcripts.repartition(5), 4096).select(
        "conv_id", "turn_idx", "batch_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_shape_for_write_bytes(spark, transcripts, tmp_path):
    """Byte-capped file outputs: every written file lands near/under
    the cap (rows-per-file calibrated from mean serialized size)."""
    from pathlib import Path

    cap = 64 * 1024
    shaped, opts = batch.shape_for_write_bytes(
        transcripts.withColumn("sink", F.lit("s1")), cap, shard_keys=("sink",)
    )
    w = shaped.write.mode("overwrite")
    w = batch.apply_write_options(w, opts)
    path = str(tmp_path / "bytecap")
    w.json(path)  # JSON output so file bytes ≈ serialized_size calibration
    sizes = [p.stat().st_size for p in Path(path).glob("*.json") if p.stat().st_size]
    assert sizes
    # mean-based calibration: allow slack for per-row variance
    assert max(sizes) < cap * 1.5
