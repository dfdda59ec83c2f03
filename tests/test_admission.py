"""Queue-admission refusal contract (memory_queue.go:63-134 analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sinks import writers
from opentelemetry_collector_spark.state.admission import (
    AdmissionQueue,
    InvalidSizeError,
    QueueFullError,
    SizeTooLargeError,
)


def test_offer_edge_sizes():
    q = AdmissionQueue(capacity=10)
    assert q.offer(0) is False  # empty envelope: accepted no-op
    assert q.accepted == 0 and q.size == 0
    with pytest.raises(InvalidSizeError):
        q.offer(-1)
    with pytest.raises(SizeTooLargeError):
        q.offer(11)  # can never fit — not a retryable refusal
    assert q.refused == 0


def test_refusal_is_retryable_after_done():
    q = AdmissionQueue(capacity=10)
    assert q.offer(6) and q.offer(4)
    with pytest.raises(QueueFullError):
        q.offer(1)
    assert q.refused == 1
    q.done(6)
    assert q.offer(5)  # the refused caller re-offers and is admitted
    assert q.accepted == 3
    assert q.metrics_rows()[:2] == [
        ("exporter_queue", "accepted_items", 3),
        ("exporter_queue", "refused_items", 1),
    ]


def test_block_on_overflow_drains_synchronously():
    q = AdmissionQueue(capacity=10, block_on_overflow=True)
    q.offer(8)
    flushed = []

    def drain():
        if q.inflight:
            s = q.inflight[0]
            flushed.append(s)
            q.done(s)

    assert q.offer(7, drain=drain)  # blocks → drain(8) → admitted
    assert flushed == [8] and q.size == 7
    # a drain that frees nothing must error, not spin
    with pytest.raises(QueueFullError):
        q.offer(7, drain=lambda: None)


def test_refused_then_retried_delivery(spark, sf_dir, tmp_path):
    """The delivery scenario: batches offered to a capacity-limited
    queue; overflow batches are REFUSED, retried after the in-flight
    write completes, and the final sink content equals a direct write
    — refusal delays delivery, never duplicates or drops it."""
    from opentelemetry_collector_spark.sources import tables

    df = (
        tables.read_transcripts(spark, sf_dir)
        .filter(F.col("turn_idx") < 2)
        .select("conv_id", "turn_idx", "text")
    )
    batches = [
        df.filter(F.pmod(F.hash("conv_id"), F.lit(3)) == i).cache() for i in range(3)
    ]
    sizes = [b.count() for b in batches]
    q = AdmissionQueue(capacity=max(sizes))  # one batch in flight at a time
    written = []
    refusals = 0
    pending = list(zip(sizes, batches, range(3)))
    while pending:
        size, batch, idx = pending[0]
        try:
            q.offer(size)
        except QueueFullError:
            refusals += 1
            inflight = q.inflight[0]
            q.done(inflight)  # the in-flight write completes → space frees
            continue
        pending.pop(0)
        path = writers.write_sink(batch, str(tmp_path), "r1", f"part{idx}")
        written.append(path)
    for s in list(q.inflight):
        q.done(s)
    assert refusals >= 1 and q.refused == refusals
    assert q.accepted == 3 and q.size == 0
    got = spark.read.parquet(*written)
    assert got.count() == df.count()
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0
    for b in batches:
        b.unpersist()
