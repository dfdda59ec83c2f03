"""Stateful streaming batch-tracker: state survives micro-batch
boundaries; emit-at-size contract holds across them."""

from __future__ import annotations

import pyarrow.parquet as pq

from opentelemetry_collector_spark import fixtures
from opentelemetry_collector_spark.streaming import micro, stateful


def test_state_spans_microbatches(spark, sf_dir, tmp_path):
    # 3 files → 3 micro-batches in one availableNow run (maxFilesPerTrigger=1)
    src = tmp_path / "src"
    src.mkdir()
    # small slice (1.2k rows, ~100 convs) keeps state-store overhead low
    t = pq.read_table(fixtures.ensure_transcripts(sf_dir))
    t = t.sort_by("conv_id").slice(0, 1200)
    step = -(-t.num_rows // 2)
    for i in range(2):
        pq.write_table(t.slice(i * step, step), src / f"p{i}.parquet")

    stream = micro.stream_transcripts(spark, str(src), max_files_per_trigger=1)
    # timeout far beyond the run so only size-flushes occur here
    tracked = stateful.batch_tracker_stream(
        stream, send_batch_size=8, timeout_ms=3_600_000
    )
    q = (
        tracked.writeStream.format("memory")
        .queryName("tracker")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from tracker").collect()
    assert rows, "no batches emitted"
    # with an hour-long timeout, every flush here is a size flush
    assert all(r["flush_reason"] == "size" for r in rows)
    assert all(r["n_turns"] == 8 for r in rows)
    # batch_seq dense per conversation
    per_conv: dict[str, list[int]] = {}
    for r in rows:
        per_conv.setdefault(r["conv_id"], []).append(r["batch_seq"])
    for conv, seqs in per_conv.items():
        assert sorted(seqs) == list(range(len(seqs))), conv
    emitted = sum(r["n_turns"] for r in rows)
    total = t.num_rows
    assert 0 < emitted <= total
    # remainder stays in state: size-8 batches can't cover every turn
    # (convs have ~12 turns → 4 left pending each)
    assert emitted < total
