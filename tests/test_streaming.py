"""Streaming mode: incremental micro-batches match batch-mode results;
checkpoint gives exactly-once across restarts (the streaming analog of
the persistent-queue contract)."""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow.parquet as pq

from opentelemetry_collector_spark import fixtures
from opentelemetry_collector_spark.streaming import micro


def _split_fixture(sf_dir: str, dst: Path, parts: int = 3) -> list[Path]:
    """Split the transcripts fixture into N files (arriving 'requests')."""
    src = fixtures.ensure_transcripts(sf_dir)
    t = pq.read_table(src)
    n = t.num_rows
    step = -(-n // parts)
    dst.mkdir(parents=True, exist_ok=True)
    files = []
    for i in range(parts):
        chunk = t.slice(i * step, step)
        p = dst / f"part-{i}.parquet"
        pq.write_table(chunk, p)
        files.append(p)
    return files


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    _split_fixture(sf_dir, src)
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    q = micro.run_to_sinks(spark, str(src), str(out), str(ck))
    q.awaitTermination(120)

    got = spark.read.option("basePath", str(out)).parquet(str(out))
    from opentelemetry_collector_spark.plans import pipeline

    want = pipeline.routed_frame(spark, sf_dir)
    g = got.groupBy("sink").count().collect()
    w = want.groupBy("sink").count().collect()
    assert {r["sink"]: r["count"] for r in g} == {r["sink"]: r["count"] for r in w}


def test_stream_incremental_exactly_once(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    files = _split_fixture(sf_dir, tmp_path / "stage", parts=3)
    src.mkdir()
    shutil.copy(files[0], src / files[0].name)
    out, ck = tmp_path / "out", tmp_path / "ck"

    q = micro.run_to_sinks(spark, str(src), str(out), str(ck))
    q.awaitTermination(120)
    n1 = spark.read.option("basePath", str(out)).parquet(str(out)).count()

    # restart with one new file: only the new file is processed
    shutil.copy(files[1], src / files[1].name)
    q2 = micro.run_to_sinks(spark, str(src), str(out), str(ck))
    q2.awaitTermination(120)
    df = spark.read.option("basePath", str(out)).parquet(str(out))
    n2 = df.count()
    expected1 = pq.read_metadata(files[0]).num_rows
    expected2 = pq.read_metadata(files[1]).num_rows
    assert n1 == expected1
    assert n2 == expected1 + expected2
    # no duplicate (conv_id, turn_idx) ids anywhere
    assert df.select("conv_id", "turn_idx").distinct().count() == n2


def test_windowed_counts_stream_runs(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    _split_fixture(sf_dir, src)
    routed = micro.routed_stream(spark, str(src))
    agg = micro.windowed_counts_stream(routed)
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select sum(n_turns) s from wincounts").collect()
    assert rows[0]["s"] == pq.read_metadata(fixtures.ensure_transcripts(sf_dir)).num_rows


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time watermark contract: once the watermark passes a
    window's end, a straggler event for that window is DROPPED in
    append mode — the closed window's count excludes it."""
    import datetime as dt

    from opentelemetry_collector_spark.streaming import micro

    src = str(tmp_path / "src")

    def rows(ts_list, start_idx=0):
        return [
            (
                "conv-late", start_idx + i, "user",
                f"[INFO] svc=api latency_ms=5 req_id=conv-late:{start_idx + i} msg=a-b",
                "", dt.datetime(2025, 1, 1) + dt.timedelta(minutes=m),
            )
            for i, m in enumerate(ts_list)
        ]

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

    def write(rs, name):
        spark.createDataFrame(rs, schema).coalesce(1).write.mode("append").parquet(src)

    # batch 1: three rows in the 00:00 window + one at 03:00 that
    # advances the watermark (1h) to 02:00 — past the 00:00 window end
    write(rows([0, 10, 20, 180]), "f1")
    routed = micro.routed_stream(spark, src)
    counts = micro.windowed_counts_stream(routed, window="1 hour", watermark="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the (closed) 00:00 window + a fresh row
        write(rows([30, 240], start_idx=10), "f2")
        q.processAllAvailable()
        got = {
            (r["window_start"].isoformat(), r["n_turns"])
            for r in spark.table("wm_counts").collect()
        }
        # the 00:00 window closed with 3 rows; the late 00:30 row was dropped
        assert ("2025-01-01T00:00:00", 3) in got, got
        assert not any(w == "2025-01-01T00:00:00" and n != 3 for w, n in got)
    finally:
        q.stop()


def test_reloadable_config_swap_and_failed_reload(tmp_path):
    """graph.go failed-reload contract: a valid change swaps at poll;
    an invalid change keeps the last-good spec and records the error."""
    import time

    cfg = tmp_path / "live.yaml"
    cfg.write_text("processors:\n  filter:\n    column: role\n    strict: [user]\n")
    rc = micro.ReloadableConfig(str(cfg))
    assert rc.filter_set is not None and rc.filter_set.strict == ("user",)
    assert rc.reloads == 0

    time.sleep(0.02)
    cfg.write_text("processors:\n  filter:\n    column: role\n    strict: [tool]\n")
    import os

    os.utime(cfg, (time.time() + 1, time.time() + 1))  # force mtime change
    assert rc.poll() is True
    assert rc.filter_set.strict == ("tool",) and rc.reloads == 1

    cfg.write_text("processors:\n  filter:\n    column: role\n    bogus: [x]\n")
    os.utime(cfg, (time.time() + 2, time.time() + 2))
    assert rc.poll() is False
    assert rc.filter_set.strict == ("tool",)  # last-good kept
    assert rc.errors and "bogus" in rc.errors[-1]
    # same broken mtime isn't re-polled into duplicate errors
    assert rc.poll() is False and len(rc.errors) == 1


def test_stream_hot_reload_between_epochs(spark, sf_dir, tmp_path):
    """A running query picks up a validated config change at the next
    micro-batch: epoch written before the change obeys the old filter,
    the epoch after obeys the new one — no restart."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    files = _split_fixture(sf_dir, tmp_path / "stage", parts=3)
    cfg = tmp_path / "live.yaml"
    cfg.write_text("processors:\n  filter:\n    column: role\n    strict: [user]\n")
    out, ck = tmp_path / "out", tmp_path / "ck"

    shutil.copy(files[0], src / files[0].name)
    q, rc = micro.run_to_sinks_reloadable(
        spark, str(src), str(out), str(ck), str(cfg), trigger_seconds=1
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not (out / "epoch=0").exists():
            time.sleep(0.5)
        assert (out / "epoch=0").exists(), "first epoch never arrived"

        cfg.write_text(
            "processors:\n  filter:\n    column: role\n    strict: [tool]\n"
        )
        import os

        os.utime(cfg, (time.time() + 5, time.time() + 5))
        time.sleep(2)  # let an (empty or pending) trigger observe the swap
        shutil.copy(files[1], src / files[1].name)
        deadline = time.time() + 60
        later = lambda: [
            p for p in out.glob("epoch=*") if p.name != "epoch=0" and
            list(p.glob("sink=*"))
        ]
        while time.time() < deadline and not later():
            time.sleep(0.5)
        assert later(), "second epoch never arrived"
    finally:
        q.stop()

    first = spark.read.parquet(str(out / "epoch=0"))
    assert first.select("role").distinct().collect()[0]["role"] == "user"
    second = spark.read.option("basePath", str(out)).parquet(
        *[str(p) for p in later()]
    )
    roles = {r["role"] for r in second.select("role").distinct().collect()}
    assert roles == {"tool"}
    assert rc.reloads >= 1 and not rc.errors


def test_stream_dedup_suppresses_redelivery(spark, sf_dir, tmp_path):
    """A re-delivered file (at-least-once source) must contribute no
    duplicate rows downstream of dedup_stream — and the dedup state is
    watermark-bounded, not unbounded."""
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    files = _split_fixture(sf_dir, tmp_path / "stage", parts=3)
    shutil.copy(files[0], src / "a.parquet")
    # the SAME rows again under a different name: a retried request
    shutil.copy(files[0], src / "a-retry.parquet")
    out, ck = tmp_path / "out", tmp_path / "ck"

    stream = micro.stream_transcripts(spark, str(src))
    deduped = micro.dedup_stream(stream)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    n_unique = pq.read_table(files[0]).num_rows
    assert got.count() == n_unique
    assert got.select("conv_id", "turn_idx").distinct().count() == n_unique


def test_partial_scrape_forwards_good_rows_and_counts_errors(spark, tmp_path):
    """scrapererror semantics (scraper/scraperhelper/controller.go:
    141-182): a scrape over targets where some are unreadable forwards
    the readable rows and records the error count — it does NOT abort,
    and it does NOT silently drop the failure."""
    from opentelemetry_collector_spark.sources.scrape import (
        record_scrape,
        scrape_parquet_targets,
    )
    from opentelemetry_collector_spark.state.metrics import StageMetrics

    schema = "conv_id string, turn_idx int"
    good1 = str(tmp_path / "a.parquet")
    good2 = str(tmp_path / "b.parquet")
    spark.createDataFrame([("c1", 0), ("c1", 1)], schema).write.parquet(good1)
    spark.createDataFrame([("c2", 0)], schema).write.parquet(good2)
    corrupt = tmp_path / "c.parquet"
    corrupt.write_bytes(b"not parquet at all")
    missing = str(tmp_path / "nope.parquet")

    res = scrape_parquet_targets(
        spark, [good1, str(corrupt), good2, missing], schema
    )
    assert res.failed == 2
    metrics = StageMetrics()
    n = record_scrape(metrics, res)
    assert n == 3  # all rows from both readable targets forwarded
    rows = {(s, m): v for s, m, v in metrics.rows}
    assert rows[("scraper", "otelcol_scraper_scraped_log_records")] == 3
    assert rows[("scraper", "otelcol_scraper_errored_targets")] == 2

    # every target failing: nothing forwards, the tick still returns
    res_all_bad = scrape_parquet_targets(spark, [missing], schema)
    assert res_all_bad.failed == 1 and res_all_bad.df.count() == 0
