"""Partial-scrape semantics — the scrapererror contract.

Mirrors scraper/scrapererror consumed at
scraper/scraperhelper/controller.go:141-182: one scrape tick collects
from a set of targets; targets that fail produce ERRORS, not an
aborted scrape — the successfully scraped rows still forward to the
pipeline, and the error counts land in the obsreport metrics
(otelcol_scraper_scraped_* / otelcol_scraper_errored_*). The r3
quarantine/partial-success path covered the EXPORTER edge only; this
is the missing scrape edge.

Spark-first shape: targets are files/globs; readability is probed
driver-side from parquet footers (cheap metadata reads — the scrape
analog of a connection attempt), the surviving targets become ONE
multi-path scan so Catalyst still sees a single source to prune and
parallelize.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_collector_spark.state.metrics import StageMetrics


@dataclass
class ScrapeResult:
    """What one controller tick yields: forwarded rows + scrapererror
    list (scrapererror.PartialScrapeError carries the failed count;
    here each failed target is one entry)."""

    df: DataFrame
    errors: list[str] = field(default_factory=list)

    @property
    def failed(self) -> int:
        return len(self.errors)


def scrape_parquet_targets(
    spark: SparkSession, targets: list[str], schema: str
) -> ScrapeResult:
    """Scrape a target list; unreadable targets become errors, readable
    rows forward — a scrape only FAILS outright when every target does
    (controller.go: Scrape err != nil with no data forwards nothing but
    keeps ticking; partial errors forward the good rows)."""
    import glob as globmod
    from pathlib import Path

    import pyarrow.parquet as pq

    def probe(t: str) -> None:
        """Footer read of the target: a plain file, a glob pattern, or
        a directory dataset — including Hive-partitioned layouts whose
        part files live in key=val subdirectories (Spark writers also
        emit _SUCCESS markers that are not parquet, hence the
        *.parquet selection rather than read-everything)."""
        if any(ch in t for ch in "*?["):
            matches = sorted(globmod.glob(t))
            if not matches:
                raise FileNotFoundError(f"glob {t} matched nothing")
            for m in matches:
                probe(m)
            return
        p = Path(t)
        if p.is_dir():
            parts = sorted(p.rglob("*.parquet"))
            if not parts:
                raise FileNotFoundError(f"no parquet part files under {t}")
            for part in parts:
                pq.read_metadata(part)
        else:
            pq.read_metadata(t)

    good: list[str] = []
    errors: list[str] = []
    for t in targets:
        try:
            probe(t)
            good.append(t)
        except Exception as e:  # noqa: BLE001 — any unreadable target is a scrape error
            errors.append(f"{t}: {type(e).__name__}: {e}")
    if good:
        df = spark.read.schema(schema).parquet(*good)
    else:
        df = spark.createDataFrame([], schema)
    return ScrapeResult(df, errors)


def record_scrape(
    metrics: StageMetrics, result: ScrapeResult, stage: str = "scraper"
) -> int:
    """Obsreport for the scrape edge (the receiverhelper accepted/
    refused analog at the pull boundary): scraped row count + errored
    target count. Returns the scraped count (one action — callers
    already have the frame if they need it again)."""
    n = result.df.count()
    metrics.add(stage, "otelcol_scraper_scraped_log_records", n)
    metrics.add(stage, "otelcol_scraper_errored_targets", result.failed)
    return n
