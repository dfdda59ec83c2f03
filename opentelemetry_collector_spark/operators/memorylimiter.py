"""Memory limiter: admission-control semantics (metric contract only).

The reference's memorylimiterprocessor refuses whole batches with a
retryable error when heap crosses soft/hard limits
(processor/memorylimiterprocessor/memorylimiter.go:83-97; limits and
GC backoff internal/memorylimiter/memorylimiter.go:42-100; config
internal/memorylimiter/config.go:34-76).

Spark has no analog need — executors spill and the scheduler applies
backpressure — so per SURVEY.md §2.2 we reproduce the *contract*, not
the heap probing: a size-based admission check over an input batch
that either admits all rows or refuses the whole batch (retryable),
with accepted/refused counts. Useful for incremental/streaming mode to
cap per-trigger work (the maxOffsetsPerTrigger analog).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataRefusedError(Exception):
    """Retryable admission rejection (consumererror ErrDataRefused)."""


@dataclass(frozen=True)
class MemoryLimiterConfig:
    limit_rows: int = 10_000_000
    spike_limit_rows: int = 2_000_000  # headroom below the hard limit

    @property
    def soft_limit_rows(self) -> int:
        return self.limit_rows - self.spike_limit_rows


def check_admission(
    df: DataFrame, cfg: MemoryLimiterConfig, current_rows: int = 0
) -> tuple[int, int]:
    """Admit or refuse the whole batch; returns (accepted, refused).

    Raises DataRefusedError (retryable, like ErrDataRefused) when the
    batch would push the tracked total past the soft limit — all-or-
    nothing, mirroring the reference's whole-batch refusal.
    """
    n = df.count()
    if current_rows + n > cfg.soft_limit_rows:
        raise DataRefusedError(
            f"batch of {n} rows refused: {current_rows} + {n} > "
            f"soft limit {cfg.soft_limit_rows}"
        )
    return n, 0


def admit_in_chunks(
    df: DataFrame,
    cfg: MemoryLimiterConfig,
    chunk_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Deterministic chunking for oversized inputs: assign an admission
    wave (pure function of the row's unique-id hash) so waves stay
    balanced. Hashing per ROW (not per key) matters: a per-key hash
    under hot-key skew can put one wave over the limit — the fixture
    itself puts ~30% of rows in ~1% of convs. Row-hash waves are
    binomially balanced regardless of key skew. 25% headroom covers the
    binomial tail. The batch-mode analog of retrying refused data in
    smaller pieces."""
    n = df.count()
    waves = max(1, -(-(n * 5) // max(1, cfg.soft_limit_rows * 4)))
    return df.withColumn(
        "admission_wave",
        F.pmod(F.xxhash64(*[F.col(c) for c in chunk_cols]), F.lit(waves)),
    )
