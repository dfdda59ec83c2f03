"""Stable turn ordering.

The reference preserves arrival order within a batch (pdata slices are
ordered; MoveAndAppendTo keeps order). Our input rows arrive shuffled,
so the per-turn text-equality invariant (BASELINE.json input_hint)
needs an explicit total order per conversation: a window over
(conv_id, turn_idx).

Scale note: the window shuffles once on conv_id. Hot conv_ids are
bounded (~400 turns at sf0.1, and the generator caps conv size growth),
so per-partition sort state stays small; AQE skew handling covers the
rest. No global sort is ever required — ordering is per-conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_turn_order(df: DataFrame) -> DataFrame:
    """Add turn_seq = 1-based stable position of the turn in its conversation."""
    w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc())
    return df.withColumn("turn_seq", F.row_number().over(w))


def first_turns(df: DataFrame, n: int = 1) -> DataFrame:
    """First n turns of each conversation (deterministic top-k per key)."""
    return with_turn_order(df).filter(F.col("turn_seq") <= n)
