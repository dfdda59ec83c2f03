"""Custom stateful streaming operator: the batchprocessor's
accumulate-and-flush contract as applyInPandasWithState.

The reference's batch processor holds items per shard and emits when
``send_batch_size`` is reached or ``timeout`` elapses
(processor/batchprocessor/batch_processor.go:38-58, shard loop
:189-239). In batch mode we reproduce only the *assignment* contract
(operators/batch.py); in streaming mode the accumulation itself is
real state that must survive micro-batch boundaries — exactly what
``applyInPandasWithState`` provides:

- group the stream by the shard key (conv_id);
- state = (pending_count, first_ts, last_ts, emitted_batches);
- each micro-batch folds its rows into state, emits one output row per
  full batch of ``send_batch_size`` turns, keeps the remainder;
- a processing-time timeout flushes stragglers (the timeout dimension).

Arrow-batched both directions (pandas in/out), zero per-row Python in
the hot loop beyond pandas ops.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, batch_seq int, n_turns long, flush_reason string"
)
STATE_SCHEMA = "pending long, emitted int"


def _tracker(send_batch_size: int, timeout_ms: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            pending, emitted = state.get if state.exists else (0, 0)
            if pending > 0:
                # keep the emitted counter: removing state here would
                # restart batch_seq at 0 if the conversation resumes,
                # emitting duplicate (conv_id, batch_seq) keys. State for
                # idle convs is GC'd only once nothing was pending
                # (mirrors the reference's idle-shard GC after N cycles,
                # partition_batcher.go).
                # keep state but do NOT re-arm the timer: an idle conv
                # would otherwise fire a no-op timeout every timeout_ms
                # forever; new data re-arms in the main branch
                state.update((0, emitted + 1))
                yield pd.DataFrame(
                    {
                        "conv_id": [conv_id],
                        "batch_seq": [emitted],
                        "n_turns": [pending],
                        "flush_reason": ["timeout"],
                    }
                )
            elif emitted == 0:
                state.remove()  # nothing ever emitted: safe to forget
            else:
                # idle but has history: keep the counter (no timer) so a
                # resumed conversation cannot reuse an emitted batch_seq
                state.update((0, emitted))
            return

        pending, emitted = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            pending += len(pdf)

        out_rows: dict[str, list[Any]] = {
            "conv_id": [],
            "batch_seq": [],
            "n_turns": [],
            "flush_reason": [],
        }
        while pending >= send_batch_size:  # emit-at-size contract
            out_rows["conv_id"].append(conv_id)
            out_rows["batch_seq"].append(emitted)
            out_rows["n_turns"].append(send_batch_size)
            out_rows["flush_reason"].append("size")
            pending -= send_batch_size
            emitted += 1

        state.update((pending, emitted))
        state.setTimeoutDuration(timeout_ms)
        if out_rows["conv_id"]:
            yield pd.DataFrame(out_rows)

    return fn


def batch_tracker_stream(
    routed: DataFrame, send_batch_size: int = 64, timeout_ms: int = 60_000
) -> DataFrame:
    """Apply the stateful accumulate-and-flush operator to a stream."""
    return routed.groupBy("conv_id").applyInPandasWithState(
        _tracker(send_batch_size, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
