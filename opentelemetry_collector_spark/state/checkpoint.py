"""Durable progress + resume: the persistent_queue contract, Spark-first.

Reference semantics (exporter/exporterhelper/internal/queue/
persistent_queue.go:50-73, 272, 321, 394, 430-448): a durable queue
persists read index, write index and the *currently dispatched* item
set; on restart, dispatched-but-unfinished items are re-enqueued →
at-least-once replay, and the exporter's dedup/overwrite makes the
effect exactly-once.

Spark-native translation: the unit of work is a **(run_id, sink)
commit** rather than a queue item. A JSON lineage manifest records
each unit's state machine:

    pending → dispatched → committed

``run_with_resume`` walks all units; units already ``committed`` are
skipped, anything else (pending OR dispatched — i.e. a crash mid-write)
is re-executed. Because every sink write is an idempotent overwrite of
a deterministic path (sinks/writers.write_sink), replaying a
dispatched unit replaces partial output instead of duplicating it —
the analog of retrieveAndEnqueueNotDispatchedReqs + client-side dedup.

The manifest write itself is atomic (tmp + rename) so a crash during
bookkeeping is indistinguishable from a crash before it — both replay.

In streaming mode this whole module is subsumed by Spark's checkpoint
dir + an exactly-once sink; it exists for the batch/incremental path.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable
from pathlib import Path

PENDING = "pending"
DISPATCHED = "dispatched"
COMMITTED = "committed"


class LineageManifest:
    """Per-run unit-of-work state, durable as one JSON file."""

    def __init__(self, checkpoint_dir: str, run_id: str):
        self.path = Path(checkpoint_dir) / f"lineage_{run_id}.json"
        self.run_id = run_id
        self._state: dict[str, str] = {}
        if self.path.exists():
            self._state = json.loads(self.path.read_text())

    def _flush(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self._state, sort_keys=True))
        os.replace(tmp, self.path)

    def ensure_units(self, units: Iterable[str]) -> None:
        for u in units:
            self._state.setdefault(u, PENDING)
        self._flush()

    def state(self, unit: str) -> str:
        return self._state.get(unit, PENDING)

    def mark(self, unit: str, state: str) -> None:
        if state not in (PENDING, DISPATCHED, COMMITTED):
            # explicit raise: an assert would vanish under python -O and
            # let a typo'd state persist, replaying the unit forever
            raise ValueError(f"invalid lineage state {state!r} for {unit!r}")
        self._state[unit] = state
        self._flush()

    def incomplete(self) -> list[str]:
        """Units needing (re-)execution on resume — pending AND
        dispatched (crashed mid-write), per persistent_queue.go:430-448."""
        return sorted(u for u, s in self._state.items() if s != COMMITTED)

    def committed(self) -> list[str]:
        return sorted(u for u, s in self._state.items() if s == COMMITTED)


class SimulatedCrash(Exception):
    """Test hook: raised mid-run to exercise the resume path."""


def run_with_resume(
    manifest: LineageManifest,
    units: list[str],
    execute: Callable[[str], None],
    crash_after: str | None = None,
) -> list[str]:
    """Execute all units with durable progress; returns units run now.

    ``execute(unit)`` must be idempotent (overwrite semantics). A crash
    between mark(DISPATCHED) and mark(COMMITTED) leaves the unit
    incomplete; the next call replays it.
    """
    manifest.ensure_units(units)
    ran: list[str] = []
    for unit in units:
        if manifest.state(unit) == COMMITTED:
            continue
        manifest.mark(unit, DISPATCHED)
        execute(unit)
        ran.append(unit)
        if crash_after == unit:
            raise SimulatedCrash(unit)  # before COMMITTED: replay on resume
        manifest.mark(unit, COMMITTED)
    return ran
