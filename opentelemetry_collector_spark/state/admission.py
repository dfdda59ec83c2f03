"""Queue-admission contract — the memory_queue Offer edge.

The reference's exporter queue refuses work at ADMISSION when full
(exporter/exporterhelper/internal/queue/memory_queue.go:63-134):

    Offer(el):
        sizeof(el) == 0  → accepted no-op (empty-envelope spec)
        sizeof(el) <  0  → errInvalidSize
        sizeof(el) > cap → errSizeTooLarge (can NEVER be admitted)
        size + sizeof(el) > cap:
            block_on_overflow=false → ErrQueueIsFull (retryable refusal)
            block_on_overflow=true  → wait for hasMoreSpace

Spark mapping: the queue sits at the batch-admission edge of a sink
writer loop (a driver-side control structure — the DataFrames
themselves never pass through it). In batch mode there is no second
thread to signal hasMoreSpace, so ``block_on_overflow=True`` takes a
``drain`` callable: admission "blocks" by synchronously completing
in-flight work (the writer flush — exactly what frees queue space in
the reference) and retrying; in Structured Streaming the same knob is
trigger backpressure (micro-batches are admitted per trigger, so a
full queue simply defers to the next trigger — streaming/micro.py).

Accepted/refused counts feed the obsreport table (state/metrics.py
``receiver refused_log_records`` semantics at the exporter-queue
stage).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class QueueFullError(Exception):
    """ErrQueueIsFull — retryable: the caller may drain and re-offer."""


class InvalidSizeError(ValueError):
    """errInvalidSize — negative size is a caller bug."""


class SizeTooLargeError(ValueError):
    """errSizeTooLarge — exceeds capacity outright, never admittable."""


@dataclass
class AdmissionQueue:
    capacity: int
    block_on_overflow: bool = False
    size: int = 0
    accepted: int = 0
    refused: int = 0
    inflight: list[int] = field(default_factory=list)

    def offer(self, size: int, drain=None) -> bool:
        """Admit `size` units or refuse. Returns False for the empty
        no-op, True when admitted; raises on refusal/invalid sizes.

        With block_on_overflow, `drain` is called (possibly repeatedly,
        once per in-flight item) to free space — the synchronous analog
        of hasMoreSpace.Wait; a drain that frees nothing raises
        QueueFullError rather than spinning forever."""
        if size == 0:
            return False  # empty request: accepted without occupying space
        if size < 0:
            raise InvalidSizeError(f"invalid element size {size}")
        if size > self.capacity:
            raise SizeTooLargeError(
                f"element size {size} exceeds queue capacity {self.capacity}"
            )
        while self.size + size > self.capacity:
            if not self.block_on_overflow or drain is None:
                self.refused += 1
                raise QueueFullError(
                    f"queue full: {self.size}/{self.capacity}, offered {size}"
                )
            before = self.size
            drain()
            if self.size >= before:
                self.refused += 1
                raise QueueFullError("drain freed no space (would deadlock)")
        self.size += size
        self.inflight.append(size)
        self.accepted += 1
        return True

    def done(self, size: int) -> None:
        """Consumer completion (done.OnDone analog): frees space."""
        if size not in self.inflight:
            raise ValueError(f"done({size}) without a matching offer")
        self.inflight.remove(size)
        self.size -= size

    def metrics_rows(self, stage: str = "exporter_queue") -> list[tuple[str, str, int]]:
        """Rows in the state/metrics.py obsreport shape."""
        return [
            (stage, "accepted_items", self.accepted),
            (stage, "refused_items", self.refused),
            (stage, "inflight_size", self.size),
        ]
