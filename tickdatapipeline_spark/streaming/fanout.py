"""Multi-consumer broadcast with priority semantics (C1-C4).

Mirrors the reference's TripleSplitManager
(/root/reference/src/TripleSplitSystem.jl:16-20, 109-305): named
consumers of type PRIORITY / MONITORING / ANALYTICS, duplicate-id
rejection, broadcast-to-all with per-consumer delivery accounting.

Spark's unit of fan-out is the micro-batch, not the row, so the
channel-full drop rule is emulated per batch: a PRIORITY consumer always
receives the whole batch (backpressure — the batch simply takes longer);
MONITORING/ANALYTICS consumers receive at most `buffer_size` rows per
batch and the remainder is counted as dropped. This is a documented
semantic translation of the reference's n_avail_items check
(TripleSplitSystem.jl:230-258), not a per-row replica of it.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConsumerType(Enum):
    PRIORITY = "PRIORITY"
    MONITORING = "MONITORING"
    ANALYTICS = "ANALYTICS"


@dataclass
class ConsumerStats:
    messages_sent: int = 0
    messages_dropped: int = 0
    batches: int = 0

    @property
    def fill_ratio(self) -> float:
        total = self.messages_sent + self.messages_dropped
        return self.messages_sent / total if total else 0.0


@dataclass
class Consumer:
    consumer_id: str
    ctype: ConsumerType
    buffer_size: int
    sink: Callable[[DataFrame, int], None]  # (batch_df, batch_id) -> None
    stats: ConsumerStats = field(default_factory=ConsumerStats)


class TripleSplitManager:
    """Consumer registry + batch broadcaster."""

    def __init__(self) -> None:
        self._consumers: dict[str, Consumer] = {}
        self._lock = threading.Lock()
        self.total_broadcasts = 0
        self.successful_broadcasts = 0

    def subscribe(
        self,
        consumer_id: str,
        ctype: ConsumerType,
        sink: Callable[[DataFrame, int], None],
        buffer_size: int = 2048,
    ) -> Consumer:
        with self._lock:
            if consumer_id in self._consumers:
                raise ValueError(f"consumer id already subscribed: {consumer_id}")
            c = Consumer(consumer_id, ctype, buffer_size, sink)
            self._consumers[consumer_id] = c
            return c

    def unsubscribe(self, consumer_id: str) -> bool:
        with self._lock:
            return self._consumers.pop(consumer_id, None) is not None

    def broadcast_batch(self, df: DataFrame, batch_id: int = 0) -> tuple[int, int, int]:
        """Deliver one batch to every consumer; returns
        (n_consumers, n_successful, total_rows_dropped)."""
        with self._lock:  # snapshot under lock, deliver outside
            consumers = list(self._consumers.values())
        n_rows = df.count()
        successful = 0
        dropped_total = 0
        for c in consumers:
            try:
                if c.ctype is ConsumerType.PRIORITY or n_rows <= c.buffer_size:
                    c.sink(df, batch_id)
                    c.stats.messages_sent += n_rows
                else:
                    c.sink(df.orderBy(F.col("tick_idx")).limit(c.buffer_size), batch_id)
                    c.stats.messages_sent += c.buffer_size
                    dropped = n_rows - c.buffer_size
                    c.stats.messages_dropped += dropped
                    dropped_total += dropped
                c.stats.batches += 1
                successful += 1
            except Exception:
                # a failing consumer must not take down the pipeline
                pass
        self.total_broadcasts += 1
        if successful == len(consumers):
            self.successful_broadcasts += 1
        return len(consumers), successful, dropped_total

    def stats(self) -> dict[str, dict]:
        with self._lock:
            return {
                cid: {
                    "type": c.ctype.value,
                    "messages_sent": c.stats.messages_sent,
                    "messages_dropped": c.stats.messages_dropped,
                    "fill_ratio": c.stats.fill_ratio,
                    "batches": c.stats.batches,
                }
                for cid, c in self._consumers.items()
            }
