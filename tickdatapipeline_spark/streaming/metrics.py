"""O2 pipeline metrics: per-batch latency accumulation + report query.

Mirrors the reference's ``PipelineMetrics`` accumulator
(/root/reference/src/PipelineOrchestrator.jl:19-33, cumulative +
min/max update :166-176) and the latency-report shape of its benchmark
suite (/root/reference/test/benchmark.jl:104-123): floor-index
percentile selection over the sorted observed latencies.

One observation in the reference is one tick (a per-tick hot loop); in
Spark the unit of execution is the micro-batch, so one observation here
is one micro-batch. The summary is a 1-row DataFrame so it composes
with the rest of the query surface (rows-only correctness: wall-clock
values are nondeterministic by nature).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class PipelineMetrics:
    """Accumulated pipeline statistics (PipelineOrchestrator.jl:19-33)."""

    ticks_processed: int = 0
    broadcasts_sent: int = 0
    errors: int = 0
    total_latency_us: int = 0
    signal_processing_time_us: int = 0
    broadcast_time_us: int = 0
    max_latency_us: int = 0
    min_latency_us: int = 2**31 - 1  # typemax sentinel until first batch
    latencies_us: list[int] = field(default_factory=list)

    def record_batch(
        self,
        *,
        ticks: int,
        total_us: int,
        signal_us: int = 0,
        broadcast_us: int = 0,
        broadcasts: int = 0,
        errors: int = 0,
    ) -> None:
        """One micro-batch worth of accumulation (:166-176 semantics:
        max tracks every observation, min ignores zero-latency ones)."""
        self.ticks_processed += ticks
        self.broadcasts_sent += broadcasts
        self.errors += errors
        self.total_latency_us += total_us
        self.signal_processing_time_us += signal_us
        self.broadcast_time_us += broadcast_us
        if total_us > self.max_latency_us:
            self.max_latency_us = total_us
        if 0 < total_us < self.min_latency_us:
            self.min_latency_us = total_us
        self.latencies_us.append(total_us)

    def summary_df(self, spark: SparkSession) -> DataFrame:
        """1-row latency report (benchmark.jl:104-123 shape).

        Percentiles use the reference's floor-index selection
        ``sorted[max(1, div(k*n, 100))]`` (1-based), not interpolation.
        """
        srt = sorted(self.latencies_us)
        n = len(srt)

        def pick(k: int) -> int:
            return srt[max(1, (k * n) // 100) - 1] if n else 0

        row = (
            n,
            self.ticks_processed,
            self.broadcasts_sent,
            self.errors,
            (float(self.total_latency_us) / n) if n else 0.0,
            srt[0] if n else 0,
            pick(50),
            pick(90),
            pick(95),
            pick(99),
            srt[-1] if n else 0,
            self.signal_processing_time_us,
            self.broadcast_time_us,
        )
        return spark.createDataFrame(
            [row],
            "sample_size long, ticks_processed long, broadcasts_sent long, "
            "errors long, avg_latency_us double, min_latency_us long, "
            "p50_latency_us long, p90_latency_us long, p95_latency_us long, "
            "p99_latency_us long, max_latency_us long, "
            "signal_processing_time_us long, broadcast_time_us long",
        )
