"""Serial-EMA ceiling probe: the one intentionally serial operator.

ema_columns with no stream_id streams ONE sorted partition through
mapInPandas, carrying the A1/A2 recurrence state across Arrow batches —
memory O(batch), throughput single-core by contract (the reference's
global EMA state admits no parallel formulation; the scale path is
per-stream partitioning, measured in multistream_probe.py). This probe
puts a NUMBER on the documented contract: ticks/s and peak Python
worker RSS at 8M/24M synthetic ticks, recorded in PERF.md ("serial but
X K ticks/s — a day of ticks in Y s").

Usage: python scripts_dev/ema_ceiling_probe.py [n_ticks ...]  (default 8M 24M)
"""

from __future__ import annotations

import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, ".")


class WorkerRssSampler(threading.Thread):
    """Samples the summed + peak RSS of pyspark daemon/worker processes
    (the Arrow-batch Python side of mapInPandas) every 0.25 s."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.peak_sum_kb = 0
        self.peak_single_kb = 0
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            total = 0
            single = 0
            for p in Path("/proc").iterdir():
                if not p.name.isdigit():
                    continue
                try:
                    cmd = (p / "cmdline").read_bytes()
                    if b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd:
                        continue
                    for line in (p / "status").read_text().splitlines():
                        if line.startswith("VmRSS:"):
                            kb = int(line.split()[1])
                            total += kb
                            single = max(single, kb)
                            break
                except OSError:
                    continue
            self.peak_sum_kb = max(self.peak_sum_kb, total)
            self.peak_single_kb = max(self.peak_single_kb, single)
            self._stop.wait(0.25)

    def stop(self) -> None:
        self._stop.set()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8_000_000, 24_000_000]

    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.stateful import ema_columns
    from tickdatapipeline_spark.plans.common import SP_DERIV
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("ema-ceiling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the mapInPandas/Arrow path once so JIT/codegen is excluded
    warm = spark.range(1, 10_001).select(
        F.col("id").alias("tick_idx"),
        ((F.col("id") * 7) % 11 - 5).cast("long").alias("delta_w"),
        (F.col("id") % 5 != 0).alias("is_core"),
    )
    ema_columns(warm, SP_DERIV).write.format("noop").mode("overwrite").save()

    for n in sizes:
        src = spark.range(1, n + 1).select(
            F.col("id").alias("tick_idx"),
            ((F.col("id") * 7) % 11 - 5).cast("long").alias("delta_w"),
            (F.col("id") % 5 != 0).alias("is_core"),
        )
        sampler = WorkerRssSampler()
        sampler.start()
        t0 = time.time()
        ema_columns(src, SP_DERIV).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sampler.stop()
        print(
            f"{n:>12,} ticks  {dt:7.2f} s  {n / dt / 1e3:7.0f} K ticks/s  "
            f"peak worker RSS: single {sampler.peak_single_kb / 1024:.0f} MiB, "
            f"all {sampler.peak_sum_kb / 1024:.0f} MiB"
        )
    spark.stop()


if __name__ == "__main__":
    main()
