"""Custom stateful streaming operator: the reserved EMA recurrences
(A1/A2) over `applyInPandasWithState`.

The batch engine computes these with a per-stream `applyInPandas` scan
(operators/stateful.py — a true recurrence has no window form). In live
mode the same kernel runs under Structured Streaming's arbitrary-state
API: one GroupState per stream carries (ema, dev, agc, initialized)
across micro-batches, so the streaming output is bit-identical to the
batch scan over the concatenated input — the same exactness contract as
the hot-loop seeds in streaming/state.py, expressed through Spark's
native stateful operator instead of foreachBatch bookkeeping.

Scale: state is four scalars per stream key, stored in the state store
(RocksDB/HDFS-backed at deployment); each micro-batch touches only the
keys present in the batch. Update rules mirrored from
/root/reference/src/TickHotLoopF32.jl:361-375 (preload 10 at :92).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_OUT_SCHEMA = (
    "stream string, tick_idx long, ema_delta long, ema_delta_dev long, ema_abs_delta long"
)
EMA_STATE_SCHEMA = "e long, v long, a long, init boolean"


def make_ema_kernel(agc_alpha: float = 0.125):
    """Returns the applyInPandasWithState function for ema_stream."""

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            e, v, a, init = state.get
        else:
            e, v, a, init = 0, 1, 10, False
        out_frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values("tick_idx")
            emas, devs, agcs = [], [], []
            for d, core in zip(pdf["delta_w"], pdf["is_core"]):
                if core:
                    d = int(d)
                    ad = abs(d)
                    if init:
                        e = e + ((d - e) >> 4)
                        v = v + ((abs(d - e) - v) >> 4)
                    else:
                        e, v, init = d, max(ad, 1), True
                    a = a + round((float(ad) - float(a)) * agc_alpha)
                emas.append(e)
                devs.append(v)
                agcs.append(a)
            out_frames.append(
                pd.DataFrame(
                    {
                        "stream": key[0],
                        "tick_idx": pdf["tick_idx"].to_numpy(),
                        "ema_delta": emas,
                        "ema_delta_dev": devs,
                        "ema_abs_delta": agcs,
                    }
                )
            )
        state.update((e, v, a, init))
        yield from out_frames

    return kernel


def ema_stream(ticks: DataFrame, agc_alpha: float = 0.125) -> DataFrame:
    """Streaming (stream, tick_idx, delta_w, is_core) -> per-tick EMA
    columns with per-stream state carried across micro-batches.

    ``ticks`` must be a streaming DataFrame; pair with
    ``outputMode("update")`` (each batch emits its rows exactly once; no
    watermark needed — the tick stream is in-order by contract)."""
    return ticks.groupBy("stream").applyInPandasWithState(
        make_ema_kernel(agc_alpha),
        outputStructType=EMA_OUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
