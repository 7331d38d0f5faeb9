"""Reserved EMA/AGC state surfaced as an analytics operator (A1/A2).

The reference computes three EMA recurrences per accepted tick but never
reads them ("reserved", /root/reference/src/TickHotLoopF32.jl:55-58,
361-375). They are TRUE recurrences — ema' = ema + ((x - ema) >> 4) is
not associative — so unlike the rest of the hot loop they cannot be a
window expression. This is the engine's one genuinely sequential
operator: an Arrow-batched ``applyInPandas`` per stream, exactly the
escape hatch SURVEY.md §2.3 prescribes.

Update rules mirrored from TickHotLoopF32.jl:361-375 (:92 preload 10):
- first core tick: ema_delta = d; ema_dev = max(|d|, 1)
- later: ema_delta += (d - ema_delta) >> 4          (arithmetic shift)
         ema_dev   += (|d - ema_delta'| - ema_dev) >> 4   (uses updated ema)
- AGC:   ema_abs   += round((|d| - ema_abs) * agc_alpha), init 10
  (round half-to-even, like Julia's round; exact for alpha=0.125)

Scale: one pandas group per stream, rows pre-sorted by Spark within the
group; the per-row loop is O(n) driver-free Python over numpy arrays.
At 100 TB each stream (session/day) is a bounded partition — the same
unit the reference processes sequentially by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from tickdatapipeline_spark.config import SignalProcessingConfig

EMA_SCHEMA_EXTRA = [
    StructField("ema_delta", LongType(), False),
    StructField("ema_delta_dev", LongType(), False),
    StructField("ema_abs_delta", LongType(), False),
]


def ema_columns(
    processed_internals: DataFrame,
    cfg: SignalProcessingConfig,
    stream_id: str | None = None,
) -> DataFrame:
    """processed ticks (keep_internals=True) -> + (ema_delta,
    ema_delta_dev, ema_abs_delta) columns.

    Only core ticks advance the state (the reference's early returns for
    zero/hold/first rows skip steps 5-6); every row reports the state as
    of that tick.
    """
    alpha = float(cfg.agc_alpha)
    in_cols = ["tick_idx", "delta_w", "is_core"]
    part = [stream_id] if stream_id else []
    src = processed_internals.select(*part, *in_cols)
    out_schema = StructType(
        [src.schema[c] for c in part] + [src.schema["tick_idx"]] + EMA_SCHEMA_EXTRA
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("tick_idx")
        deltas = pdf["delta_w"].to_numpy()
        core = pdf["is_core"].to_numpy()
        n = len(pdf)
        ema = np.zeros(n, dtype=np.int64)
        dev = np.zeros(n, dtype=np.int64)
        agc = np.zeros(n, dtype=np.int64)
        e, v, a, init = 0, 1, 10, False
        for i in range(n):
            if core[i]:
                d = int(deltas[i])
                ad = abs(d)
                if init:
                    e = e + ((d - e) >> 4)
                    v = v + ((abs(d - e) - v) >> 4)
                else:
                    e, v, init = d, max(ad, 1), True
                a = a + round((float(ad) - float(a)) * alpha)
            ema[i], dev[i], agc[i] = e, v, a
        out = {c: pdf[c] for c in part}
        out["tick_idx"] = pdf["tick_idx"]
        out["ema_delta"] = ema
        out["ema_delta_dev"] = dev
        out["ema_abs_delta"] = agc
        return pd.DataFrame(out)

    grouped = src.groupBy(*part) if part else src.groupBy(F.lit(0).alias("_g"))
    out = grouped.applyInPandas(kernel, schema=out_schema)
    join_keys = part + ["tick_idx"]
    return processed_internals.join(out.select(*join_keys, "ema_delta", "ema_delta_dev", "ema_abs_delta"), on=join_keys)
