"""Reserved EMA/AGC state surfaced as an analytics operator (A1/A2).

The reference computes three EMA recurrences per accepted tick but never
reads them ("reserved", /root/reference/src/TickHotLoopF32.jl:55-58,
361-375). They are TRUE recurrences — ema' = ema + ((x - ema) >> 4) is
not associative — so unlike the rest of the hot loop they cannot be a
window expression or a two-pass chunked plan (a chunk's end state
depends on its start state, so chunk offsets cannot be computed
independently). This is the engine's ONE intentionally sequential
operator: the serial contract below is explicit and tested, and the
cost is bounded wall-clock-serial but MEMORY-BOUNDED:

- per-stream (``stream_id`` given): Arrow-batched ``applyInPandas`` per
  stream — streams process in parallel, each group is a bounded unit
  (session/day), the same unit the reference processes sequentially by
  construction.
- single-stream (no ``stream_id``): a streaming ``mapInPandas`` over
  ONE sorted partition, carrying the (ema, dev, agc) state across
  Arrow batches — the task is serial (inherent to the recurrence; the
  plan's SinglePartition exchange is the documented contract), but
  memory is O(arrow batch), not O(stream), so an arbitrarily long
  stream cannot OOM the one python worker. Bit-equality of the two
  kernels is structural (one shared stepper) and pinned by
  tests/test_stateful.py::test_single_stream_streaming_kernel_bit_equal.

Update rules mirrored from TickHotLoopF32.jl:361-375 (:92 preload 10):
- first core tick: ema_delta = d; ema_dev = max(|d|, 1)
- later: ema_delta += (d - ema_delta) >> 4          (arithmetic shift)
         ema_dev   += (|d - ema_delta'| - ema_dev) >> 4   (uses updated ema)
- AGC:   ema_abs   += round((|d| - ema_abs) * agc_alpha), init 10
  (round half-to-even, like Julia's round; exact for alpha=0.125)
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

# (ema_delta, ema_dev, ema_abs, initialized) before the first core tick
EMA_STATE0 = (0, 1, 10, False)


def _ema_step(deltas: np.ndarray, core: np.ndarray, alpha: float, state: tuple):
    """Advance the recurrence over one batch of rows from ``state``;
    returns the per-row state arrays and the carry-out state. Shared by
    the per-stream group kernel and the single-stream batch-streaming
    kernel so the two are bit-identical by construction."""
    e, v, a, init = state
    n = len(deltas)
    ema = np.zeros(n, dtype=np.int64)
    dev = np.zeros(n, dtype=np.int64)
    agc = np.zeros(n, dtype=np.int64)
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
    return ema, dev, agc, (e, v, a, init)


def ema_columns(
    processed_internals: DataFrame,
    cfg: SignalProcessingConfig,
    stream_id: str | None = None,
) -> DataFrame:
    """processed ticks (keep_internals=True) -> + (ema_delta,
    ema_delta_dev, ema_abs_delta) columns.

    Only core ticks advance the state (the reference's early returns for
    zero/hold/first rows skip steps 5-6); every row reports the state as
    of that tick. See the module docstring for the serial contract of
    each path.
    """
    alpha = float(cfg.agc_alpha)
    in_cols = ["tick_idx", "delta_w", "is_core"]
    part = [stream_id] if stream_id else []
    src = processed_internals.select(*part, *in_cols)
    out_schema = StructType(
        [src.schema[c] for c in part] + [src.schema["tick_idx"]] + EMA_SCHEMA_EXTRA
    )

    if part:
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("tick_idx")
            ema, dev, agc, _ = _ema_step(
                pdf["delta_w"].to_numpy(), pdf["is_core"].to_numpy(), alpha, EMA_STATE0
            )
            out = {c: pdf[c] for c in part}
            out["tick_idx"] = pdf["tick_idx"]
            out["ema_delta"] = ema
            out["ema_delta_dev"] = dev
            out["ema_abs_delta"] = agc
            return pd.DataFrame(out)

        out = src.groupBy(*part).applyInPandas(kernel, schema=out_schema)
    else:
        # single stream: one sorted partition streamed through mapInPandas
        # with the state carried across Arrow batches — memory O(batch)
        def stream_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            state = EMA_STATE0
            for pdf in batches:
                # batches are ordered slices of the sorted partition
                ema, dev, agc, state = _ema_step(
                    pdf["delta_w"].to_numpy(), pdf["is_core"].to_numpy(), alpha, state
                )
                yield pd.DataFrame(
                    {
                        "tick_idx": pdf["tick_idx"],
                        "ema_delta": ema,
                        "ema_delta_dev": dev,
                        "ema_abs_delta": agc,
                    }
                )

        out = (
            src.repartition(1)
            .sortWithinPartitions("tick_idx")
            .mapInPandas(stream_kernel, schema=out_schema)
        )
    join_keys = part + ["tick_idx"]
    return processed_internals.join(out.select(*join_keys, "ema_delta", "ema_delta_dev", "ema_abs_delta"), on=join_keys)


# ================= Wilder's RSI (EMA form) =================

# (last_close, n_seed, seed_gain, seed_loss, avg_gain, avg_loss, seeded)
WILDER_STATE0 = (None, 0, 0, 0, 0.0, 0.0, False)


def _wilder_rsi_step(bar_ids, closes, state, w: int):
    """Advance Wilder's RSI recurrence over one ORDERED batch of bar
    closes from ``state``; returns (emitted rows, carry-out state).
    Shared by the batch ``applyInPandas`` kernel (`wilder_rsi`) and the
    streaming GroupState kernel (streaming/stateful.wilder_rsi_stream)
    so the two are bit-identical by construction — the `_ema_step`
    pattern.

    Wilder (1978): seed avg_gain/avg_loss = simple mean of the first
    ``w`` bar-to-bar moves, then avg' = (avg*(w-1) + move)/w — the
    smoothing desks mean by "RSI" (Cutler's SMA variant is the gated
    twin, plans/market.rsi_fn). All arithmetic is IEEE-double +,-,*,/
    in a FIXED order (seed sums stay integer until the one seed
    division), so the recurrence is reproducible bit-for-bit by any
    engine replaying the same ops — which is exactly how the DuckDB
    oracle gates it (a recursive CTE replays the recurrence;
    cross-engine +,-,*,/ on doubles are correctly rounded, unlike the
    transcendental pow() a closed-form oracle would need).

    Emitted per bar once >= w moves exist: (bar_id, avg_gain,
    avg_loss, rsi) with rsi = 100*avg_gain/(avg_gain+avg_loss), None
    on a fully flat window (both averages zero).
    """
    lc, n_seed, sg, sl, ag, al, seeded = state
    out = []
    for b, c in zip(bar_ids, closes):
        b, c = int(b), int(c)
        if lc is not None:
            m = c - lc
            g = m if m > 0 else 0
            lo = -m if m < 0 else 0
            if not seeded:
                n_seed += 1
                sg += g
                sl += lo
                if n_seed == w:
                    ag = sg / w
                    al = sl / w
                    seeded = True
            else:
                ag = (ag * (w - 1) + g) / w
                al = (al * (w - 1) + lo) / w
            if seeded:
                s = ag + al
                rsi = (100.0 * ag / s) if s != 0 else None
                out.append((b, ag, al, rsi))
        lc = c
    return out, (lc, n_seed, sg, sl, ag, al, seeded)


WILDER_OUT_SCHEMA = (
    "stream long, bar_id long, avg_gain double, avg_loss double, "
    "rsi_wilder double"
)


def wilder_rsi(bars: DataFrame, w: int = 14) -> DataFrame:
    """Wilder's-EMA RSI per completed bar, per stream, over a bar-close
    table (stream, bar_id, close). A TRUE recurrence (like the EMA
    family above): each average depends on its predecessor, so it runs
    as a per-stream Arrow kernel — streams process in parallel, the
    serial unit is one stream's 144x-reduced bar sequence, the same
    deployment shape as `ema_columns`.

    Output: (stream, bar_id, avg_gain, avg_loss, rsi_wilder) from the
    first bar with ``w`` trailing moves onward.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bar_id")
        rows, _ = _wilder_rsi_step(
            pdf["bar_id"].to_numpy(), pdf["close"].to_numpy(),
            WILDER_STATE0, w)
        st = int(pdf["stream"].iat[0])
        return pd.DataFrame(
            [(st, b, g, lo, r) for b, g, lo, r in rows],
            columns=["stream", "bar_id", "avg_gain", "avg_loss",
                     "rsi_wilder"])

    return (
        bars.select("stream", "bar_id", "close")
        .groupBy("stream")
        .applyInPandas(kernel, schema=WILDER_OUT_SCHEMA)
    )
