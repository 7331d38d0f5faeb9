"""Micro-batch continuation state for the streaming tick pipeline.

The reference pushes one mutable state struct down a Channel
(/root/reference/src/TickHotLoopF32.jl:53-83). In Spark Structured
Streaming the natural unit is the micro-batch, and because every piece
of hot-loop state is a prefix aggregate (SURVEY.md §2.3), a batch can be
processed EXACTLY given a small seed of prefix totals. ``advance``
processes one raw-tick batch and returns (processed_df, next_state);
streaming output over any batch split is bit-identical to the batch
plan over the concatenated input (tested in tests/test_streaming.py).

Scale: state is O(1) per stream (a dozen scalars), extracted with two
tiny aggregations per batch — no growing state store, no shuffling of
history.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdatapipeline_spark import constants as C
from tickdatapipeline_spark.config import SignalProcessingConfig
from tickdatapipeline_spark.operators.expansion import expand_volume
from tickdatapipeline_spark.operators.hotloop import HotLoopSeed, hot_loop

OUT_COLS = ["tick_idx", "timestamp", "raw_price", "price_delta",
            "sig_re", "sig_im", "normalization", "status_flag"]


@dataclass(frozen=True)
class StreamState:
    """Everything needed to continue the stream in the next batch."""

    tick0: int = 0                 # ticks emitted so far
    prev_last: int | None = None   # last raw price of the previous batch
    hot: HotLoopSeed = HotLoopSeed()


def advance(
    raw_batch: DataFrame,
    cfg: SignalProcessingConfig,
    state: StreamState,
    stats_ticks_per_bar: int = C.STATS_TICKS_PER_BAR,
) -> tuple[DataFrame, StreamState]:
    """Process one ticks_raw micro-batch; return (processed, next_state).

    The returned DataFrame is materialized (cached + counted) before
    state extraction, so callers can write it to any sink without
    recomputation.
    """
    n = stats_ticks_per_bar
    expanded = expand_volume(
        raw_batch, seed_prev_last=state.prev_last, seed_tick0=state.tick0
    )
    processed = hot_loop(
        expanded, cfg, stats_ticks_per_bar=n, keep_internals=True, seed=state.hot
    ).cache()
    n_rows = processed.count()
    if n_rows == 0:
        processed.unpersist()
        return processed, state

    s = state.hot
    scale = 2.0 * float(cfg.cpm_modulation_index) * 2.0**31

    top = processed.agg(
        F.max("tick_idx").alias("max_tick"),
        F.max_by("raw_price", "tick_idx").alias("last_price"),
        F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("valid_b"),
        F.max("core_seq").alias("core_total"),
        F.min(F.when(F.col("is_valid"), F.col("tick_idx"))).alias("first_valid_tick"),
        F.max_by(F.col("ratio"), F.when(F.col("is_core"), F.col("tick_idx"))).alias("last_core_ratio"),
        F.max_by(F.col("inv_q16"), F.when(F.col("is_core"), F.col("tick_idx"))).alias("last_inv"),
        F.sum(
            F.when(F.col("is_core"), F.round(F.col("ratio") * F.lit(scale), 0).cast("long")).otherwise(F.lit(0))
        ).alias("dp_sum"),
    ).collect()[0]

    core_total = int(top["core_total"] or s.core_seq0)

    # stats-bar bookkeeping: merge the carried partial bar, count the bars
    # newly completed in this batch, and capture the new trailing partial.
    bars = (
        processed.where(F.col("is_core"))
        .groupBy("bar_ord")
        .agg(F.min("delta_w").alias("bmin"), F.max("delta_w").alias("bmax"),
             F.count(F.lit(1)).alias("cnt"))
    )
    pb = s.core_seq0 // n
    if s.partial_cnt0 > 0:
        bars = bars.withColumn(
            "bmin", F.when(F.col("bar_ord") == pb, F.least("bmin", F.lit(s.partial_min0))).otherwise(F.col("bmin"))
        ).withColumn(
            "bmax", F.when(F.col("bar_ord") == pb, F.greatest("bmax", F.lit(s.partial_max0))).otherwise(F.col("bmax"))
        ).withColumn(
            "cnt", F.when(F.col("bar_ord") == pb, F.col("cnt") + s.partial_cnt0).otherwise(F.col("cnt"))
        )
    new_partial_ord = core_total // n if core_total % n != 0 else None
    brow = bars.agg(
        F.sum(F.when(F.col("cnt") == n, F.col("bmin"))).alias("add_bmin"),
        F.sum(F.when(F.col("cnt") == n, F.col("bmax"))).alias("add_bmax"),
        F.max(F.when(F.col("bar_ord") == new_partial_ord, F.col("bmin"))).alias("p_min"),
        F.max(F.when(F.col("bar_ord") == new_partial_ord, F.col("bmax"))).alias("p_max"),
        F.max(F.when(F.col("bar_ord") == new_partial_ord, F.col("cnt"))).alias("p_cnt"),
    ).collect()[0]

    # zero rows (invalid before any valid ever) only exist while no valid
    # tick has been seen; they advance no encoder (is_zero rows).
    if s.n_valid0 > 0:
        zero_b = 0
    elif top["first_valid_tick"] is None:
        zero_b = n_rows
    else:
        zero_b = int(top["first_valid_tick"]) - state.tick0 - 1

    p_cnt = int(brow["p_cnt"] or 0)
    p_min = None if brow["p_min"] is None else int(brow["p_min"])
    p_max = None if brow["p_max"] is None else int(brow["p_max"])
    if p_cnt == 0 and new_partial_ord == pb and s.partial_cnt0 > 0:
        # carried partial bar got no new core ticks this batch — keep it
        p_cnt, p_min, p_max = s.partial_cnt0, s.partial_min0, s.partial_max0

    next_hot = HotLoopSeed(
        n_valid0=s.n_valid0 + int(top["valid_b"] or 0),
        core_seq0=core_total,
        sum_bmin0=s.sum_bmin0 + int(brow["add_bmin"] or 0),
        sum_bmax0=s.sum_bmax0 + int(brow["add_bmax"] or 0),
        partial_cnt0=p_cnt,
        partial_min0=p_min,
        partial_max0=p_max,
        inv_q16_0=int(top["last_inv"]) if top["last_inv"] is not None else s.inv_q16_0,
        cpm_theta0=(s.cpm_theta0 + int(top["dp_sum"] or 0)) % C.Q32_MOD,
        amc_n0=s.amc_n0 + (n_rows - zero_b),
        last_core_ratio0=(
            float(top["last_core_ratio"]) if top["last_core_ratio"] is not None else s.last_core_ratio0
        ),
    )
    next_state = StreamState(
        tick0=int(top["max_tick"]), prev_last=int(top["last_price"]), hot=next_hot
    )
    # NOTE: the returned frame is the CACHED internals frame, so the
    # caller's sink writes don't recompute the plan. Select OUT_COLS for
    # the reference-parity output schema, and unpersist() after writing.
    return processed, next_state


def carry_forward(state: StreamState) -> StreamState:
    """State after an empty batch (no ticks): unchanged."""
    return replace(state)
