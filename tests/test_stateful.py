"""Golden tests for the reserved EMA/AGC recurrences
(/root/reference/src/TickHotLoopF32.jl:361-375 semantics)."""

from __future__ import annotations

import pytest

from tests.conftest import make_ticks_raw
from tickdatapipeline_spark.config import SignalProcessingConfig
from tickdatapipeline_spark.operators.expansion import expand_volume
from tickdatapipeline_spark.operators.hotloop import hot_loop
from tickdatapipeline_spark.operators.stateful import ema_columns

TS = "20250319 120000 0000000"


def reference_ema(deltas, alpha=0.125):
    """Straight-line Python mirror of TickHotLoopF32.jl:361-375."""
    out = []
    e, v, a, init = 0, 1, 10, False
    for d in deltas:
        ad = abs(d)
        if init:
            e = e + ((d - e) >> 4)
            v = v + ((abs(d - e) - v) >> 4)
        else:
            e, v, init = d, max(ad, 1), True
        a = a + round((float(ad) - float(a)) * alpha)
        out.append((e, v, a))
    return out


def test_ema_matches_reference_recurrence(spark):
    cfg = SignalProcessingConfig(encoder_type="derivative")
    prices, p = [], 41970
    for i in range(30):
        p += (i * 7) % 13 - 6
        prices.append(p)
    raw = make_ticks_raw(spark, [(i + 1, TS, pr, 1) for i, pr in enumerate(prices)])
    internals = hot_loop(expand_volume(raw), cfg, keep_internals=True)
    rows = ema_columns(internals, cfg).orderBy("tick_idx").collect()

    # core ticks are 2..30; their winsorized deltas drive the recurrence
    core_deltas = [r.delta_w for r in rows if r.is_core]
    expected = reference_ema(core_deltas)
    got = [(r.ema_delta, r.ema_delta_dev, r.ema_abs_delta) for r in rows if r.is_core]
    assert got == expected
    # tick 1 (first valid, not core) reports the initial state
    assert (rows[0].ema_delta, rows[0].ema_delta_dev, rows[0].ema_abs_delta) == (0, 1, 10)


def test_ema_holdlast_does_not_advance_state(spark):
    cfg = SignalProcessingConfig(encoder_type="derivative")
    raw = make_ticks_raw(spark, [
        (1, TS, 41970, 1), (2, TS, 41975, 1), (3, TS, 99999, 1), (4, TS, 41973, 1),
    ])
    internals = hot_loop(expand_volume(raw), cfg, keep_internals=True)
    rows = ema_columns(internals, cfg).orderBy("tick_idx").collect()
    # the hold-last tick (3) carries tick 2's state unchanged
    assert (rows[2].ema_delta, rows[2].ema_delta_dev, rows[2].ema_abs_delta) == (
        rows[1].ema_delta, rows[1].ema_delta_dev, rows[1].ema_abs_delta
    )


@pytest.mark.heavy
def test_single_stream_streaming_kernel_bit_equal(spark):
    """The single-stream path streams ONE sorted partition through
    mapInPandas, carrying the recurrence state across Arrow batches
    (memory O(batch), not O(stream)). Force tiny Arrow batches so the
    carry actually exercises — results must be bit-equal to the
    reference recurrence AND to the per-stream group kernel run on the
    same rows under a constant stream id."""
    cfg = SignalProcessingConfig(encoder_type="derivative")
    prices, p = [], 41970
    for i in range(200):
        p += (i * 11) % 17 - 8
        prices.append(p)
    raw = make_ticks_raw(spark, [(i + 1, TS, pr, 1 + i % 3) for i, pr in enumerate(prices)])
    internals = hot_loop(expand_volume(raw), cfg, keep_internals=True)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        streamed = ema_columns(internals, cfg).orderBy("tick_idx").collect()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # vs the straight-line reference recurrence over core deltas
    expected = reference_ema([r.delta_w for r in streamed if r.is_core])
    got = [(r.ema_delta, r.ema_delta_dev, r.ema_abs_delta) for r in streamed if r.is_core]
    assert got == expected

    # vs the per-stream group kernel (same rows, constant stream id)
    from pyspark.sql import functions as F

    grouped = (
        ema_columns(internals.withColumn("sid", F.lit(1)), cfg, stream_id="sid")
        .orderBy("tick_idx")
        .collect()
    )
    assert [(r.tick_idx, r.ema_delta, r.ema_delta_dev, r.ema_abs_delta) for r in streamed] \
        == [(r.tick_idx, r.ema_delta, r.ema_delta_dev, r.ema_abs_delta) for r in grouped]


def test_embedding_near_duplicates_golden(spark):
    from tickdatapipeline_spark.operators.similarity import embedding_near_duplicates

    emb = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [1.0] * 64), (2, [-1.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_near_duplicates(emb, threshold=0.9).collect()
    # identical vectors share every hyperplane bucket and have cosine 1
    assert len(out) == 1
    assert (out[0].vec_a, out[0].vec_b, out[0].cosine) == (0, 1, 1.0)