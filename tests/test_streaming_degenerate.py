"""Degenerate-input battery for the GroupState streaming kernels
(r11 verdict #8: the batch registry is hardened by
tests/test_degenerate_sources.py; the `*_stream` twins had never been
driven with the same adversarial inputs).

Each tick-based live monitor is driven through three micro-batches:

- an EMPTY file (a zero-row trigger — the empty-partition day);
- a DEGENERATE shard: constant price (zero delta / zero variance /
  zero covariance — every denominator class the batch audit found),
  zero volume on every tick (zero VWAP denominator, zero Amihud
  denominator), a single stream;
- another empty file (state survives an idle trigger).

"Survive" = the query processes all batches without an exception and
the emitted rows carry the documented NULL-on-undefined answers (never
a crash, never a fabricated 0 where the batch twin says NULL).
"""
import json
import os

import pytest


def _write_ticks(in_dir, fname, rows, i):
    p = in_dir / fname
    with open(p, "w") as f:
        for st, ln, last, vol in rows:
            f.write(json.dumps({"stream": st, "line_no": ln,
                                "last": last, "volume": vol}) + "\n")
    os.utime(p, (1700000000 + i, 1700000000 + i))


def _drive(spark, tmp_path, build_stream, qname, mode="append"):
    """Empty / degenerate / empty micro-batches through a tick stream.
    ``mode`` must match the operator's declared outputMode (append for
    the bar finalizers, update for the per-tick monitors)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_ticks(in_dir, "b0.json", [], 0)  # empty trigger
    # constant price, ZERO volume, one stream: zero delta, zero
    # variance, zero vwap + amihud denominators all at once
    _write_ticks(in_dir, "b1.json",
                 [(0, i + 1, 500, 0) for i in range(10)], 1)
    _write_ticks(in_dir, "b2.json", [], 2)  # idle trigger after state
    raw = (
        spark.readStream
        .schema("stream long, line_no long, last long, volume long")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = (
        build_stream(raw)
        .writeStream.format("memory").queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(qname).collect()


def test_degenerate_vwap_stream(spark, tmp_path):
    from tickdatapipeline_spark.streaming.stateful import vwap_bars_stream

    rows = _drive(spark, tmp_path,
                  lambda t: vwap_bars_stream(t, bar_size=5), "dg_vwap")
    assert len(rows) == 2  # two complete zero-volume bars
    assert all(r.vwap is None and r.bar_volume == 0 for r in rows)


@pytest.mark.heavy
def test_degenerate_bollinger_stream(spark, tmp_path):
    from tickdatapipeline_spark.streaming.stateful import bollinger_stream

    rows = _drive(spark, tmp_path,
                  lambda t: bollinger_stream(t, bar_size=2, w_bars=3, k=1),
                  "dg_boll")
    # constant closes: zero variance, d = 0 -> full windows emit 0/0
    assert len(rows) == 5
    full = [r for r in rows if r.upper_break is not None]
    assert full and all((r.upper_break, r.lower_break) == (0, 0)
                        for r in full)


@pytest.mark.heavy
def test_degenerate_wilder_rsi_stream(spark, tmp_path):
    from tickdatapipeline_spark.streaming.stateful import wilder_rsi_stream

    # 10 ticks at bar_size=1 -> 10 bars, 9 zero moves: with w=4 the
    # seed window fills and avg gain == avg loss == 0 -> RSI undefined
    rows = _drive(spark, tmp_path,
                  lambda t: wilder_rsi_stream(t, bar_size=1, w=4),
                  "dg_rsi")
    for r in rows:
        assert r.avg_gain == 0.0 and r.avg_loss == 0.0


def test_degenerate_order_flow_stream(spark, tmp_path):
    from tickdatapipeline_spark.streaming.stateful import order_flow_stream

    rows = _drive(spark, tmp_path, order_flow_stream, "dg_flow",
                  mode="update")
    assert rows  # flat tape: everything unclassified, nothing crashes


@pytest.mark.heavy
def test_degenerate_drawdown_stream(spark, tmp_path):
    from tickdatapipeline_spark.streaming.stateful import drawdown_stream

    rows = _drive(spark, tmp_path, drawdown_stream, "dg_dd", mode="update")
    assert rows


def test_degenerate_rv_bars_stream(spark, tmp_path):
    from tickdatapipeline_spark.streaming.stateful import rv_bars_stream

    rows = _drive(spark, tmp_path,
                  lambda t: rv_bars_stream(t, bar_size=5), "dg_rv")
    assert len(rows) == 2  # flat bars: rv 0, never a crash


@pytest.mark.heavy
def test_degenerate_liquidity_stream(spark, tmp_path):
    from tickdatapipeline_spark.streaming.stateful import liquidity_stream

    rows = _drive(spark, tmp_path, liquidity_stream, "dg_liq",
                  mode="update")
    # zero volume -> no Amihud terms; flat tape -> cov 0 (no negative
    # cov, so no Roll spread), variance ratio undefined (NULL)
    last = max(rows, key=lambda r: r.n_ticks)
    assert last.amihud_mean_pm is None
    assert last.roll_spread is None


@pytest.mark.heavy
def test_degenerate_ema_stream(spark, tmp_path):
    """EMA twin has its own input contract (stream string, tick_idx,
    delta_w, is_core): all-zero deltas with a core/non-core mix."""
    from tickdatapipeline_spark.streaming.stateful import ema_stream

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for bi, rows in enumerate([
            [],
            [("s0", i + 1, 0, i % 2 == 0) for i in range(8)],
            []]):
        p = in_dir / f"b{bi}.json"
        with open(p, "w") as f:
            for st, ti, dw, core in rows:
                f.write(json.dumps({"stream": st, "tick_idx": ti,
                                    "delta_w": dw, "is_core": core}) + "\n")
        os.utime(p, (1700000000 + bi, 1700000000 + bi))
    raw = (
        spark.readStream
        .schema("stream string, tick_idx long, delta_w long, is_core boolean")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = (
        ema_stream(raw)
        .writeStream.format("memory").queryName("dg_ema")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("dg_ema").collect()
    assert len(rows) == 8  # flat tape: deltas 0, AGC floors hold


def test_degenerate_type_transitions_stream(spark, tmp_path):
    """Events twin: one instant, one user, one type — zero spans,
    self-transitions only."""
    from tickdatapipeline_spark.streaming.stateful import (
        type_transitions_stream)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for bi, rows in enumerate([[], [(1, 1000, 7, "view"), (2, 1000, 7, "view")], []]):
        p = in_dir / f"b{bi}.json"
        with open(p, "w") as f:
            for eid, tus, uid, et in rows:
                f.write(json.dumps({"event_id": eid, "tus": tus,
                                    "user_id": uid, "event_type": et}) + "\n")
        os.utime(p, (1700000000 + bi, 1700000000 + bi))
    raw = (
        spark.readStream
        .schema("event_id long, tus long, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = (
        type_transitions_stream(raw)
        .writeStream.format("memory").queryName("dg_trans")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("dg_trans").collect()
    # one zero-gap self-transition (view -> view at the same instant)
    assert [(r.prev_type, r.next_type) for r in rows] == [("view", "view")]


def test_degenerate_kyle_lambda_stream(spark, tmp_path):
    """Flat tape: every tick unclassified (no price change ever), so
    the monitor emits NOTHING — matching the batch plan, whose obs set
    is empty — and never divides."""
    from tickdatapipeline_spark.streaming.stateful import kyle_lambda_stream

    rows = _drive(spark, tmp_path, kyle_lambda_stream, "dg_kyle",
                  mode="update")
    assert rows == []
