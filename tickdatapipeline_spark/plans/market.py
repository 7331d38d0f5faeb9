"""Market-microstructure indicator surface (beyond the reference).

The reference stops at OHLC / boxcar / FIR bars
(`/root/reference/src/BarProcessor.jl:134-202`); the standard desk
indicators computed FROM those bars and ticks — tick-rule order-flow
classification (Lee & Ready 1991), running-peak drawdown, Bollinger
breakout flags (Bollinger 1992), and Cutler's RSI — are absent there
and live here as first-class gated queries.

Every query runs on the MULTISTREAM fixture
(`sources/tickfile.ticks_from_events_streams`): 4 independent tick
streams, every window `partitionBy("stream")` — the per-symbol/per-file
partitioning a 100 TB tick corpus actually has, so no plan below ever
contains a SinglePartition window exchange (pinned in
tests/test_plan_shape.py). Trailing-window indicators (Bollinger, RSI)
additionally run over the BAR table — already 144x smaller than ticks —
with bounded ROWS frames.

Cross-engine exactness: prices/volumes are BIGINT; every running/
trailing statistic is an integer sum/min/max/count; Bollinger's
k-sigma test is the INTEGER inequality (W*close - sum)^2 > k^2 *
(W*sumsq - sum^2) — W^2-scaled variance, no sqrt, no float anywhere;
the only float columns are the final order-flow imbalance share and
the RSI, each one rnd-crossed division of exact BIGINTs. Tick-rule
signs use explicit CASE arms (Spark signum returns DOUBLE; DuckDB
greatest/sign null-handling differs — neither crosses the boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tickdatapipeline_spark.functions.guards import corr_budget_guard
from tickdatapipeline_spark.functions.rounding import rnd, sql_rnd
from tickdatapipeline_spark.sources.tickfile import (
    ticks_from_events_streams,
    ticks_streams_sql,
)

MARKET_BAR_SIZE = 144  # ticks per bar, the reference's bar period
BOLLINGER_W = 20  # trailing bars in the band window (incl. current)
BOLLINGER_K = 2  # band half-width in sigmas
RSI_W = 14  # trailing bar-to-bar moves in Cutler's RSI

# Window specs are built lazily (inside the functions): constructing a
# WindowSpec needs an active SparkContext, and this module imports at
# __spark_entry__ load time, before any session exists.


def _w_stream() -> Window:
    return Window.partitionBy("stream").orderBy("line_no")


def _w_run() -> Window:
    return _w_stream().rowsBetween(Window.unboundedPreceding, Window.currentRow)


def _w_bars() -> Window:
    return Window.partitionBy("stream").orderBy("bar_id")


# ================= tick-rule order flow =================


def tick_rule_dirs(t: DataFrame) -> DataFrame:
    """Adds the tick-rule direction column: +1 after an uptick, -1
    after a downtick, zero-ticks inherit the LAST non-zero move's sign
    (carry-forward via last(ignorenulls) over a stream-partitioned
    running frame), NULL for the leading run before any price change.
    Input needs (stream, line_no, last); golden-tested on a
    constructed frame in tests/test_properties.py."""
    delta = F.col("last") - F.lag("last").over(_w_stream())
    s = (
        F.when(delta > 0, F.lit(1))
        .when(delta < 0, F.lit(-1))
        .when(delta.isNotNull(), F.lit(0))
    )
    dir_ = F.last(F.nullif(s, F.lit(0)), ignorenulls=True).over(_w_run())
    return t.withColumn("dir", dir_)


def order_flow_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-rule trade classification + signed order flow per stream:
    each tick is a BUY if the last price change was up, a SELL if down
    (Lee & Ready 1991's tick test — zero-tick prints inherit the sign
    of the LAST non-zero move, the standard carry-forward); ticks
    before the first price change stay unclassified. Output per
    stream: classified buy/sell volume, the unclassified leading run,
    net signed flow, and the rnd-crossed imbalance share.

    Scale: the carry-forward is `last(nullif(sign), ignorenulls)` over
    a stream-partitioned running frame — per-symbol windows, never a
    global order; the final aggregate is one combinable groupBy.
    Exactness: signs are CASE arms (-1/0/1 BIGINT), volumes exact
    BIGINT sums; imbalance = net/(buy+sell) is the one double, rnd-
    crossed, NULL for an all-unclassified stream (nullif guard)."""
    flow = tick_rule_dirs(ticks_from_events_streams(spark, sf_dir)).select(
        "stream", "volume", "dir")
    buy = F.coalesce(F.sum(F.when(F.col("dir") == 1, F.col("volume"))), F.lit(0))
    sell = F.coalesce(F.sum(F.when(F.col("dir") == -1, F.col("volume"))), F.lit(0))
    uncl = F.coalesce(F.sum(F.when(F.col("dir").isNull(), F.col("volume"))), F.lit(0))
    return (
        flow.groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            buy.cast("long").alias("buy_volume"),
            sell.cast("long").alias("sell_volume"),
            uncl.cast("long").alias("unclassified_volume"),
        )
        .select(
            "stream",
            "n_ticks",
            "buy_volume",
            "sell_volume",
            "unclassified_volume",
            (F.col("buy_volume") - F.col("sell_volume")).alias("net_flow"),
            rnd(
                (F.col("buy_volume") - F.col("sell_volume")).cast("double")
                / F.nullif(F.col("buy_volume") + F.col("sell_volume"), F.lit(0)).cast("double")
            ).alias("imbalance"),
        )
        .orderBy("stream")
    )


# the tick-rule classification CTE shared by every signed-flow oracle
# twin (order flow, Kyle's lambda): ONE copy of the carry-forward SQL,
# so the contract that must match Spark's tick_rule_dirs cannot drift
# between queries. Exposes dir AND the per-tick move y (consumers that
# only need dir ignore y).
TICK_RULE_SIGNED_SQL = """signed AS (
    SELECT stream, line_no, volume,
           last - lag(last) OVER w AS y,
           last_value(nullif(CASE WHEN delta > 0 THEN 1
                                  WHEN delta < 0 THEN -1
                                  WHEN delta IS NOT NULL THEN 0 END, 0) IGNORE NULLS)
               OVER (PARTITION BY stream ORDER BY line_no
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dir
    FROM (
        SELECT stream, line_no, volume, last,
               last - lag(last) OVER (PARTITION BY stream ORDER BY line_no) AS delta
        FROM ticks_streams
    )
    WINDOW w AS (PARTITION BY stream ORDER BY line_no)
)"""


ORDER_FLOW_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
{TICK_RULE_SIGNED_SQL},
agg AS (
    SELECT stream,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(coalesce(sum(volume) FILTER (WHERE dir = 1), 0) AS BIGINT) AS buy_volume,
           CAST(coalesce(sum(volume) FILTER (WHERE dir = -1), 0) AS BIGINT) AS sell_volume,
           CAST(coalesce(sum(volume) FILTER (WHERE dir IS NULL), 0) AS BIGINT) AS unclassified_volume
    FROM signed GROUP BY stream
)
SELECT stream, n_ticks, buy_volume, sell_volume, unclassified_volume,
       buy_volume - sell_volume AS net_flow,
       {sql_rnd('CAST(buy_volume - sell_volume AS DOUBLE) / CAST(nullif(buy_volume + sell_volume, 0) AS DOUBLE)')} AS imbalance
FROM agg ORDER BY stream
"""


# ================= running-peak drawdown =================


def drawdown_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown (and symmetric maximum runup) per stream: the
    classic risk statistic max over t of (running peak up to t - price
    at t). Two stream-partitioned running-extreme windows + one
    combinable groupBy — every value an exact BIGINT (the indicator
    family's only query with no float column at all).

    Scale: running min/max over a per-symbol partition is the
    canonical cumulative window (same shape as the tick chain's
    per-stream prefix aggregates); the aggregate is map-side
    combinable. No SinglePartition anywhere."""
    t = ticks_from_events_streams(spark, sf_dir)
    runmax = F.max("last").over(_w_run())
    runmin = F.min("last").over(_w_run())
    dd = t.select(
        "stream",
        "last",
        (runmax - F.col("last")).alias("dd"),
        (F.col("last") - runmin).alias("ru"),
    )
    return (
        dd.groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.max("last").alias("peak"),
            F.min("last").alias("trough"),
            F.max("dd").alias("max_drawdown"),
            F.max("ru").alias("max_runup"),
        )
        .orderBy("stream")
    )


DRAWDOWN_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
run AS (
    SELECT stream, last,
           max(last) OVER w - last AS dd,
           last - min(last) OVER w AS ru
    FROM ticks_streams
    WINDOW w AS (PARTITION BY stream ORDER BY line_no
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT stream,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(max(last) AS BIGINT) AS peak,
       CAST(min(last) AS BIGINT) AS trough,
       CAST(max(dd) AS BIGINT) AS max_drawdown,
       CAST(max(ru) AS BIGINT) AS max_runup
FROM run GROUP BY stream ORDER BY stream
"""


# ================= shared bar-close table =================


def _bar_closes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-count bar closes per stream: close = the bar's LAST print
    (max_by over the unique per-stream line_no — tie-free). One
    combinable groupBy; 144x row reduction before any trailing
    window runs."""
    t = ticks_from_events_streams(spark, sf_dir)
    return (
        t.withColumn("bar_id", F.expr(f"(line_no - 1) DIV {MARKET_BAR_SIZE}"))
        .groupBy("stream", "bar_id")
        .agg(F.max_by("last", "line_no").alias("close"))
    )


_BAR_CLOSES_SQL = f"""
    SELECT stream, (line_no - 1) // {MARKET_BAR_SIZE} AS bar_id,
           CAST(max_by(last, line_no) AS BIGINT) AS close
    FROM ticks_streams GROUP BY stream, (line_no - 1) // {MARKET_BAR_SIZE}
"""



# ================= Bollinger breakout flags =================


def bollinger_flags(bars: DataFrame, w_bars: int = BOLLINGER_W,
                    k: int = BOLLINGER_K) -> DataFrame:
    """Bollinger-band breakout flags over a (stream, bar_id, close)
    frame: a close more than ``k`` sigmas from the trailing
    ``w_bars``-bar mean (window INCLUDING the current bar, the
    textbook form). The k-sigma test is computed entirely in integers:
    with d = W*close - sum and W^2-scaled variance V = W*sumsq -
    sum^2, |close - mean| > k*sigma iff d^2 > k^2 * V — no sqrt, no
    division, every column exact BIGINT (close <= 99999, W = 20 keeps
    d^2 < 2^43, far inside int64). Bars without a full trailing
    window emit NULL flags rather than a partial-window answer.

    Factored out of bollinger_fn so the streaming twin
    (streaming.stateful.bollinger_stream) can be pinned bit-identical
    against the same algebra on arbitrary bar frames."""
    w = Window.partitionBy("stream").orderBy("bar_id") \
        .rowsBetween(-(w_bars - 1), Window.currentRow)
    b = bars.select(
        "stream",
        "bar_id",
        "close",
        F.count(F.lit(1)).over(w).alias("win_n"),
        F.sum("close").over(w).alias("win_sum"),
        F.sum(F.col("close") * F.col("close")).over(w).alias("win_sumsq"),
    )
    d = F.lit(w_bars) * F.col("close") - F.col("win_sum")
    v = F.lit(w_bars) * F.col("win_sumsq") - F.col("win_sum") * F.col("win_sum")
    k2 = k * k
    full = F.col("win_n") == w_bars
    return b.select(
        "stream",
        "bar_id",
        "close",
        "win_sum",
        F.when(full, ((d > 0) & (d * d > k2 * v)).cast("long")).alias("upper_break"),
        F.when(full, ((d < 0) & (d * d > k2 * v)).cast("long")).alias("lower_break"),
    )


def bollinger_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger breakout flags per 144-tick bar — see bollinger_flags
    for the integer k-sigma algebra.

    Scale: the trailing window is a BOUNDED 20-row frame over the
    144x-reduced bar table, partitioned by stream — both the row
    reduction and the partitioning survive a 100x scale-up."""
    return bollinger_flags(_bar_closes(spark, sf_dir)) \
        .orderBy("stream", "bar_id")


BOLLINGER_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
bars AS ({_BAR_CLOSES_SQL}),
win AS (
    SELECT stream, bar_id, close,
           count(*) OVER w AS win_n,
           CAST(sum(close) OVER w AS BIGINT) AS win_sum,
           CAST(sum(close * close) OVER w AS BIGINT) AS win_sumsq
    FROM bars
    WINDOW w AS (PARTITION BY stream ORDER BY bar_id
                 ROWS BETWEEN {BOLLINGER_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT stream, bar_id, close, win_sum,
       CASE WHEN win_n = {BOLLINGER_W} THEN CAST(
           ({BOLLINGER_W} * close - win_sum > 0 AND
            ({BOLLINGER_W} * close - win_sum) * ({BOLLINGER_W} * close - win_sum)
              > {BOLLINGER_K * BOLLINGER_K} * ({BOLLINGER_W} * win_sumsq - win_sum * win_sum))
           AS BIGINT) END AS upper_break,
       CASE WHEN win_n = {BOLLINGER_W} THEN CAST(
           ({BOLLINGER_W} * close - win_sum < 0 AND
            ({BOLLINGER_W} * close - win_sum) * ({BOLLINGER_W} * close - win_sum)
              > {BOLLINGER_K * BOLLINGER_K} * ({BOLLINGER_W} * win_sumsq - win_sum * win_sum))
           AS BIGINT) END AS lower_break
FROM win ORDER BY stream, bar_id
"""


# ================= Cutler's RSI =================


def rsi_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI per bar: 100 * SMA(gains) / (SMA(gains) +
    SMA(losses)) over the trailing RSI_W bar-to-bar moves — the
    simple-moving-average variant (Cutler's), chosen over Wilder's
    EMA form deliberately: Wilder's recurrence is order-dependent
    state (the EMA family's rows-only territory, operators/stateful),
    while Cutler's is two bounded-window integer sums — fully
    oracle-gateable. Gains/losses split via explicit CASE arms (a
    greatest(delta, 0) would turn the first bar's NULL move into 0 in
    Spark but not DuckDB). Only bars with RSI_W non-null trailing
    moves emit; the division is the one double, rnd-crossed, NULL on
    a 14-bar flat stretch (nullif guard).

    Scale: same posture as Bollinger — bounded 14-row frames over the
    144x-reduced, stream-partitioned bar table."""
    dlt = F.col("close") - F.lag("close").over(_w_bars())
    w = _w_bars().rowsBetween(-(RSI_W - 1), Window.currentRow)
    b = (
        _bar_closes(spark, sf_dir)
        .select(
            "stream",
            "bar_id",
            dlt.alias("dlt"),
        )
        .select(
            "stream",
            "bar_id",
            F.when(F.col("dlt") > 0, F.col("dlt")).when(F.col("dlt").isNotNull(), F.lit(0)).alias("gain"),
            F.when(F.col("dlt") < 0, -F.col("dlt")).when(F.col("dlt").isNotNull(), F.lit(0)).alias("loss"),
        )
        .select(
            "stream",
            "bar_id",
            F.count("gain").over(w).alias("n_moves"),
            F.sum("gain").over(w).cast("long").alias("gain_sum"),
            F.sum("loss").over(w).cast("long").alias("loss_sum"),
        )
        .where(F.col("n_moves") == RSI_W)
    )
    return b.select(
        "stream",
        "bar_id",
        "gain_sum",
        "loss_sum",
        rnd(
            F.lit(100.0) * F.col("gain_sum").cast("double")
            / F.nullif(F.col("gain_sum") + F.col("loss_sum"), F.lit(0)).cast("double")
        ).alias("rsi"),
    ).orderBy("stream", "bar_id")


RSI_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
bars AS ({_BAR_CLOSES_SQL}),
moves AS (
    SELECT stream, bar_id,
           CASE WHEN dlt > 0 THEN dlt WHEN dlt IS NOT NULL THEN 0 END AS gain,
           CASE WHEN dlt < 0 THEN -dlt WHEN dlt IS NOT NULL THEN 0 END AS loss
    FROM (
        SELECT stream, bar_id,
               close - lag(close) OVER (PARTITION BY stream ORDER BY bar_id) AS dlt
        FROM bars
    )
),
win AS (
    SELECT stream, bar_id,
           count(gain) OVER w AS n_moves,
           CAST(sum(gain) OVER w AS BIGINT) AS gain_sum,
           CAST(sum(loss) OVER w AS BIGINT) AS loss_sum
    FROM moves
    WINDOW w AS (PARTITION BY stream ORDER BY bar_id
                 ROWS BETWEEN {RSI_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT stream, bar_id, gain_sum, loss_sum,
       {sql_rnd('100.0 * CAST(gain_sum AS DOUBLE) / CAST(nullif(gain_sum + loss_sum, 0) AS DOUBLE)')} AS rsi
FROM win WHERE n_moves = {RSI_W} ORDER BY stream, bar_id
"""


# ================= Wilder's RSI (EMA form) =================


def wilder_rsi_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder's-EMA RSI per bar (the r10-verdict gap: Cutler's SMA form
    shipped; Wilder's smoothing is what desks mean by "RSI"): seed =
    simple mean of the first RSI_W moves, then avg' =
    (avg*(RSI_W-1) + move)/RSI_W — a TRUE recurrence, so it runs as
    the per-stream Arrow kernel `operators/stateful.wilder_rsi`
    (streams parallel, one stream's 144x-reduced bar sequence serial —
    the `ema_columns` deployment shape) with a GroupState streaming
    twin (streaming/stateful.wilder_rsi_stream, restart-proven).

    GATED despite being a recurrence: the oracle is a recursive CTE
    that replays the IDENTICAL IEEE-double +,-,*,/ sequence per step
    (all correctly rounded cross-engine, unlike the pow() a
    closed-form oracle would need — the reason a naive formulation
    would be rows-only). Outputs are additionally rnd-crossed.
    """
    from tickdatapipeline_spark.operators.stateful import wilder_rsi

    out = wilder_rsi(_bar_closes(spark, sf_dir), w=RSI_W)
    return out.select(
        "stream", "bar_id",
        rnd(F.col("avg_gain")).alias("avg_gain"),
        rnd(F.col("avg_loss")).alias("avg_loss"),
        rnd(F.col("rsi_wilder")).alias("rsi_wilder"),
    ).orderBy("stream", "bar_id")


WILDER_RSI_SQL = f"""
WITH RECURSIVE ticks_streams AS ({ticks_streams_sql()}),
bars AS ({_BAR_CLOSES_SQL}),
numbered AS (
    SELECT stream, bar_id, close,
           row_number() OVER (PARTITION BY stream ORDER BY bar_id) AS rn
    FROM bars
),
moves AS (
    SELECT stream, rn, bar_id,
           close - lag(close) OVER (PARTITION BY stream ORDER BY rn) AS m
    FROM numbered
),
gl AS (
    SELECT stream, rn, bar_id,
           CASE WHEN m > 0 THEN m ELSE 0 END AS g,
           CASE WHEN m < 0 THEN -m ELSE 0 END AS lo
    FROM moves WHERE m IS NOT NULL
),
seed AS (
    -- integer sums of the first {RSI_W} moves, ONE division each:
    -- the kernel's exact seed arithmetic
    SELECT stream, rn, bar_id,
           CAST(gain_sum AS DOUBLE) / {RSI_W} AS avg_g,
           CAST(loss_sum AS DOUBLE) / {RSI_W} AS avg_l
    FROM (
        SELECT stream, rn, bar_id,
               CAST(sum(g) OVER w AS BIGINT) AS gain_sum,
               CAST(sum(lo) OVER w AS BIGINT) AS loss_sum,
               count(*) OVER w AS nm
        FROM gl
        WINDOW w AS (PARTITION BY stream ORDER BY rn
                     ROWS BETWEEN {RSI_W - 1} PRECEDING AND CURRENT ROW)
    ) WHERE nm = {RSI_W} AND rn = {RSI_W + 1}
),
rec AS (
    SELECT stream, rn, bar_id, avg_g, avg_l FROM seed
    UNION ALL
    -- replay the kernel's recurrence step in the same op order:
    -- (avg * (W-1) + move) / W, every op IEEE-double correctly rounded
    SELECT m.stream, m.rn, m.bar_id,
           (r.avg_g * {RSI_W - 1} + CAST(m.g AS DOUBLE)) / {RSI_W},
           (r.avg_l * {RSI_W - 1} + CAST(m.lo AS DOUBLE)) / {RSI_W}
    FROM rec r JOIN gl m ON m.stream = r.stream AND m.rn = r.rn + 1
)
SELECT stream, bar_id,
       {sql_rnd('avg_g')} AS avg_gain,
       {sql_rnd('avg_l')} AS avg_loss,
       {sql_rnd('100.0 * avg_g / nullif(avg_g + avg_l, 0)')} AS rsi_wilder
FROM rec ORDER BY stream, bar_id
"""


def queries() -> dict[str, tuple]:
    return {
        "ticks_order_flow": (order_flow_fn, ORDER_FLOW_SQL),
        "ticks_drawdown": (drawdown_fn, DRAWDOWN_SQL),
        "bars_bollinger": (bollinger_fn, BOLLINGER_SQL),
        "bars_rsi": (rsi_fn, RSI_SQL),
        "bars_rsi_wilder": (wilder_rsi_fn, WILDER_RSI_SQL),
        "ticks_realized_variance": (realized_variance_fn, REALIZED_VARIANCE_SQL),
        "ticks_liquidity_panel": (liquidity_panel_fn, LIQUIDITY_PANEL_SQL),
        "ticks_kyle_lambda": (kyle_lambda_fn, KYLE_LAMBDA_SQL),
        "ticks_vol_signature": (vol_signature_fn, VOL_SIGNATURE_SQL),
        "ticks_lee_ready": (lee_ready_fn, LEE_READY_SQL),
    }


# ================= realized variance =================


def realized_variance_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized variance per bar: RV = sum of squared tick-to-tick
    price moves inside each fixed-count bar (Andersen & Bollerslev
    1998) — THE canonical high-frequency volatility estimator, and the
    statistic the reference's per-bar delta min/max (BarProcessor.jl
    A3) stops short of. A move crossing a bar boundary belongs to the
    bar of its LATER tick (the standard convention: the move is
    realized when the second print arrives). All-integer: moves,
    their squares (|delta| <= ~58k at the fixture's spike bound, so
    delta^2 < 2^32), counts, and the max absolute move; no float
    column at all.

    Scale: one stream-partitioned lag + one combinable
    groupBy(stream, bar_id) — the same two-shuffle-max shape as the
    OHLC bars themselves."""
    t = ticks_from_events_streams(spark, sf_dir)
    dlt = (F.col("last") - F.lag("last").over(_w_stream())).alias("dlt")
    moves = t.select(
        "stream",
        F.expr(f"(line_no - 1) DIV {MARKET_BAR_SIZE}").alias("bar_id"),
        dlt,
    )
    return (
        moves.groupBy("stream", "bar_id")
        .agg(
            F.count("dlt").alias("n_moves"),
            F.coalesce(F.sum(F.col("dlt") * F.col("dlt")), F.lit(0)).alias("rv"),
            F.max(F.abs(F.col("dlt"))).alias("max_abs_move"),
        )
        .orderBy("stream", "bar_id")
    )


REALIZED_VARIANCE_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
moves AS (
    SELECT stream, (line_no - 1) // {MARKET_BAR_SIZE} AS bar_id,
           last - lag(last) OVER (PARTITION BY stream ORDER BY line_no) AS dlt
    FROM ticks_streams
)
SELECT stream, bar_id,
       CAST(count(dlt) AS BIGINT) AS n_moves,
       CAST(coalesce(sum(dlt * dlt), 0) AS BIGINT) AS rv,
       CAST(max(abs(dlt)) AS BIGINT) AS max_abs_move
FROM moves GROUP BY stream, bar_id ORDER BY stream, bar_id
"""


# ================= liquidity / market-efficiency panel =================

VR_Q = 4  # variance-ratio horizon (ticks); VR(4) is the textbook short-horizon point
AMIHUD_SCALE = 1000  # per-mille scaling of the per-tick |move|/volume quotient


def liquidity_panel_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream liquidity / market-efficiency panel: the three
    textbook estimators computed from trades alone (no quote data
    needed) that complete the microstructure family —

    * **Roll (1984) implied spread**: first-order serial covariance of
      price changes; under Roll's bid-ask-bounce model cov < 0 and the
      effective spread is 2*sqrt(-cov). Emitted as the rnd-crossed
      covariance plus the spread (NULL when cov >= 0, the standard
      "Roll undefined" caveat — a trending fixture stream can produce
      positive autocovariance).
    * **Amihud (2002) illiquidity**: mean per-tick |price move| /
      volume — price impact per unit traded. Per-tick quotient as the
      exact non-negative integer |d|*1000 DIV volume (trunc == floor in
      both engines on non-negatives), summed BIGINT; per-tick value
      <= ~5.8e7 at the fixture's 58k spike bound, so the sum holds
      ~7.9e10 ticks/stream inside int64 — a century of prints.
    * **Lo-MacKinlay (1988) variance ratio** VR(q)=Var(r_q)/(q*Var(d))
      with overlapping q-tick returns: the random-walk diagnostic
      (VR<1 = mean reversion / bounce, VR>1 = momentum).

    Exactness: every sum/count is BIGINT; cov and the two variances are
    the exact integer forms n*Sxy - Sx*Sy / n*Sxx - Sx^2 cast to double
    only for the final correctly-rounded IEEE divisions (sqrt is
    correctly rounded too — the ACF family's sanctioned route); each
    float output is rnd-crossed. The five-sums int64 budget is guarded
    division-form (|S| <= (2^62-1) DIV n_ticks — conservative: every
    pair/move/return count <= n_ticks; Cauchy-Schwarz bounds the Sx*Sy
    cross terms by the guarded n*Sxx/n*Syy), folded into the consumed
    n_pairs column so Catalyst cannot prune it; on trip it raises the
    documented re-scale message instead of a silent wraparound.

    Scale: ONE stream-partitioned window node (lags 1/2/q of last) +
    one combinable groupBy(stream) — no SinglePartition, no global
    sort; the panel output is O(streams) rows."""
    return liquidity_panel(ticks_from_events_streams(spark, sf_dir))


def liquidity_panel(t: DataFrame) -> DataFrame:
    """Core of ticks_liquidity_panel over any (stream, line_no, last,
    volume) frame — split out so the golden test can pin the algebra
    against an exact-Fraction Python mirror on a constructed series."""
    w = _w_stream()
    l1, l2, lq = (F.lag("last", k).over(w) for k in (1, 2, VR_Q))
    base = t.select(
        "stream",
        "volume",
        (F.col("last") - l1).alias("d"),
        (l1 - l2).alias("xd"),
        (F.col("last") - lq).alias("r"),
    ).withColumn(
        "am_q",
        F.when(
            F.col("d").isNotNull() & (F.col("volume") > 0),
            F.expr(f"abs(d) * {AMIHUD_SCALE} DIV volume"),
        ),
    )
    pair = F.col("d").isNotNull() & F.col("xd").isNotNull()

    def psum(e):
        return F.coalesce(F.sum(F.when(pair, e)), F.lit(0)).cast("long")

    sums = base.groupBy("stream").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.count("d").alias("n_moves"),
        F.count(F.when(pair, F.lit(1))).alias("n_pairs"),
        psum(F.col("xd")).alias("sx"),
        psum(F.col("d")).alias("sy"),
        psum(F.col("xd") * F.col("d")).alias("sxy"),
        psum(F.col("xd") * F.col("xd")).alias("sxx"),
        psum(F.col("d") * F.col("d")).alias("syy"),
        F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("sd"),
        F.coalesce(F.sum(F.col("d") * F.col("d")), F.lit(0)).cast("long").alias("sdd"),
        F.count("r").alias("nq"),
        F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("sr"),
        F.coalesce(F.sum(F.col("r") * F.col("r")), F.lit(0)).cast("long").alias("srr"),
        F.count("am_q").alias("n_am"),
        F.coalesce(F.sum("am_q"), F.lit(0)).cast("long").alias("amihud_sum_pm"),
    )
    nd = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cov = cov_num / (nd("n_pairs") * nd("n_pairs"))
    var1_num = (F.col("n_moves") * F.col("sdd") - F.col("sd") * F.col("sd")).cast("double")
    varq_num = (F.col("nq") * F.col("srr") - F.col("sr") * F.col("sr")).cast("double")
    vr = (varq_num / (nd("nq") * nd("nq"))) / (
        F.lit(float(VR_Q)) * (var1_num / (nd("n_moves") * nd("n_moves")))
    )
    guarded_n_pairs = corr_budget_guard(
        "ticks_liquidity_panel: five-sums exceed the int64 budget — re-scale prices",
        n_col="n_ticks",
        abs_cols=("sxy",),
        pos_cols=("sxx", "syy", "sdd", "srr"),
        return_col="n_pairs",
    )
    return sums.select(
        "stream",
        F.col("n_ticks").cast("long").alias("n_ticks"),
        F.col("n_moves").cast("long").alias("n_moves"),
        guarded_n_pairs.cast("long").alias("n_pairs"),
        F.when(F.col("n_pairs") > 0, rnd(cov)).alias("roll_cov"),
        F.when((F.col("n_pairs") > 0) & (cov_num < 0),
               rnd(F.lit(2.0) * F.sqrt(-cov))).alias("roll_spread"),
        "amihud_sum_pm",
        F.when(F.col("n_am") > 0,
               rnd(nd("amihud_sum_pm") / nd("n_am"))).alias("amihud_mean_pm"),
        F.when((F.col("n_moves") > 0) & (F.col("nq") > 0) & (var1_num > 0),
               rnd(vr)).alias(f"vr{VR_Q}"),
    ).orderBy("stream")


LIQUIDITY_PANEL_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
base AS (
    SELECT stream, volume,
           last - lag(last, 1) OVER w AS d,
           lag(last, 1) OVER w - lag(last, 2) OVER w AS xd,
           last - lag(last, {VR_Q}) OVER w AS r
    FROM ticks_streams
    WINDOW w AS (PARTITION BY stream ORDER BY line_no)
),
q AS (
    SELECT *, CASE WHEN d IS NOT NULL AND volume > 0
                   THEN abs(d) * {AMIHUD_SCALE} // volume END AS am_q
    FROM base
),
sums AS (
    SELECT stream,
           CAST(count(*) AS BIGINT) AS n_ticks,
           CAST(count(d) AS BIGINT) AS n_moves,
           CAST(count(*) FILTER (WHERE d IS NOT NULL AND xd IS NOT NULL) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(xd)     FILTER (WHERE d IS NOT NULL AND xd IS NOT NULL), 0) AS BIGINT) AS sx,
           CAST(coalesce(sum(d)      FILTER (WHERE d IS NOT NULL AND xd IS NOT NULL), 0) AS BIGINT) AS sy,
           CAST(coalesce(sum(xd * d) FILTER (WHERE d IS NOT NULL AND xd IS NOT NULL), 0) AS BIGINT) AS sxy,
           CAST(coalesce(sum(xd * xd) FILTER (WHERE d IS NOT NULL AND xd IS NOT NULL), 0) AS BIGINT) AS sxx,
           CAST(coalesce(sum(d * d)  FILTER (WHERE d IS NOT NULL AND xd IS NOT NULL), 0) AS BIGINT) AS syy,
           CAST(coalesce(sum(d), 0) AS BIGINT) AS sd,
           CAST(coalesce(sum(d * d), 0) AS BIGINT) AS sdd,
           CAST(count(r) AS BIGINT) AS nq,
           CAST(coalesce(sum(r), 0) AS BIGINT) AS sr,
           CAST(coalesce(sum(r * r), 0) AS BIGINT) AS srr,
           CAST(count(am_q) AS BIGINT) AS n_am,
           CAST(coalesce(sum(am_q), 0) AS BIGINT) AS amihud_sum_pm
    FROM q GROUP BY stream
)
SELECT stream, n_ticks, n_moves, n_pairs,
       CASE WHEN n_pairs > 0 THEN {sql_rnd(
           'CAST(n_pairs * sxy - sx * sy AS DOUBLE)'
           ' / (CAST(n_pairs AS DOUBLE) * CAST(n_pairs AS DOUBLE))')} END AS roll_cov,
       CASE WHEN n_pairs > 0 AND n_pairs * sxy - sx * sy < 0 THEN {sql_rnd(
           '2.0 * sqrt(-(CAST(n_pairs * sxy - sx * sy AS DOUBLE)'
           ' / (CAST(n_pairs AS DOUBLE) * CAST(n_pairs AS DOUBLE))))')} END AS roll_spread,
       amihud_sum_pm,
       CASE WHEN n_am > 0 THEN {sql_rnd(
           'CAST(amihud_sum_pm AS DOUBLE) / CAST(n_am AS DOUBLE)')} END AS amihud_mean_pm,
       CASE WHEN n_moves > 0 AND nq > 0 AND n_moves * sdd - sd * sd > 0 THEN {sql_rnd(
           '(CAST(nq * srr - sr * sr AS DOUBLE) / (CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE)))'
           f' / ({float(VR_Q)!r} * (CAST(n_moves * sdd - sd * sd AS DOUBLE)'
           ' / (CAST(n_moves AS DOUBLE) * CAST(n_moves AS DOUBLE))))')} END AS vr{VR_Q}
FROM sums ORDER BY stream
"""


# ================= Kyle's lambda (price impact) =================


def kyle_lambda_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kyle's lambda per stream: the OLS slope of price change on
    SIGNED volume (Kyle 1985) — price impact per unit of net order
    flow, the third leg of the microstructure stool (order_flow = WHO
    is trading, liquidity_panel = what trading COSTS, this = how much
    trading MOVES the price). Signed volume x_t = dir_t * volume_t
    re-uses the tick-rule classification (zero-ticks inherit the last
    non-zero move's sign and contribute y=0 observations — the
    standard regression, not a move-only subsample); ticks before the
    first price change are unclassified and excluded.

    Exactness: the five sums are exact BIGINTs (|x| <= 5 volume cap,
    |y| <= ~58k move bound at the fixture); lambda = (n*Sxy - Sx*Sy) /
    (n*Sxx - Sx^2) and the Pearson r are correctly-rounded IEEE
    expressions of those integers (two exact sqrts, the ACF family's
    route), rnd-crossed, NULL on a degenerate all-same-x stream. The
    division-form int64 budget guard (|S| <= (2^62-1) DIV n) is folded
    into the consumed n_obs.

    Scale: the same shape as ticks_order_flow — one stream-partitioned
    carry-forward window + one combinable groupBy(stream); O(streams)
    output rows."""
    return kyle_lambda(ticks_from_events_streams(spark, sf_dir))


def kyle_lambda(t: DataFrame) -> DataFrame:
    """Core of ticks_kyle_lambda over any (stream, line_no, last,
    volume) frame — split out (the liquidity_panel convention) so the
    golden test drives the ACTUAL plan, not a re-derivation."""
    t = tick_rule_dirs(t)
    obs = t.select(
        "stream",
        (F.col("last") - F.lag("last").over(_w_stream())).alias("y"),
        (F.col("dir") * F.col("volume")).alias("x"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    sums = obs.groupBy("stream").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    guarded_n = corr_budget_guard(
        "ticks_kyle_lambda: five-sums exceed the int64 budget — re-scale prices"
    )
    return sums.select(
        "stream",
        guarded_n.cast("long").alias("n_obs"),
        "sx", "sy", "sxy", "sxx",
        F.when(vx > 0, rnd(num / vx.cast("double"))).alias("kyle_lambda"),
        F.when(
            (vx > 0) & (vy > 0),
            rnd(num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))),
        ).alias("impact_corr"),
    ).orderBy("stream")


KYLE_LAMBDA_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
{TICK_RULE_SIGNED_SQL},
obs AS (
    SELECT stream, y, dir * volume AS x
    FROM signed WHERE dir IS NOT NULL AND y IS NOT NULL
),
sums AS (
    SELECT stream,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM obs GROUP BY stream
)
SELECT stream, n AS n_obs, sx, sy, sxy, sxx,
       CASE WHEN n * sxx - sx * sx > 0 THEN {sql_rnd(
           'CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)')} END AS kyle_lambda,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN {sql_rnd(
           'CAST(n * sxy - sx * sy AS DOUBLE)'
           ' / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))')} END AS impact_corr
FROM sums ORDER BY stream
"""


# ================= volatility signature =================

SIGNATURE_QS = (1, 2, 4, 8)  # sampling intervals (ticks)


def vol_signature_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatility signature per stream: realized variance per
    NON-OVERLAPPING q-tick return at sampling intervals q = 1,2,4,8 —
    the Andersen/Bollerslev/Diebold signature-plot data. Under a pure
    random walk the per-tick-normalized RV is flat in q; bid-ask
    bounce inflates the finest grids (RV/tick FALLS as q grows), so
    the q-profile is the standard microstructure-noise diagnostic and
    picks the sampling interval for the per-bar RV estimator
    (ticks_realized_variance).

    Sampling: grid points are the ticks with (line_no - 1) % q == 0;
    the q-return is the price change between consecutive grid points
    (lag over the FILTERED per-stream frame — non-overlapping by
    construction, every tick's move counted exactly once per q).

    Exactness: all-integer (move^2 < 2^32 at the fixture bound; sums
    BIGINT) except rv_per_tick = rv/(n_ret*q), ONE rnd-crossed
    division of exact integers.

    Scale: the q fan-out multiplies rows by sum(1/q) < 2 — cheaper
    than two copies of the tick table; windows stay stream-partitioned
    ((stream, q) partitions after the fan-out); one combinable
    groupBy(stream, q)."""
    return vol_signature(ticks_from_events_streams(spark, sf_dir))


def vol_signature(t: DataFrame) -> DataFrame:
    """Core of ticks_vol_signature over any (stream, line_no, last)
    frame — split out (the liquidity_panel convention) so the mirror
    test drives the ACTUAL plan, not a re-derivation."""
    fanned = t.select(
        "stream", "line_no", "last",
        F.explode(F.array(*[F.lit(q) for q in SIGNATURE_QS])).alias("q"),
    ).where((F.col("line_no") - 1) % F.col("q") == 0)
    wq = Window.partitionBy("stream", "q").orderBy("line_no")
    moves = fanned.select(
        "stream", "q",
        (F.col("last") - F.lag("last").over(wq)).alias("d"),
    )
    return (
        moves.groupBy("stream", "q")
        .agg(
            F.count("d").alias("n_ret"),
            F.coalesce(F.sum(F.col("d") * F.col("d")), F.lit(0)).cast("long").alias("rv"),
        )
        .select(
            "stream",
            F.col("q").cast("long").alias("q"),
            F.col("n_ret").cast("long").alias("n_ret"),
            "rv",
            F.when(
                F.col("n_ret") > 0,
                rnd(F.col("rv").cast("double")
                    / (F.col("n_ret") * F.col("q")).cast("double")),
            ).alias("rv_per_tick"),
        )
        .orderBy("stream", "q")
    )


VOL_SIGNATURE_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
fanned AS (
    SELECT stream, line_no, last, q
    FROM ticks_streams, (SELECT unnest({list(SIGNATURE_QS)}) AS q)
    WHERE (line_no - 1) % q = 0
),
moves AS (
    SELECT stream, q,
           last - lag(last) OVER (PARTITION BY stream, q ORDER BY line_no) AS d
    FROM fanned
)
SELECT stream, CAST(q AS BIGINT) AS q,
       CAST(count(d) AS BIGINT) AS n_ret,
       CAST(coalesce(sum(d * d), 0) AS BIGINT) AS rv,
       CASE WHEN count(d) > 0 THEN {sql_rnd(
           'CAST(coalesce(sum(d * d), 0) AS DOUBLE) / CAST(count(d) * q AS DOUBLE)')} END AS rv_per_tick
FROM moves GROUP BY stream, q ORDER BY stream, q
"""


# ================= Lee-Ready with quotes (spreads) =================


def lee_ready_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE Lee & Ready (1991) algorithm plus the two spread
    measures it enables — the quote-side half the tick-rule order flow
    (ticks_order_flow) approximates away: a trade above the quote
    MIDPOINT is a buy, below a sell, and only the at-midpoint ties
    fall back to the tick test. Also per stream: quoted spread
    (ask - bid) and effective spread 2*|price - mid| — the realized
    cost of crossing, the number Roll's estimator (liquidity_panel)
    infers from trades alone; comparing the two validates the
    inference.

    Fixture note (the PII-fixture precedent of planting deterministic
    features): the generator's quotes are DEGENERATE — bid/ask = px∓1
    always, so mid == last and every tick would tie. The query widens
    them with a deterministic line_no-keyed perturbation (bid -
    line_no%3, ask + (line_no DIV 3)%3), identical in both engines and
    chosen so m2diff = line_no%3 - (line_no DIV 3)%3 cycles through
    NEGATIVE, ZERO and POSITIVE — the quote rule, the at-mid tie
    fallback, AND both spreads all exercise non-trivially at the
    parity fixture (a fixture-level test asserts n_tick_fallback > 0);
    the golden test pins the algebra on hand-built quotes.

    Exactness: midpoints never materialize as halves — the quote sign
    is sign(2*last - bid - ask) in CASE arms and the effective spread
    accumulates E2 = |2*last - bid - ask| = 2*|last - mid| as exact
    BIGINTs; the two means are the only rnd-crossed divisions.

    Scale: the tick-rule fallback reuses the one carry-forward window;
    everything else is map-side; one combinable groupBy(stream)."""
    t = ticks_from_events_streams(spark, sf_dir)
    return lee_ready(t.select(
        "stream", "line_no", "last", "volume",
        (F.col("bid") - F.col("line_no") % 3).alias("bq"),
        (F.col("ask") + F.expr("(line_no DIV 3) % 3")).alias("aq"),
    ))


def lee_ready(t: DataFrame) -> DataFrame:
    """Core of ticks_lee_ready over any (stream, line_no, last, volume,
    bq, aq) frame — split out (the liquidity_panel convention) so the
    golden test drives the ACTUAL plan on hand-built quotes."""
    t = tick_rule_dirs(t).select(
        "stream", "volume", "dir", "bq", "aq", "last",
    )
    m2diff = F.lit(2) * F.col("last") - F.col("bq") - F.col("aq")
    qs = (
        F.when(m2diff > 0, F.lit(1))
        .when(m2diff < 0, F.lit(-1))
    )
    lr = t.select(
        "stream", "volume",
        F.coalesce(qs, F.col("dir")).alias("lr_dir"),
        qs.isNotNull().alias("quote_classified"),
        (F.col("aq") - F.col("bq")).alias("quoted_spread"),
        F.abs(m2diff).alias("es2"),
    )
    vol_if = lambda c: F.coalesce(F.sum(F.when(c, F.col("volume"))), F.lit(0)).cast("long")  # noqa: E731
    return (
        lr.groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.count(F.when(F.col("quote_classified"), F.lit(1))).alias("n_quote_rule"),
            F.count(F.when(~F.col("quote_classified") & F.col("lr_dir").isNotNull(),
                           F.lit(1))).alias("n_tick_fallback"),
            vol_if(F.col("lr_dir") == 1).alias("buy_volume"),
            vol_if(F.col("lr_dir") == -1).alias("sell_volume"),
            vol_if(F.col("lr_dir").isNull()).alias("unclassified_volume"),
            F.sum("quoted_spread").cast("long").alias("quoted_spread_sum"),
            F.sum("es2").cast("long").alias("es2_sum"),
        )
        .select(
            "stream", "n_ticks", "n_quote_rule", "n_tick_fallback",
            "buy_volume", "sell_volume", "unclassified_volume",
            "quoted_spread_sum", "es2_sum",
            rnd(F.col("quoted_spread_sum").cast("double")
                / F.col("n_ticks").cast("double")).alias("avg_quoted_spread"),
            rnd(F.col("es2_sum").cast("double")
                / F.col("n_ticks").cast("double")).alias("avg_effective_spread"),
        )
        .orderBy("stream")
    )


LEE_READY_SQL = f"""
WITH ticks_streams AS ({ticks_streams_sql()}),
base AS (
    SELECT stream, line_no, volume, last,
           bid - line_no % 3 AS bq,
           ask + (line_no // 3) % 3 AS aq
    FROM ticks_streams
),
{TICK_RULE_SIGNED_SQL},
joined AS (
    SELECT b.stream, b.volume,
           2 * b.last - b.bq - b.aq AS m2diff,
           b.aq - b.bq AS quoted_spread,
           s.dir
    FROM base b JOIN signed s
      ON b.stream = s.stream AND b.line_no = s.line_no
),
lr AS (
    SELECT stream, volume, quoted_spread, abs(m2diff) AS es2,
           CASE WHEN m2diff > 0 THEN 1 WHEN m2diff < 0 THEN -1 END IS NOT NULL AS quote_classified,
           coalesce(CASE WHEN m2diff > 0 THEN 1 WHEN m2diff < 0 THEN -1 END, dir) AS lr_dir
    FROM joined
)
SELECT stream,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(count(*) FILTER (WHERE quote_classified) AS BIGINT) AS n_quote_rule,
       CAST(count(*) FILTER (WHERE NOT quote_classified AND lr_dir IS NOT NULL) AS BIGINT) AS n_tick_fallback,
       CAST(coalesce(sum(volume) FILTER (WHERE lr_dir = 1), 0) AS BIGINT) AS buy_volume,
       CAST(coalesce(sum(volume) FILTER (WHERE lr_dir = -1), 0) AS BIGINT) AS sell_volume,
       CAST(coalesce(sum(volume) FILTER (WHERE lr_dir IS NULL), 0) AS BIGINT) AS unclassified_volume,
       CAST(sum(quoted_spread) AS BIGINT) AS quoted_spread_sum,
       CAST(sum(es2) AS BIGINT) AS es2_sum,
       {sql_rnd('CAST(sum(quoted_spread) AS DOUBLE) / CAST(count(*) AS DOUBLE)')} AS avg_quoted_spread,
       {sql_rnd('CAST(sum(es2) AS DOUBLE) / CAST(count(*) AS DOUBLE)')} AS avg_effective_spread
FROM lr GROUP BY stream ORDER BY stream
"""
