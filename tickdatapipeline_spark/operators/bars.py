"""Bar processing: count-based tumbling OHLC bars + bar-level signal chain.

B1-B7 of SURVEY.md §2.5 (/root/reference/src/BarProcessor.jl:134-358):

- bars are *count*-based tumbling windows over the tick stream:
  bar_id = (tick_idx-1) DIV ticks_per_bar; only full bars complete
  (BarProcessor.jl:177-202);
- OHLC per bar, bar average by boxcar round((H+L+C)/3) (:239-245) or a
  trailing FIR convolution of the last len(taps) raw prices at the
  completing tick (:170-174, :345-358; zeros before stream start, exactly
  like the reference's zero-initialised circular buffer);
- cumulative normalization recomputed every `normalization_window_bars`
  bars from running sums of highs/lows (:247-270), preload 1.0;
- bar delta jump-guard + winsorize with FLAG_CLIPPED (:279-291);
- derivative encoding with the reference's quirk preserved: the imaginary
  component uses the UNclipped average delta, and the first bar's
  "velocity" is avg_raw/norm because prev_normalized=0 (:297-310);
- pass-through enrichment: bar columns land only on the completing tick,
  all other ticks keep nulls (:134-161) — a broadcast left join.

Scale: groupBy(bar_id) is an N:1 reduction shuffle on a key derived from
tick_idx; with stream partitioning it is map-side-combinable and evenly
distributed by construction (every bar has exactly N rows — no skew).
The bars table is ~N x smaller than ticks; all bar windows run on it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tickdatapipeline_spark import constants as C
from tickdatapipeline_spark.config import BarProcessingConfig
from tickdatapipeline_spark.functions.fir import design_decimation_filter


@dataclass(frozen=True)
class BarSeed:
    """Bar-stage prefix state carried across streaming micro-batches.

    Like HotLoopSeed, every stateful bar quantity is a prefix aggregate
    plus one bounded buffer: the unfinished OHLC bar, the lag value for
    bar deltas, cumulative high/low sums for normalization epochs, and
    (FIR only) the trailing raw prices that the next completion's
    convolution can still reach. Defaults = start of stream.
    """

    partial_cnt0: int = 0          # ticks in the unfinished bar
    partial_open0: int | None = None
    partial_high0: int | None = None
    partial_low0: int | None = None
    bars_done0: int = 0            # completed bars so far (lag/row_number offset)
    prev_avg0: int | None = None   # last completed bar's average_raw
    sum_high0: int = 0             # cumulative bar-high sum
    sum_low0: int = 0              # cumulative bar-low sum
    norm0: float = 1.0             # latest recomputed normalization
    tail_prices0: tuple[tuple[int, int], ...] = field(default=())  # (tick_idx, price) FIR tail


# Q33 fixed-point tap quantization for the FIR convolution. Products
# raw_price (<2^17) x tap_q (<2^31) x 1087 terms stay < 2^62: no overflow.
# Integer sums are order-independent, so the convolution is an ordinary
# map-side-combinable SUM — exact across engines AND shuffle-friendly,
# unlike an ordered float fold. Quantization error ~2^-33 per tap is far
# below the reference's own Float32 resolution (2^-24); divergence
# documented in the module docstring.
FIR_Q = 2**33


# FIR scatter chunking (r15): ends-chunk width as a multiple of the tap
# count L. The pre-explode exchange replicates each tick into the end-
# chunks it touches — span L over chunk width k*L is 1 + 1/k replicas —
# so k=4 caps the duplication at 1.25x of the NARROW tick rows while
# keeping #chunks = ticks/(4L) large enough to spread any stream over
# the cluster (sf0.1: ~69 chunks; 100 TB: millions — hash-partitioned).
_FIR_CHUNK_TAPS = 4


def _fir_averages(
    ticks: DataFrame, part: list[str], taps: tuple[float, ...], step: int,
    chunked: bool = False,
) -> DataFrame:
    """FIR bar averages at bar-end ticks.

    out(end) = round(sum_i taps[i] * price[end - i]) — the reference's
    newest-to-oldest circular-buffer convolution (BarProcessor.jl:345-358)
    with zeros before stream start (absent scatter rows == zero terms).

    Physical shape: SCATTER, not gather — each tick explodes into the
    ~L/step bar-end positions it contributes to (bar ends sit at
    multiples of ``step`` in global tick numbering, so a stepped
    sequence enumerates them directly), then ONE integer-SUM groupBy.
    No join against the tick stream at all. (The previous gather
    formulation exploded completions x L and equi-joined 65 M rows back
    to ticks at sf0.1 — 2 shuffles of the blown-up set.)

    Chunked scatter (``chunked=True``, r15; guide §2.5 input skew /
    §1.2 order-of-operations): the L/step explode is the expensive
    stage (~218 replicas/tick at L=1087, step=5) and it inherits the
    INPUT's partitioning — one giant stream runs it on one core. Each
    tick is first replicated into the 1-2 end-CHUNKS its window spans
    (chunk width = _FIR_CHUNK_TAPS x L, so the duplication is <= 1.25x
    of narrow (tick_idx, price) rows — never the exploded replicas),
    hash-repartitioned on (stream, chunk) with an explicit
    AQE-coalesce-exempt partition count, and only then exploded to its
    in-chunk end positions. Each (part, end) group lives entirely in
    one chunk, so the map-side combiner still collapses the blow-up to
    O(ends) rows before the only full shuffle — identical integer sums
    in any order, bit-identical output.

    ``chunked`` follows the caller's two-pass posture (bar_aggregate
    passes its own use_chunks), the same size-gated split the tick
    chain uses: BELOW the two-pass cutover the fused serial scatter
    wins outright (measured r15 at sf0.1, matched probe_ratio: serial
    1.94 s vs chunked 2.29 s bench entry — the extra narrow exchange
    costs more than one core's explode at fixture sizes), ABOVE it the
    explode is unbounded per partition and must fan out (10x
    spot-check: multi-task FIR stage, see plans/r15).

    Output may contain ends whose bar never completes (trailing partial);
    the caller's inner join against completed bars drops them.
    """
    L = len(taps)
    taps_q = F.array(*[F.lit(round(c * FIR_Q)) for c in taps])
    t = F.col("tick_idx")
    first_end = F.expr(f"((tick_idx + {step - 1}) DIV {step}) * {step}")
    last_end = t + F.lit(L - 1)
    src = ticks.select(*part, "tick_idx", "raw_price")
    if chunked:
        C = _FIR_CHUNK_TAPS * L
        # replicate each tick into the end-chunks its [first_end,
        # last_end] span touches (<= 1 + span/C); guard the ascending-
        # sequence contract like _expand_rows does (L < step could make
        # the span empty)
        chunk_seq = F.when(
            first_end <= last_end,
            F.sequence(
                F.expr(
                    f"(((tick_idx + {step - 1}) DIV {step}) * {step}) DIV {C}"),
                F.expr(f"(tick_idx + {L - 1}) DIV {C}"),
            ),
        )
        src = src.withColumn("_fc", F.explode(chunk_seq))
        n_shuffle = int(
            src.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        src = src.repartition(n_shuffle, *(part + ["_fc"]))
        # in-chunk end positions: multiples of `step` within
        # [max(first_end, chunk start), min(last_end, chunk end)]
        lo = F.greatest(
            first_end,
            F.expr(f"((_fc * {C} + {step - 1}) DIV {step}) * {step}"),
        )
        hi = F.least(last_end, F.col("_fc") * F.lit(C) + F.lit(C - 1))
        ends = F.when(lo <= hi, F.sequence(lo, hi, F.lit(step)))
    else:
        ends = F.when(
            first_end <= last_end, F.sequence(first_end, last_end, F.lit(step))
        )
    scattered = (
        src.withColumn("_e", F.explode(ends))
        .withColumn("_tap_q", F.element_at(taps_q, (F.col("_e") - t + 1).cast("int")))
    )
    return (
        scattered.groupBy(*part, F.col("_e").alias("end_tick_idx"))
        .agg(F.sum(F.col("raw_price") * F.col("_tap_q")).alias("_fir_q"))
        .select(
            *part,
            "end_tick_idx",
            F.floor(F.col("_fir_q").cast("double") / F.lit(float(FIR_Q)) + F.lit(0.5))
            .cast("long")
            .alias("bar_average_raw"),
        )
    )


def _seed_table(ticks: DataFrame, seeds: dict, stream_id: str) -> DataFrame:
    """Per-stream BarSeed scalars as a (tiny, broadcastable) DataFrame.
    Explicit schema: optional fields may be all-None, which inference
    cannot type; the key column matches the ticks' stream dtype."""
    key_t = ticks.schema[stream_id].dataType.simpleString()
    rows = [
        (
            k,
            s.partial_cnt0, s.partial_open0, s.partial_high0, s.partial_low0,
            s.bars_done0, s.prev_avg0, s.sum_high0, s.sum_low0, float(s.norm0),
        )
        for k, s in seeds.items()
    ]
    return ticks.sparkSession.createDataFrame(
        rows,
        f"{stream_id} {key_t}, _sd_pcnt long, _sd_popen long, _sd_phigh long, "
        "_sd_plow long, _sd_bdone long, _sd_pavg long, _sd_shigh long, "
        "_sd_slow long, _sd_norm double",
    )


def bar_aggregate(
    ticks: DataFrame,
    cfg: BarProcessingConfig,
    stream_id: str | None = None,
    seed: "BarSeed | dict | None" = None,
    chunk_size: int | None = None,
) -> DataFrame:
    """Tick stream -> one row per completed bar.

    Input needs (tick_idx, raw_price, timestamp [, stream_id]).
    Output: bar_idx (1-based), OHLC, bar_average_raw, bar_price_delta,
    bar_sig_re, bar_sig_im, bar_normalization, bar_flags, bar_ticks,
    bar_volume, bar_end_timestamp, end_tick_idx. ``seed`` continues from
    a prior micro-batch: a single BarSeed (one-stream input) or, with
    ``stream_id``, a {stream_key: BarSeed} mapping — per-stream state is
    attached via a broadcast join of the (tiny) seed table, mirroring
    the reference's per-stream BarProcessor state
    (/root/reference/src/BarProcessor.jl:41-68). None == start of stream.

    ``chunk_size`` (single-stream batch, measured in TICKS like
    hot_loop's): two-pass chunked global order over the bar frame — the
    bar stream is ticks/n rows but still unbounded for a single 100 TB
    stream, so B4's cumulative H/L sums, the norm carry-forward and
    B5's prev-average lag each become chunk-local prefixes plus in-plan
    broadcast offsets (operators/globalorder.py), and ``k`` (1-based
    bars-completed) reduces to the row-local ``bar_id + 1 + seed`` —
    bar ids are dense, the trailing-partial filter only ever drops the
    last bar. Zero SinglePartition exchanges; bit-identical to the
    windowed plan (tests/test_bars.py).
    """
    if not cfg.enabled:
        raise ValueError("bar processing disabled in config")
    part = [stream_id] if stream_id else []
    n = cfg.ticks_per_bar
    use_chunks = chunk_size is not None and not isinstance(seed, dict)

    seeds: dict | None = None
    if isinstance(seed, dict):
        if not stream_id:
            raise ValueError("per-stream seeds require stream_id")
        seeds = seed
        s = BarSeed()  # defaults for streams absent from the mapping
    else:
        s = seed or BarSeed()

    # DIV, not double '/'+cast: exact for any tick_idx (the double
    # quotient is only floor-exact below 2^53)
    df = ticks.withColumn("bar_id", F.expr(f"(tick_idx - 1) DIV {n}"))
    df = df.withColumn("bar_pos", ((F.col("tick_idx") - 1) % n).cast("long"))

    bars = df.groupBy(*part, "bar_id").agg(
        F.max(F.when(F.col("bar_pos") == 0, F.col("raw_price"))).alias("bar_open_raw"),
        F.max("raw_price").alias("bar_high_raw"),
        F.min("raw_price").alias("bar_low_raw"),
        F.max(F.when(F.col("bar_pos") == n - 1, F.col("raw_price"))).alias("bar_close_raw"),
        F.max(F.when(F.col("bar_pos") == n - 1, F.col("timestamp"))).alias("bar_end_timestamp"),
        F.max(F.when(F.col("bar_pos") == n - 1, F.col("tick_idx"))).alias("end_tick_idx"),
        F.count(F.lit(1)).alias("_cnt"),
    )

    # Attach seed scalars as columns: literals for the single-seed path,
    # a broadcast-joined row per stream for the mapping path. Everything
    # downstream reads the _sd_* columns, so both paths share one plan.
    if seeds is not None:
        sd = _seed_table(ticks, seeds, stream_id)
        bars = bars.join(F.broadcast(sd), on=part, how="left")
    else:
        for name, val in [
            ("_sd_pcnt", s.partial_cnt0), ("_sd_popen", s.partial_open0),
            ("_sd_phigh", s.partial_high0), ("_sd_plow", s.partial_low0),
            ("_sd_bdone", s.bars_done0), ("_sd_pavg", s.prev_avg0),
            ("_sd_shigh", s.sum_high0), ("_sd_slow", s.sum_low0),
        ]:
            bars = bars.withColumn(name, F.lit(val).cast("long"))
        bars = bars.withColumn("_sd_norm", F.lit(float(s.norm0)))

    pcnt = F.coalesce(F.col("_sd_pcnt"), F.lit(0))
    bdone = F.coalesce(F.col("_sd_bdone"), F.lit(0))
    # merge the carried unfinished OHLC bar into its batch remainder
    is_pb = (pcnt > 0) & (F.col("bar_id") == bdone)
    bars = (
        bars.withColumn("bar_open_raw", F.when(is_pb, F.col("_sd_popen")).otherwise(F.col("bar_open_raw")))
        .withColumn("bar_high_raw", F.when(is_pb, F.greatest("bar_high_raw", F.col("_sd_phigh"))).otherwise(F.col("bar_high_raw")))
        .withColumn("bar_low_raw", F.when(is_pb, F.least("bar_low_raw", F.col("_sd_plow"))).otherwise(F.col("bar_low_raw")))
        .withColumn("_cnt", F.when(is_pb, F.col("_cnt") + pcnt).otherwise(F.col("_cnt")))
    )
    bars = bars.where(F.col("_cnt") == n)  # partial trailing bar never completes

    if cfg.bar_method == "FIR":
        taps = design_decimation_filter(n)
        fir_src = ticks.select(*part, "tick_idx", "raw_price")
        tail_rows: list = []
        if seeds is not None:
            tail_rows = [
                (k, t_idx, price)
                for k, sk in seeds.items()
                for t_idx, price in sk.tail_prices0
            ]
            if tail_rows:
                key_t = ticks.schema[stream_id].dataType.simpleString()
                tail = ticks.sparkSession.createDataFrame(
                    tail_rows, f"{stream_id} {key_t}, tick_idx long, raw_price long"
                )
                fir_src = fir_src.unionByName(tail)
        elif s.tail_prices0:
            tail = ticks.sparkSession.createDataFrame(
                list(s.tail_prices0), "tick_idx long, raw_price long"
            )
            if part:
                # single seed + stream column: like the scalar seed
                # columns above, the one seed applies uniformly to
                # every stream — replicate the tail per distinct stream
                # (an O(streams) frame)
                tail = ticks.select(*part).distinct().crossJoin(tail)
            fir_src = fir_src.unionByName(tail.select(*part, "tick_idx", "raw_price"))
        firs = _fir_averages(fir_src, part, taps, step=n, chunked=use_chunks)
        bars = bars.join(firs, on=part + ["end_tick_idx"])
    else:
        # boxcar: Int(round((H+L+C)/3)) (BarProcessor.jl:239-245);
        # (H+L+C)/3 can never be an exact .5 tie for integers, so the
        # HALF_UP round is engine-agnostic.
        bars = bars.withColumn(
            "bar_average_raw",
            F.round(
                (F.col("bar_high_raw") + F.col("bar_low_raw") + F.col("bar_close_raw")) / F.lit(3.0), 0
            ).cast("long"),
        )

    if use_chunks:
        from tickdatapipeline_spark.operators.globalorder import (
            GO_CHUNK,
            add_chunk,
            chunk_offsets_plan,
            pin,
        )

        bars = add_chunk(bars, "bar_id", max(chunk_size // n, 1))
        # shared by two offsets subplans and the main plan — pin once
        bars = pin(bars)
        wb = Window.partitionBy(*part, GO_CHUNK).orderBy("bar_id")
    else:
        wb = Window.partitionBy(*part).orderBy("bar_id")
    wcum = wb.rowsBetween(Window.unboundedPreceding, 0)

    # B4: normalization recomputed every W bars from cumulative H/L sums
    # (BarProcessor.jl:247-270). bars_completed k is 1-based; a recompute
    # happens AT bar k when k % W == 0 and uses stats through bar k.
    if use_chunks:
        # bar ids are dense (ticks are dense; the trailing-partial
        # filter only drops the final bar) and the batch's first bar has
        # bar_id == _sd_bdone, so row_number + _sd_bdone == bar_id + 1:
        # k is row-local, no window needed
        k = (F.col("bar_id") + 1).cast("long")
        bars_off = chunk_offsets_plan(
            bars,
            sums={"_go_h0": F.col("bar_high_raw"), "_go_l0": F.col("bar_low_raw")},
            keys=part,
        )
        bars = bars.join(F.broadcast(bars_off), on=part + [GO_CHUNK], how="left")
        cum_high = (
            F.sum("bar_high_raw").over(wcum) + F.coalesce("_go_h0", F.lit(0))
            + F.coalesce(F.col("_sd_shigh"), F.lit(0))
        ).cast("double")
        cum_low = (
            F.sum("bar_low_raw").over(wcum) + F.coalesce("_go_l0", F.lit(0))
            + F.coalesce(F.col("_sd_slow"), F.lit(0))
        ).cast("double")
    else:
        k = (F.row_number().over(wb) + F.coalesce(F.col("_sd_bdone"), F.lit(0))).cast("long")
        cum_high = (F.sum("bar_high_raw").over(wcum) + F.coalesce(F.col("_sd_shigh"), F.lit(0))).cast("double")
        cum_low = (F.sum("bar_low_raw").over(wcum) + F.coalesce(F.col("_sd_slow"), F.lit(0))).cast("double")
    bars = bars.withColumn("k", k)
    norm_at_k = F.greatest(cum_high / F.col("k").cast("double") - cum_low / F.col("k").cast("double"), F.lit(1.0))
    w_recalc = cfg.normalization_window_bars
    bars = bars.withColumn(
        "_norm_recalc", F.when(F.col("k") % w_recalc == 0, norm_at_k)
    )
    if use_chunks:
        # one more offsets pass for the carry-forward quantities that
        # depend on columns computed above: the last norm recalc and the
        # previous bar's (unclipped) average
        carry_off = chunk_offsets_plan(
            bars,
            carries={
                "_go_nr": (F.col("bar_id"), F.col("_norm_recalc")),
                "_go_pavg": (F.col("bar_id"), F.col("bar_average_raw")),
            },
            keys=part,
        )
        bars = bars.join(F.broadcast(carry_off), on=part + [GO_CHUNK], how="left")
        bars = bars.withColumn(
            "bar_normalization",
            F.coalesce(
                F.last("_norm_recalc", ignorenulls=True).over(wcum),
                F.col("_go_nr"),     # last recalc in preceding chunks
                F.col("_sd_norm"),   # carried recalc from the previous batch
                F.lit(1.0),          # preload (BarProcessor.jl:126)
            ),
        )
        prev_avg = F.coalesce(
            F.lag("bar_average_raw").over(wb), F.col("_go_pavg"), F.col("_sd_pavg")
        )
    else:
        bars = bars.withColumn(
            "bar_normalization",
            F.coalesce(
                F.last("_norm_recalc", ignorenulls=True).over(wcum),
                F.col("_sd_norm"),   # carried recalc from the previous batch
                F.lit(1.0),          # preload (BarProcessor.jl:126)
            ),
        )
        prev_avg = F.coalesce(F.lag("bar_average_raw").over(wb), F.col("_sd_pavg"))

    # B5: bar delta = avg_raw - prev avg_raw (UNclipped prev), first bar 0
    # (:272-291); jump guard + winsorize collapse to one clamp.
    raw_delta = F.when(prev_avg.isNull(), F.lit(0)).otherwise(F.col("bar_average_raw") - prev_avg)
    bars = bars.withColumn("_raw_delta", raw_delta.cast("long"))
    eff = min(cfg.max_bar_jump, cfg.winsorize_bar_threshold)
    bars = bars.withColumn(
        "bar_price_delta",
        F.greatest(F.least(F.col("_raw_delta"), F.lit(eff)), F.lit(-eff)).cast("long"),
    )
    bars = bars.withColumn(
        "bar_flags",
        F.when(F.abs(F.col("_raw_delta")) > eff, F.lit(C.FLAG_CLIPPED)).otherwise(F.lit(C.FLAG_OK)).cast("long"),
    )

    # B6: derivative encoding (:293-310). Quirk preserved: imaginary part
    # uses unclipped average delta; first bar's prev_normalized is 0.
    norm = F.col("bar_normalization")
    sig_re = F.col("bar_price_delta").cast("double") / norm
    prev_normalized = F.when(prev_avg.isNull(), F.lit(0.0)).otherwise(prev_avg.cast("double") / norm)
    cur_normalized = F.col("bar_average_raw").cast("double") / norm
    sig_im = (cur_normalized - prev_normalized) * F.lit(float(cfg.bar_derivative_imag_scale))
    bars = bars.withColumn("bar_sig_re", sig_re).withColumn("bar_sig_im", sig_im)

    return bars.select(
        *part,
        (F.col("bar_id") + 1).cast("long").alias("bar_idx"),  # 1-based (:313)
        F.lit(n).cast("long").alias("bar_ticks"),
        F.lit(n).cast("long").alias("bar_volume"),  # 1 contract/tick (:315)
        "bar_open_raw",
        "bar_high_raw",
        "bar_low_raw",
        "bar_close_raw",
        "bar_average_raw",
        "bar_price_delta",
        "bar_sig_re",
        "bar_sig_im",
        "bar_normalization",
        "bar_flags",
        "bar_end_timestamp",
        "end_tick_idx",
    )


def enrich_ticks_with_bars(
    ticks: DataFrame, bars: DataFrame, stream_id: str | None = None
) -> DataFrame:
    """B7 pass-through enrichment: bar columns only on the completing tick
    (BarProcessor.jl:134-161); everyone else keeps nulls — Spark null
    semantics match the reference's Union{T,Nothing} exactly."""
    # bars usually derives from `ticks` itself, so its join-key columns can
    # carry the SAME attribute ids — column-reference equality/drop would
    # silently bind to the wrong side (drop(bars[stream_id]) removed the
    # ticks-side column, nulling `stream` on non-completing rows). Renaming
    # the bars-side keys breaks the ambiguity outright.
    part = [stream_id] if stream_id else []
    renamed = bars.withColumnRenamed("end_tick_idx", "_b_end_tick_idx")
    for c in part:
        renamed = renamed.withColumnRenamed(c, f"_b_{c}")
    cond = ticks["tick_idx"] == renamed["_b_end_tick_idx"]
    for c in part:
        cond = cond & (ticks[c] == renamed[f"_b_{c}"])
    # no broadcast hint: bars is rows/N — AQE broadcasts when small, and
    # at 100 TB this is a co-partitioned shuffle join per stream
    return ticks.join(renamed, cond, "left").drop(
        "_b_end_tick_idx", *[f"_b_{c}" for c in part]
    )


def vwap_bars(raw: DataFrame, bar_size: int) -> DataFrame:
    """Volume-weighted average price per fixed-count bar over a RAW
    (pre-expansion) tick frame — see plans/analytics.bars_vwap_fn for
    rationale vs. the reference's post-expansion bars. ``raw`` needs
    (line_no, last, volume); pv and bar_volume are exact BIGINTs, vwap
    the one rnd-crossed double division. One map-side projection + one
    combinable groupBy."""
    from tickdatapipeline_spark.functions.rounding import rnd

    return (
        raw.select(
            F.expr(f"(line_no - 1) DIV {int(bar_size)}").alias("bar_id"),
            "last",
            "volume",
        )
        .groupBy("bar_id")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("volume").alias("bar_volume"),
            F.sum(F.col("last") * F.col("volume")).alias("pv"),
            F.min("last").alias("low"),
            F.max("last").alias("high"),
        )
        .select(
            "bar_id", "n_ticks", "bar_volume", "pv", "low", "high",
            rnd(F.col("pv").cast("double") / F.col("bar_volume").cast("double")).alias("vwap"),
        )
    )
