"""The tick hot loop as a stateless DataFrame plan.

Re-expresses /root/reference/src/TickHotLoopF32.jl:287-437 (validate ->
hold-last -> jump guard -> winsorize -> 144-tick bar stats -> rolling Q16
normalization -> encoder) with window functions, one tiny per-bar
aggregate, and a broadcast join — no per-row state, no UDFs.

Row taxonomy (derived from the reference's early returns):
- ``zero``       invalid price, no prior valid tick (:321-325): signal
                 (0,0), norm 1.0, FLAG_OK; encoders NOT invoked.
- ``holdlast``   invalid price, prior valid tick exists (:305-320):
                 ratio 0, norm 1.0, FLAG_HOLDLAST; CPM/AMC encoders ARE
                 invoked (AMC carrier advances; CPM emits current phase).
- ``first``      first valid tick (:329-343): ratio 0, norm 1.0, FLAG_OK;
                 same encoder treatment as holdlast.
- ``core``       every later valid tick: full chain (:345-436).

Bar statistics count only core ticks (the early returns skip :377-405),
so bar position = running count of core rows. The bar-completing tick
recomputes the cached normalization BEFORE normalizing itself (:384-408),
hence ``bars_done = core_seq DIV 144`` (the 144th core tick of a bar sees
its own bar's stats).

Divergence from the reference (documented, deliberate): all float math is
IEEE double instead of Float32 so the Spark plan and the DuckDB oracle
match bit-for-bit; the reserved EMA/AGC state (:361-375) never affects
output and is exposed separately (see ``ema_columns``).

Scale: `stream_id` partitions every window. Per stream the only shuffle
is the per-bar groupBy (144x reduction) whose result is broadcast back.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tickdatapipeline_spark import constants as C
from tickdatapipeline_spark.config import SignalProcessingConfig


@dataclass(frozen=True)
class HotLoopSeed:
    """Prefix state carried across streaming micro-batches.

    Every stateful quantity in the hot loop is a prefix aggregate, so a
    batch can be processed exactly given these offsets (streaming/state.py
    extracts the next seed from each processed batch). Defaults = the
    start-of-stream state, making the batch path a seed of zeros.
    """

    n_valid0: int = 0          # valid ticks seen in prior batches
    core_seq0: int = 0         # core (accepted) ticks seen
    sum_bmin0: int = 0         # cumulative per-stats-bar min-delta sum
    sum_bmax0: int = 0         # cumulative per-stats-bar max-delta sum
    partial_cnt0: int = 0      # core ticks in the unfinished stats bar
    partial_min0: int | None = None
    partial_max0: int | None = None
    inv_q16_0: int = C.PRELOAD_INV_NORM_Q16  # latest cached Q16 reciprocal
    cpm_theta0: int = 0        # CPM phase accumulator mod 2^32
    amc_n0: int = 0            # AMC carrier position (invoked rows seen)
    last_core_ratio0: float = 0.0  # derivative encoder's prev ratio


def _hexad_expr(ratio: Column, tick_idx: Column) -> tuple[Column, Column]:
    """E1: z = ratio * HEXAD16[(tick_idx-1) & 15] (TickHotLoopF32.jl:122-134)."""
    re_lut = F.array(*[F.lit(re) for re, _ in C.HEXAD16])
    im_lut = F.array(*[F.lit(im) for _, im in C.HEXAD16])
    phase = ((tick_idx - 1) % 16).cast("int") + 1  # 1-based element_at
    return ratio * F.element_at(re_lut, phase), ratio * F.element_at(im_lut, phase)


def _lut_trig(idx: Column) -> tuple[Column, Column]:
    """1024-entry unit-circle LUT entry k -> (cos, sin)(2*pi*k/1024)
    (TickHotLoopF32.jl:36-41)."""
    ang = idx.cast("double") * F.lit(C.TWO_PI / C.CPM_LUT_SIZE)
    return F.cos(ang), F.sin(ang)


def hot_loop(
    expanded: DataFrame,
    cfg: SignalProcessingConfig,
    stream_id: str | None = None,
    stats_ticks_per_bar: int = C.STATS_TICKS_PER_BAR,
    keep_internals: bool = False,
    seed: "HotLoopSeed | dict | None" = None,
    chunk_size: int | None = None,
) -> DataFrame:
    """expanded ticks -> processed ticks.

    Input: (tick_idx, timestamp, raw_price, price_delta [, stream_id]).
    Output: input cols + (sig_re, sig_im, normalization, status_flag)
    [+ internals when keep_internals]. ``seed`` continues from a prior
    micro-batch (see HotLoopSeed): a single seed (one-stream input) or,
    with ``stream_id``, a {stream_key: HotLoopSeed} mapping — per-stream
    state is attached via a broadcast join of the (tiny) seed table,
    mirroring the reference's one-TickHotLoopState-per-stream model.
    None == start of stream.

    ``chunk_size``: two-pass chunked global order — every running
    quantity becomes a chunk-local window prefix plus a broadcast
    per-chunk offset (operators/globalorder.py), removing the
    SinglePartition exchange. Applies to the single-stream batch plan
    AND, with ``stream_id``, to multistream batches whose individual
    streams are long (windows then partition by (stream, chunk));
    only per-stream seed DICTS disable it (they stay on the windowed
    path). The cumulative-valid offsets are an in-plan broadcast
    subquery; core_seq then needs NO second pass — it is the row-local
    function valid_cum - 1[seed==0 and a first-valid row seen],
    because exactly one valid row per cold stream is non-core. Bit-
    identical to the windowed plan (pinned by tests).
    """
    # chunked two-pass applies to the single-stream batch plan AND, with
    # stream_id, to multistream batches whose INDIVIDUAL streams are long
    # (windows partition by (stream, chunk); every offsets subquery is
    # per-stream). Per-stream seed dicts stay on the windowed path.
    use_chunks = chunk_size is not None and not isinstance(seed, dict)
    part = [stream_id] if stream_id else []
    if use_chunks:
        from tickdatapipeline_spark.operators.globalorder import (
            GO_CHUNK,
            add_chunk,
            chunk_offsets_plan,
            pin,
        )

        expanded = add_chunk(expanded, "tick_idx - 1", chunk_size)
        w = Window.partitionBy(*part, GO_CHUNK).orderBy("tick_idx")
    else:
        w = Window.partitionBy(*part).orderBy("tick_idx")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)

    # Seed scalars become _hs_* columns: literals for the single-seed
    # path, a broadcast-joined row per stream for a {key: HotLoopSeed}
    # mapping (mirrors bar_aggregate's per-stream BarSeed; reference
    # keeps one TickHotLoopState per stream). Downstream reads only the
    # columns, so both paths share one plan.
    _HS_FIELDS = [
        ("_hs_nvalid", "n_valid0", "long", 0),
        ("_hs_cseq", "core_seq0", "long", 0),
        ("_hs_sbmin", "sum_bmin0", "long", 0),
        ("_hs_sbmax", "sum_bmax0", "long", 0),
        ("_hs_pcnt", "partial_cnt0", "long", 0),
        ("_hs_pmin", "partial_min0", "long", None),
        ("_hs_pmax", "partial_max0", "long", None),
        ("_hs_inv", "inv_q16_0", "long", C.PRELOAD_INV_NORM_Q16),
        ("_hs_theta", "cpm_theta0", "long", 0),
        ("_hs_amcn", "amc_n0", "long", 0),
        ("_hs_lratio", "last_core_ratio0", "double", 0.0),
    ]

    if isinstance(seed, dict):
        if not stream_id:
            raise ValueError("per-stream seeds require stream_id")
        key_t = expanded.schema[stream_id].dataType.simpleString()
        schema = f"{stream_id} {key_t}, " + ", ".join(
            f"{c} {t}" for c, _a, t, _d in _HS_FIELDS
        )
        seed_tbl = F.broadcast(expanded.sparkSession.createDataFrame(
            [tuple([k] + [getattr(sk, a) for _c, a, _t, _d in _HS_FIELDS])
             for k, sk in seed.items()],
            schema,
        ))

        def _with_seed_cols(frame: DataFrame) -> DataFrame:
            return frame.join(seed_tbl, on=part, how="left")
    else:
        s = seed or HotLoopSeed()

        def _with_seed_cols(frame: DataFrame) -> DataFrame:
            for c, a, t, _d in _HS_FIELDS:
                frame = frame.withColumn(c, F.lit(getattr(s, a)).cast(t))
            return frame

    def _hs(col: str) -> F.Column:
        default = next(d for c, _a, _t, d in _HS_FIELDS if c == col)
        if default is None:
            return F.col(col)
        return F.coalesce(F.col(col), F.lit(default))

    df = _with_seed_cols(expanded)
    df = df.withColumn(
        "is_valid", F.col("raw_price").between(cfg.min_price, cfg.max_price)
    )
    if use_chunks:
        # shared by the offsets subplans, the bar aggregate and the main
        # plan — pin once so the single job computes the lineage once
        df = pin(df)
        if "_go_v0" not in df.columns:
            # not fused upstream (see expand_volume valid_price_range):
            # build the per-chunk valid-count offsets from the expanded
            # rows — one extra full-data groupBy pass + broadcast join
            valid_offsets = chunk_offsets_plan(
                df, sums={"_go_v0": F.when(F.col("is_valid"), 1).otherwise(0)},
                keys=part,
            )
            df = df.join(F.broadcast(valid_offsets), on=part + [GO_CHUNK], how="left")
        batch_valid_cum = (
            F.count(F.when(F.col("is_valid"), 1)).over(wcum)
            + F.coalesce("_go_v0", F.lit(0))
        )
        df = df.withColumn("_go_bvc", batch_valid_cum)
        df = df.withColumn("n_valid_upto", F.col("_go_bvc") + _hs("_hs_nvalid"))
    else:
        df = df.withColumn(
            "n_valid_upto",
            F.count(F.when(F.col("is_valid"), 1)).over(wcum) + _hs("_hs_nvalid"),
        )
    is_core = F.col("is_valid") & (F.col("n_valid_upto") >= 2)
    # (the 'first' leg of the taxonomy needs no own column: it is the
    # valid-but-not-core row, handled implicitly by is_core/is_hold)
    is_hold = (~F.col("is_valid")) & (F.col("n_valid_upto") >= 1)
    is_zero = (~F.col("is_valid")) & (F.col("n_valid_upto") == 0)
    df = df.withColumn("is_core", is_core).withColumn("is_zero", is_zero)

    # Jump guard then winsorize collapse to one clamp at the tighter bound
    # (TickHotLoopF32.jl:347-359): clip(clip(d, +-mj), +-wt) == clip(d, +-min(mj, wt))
    eff = min(cfg.max_jump, cfg.winsorize_delta_threshold)
    delta_w = F.when(
        F.col("is_core"),
        F.greatest(F.least(F.col("price_delta"), F.lit(eff)), F.lit(-eff)),
    )
    df = df.withColumn("delta_w", delta_w.cast("long"))
    df = df.withColumn(
        "clipped", F.col("is_core") & (F.abs(F.col("price_delta")) > eff)
    )

    # Bar position over core (accepted) ticks only (:377-381).
    if use_chunks:
        # row-local: valid rows are all core except the single `first`
        # row a cold stream has (seed n_valid0 == 0) — no second pass
        first_corr = (
            F.when(F.col("_go_bvc") >= 1, F.lit(1)).otherwise(F.lit(0))
            if (seed or HotLoopSeed()).n_valid0 == 0
            else F.lit(0)
        )
        df = df.withColumn(
            "core_seq", F.col("_go_bvc") - first_corr + _hs("_hs_cseq")
        )
    else:
        # row-local, NO second serial window pass (the same identity
        # the chunked path derives): every batch valid row is core
        # except the single `first` row a cold stream has, so the
        # cumulative core count is the cumulative valid count minus
        # that one row. Expressed on the seed COLUMNS so the per-stream
        # dict path (n_valid0 varying by stream) corrects per row.
        # Bit-identity with the count-window form is pinned by the
        # windowed==chunked and golden suites; measured r14 (alternating
        # same-session A/B, min of 4): trio total 10.8 -> 9.3 s.
        first_corr = F.when(
            (_hs("_hs_nvalid") == 0) & (F.col("n_valid_upto") >= 1), F.lit(1)
        ).otherwise(F.lit(0))
        df = df.withColumn(
            "core_seq",
            F.col("n_valid_upto") - _hs("_hs_nvalid") - first_corr
            + _hs("_hs_cseq"),
        )
    n = stats_ticks_per_bar
    df = df.withColumn(
        "bars_done", F.when(F.col("is_core"), F.expr(f"core_seq DIV {n}"))
    )
    df = df.withColumn(
        "bar_ord", F.when(F.col("is_core"), F.expr(f"(core_seq - 1) DIV {n}"))
    )

    # NOTE (r14, measured): the bars aggregate below re-executes the
    # serial window lineage as a broadcast subquery (no exchange to
    # reuse — the single-file scan is already single-partition). A
    # DISK_ONLY pin here to share the lineage was measured SLOWER than
    # the recompute at sub-threshold sizes (alternating A/B: trio total
    # 10.8 -> 11.4 s): the eager checkpoint write+read of the wide
    # post-window frame costs more than re-running the windows. The
    # windowed path only ever runs below the two-pass cutover, so the
    # duplicated lineage is bounded; the chunked path pins because its
    # offsets subqueries multiply consumers.
    # Per-bar min/max of winsorized deltas; only FULL bars trigger a
    # normalization recompute (:383-405). The groupBy is a 144x reduction;
    # the result is tiny -> broadcast back to the tick stream.
    bars = df.where(F.col("is_core")).groupBy(*part, "bar_ord").agg(
        F.min("delta_w").alias("bmin"),
        F.max("delta_w").alias("bmax"),
        F.count(F.lit(1)).alias("cnt"),
        # seed scalars are constant per stream — carry them through
        *[F.min(c).alias(c) for c, _a, _t, _d in _HS_FIELDS],
    )
    # merge the carried unfinished stats bar into its batch remainder;
    # least/greatest skip NULL partial min/max for streams with no carry
    is_pb = (_hs("_hs_pcnt") > 0) & (
        F.col("bar_ord") == F.expr(f"coalesce(_hs_cseq, 0) DIV {n}")
    )
    bars = bars.withColumn(
        "bmin",
        F.when(is_pb, F.least(F.col("bmin"), F.col("_hs_pmin"))).otherwise(F.col("bmin")),
    ).withColumn(
        "bmax",
        F.when(is_pb, F.greatest(F.col("bmax"), F.col("_hs_pmax"))).otherwise(F.col("bmax")),
    ).withColumn(
        "cnt",
        F.when(is_pb, F.col("cnt") + _hs("_hs_pcnt")).otherwise(F.col("cnt")),
    )
    bars = bars.where(F.col("cnt") == n)
    if use_chunks:
        # same two-pass shape one level up the hierarchy: the bar frame
        # is rows/144 but still unbounded for a single 100 TB stream
        bars_chunk = max(chunk_size // n, 1)
        bars = pin(add_chunk(bars, "bar_ord", bars_chunk))
        bar_offs = chunk_offsets_plan(
            bars,
            sums={"_go_bmin0": F.col("bmin"), "_go_bmax0": F.col("bmax")},
            keys=part,
        )
        bars = bars.join(F.broadcast(bar_offs), on=part + [GO_CHUNK], how="left")
        wb = (
            Window.partitionBy(*part, GO_CHUNK).orderBy("bar_ord")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum_bmin = F.sum("bmin").over(wb) + F.coalesce("_go_bmin0", F.lit(0))
        cum_bmax = F.sum("bmax").over(wb) + F.coalesce("_go_bmax0", F.lit(0))
    else:
        wb = Window.partitionBy(*part).orderBy("bar_ord").rowsBetween(Window.unboundedPreceding, 0)
        cum_bmin = F.sum("bmin").over(wb)
        cum_bmax = F.sum("bmax").over(wb)
    k = (F.col("bar_ord") + 1).cast("double")
    norm = F.greatest(
        (cum_bmax + _hs("_hs_sbmax")).cast("double") / k
        - (cum_bmin + _hs("_hs_sbmin")).cast("double") / k,
        F.lit(1.0),
    )
    norms = bars.select(
        *part,
        (F.col("bar_ord") + 1).alias("bars_done"),
        # bround = half-even, matching Julia round() at exact .5 ties
        # (TickHotLoopF32.jl:397 Int32(round(65536f0/norm))); reachable
        # e.g. at norm = 131072 where 0.5 must round DOWN to 0.
        F.bround(F.lit(65536.0) / norm, 0).cast("long").alias("inv_q16"),
    )
    if use_chunks:
        # tiny relative to ticks; pin so the encoder-stage summary job
        # and the final plan don't both recompute the bar aggregation
        norms = pin(norms)

    # NO broadcast hint: norms is rows/144 — tiny locally (AQE broadcasts
    # it automatically) but far too large to broadcast at 100 TB, where
    # this becomes a stream-co-partitioned shuffle join.
    join_keys = part + ["bars_done"]
    df = df.join(norms, on=join_keys, how="left")
    inv = F.when(
        F.col("is_core"), F.coalesce(F.col("inv_q16"), _hs("_hs_inv"))
    )
    df = df.withColumn("inv_q16", inv)

    # Q16 fixed-point normalize (:407-414) — exact in double.
    df = df.withColumn("nq16", F.col("delta_w") * F.col("inv_q16"))
    ratio = F.when(F.col("is_core"), F.col("nq16").cast("double") * F.lit(C.Q16_INV)).otherwise(F.lit(0.0))
    df = df.withColumn("ratio", ratio)
    # inv_q16 can be 0 (norm >= 131072 rounds the reciprocal to zero);
    # the reference's float division then yields Inf32
    # (TickHotLoopF32.jl:413) — Spark ANSI would throw, so emit inf
    # explicitly.
    norm_out = F.when(
        F.col("is_core"),
        F.when(F.col("inv_q16") == 0, F.lit(float("inf"))).otherwise(
            F.lit(1.0) / (F.col("inv_q16").cast("double") * F.lit(C.Q16_INV))
        ),
    ).otherwise(F.lit(1.0))
    df = df.withColumn("normalization", norm_out)

    flag = (
        F.when(is_hold, F.lit(C.FLAG_HOLDLAST))
        .when(F.col("clipped"), F.lit(C.FLAG_CLIPPED))
        .otherwise(F.lit(C.FLAG_OK))
    )
    df = df.withColumn("status_flag", flag.cast("long"))

    # ---- encoders (E1-E5, dispatch :416-432) ----
    enc = cfg.encoder_type
    invoked = ~F.col("is_zero")  # encoders run on every row except `zero` rows
    if use_chunks and enc != "hexad16":
        # the encoder prefix needs one more chunk summary over the
        # post-join frame — pin it so summary + final plan share work.
        # (r14: removing this pin measured a wash locally — derivative
        # 6.57 vs 6.58, multistream 7.32 vs 6.72, within box noise —
        # but it inlines the norms-join segment into the carry-offsets
        # subquery, tripling the full-data exchange nodes the plan-shape
        # test pins; kept for the bounded verified shape.)
        df = pin(df)
    if enc == "derivative":
        # prev ratio over core rows only (:257-282; hold/first rows fall to
        # the hexad16 branch in the reference and do not touch prev state).
        local_prev = F.last(
            F.when(F.col("is_core"), F.col("ratio")), ignorenulls=True
        ).over(w.rowsBetween(Window.unboundedPreceding, -1))
        if use_chunks:
            # cross-chunk carry: last core ratio of preceding chunks
            off2 = chunk_offsets_plan(
                df,
                carries={
                    "_go_lr": (
                        F.col("tick_idx"),
                        F.when(F.col("is_core"), F.col("ratio")),
                    )
                },
                keys=part,
            )
            df = df.join(F.broadcast(off2), on=part + [GO_CHUNK], how="left")
            prev = F.coalesce(local_prev, F.col("_go_lr"), _hs("_hs_lratio"))
        else:
            prev = F.coalesce(local_prev, _hs("_hs_lratio"))
        sig_re = F.when(F.col("is_core"), F.col("ratio")).otherwise(F.lit(0.0))
        sig_im = F.when(
            F.col("is_core"),
            (F.col("ratio") - prev) * F.lit(float(cfg.tick_derivative_imag_scale)),
        ).otherwise(F.lit(0.0))
    elif enc == "hexad16":
        sig_re, sig_im = _hexad_expr(F.col("ratio"), F.col("tick_idx"))
    elif enc == "cpm":
        # Phase accumulation is an associative cumulative sum (:160-176):
        # dp = trunc32(round(ratio * 2h * 2^31)); theta = cumsum(dp) mod 2^32.
        # bround = half-even like Julia round(); ties are impossible at
        # h=0.5 (integral product, see the pi/2 golden) but reachable at
        # h values with >16 fractional bits (e.g. h=2^-17).
        scale = 2.0 * float(cfg.cpm_modulation_index) * 2.0**31
        dp = F.when(F.col("is_core"), F.bround(F.col("ratio") * F.lit(scale), 0).cast("long")).otherwise(F.lit(0))
        if use_chunks:
            # the offsets hierarchy reduces mod 2^32 at EVERY level
            # (per-chunk totals, within-super prefixes, super totals —
            # globalorder.chunk_offsets_plan), so the only un-modded
            # int64 accumulations are the within-chunk sums: bounded by
            # chunk_size x max|dp| (|dp| < 2^35 at config extremes),
            # safe for chunk_size <= 2^27 — which plans/common caps.
            # The chunked form therefore stays exact at stream lengths
            # where a single running int64 sum would overflow.
            df = df.withColumn("_go_dp", dp)
            off2 = chunk_offsets_plan(
                df, sums={"_go_th0": F.col("_go_dp")}, mods={"_go_th0": C.Q32_MOD},
                keys=part,
            )
            df = df.join(F.broadcast(off2), on=part + [GO_CHUNK], how="left")
            theta = F.pmod(
                F.sum("_go_dp").over(wcum)
                + F.coalesce("_go_th0", F.lit(0)) + _hs("_hs_theta"),
                F.lit(C.Q32_MOD),
            )
        else:
            theta = F.pmod(F.sum(dp).over(wcum) + _hs("_hs_theta"), F.lit(C.Q32_MOD))
        idx = (theta / F.lit(2**C.CPM_INDEX_SHIFT)).cast("long")  # top 10 bits (:173-176)
        lre, lim = _lut_trig(idx)
        sig_re = F.when(invoked, lre).otherwise(F.lit(0.0))
        sig_im = F.when(invoked, lim).otherwise(F.lit(0.0))
        # theta is observable under keep_internals so the half-even tie
        # policy can be pinned by a golden (a +-1 in theta is invisible
        # through the 10-bit LUT index).
        df = df.withColumn("cpm_theta", theta)
    elif enc == "amc":
        # Carrier advances by a constant 2^32/16 per *invocation* (:203-230);
        # closed form: theta = incr * (# invoked rows so far) mod 2^32.
        if use_chunks:
            off2 = chunk_offsets_plan(
                df, sums={"_go_n0": F.when(invoked, 1).otherwise(0)}, keys=part,
            )
            df = df.join(F.broadcast(off2), on=part + [GO_CHUNK], how="left")
            amc_n = (
                F.count(F.when(invoked, 1)).over(wcum)
                + F.coalesce("_go_n0", F.lit(0)) + _hs("_hs_amcn")
            )
        else:
            amc_n = F.count(F.when(invoked, 1)).over(wcum) + _hs("_hs_amcn")
        # reduce mod 16 before the multiply: INCR*16 == 2^32 exactly, so
        # theta depends only on amc_n mod 16 — and amc_n * INCR would
        # overflow int64 past 2^35 rows
        assert C.AMC_CARRIER_INCREMENT_Q32 * 16 == C.Q32_MOD
        theta = F.pmod(
            F.pmod(amc_n, F.lit(16)) * F.lit(C.AMC_CARRIER_INCREMENT_Q32),
            F.lit(C.Q32_MOD),
        )
        idx = (theta / F.lit(2**C.CPM_INDEX_SHIFT)).cast("long")
        lre, lim = _lut_trig(idx)
        sig_re = F.when(invoked, F.col("ratio") * lre).otherwise(F.lit(0.0))
        sig_im = F.when(invoked, F.col("ratio") * lim).otherwise(F.lit(0.0))
    else:
        raise ValueError(f"unknown encoder_type: {enc}")

    df = df.withColumn("sig_re", sig_re).withColumn("sig_im", sig_im)

    out_cols = part + [
        "tick_idx",
        "timestamp",
        "raw_price",
        "price_delta",
        "sig_re",
        "sig_im",
        "normalization",
        "status_flag",
    ]
    if keep_internals:
        out_cols += ["is_valid", "is_core", "core_seq", "delta_w", "bar_ord", "bars_done", "inv_q16", "nq16", "ratio"]
        if enc == "cpm":
            out_cols += ["cpm_theta"]
    return df.select(*out_cols)
