"""Per-tick Float32 simulator of the reference hot loop.

An INDEPENDENT third implementation, written directly from the
reference's per-tick semantics (/root/reference/src/TickHotLoopF32.jl:
287-437 main loop, :120-280 encoders; expansion delta rule
/root/reference/src/VolumeExpansion.jl:182-194) in numpy float32 — the
reference's ComplexF32 arithmetic — so the Spark engine's documented
IEEE-double formulation can be pinned against reference-traced values
with explicit tolerances. The DuckDB oracle is co-designed with the
Spark plans, so it cannot catch a SHARED semantic drift from the Julia
source; this simulator can.

Float32-vs-float64 analysis (why the tolerances are what they are):
- ratio = nq16 * 2^-16 with |nq16| < 2^24: exact in BOTH widths.
- derivative sig: differences of exact multiples of 2^-16 below 2^24
  stay exact -> bit-equal across widths.
- CPM dp at h=0.5: nq16 * 2^15 has <= 20 mantissa bits -> exact in f32;
  theta/idx therefore EXACT. (At h with >16 fractional bits the f32
  product rounds more coarsely and theta may drift - not exercised
  here; the half-even tie policy is pinned separately.)
- LUT / HEXAD trig constants: f32 vs f64 differ by <= ~1.2e-7.
- normalization factor 1/(inv * 2^-16): one f32 division -> rel ~1e-7.
"""

from __future__ import annotations

import numpy as np

from tickdatapipeline_spark import constants as C

F32 = np.float32

# CPM_LUT_1024 (TickHotLoopF32.jl:36-42): trig of the Float32-rounded
# angle, rounded to Float32.
_ANG32 = (np.arange(1024, dtype=np.float64) * (2.0 * np.pi) / 1024.0).astype(F32)
LUT_RE = np.cos(_ANG32.astype(np.float64)).astype(F32)
LUT_IM = np.sin(_ANG32.astype(np.float64)).astype(F32)

# HEXAD16 (:13-30): ComplexF32 constants from the same decimal literals.
_C225, _S225 = F32(0.9238795325112867), F32(0.3826834323650898)
_SQ22 = F32(0.7071067811865476)
HEXAD_RE = np.array(
    [1.0, _C225, _SQ22, _S225, 0.0, -_S225, -_SQ22, -_C225,
     -1.0, -_C225, -_SQ22, -_S225, 0.0, _S225, _SQ22, _C225], dtype=F32)
HEXAD_IM = np.array(
    [0.0, _S225, _SQ22, _C225, 1.0, _C225, _SQ22, _S225,
     0.0, -_S225, -_SQ22, -_C225, -1.0, -_C225, -_SQ22, -_S225], dtype=F32)

_Q16_INV_F32 = F32(1.52587890625e-5)  # 2^-16 (:408)
_U32 = 1 << 32


def _rnd_f32(x: F32) -> int:
    """Julia round(::Float32) = half-to-even."""
    return int(np.rint(F32(x)))


class _State:
    """TickHotLoopState (:55-94) with create_tickhotloop_state defaults
    (:96-118): preload inv = round(65536f0/8.67f0), AMC incr 2^32/16."""

    def __init__(self) -> None:
        self.last_clean: int | None = None
        self.bar_tick_count = 0
        self.bar_min = None  # typemax/typemin sentinels
        self.bar_max = None
        self.sum_bar_min = 0
        self.sum_bar_max = 0
        self.bar_count = 0
        self.inv_q16 = _rnd_f32(F32(65536) / F32(8.67))
        self.theta_u32 = 0  # phase accumulator reinterpreted as UInt32
        self.amc_incr = 268435456
        self.prev_ratio = F32(0.0)


def _emit(state, enc, ratio, norm_factor, flag, tick_idx, cfg, invoked=True):
    """Encoder dispatch (:416-432) -> (sig_re, sig_im) as Python floats."""
    if not invoked:
        return 0.0, 0.0
    if enc == "cpm":
        # process_tick_cpm! (:153-184): f32 product, half-even round,
        # Int32-wrap accumulate, top 10 bits index the LUT.
        scale = F32(2.0) * F32(cfg.cpm_modulation_index) * F32(2.0**31)
        dp = _rnd_f32(F32(ratio) * scale)
        state.theta_u32 = (state.theta_u32 + dp) % _U32
        idx = (state.theta_u32 >> 22) & 0x3FF
        return float(LUT_RE[idx]), float(LUT_IM[idx])
    if enc == "amc":
        # process_tick_amc! (:203-230): constant carrier increment,
        # amplitude = ratio.
        state.theta_u32 = (state.theta_u32 + state.amc_incr) % _U32
        idx = (state.theta_u32 >> 22) & 0x3FF
        return float(F32(ratio) * LUT_RE[idx]), float(F32(ratio) * LUT_IM[idx])
    if enc == "derivative":
        # process_tick_derivative! (:246-282). NOTE: hold/first/zero rows
        # go through the hexad branch in the reference dispatch and do
        # NOT touch prev_ratio — callers route those to enc="hexad16".
        d = F32(F32(ratio) - state.prev_ratio) * F32(cfg.tick_derivative_imag_scale)
        state.prev_ratio = F32(ratio)
        return float(F32(ratio)), float(d)
    # hexad16 (:125-134): phase = (tick_idx - 1) & 15
    ph = (tick_idx - 1) & 15
    return float(F32(ratio) * HEXAD_RE[ph]), float(F32(ratio) * HEXAD_IM[ph])


def simulate(lines, cfg, stats_ticks_per_bar=144):
    """lines: [(price, volume)] -> one dict per expanded tick.

    Returns tick_idx, raw_price, price_delta, sig_re, sig_im,
    normalization, status_flag (+ cpm theta_u32 after the tick).
    """
    enc = cfg.encoder_type
    st = _State()
    out = []
    tick_idx = 0
    previous_last = None
    first_tick = True
    for price, vol in lines:
        for replica in range(1, vol + 1):
            tick_idx += 1
            # VolumeExpansion.jl:182-194 delta rule
            if first_tick:
                msg_delta = 0
                first_tick = False
            elif replica == 1:
                msg_delta = price - previous_last
            else:
                msg_delta = 0
            row = _tick(st, tick_idx, price, msg_delta, cfg, enc,
                        stats_ticks_per_bar)
            out.append(row)
        previous_last = price
    return out


def _tick(st, tick_idx, price, msg_delta, cfg, enc, n_bar):
    flag = C.FLAG_OK
    hexad_like = "hexad16" if enc in ("hexad16", "derivative") else enc

    # Step 1: validation (:304-326)
    if price < cfg.min_price or price > cfg.max_price:
        if st.last_clean is not None:
            flag |= C.FLAG_HOLDLAST
            re, im = _emit(st, hexad_like, F32(0.0), F32(1.0), flag, tick_idx, cfg)
            return dict(tick_idx=tick_idx, raw_price=price, price_delta=msg_delta,
                        sig_re=re, sig_im=im, normalization=1.0,
                        status_flag=flag, theta=st.theta_u32)
        # first tick invalid: zeros, encoder NOT invoked (:322-325)
        return dict(tick_idx=tick_idx, raw_price=price, price_delta=msg_delta,
                    sig_re=0.0, sig_im=0.0, normalization=1.0,
                    status_flag=C.FLAG_OK, theta=st.theta_u32)

    # Step 2: first valid tick (:329-344)
    if st.last_clean is None:
        st.last_clean = price
        re, im = _emit(st, hexad_like, F32(0.0), F32(1.0), C.FLAG_OK, tick_idx, cfg)
        return dict(tick_idx=tick_idx, raw_price=price, price_delta=msg_delta,
                    sig_re=re, sig_im=im, normalization=1.0,
                    status_flag=C.FLAG_OK, theta=st.theta_u32)

    delta = msg_delta
    # Step 3: jump guard (:348-352)
    if abs(delta) > cfg.max_jump:
        delta = cfg.max_jump if delta > 0 else -cfg.max_jump
        flag |= C.FLAG_CLIPPED
    # Step 4: winsorize (:354-360)
    if abs(delta) > cfg.winsorize_delta_threshold:
        delta = (1 if delta > 0 else -1) * cfg.winsorize_delta_threshold
        flag |= C.FLAG_CLIPPED

    # Steps 5-6 (EMA/AGC) are reserved state with no output — skipped.

    # Step 7: bar min/max (:380-384)
    st.bar_tick_count += 1
    st.bar_min = delta if st.bar_min is None else min(st.bar_min, delta)
    st.bar_max = delta if st.bar_max is None else max(st.bar_max, delta)

    # Step 8: bar boundary recompute (:386-404); Julia Int64/Int64 is
    # float64 division, then Float32() narrows before the f32 divide.
    if st.bar_tick_count >= n_bar:
        st.sum_bar_min += st.bar_min
        st.sum_bar_max += st.bar_max
        st.bar_count += 1
        avg_min = st.sum_bar_min / st.bar_count
        avg_max = st.sum_bar_max / st.bar_count
        normalization = max(avg_max - avg_min, 1)
        st.inv_q16 = _rnd_f32(F32(65536) / F32(normalization))
        st.bar_tick_count = 0
        st.bar_min = None
        st.bar_max = None

    # Step 9: Q16 normalize (:406-413)
    nq16 = delta * st.inv_q16
    ratio = F32(F32(nq16) * _Q16_INV_F32)
    if st.inv_q16 == 0:
        norm_factor = float("inf")
    else:
        norm_factor = float(F32(1.0) / F32(F32(st.inv_q16) * _Q16_INV_F32))

    # Step 10: encoder (:416-432)
    re, im = _emit(st, enc, ratio, norm_factor, flag, tick_idx, cfg)
    st.last_clean = price
    return dict(tick_idx=tick_idx, raw_price=price, price_delta=msg_delta,
                sig_re=re, sig_im=im, normalization=norm_factor,
                status_flag=flag, theta=st.theta_u32, inv_q16=st.inv_q16,
                ratio=float(ratio))
