"""Reference-trace fidelity: Spark (float64) vs per-tick Float32 simulator.

The engine deliberately computes in IEEE double (operators/hotloop.py
header) while the reference is ComplexF32 end-to-end. The DuckDB oracle
is co-designed with the Spark plans, so only THIS suite — an independent
per-tick float32 re-implementation straight from TickHotLoopF32.jl —
can catch a semantic drift shared by plan and oracle. Tolerances are
derived in tests/ref_sim_f32.py's header; everything integer (flags,
deltas, theta, inv_q16) and everything exactly representable in both
widths (ratio, derivative sigs) must match EXACTLY.
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import make_ticks_raw
from tests.ref_sim_f32 import simulate
from tickdatapipeline_spark.config import SignalProcessingConfig
from tickdatapipeline_spark.operators.expansion import expand_volume
from tickdatapipeline_spark.operators.hotloop import hot_loop

TS = "20250319 120000 0000000"
N_STATS = 12


def _scenario():
    """Deterministic mixed workload: leading zero row, holds, jump-guard
    and winsorize clips, volume replicas, several stats-bar recomputes."""
    rng = random.Random(20250813)
    lines = [(99999, 1)]  # invalid before any valid -> zero row
    p = 41970
    for i in range(240):
        r = rng.random()
        if r < 0.04:
            lines.append((99999, 1))          # hold rows
            continue
        if r < 0.07:
            step = 80 if r < 0.055 else -80   # jump guard (then winsorize)
        elif r < 0.13:
            step = rng.choice([30, -25, 15])  # winsorize only
        else:
            step = rng.randint(-6, 6)
        p = min(max(p + step, 41800), 42600)  # stay inside valid range
        lines.append((p, rng.choice([1, 1, 1, 2, 3])))
    return lines


@pytest.mark.parametrize("enc", ["derivative", "hexad16", "cpm", "amc"])
def test_engine_matches_f32_reference_trace(spark, enc):
    cfg = SignalProcessingConfig(encoder_type=enc)
    lines = _scenario()
    sim = simulate(lines, cfg, stats_ticks_per_bar=N_STATS)

    raw = make_ticks_raw(spark, [(i + 1, TS, p, v) for i, (p, v) in enumerate(lines)])
    got = (
        hot_loop(expand_volume(raw), cfg, stats_ticks_per_bar=N_STATS,
                 keep_internals=True)
        .orderBy("tick_idx")
        .collect()
    )
    assert len(got) == len(sim) >= 250
    n_bars_seen = 0
    for g, s in zip(got, sim):
        ctx = f"enc={enc} tick={s['tick_idx']}"
        # integer surface: exact
        assert g.tick_idx == s["tick_idx"] and g.raw_price == s["raw_price"]
        assert g.price_delta == s["price_delta"], ctx
        assert g.status_flag == s["status_flag"], ctx
        if g.inv_q16 is not None:
            assert g.inv_q16 == s["inv_q16"], ctx
            if s["inv_q16"] != 7559:
                n_bars_seen += 1
            # ratio is exact in both widths (|nq16| < 2^24)
            assert g.ratio == s["ratio"], ctx
        # normalization: one f32 division in the reference
        assert g.normalization == pytest.approx(s["normalization"], rel=1e-6), ctx
        if enc == "cpm":
            assert g.cpm_theta == s["theta"], ctx  # exact at h=0.5
        if enc == "derivative":
            # bit-equal across widths (exact f32 values, Sterbenz-safe)
            assert g.sig_re == s["sig_re"], ctx
            assert g.sig_im == pytest.approx(s["sig_im"], abs=1e-12), ctx
        else:
            # trig constants: f32 LUT vs f64 expressions
            assert g.sig_re == pytest.approx(s["sig_re"], abs=1e-6), ctx
            assert g.sig_im == pytest.approx(s["sig_im"], abs=1e-6), ctx
    # the scenario must actually exercise recomputed normalization
    assert n_bars_seen > 50, f"stats-bar recompute never engaged ({n_bars_seen})"


def test_cpm_f32_drift_bounded_at_inexact_h(spark):
    """At h values whose f32 product rounds coarsely (h=0.3), the engine's
    float64 CPM phase may drift from the reference's float32 phase — the
    documented width divergence. Pin it QUANTITATIVELY: per-tick dp
    differs by at most half an f32 ulp of the product magnitude
    (<= 2^31 * 2^-24 = 128), so |theta_engine - theta_ref| after N core
    ticks is <= 128*N — far below the 2^22 LUT-index granularity for any
    realistic batch."""
    cfg = SignalProcessingConfig(encoder_type="cpm", cpm_modulation_index=0.3)
    lines = _scenario()
    sim = simulate(lines, cfg, stats_ticks_per_bar=N_STATS)
    raw = make_ticks_raw(spark, [(i + 1, TS, p, v) for i, (p, v) in enumerate(lines)])
    got = (
        hot_loop(expand_volume(raw), cfg, stats_ticks_per_bar=N_STATS,
                 keep_internals=True)
        .orderBy("tick_idx")
        .collect()
    )
    n_core = 0
    worst = 0
    for g, s in zip(got, sim):
        if g.inv_q16 is not None:
            n_core += 1
        d = abs(g.cpm_theta - s["theta"])
        d = min(d, 2**32 - d)  # wrap distance
        worst = max(worst, d)
        assert d <= 128 * max(n_core, 1), f"tick {s['tick_idx']}: drift {d}"
    assert n_core > 200  # the bound was actually exercised
