"""Engine-wide constants.

These mirror the reference's compile-time constants so that the Spark
engine and the DuckDB oracle share one source of truth:

- status flag bits: /root/reference/src/BroadcastMessage.jl:67-72
- HEXAD16 16-phase rotation table: /root/reference/src/TickHotLoopF32.jl:4-30
- CPM/AMC Q32 phase constants + 1024-entry LUT quantization:
  /root/reference/src/TickHotLoopF32.jl:36-46
- 144-tick stats bar: /root/reference/src/TickHotLoopF32.jl:49-50
- Q16 normalization preload (65536/8.67 rounded in Float32 = 7559):
  /root/reference/src/TickHotLoopF32.jl:106-107

All floating-point math in this engine is IEEE-754 double (the reference
uses Float32); this is a deliberate, documented divergence that makes
results reproducible bit-for-bit across Spark and DuckDB.
"""

from __future__ import annotations

import math

# --- status flags (BroadcastMessage.jl:67-72) ---
FLAG_OK = 0x00
FLAG_MALFORMED = 0x01
FLAG_HOLDLAST = 0x02
FLAG_CLIPPED = 0x04
FLAG_AGC_LIMIT = 0x08

# --- hot-loop stats bar (TickHotLoopF32.jl:49-50) ---
STATS_TICKS_PER_BAR = 144

# --- Q16 normalization (TickHotLoopF32.jl:73, 106-107, 397-409) ---
Q16_ONE = 65536
Q16_INV = 1.52587890625e-5  # 2^-16, exact in binary floating point
# round(Float32(65536) / Float32(8.67)) == 7559 (preload before first bar)
PRELOAD_INV_NORM_Q16 = 7559

# --- CPM / AMC Q32 phase (TickHotLoopF32.jl:44-46, 112-115) ---
Q32_MOD = 2**32
CPM_INDEX_SHIFT = 22  # top 10 bits of the 32-bit phase
CPM_LUT_SIZE = 1024
AMC_CARRIER_INCREMENT_Q32 = 268435456  # 2^32/16 = pi/8 per tick (hardcoded)

# --- HEXAD16 rotation table (TickHotLoopF32.jl:4-30) ---
_COS_22_5 = 0.9238795325112867
_SIN_22_5 = 0.3826834323650898
_SQRT2_2 = 0.7071067811865476

# (re, im) pairs for phases 0..15 (22.5 deg steps). Literal doubles so the
# Spark plan and the DuckDB oracle SQL embed the exact same values.
HEXAD16: tuple[tuple[float, float], ...] = (
    (1.0, 0.0),
    (_COS_22_5, _SIN_22_5),
    (_SQRT2_2, _SQRT2_2),
    (_SIN_22_5, _COS_22_5),
    (0.0, 1.0),
    (-_SIN_22_5, _COS_22_5),
    (-_SQRT2_2, _SQRT2_2),
    (-_COS_22_5, _SIN_22_5),
    (-1.0, 0.0),
    (-_COS_22_5, -_SIN_22_5),
    (-_SQRT2_2, -_SQRT2_2),
    (-_SIN_22_5, -_COS_22_5),
    (0.0, -1.0),
    (_SIN_22_5, -_COS_22_5),
    (_SQRT2_2, -_SQRT2_2),
    (_COS_22_5, -_SIN_22_5),
)

TWO_PI = 2.0 * math.pi
