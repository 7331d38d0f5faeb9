"""FIR anti-aliasing filter design for bar decimation.

Re-expresses /root/reference/src/FIRFilter.jl:35-86. The reference uses
Parks-McClellan (DSP.jl `remez`); scipy is not available in this
environment, so we use the classical Kaiser-windowed-sinc design — same
published spec (passband 80% of the new Nyquist, stopband at the new
Nyquist, 80 dB attenuation) and the *same Kaiser order-estimate formula*
the reference uses (FIRFilter.jl:56-66). Coefficients therefore differ
slightly from the reference's remez taps but meet the identical
anti-aliasing specification; this is a documented substitution, not an
omission.

Coefficients are computed once on the driver (numpy, float64) and
embedded as literals in both the Spark plan and the DuckDB oracle SQL, so
the two engines convolve with bit-identical taps.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


def _kaiser_beta(a_db: float) -> float:
    """Standard Kaiser window beta for stopband attenuation a_db."""
    if a_db > 50.0:
        return 0.1102 * (a_db - 8.7)
    if a_db >= 21.0:
        return 0.5842 * (a_db - 21.0) ** 0.4 + 0.07886 * (a_db - 21.0)
    return 0.0


@lru_cache(maxsize=32)
def design_decimation_filter(
    m: int,
    fs: float = 1.0,
    a_pass_db: float = 0.1,
    a_stop_db: float = 80.0,
    passband_fraction: float = 0.8,
) -> tuple[float, ...]:
    """Low-pass FIR for decimation by m. Returns tuple of float taps.

    Frequency plan mirrors FIRFilter.jl:48-51; the order estimate is the
    reference's Kaiser formula (FIRFilter.jl:56-66) with the same
    even-order (Type I linear phase) constraint, so group delay =
    len(taps)//2 exactly as the reference computes it (:104).
    """
    f_nyq_new = fs / (2.0 * m)
    f_pass = passband_fraction * f_nyq_new
    f_stop = f_nyq_new

    delta_p = (10.0 ** (a_pass_db / 20.0) - 1.0) / (10.0 ** (a_pass_db / 20.0) + 1.0)
    delta_s = 10.0 ** (-a_stop_db / 20.0)
    delta = min(delta_p, delta_s)
    a_atten = -20.0 * math.log10(delta)
    transition = f_stop - f_pass
    order = int(math.ceil((a_atten - 8.0) / (2.285 * 2.0 * math.pi * transition / fs)))
    if order % 2 == 1:
        order += 1

    numtaps = order + 1
    cutoff = (f_pass + f_stop) / 2.0 / fs  # transition-band centre, cycles/sample
    n = np.arange(numtaps, dtype=np.float64) - order / 2.0
    h = 2.0 * cutoff * np.sinc(2.0 * cutoff * n)
    h *= np.kaiser(numtaps, _kaiser_beta(a_atten))
    h /= h.sum()  # unity DC gain so bar averages stay in price units
    return tuple(float(x) for x in h)
