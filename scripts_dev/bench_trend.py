"""Cross-round BENCH artifact drift auto-triage (r12 verdict #2).

Two rounds in a row the driver's raw headline number moved double-digit
percent on byte-identical headline code, and each time attribution cost
a manual session (r12: a full alternating A/B harness). The bench
artifacts already carry everything needed to do that triage
automatically: each run records FOUR fixed-work calibration probes —

- ``probe_ratio``     interleaved scheduler+CPU Spark probe (vs pin)
- ``spark_fixed_sec`` the warmed whole-plan tiny pass (sf0.001)
- ``cpu_fixed_sec``   pure single-core Python loop (no Spark)
- ``io_fixed_sec``    warm parquet scan of a fixed sf0.1 file (r12+)

This script compares two BENCH_r*.json files PAIRWISE: every probe's
new/old ratio is a box-speed measurement on the exact same work, so the
box constant cancels and NO quiet-box pin is needed (the r12 lesson:
pins drift with session warmup state; same-work cross-round ratios
don't). The host explanation for a raw drift is the LARGEST probe
ratio — CPU-side contention shows in the interleaved/CPU probes,
IO-side contention (the correction model's acknowledged r12 blind
spot) shows in ``io_fixed_sec`` — and the verdict is:

- ``flat-or-improved``  raw ratio <= FLAG_RATIO;
- ``host (<probe>)``    raw ratio > FLAG_RATIO but residual
                        raw/host_factor <= FLAG_RATIO — the named
                        probe moved at least as much as the queries;
- ``code-lead``         residual > FLAG_RATIO: the drift exceeds every
                        probe's movement — run the alternating A/B
                        (scripts_dev/ab_bench.py) before reading it as
                        a regression (per the committed r12
                        methodology, deltas under ~±25% are host noise
                        until an A/B shows a one-sided per-query min).

Validation (pinned in tests/test_bench_trend.py): replaying the
committed r10→r11 and r11→r12 artifacts classifies r11→r12's raw +32%
as host via the interleaved probe (its ratio moved 1.03→1.54) with no
manual A/B, and r10→r11 as flat.

Usage:
    python scripts_dev/bench_trend.py BENCH_r11.json BENCH_r12.json
"""

from __future__ import annotations

import json
import sys

FLAG_RATIO = 1.10  # drift below this is jitter, not worth attribution

# (key-in-calibration, human label). probe_ratio is already normalized
# by the shared pin, so its pairwise ratio equals the probe-time ratio.
PROBES = [
    ("probe_ratio", "interleaved scheduler+CPU probe"),
    ("spark_fixed_sec", "warmed tiny-pass Spark probe"),
    ("cpu_fixed_sec", "single-core Python probe"),
    ("io_fixed_sec", "fixed parquet-scan IO probe"),
]


def load(path: str) -> dict:
    """Accept the driver wrapper ({"parsed": {...}}) or the raw bench
    JSON line."""
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def probe_ratios(old: dict, new: dict) -> dict:
    oc, nc = old.get("calibration", {}), new.get("calibration", {})
    out = {}
    for key, label in PROBES:
        if key in oc and key in nc and float(oc[key]) > 0:
            out[label] = float(nc[key]) / float(oc[key])
    return out


def classify(old: dict, new: dict) -> dict:
    """{"raw_ratio", "probe_ratios", "host_factor", "host_probe",
    "residual_ratio", "verdict"} for the headline totals."""
    raw = float(new["value"]) / float(old["value"])
    ratios = probe_ratios(old, new)
    if ratios:
        host_probe = max(ratios, key=ratios.get)
        host_factor = max(1.0, ratios[host_probe])
    else:
        host_probe, host_factor = None, 1.0
    residual = raw / host_factor
    if raw <= FLAG_RATIO:
        verdict = "flat-or-improved"
    elif residual <= FLAG_RATIO:
        verdict = f"host ({host_probe})"
    else:
        verdict = ("code-lead: run scripts_dev/ab_bench.py before "
                   "reading this as a regression")
    return {
        "raw_ratio": round(raw, 4),
        "probe_ratios": {k: round(v, 4) for k, v in ratios.items()},
        "host_factor": round(host_factor, 4),
        "host_probe": host_probe,
        "residual_ratio": round(residual, 4),
        "verdict": verdict,
    }


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    old, new = load(argv[1]), load(argv[2])
    c = classify(old, new)
    print(f"old: {argv[1]}  total {old['value']}s")
    print(f"new: {argv[2]}  total {new['value']}s  "
          f"(x{c['raw_ratio']})")
    for label, r in c["probe_ratios"].items():
        print(f"  probe x{r:6.3f}  {label}")
    print(f"host factor x{c['host_factor']} ({c['host_probe']}); "
          f"residual x{c['residual_ratio']}")
    print(f"VERDICT: {c['verdict']}")

    # per-query detail: residual ratios after the host correction —
    # a genuinely regressed query stands out against a uniform-host
    # background even when the total classifies as host
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq), key=lambda q: -(
        (nq[q] / oq[q]) if oq[q] else 0))
    if common:
        print("\nper-query raw -> residual (worst 8):")
        for q in common[:8]:
            r = nq[q] / oq[q] if oq[q] else float("inf")
            print(f"  {q:38s} {oq[q]:7.2f}s -> {nq[q]:7.2f}s  "
                  f"x{r:5.2f} -> x{r / c['host_factor']:5.2f}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main(sys.argv))
    except BrokenPipeError:  # piped into head — not an error
        raise SystemExit(0)
