"""The cross-round drift auto-triage (scripts_dev/bench_trend.py) —
r12 verdict #2's done-criterion: replaying the committed r10–r12 bench
artifacts must classify the r12 raw +32% as HOST with no manual A/B.

These tests read the committed BENCH_r*.json artifacts (repo-root,
versioned) so the classifier is validated against the exact history
that motivated it, plus synthetic cases for the IO-probe arm the real
artifacts cannot exercise yet (io_fixed_sec ships from r12 on).
"""
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts_dev"))

from bench_trend import FLAG_RATIO, classify, load  # noqa: E402


def test_r11_to_r12_classifies_host():
    """The r12 driver bench's raw +32% on byte-unchanged headline code
    (manually root-caused as host noise via the r12 A/B session) must
    auto-classify as host: the interleaved probe ratio moved 1.03->1.54
    while raw moved x1.32, so the residual is under the flag ratio."""
    old = load(str(ROOT / "BENCH_r11.json"))
    new = load(str(ROOT / "BENCH_r12.json"))
    c = classify(old, new)
    assert c["raw_ratio"] > FLAG_RATIO            # the drift is real...
    assert c["verdict"].startswith("host (interleaved")  # ...and host
    assert c["residual_ratio"] <= FLAG_RATIO


def test_r10_to_r11_classifies_flat():
    old = load(str(ROOT / "BENCH_r10.json"))
    new = load(str(ROOT / "BENCH_r11.json"))
    assert classify(old, new)["verdict"] == "flat-or-improved"


def test_io_contention_attributed():
    """The r12 blind spot: IO-side contention the CPU probes cannot
    see. With every CPU probe flat and io_fixed_sec 3x slower, a +40%
    raw drift must attribute to the IO probe — not read as code."""
    mk = lambda total, io: {  # noqa: E731
        "value": total,
        "calibration": {"probe_ratio": 1.0, "spark_fixed_sec": 20.0,
                        "cpu_fixed_sec": 1.0, "io_fixed_sec": io}}
    c = classify(mk(30.0, 0.3), mk(42.0, 0.9))
    assert c["verdict"] == "host (fixed parquet-scan IO probe)"


def test_code_lead_flagged_when_probes_flat():
    """All four probes flat, raw x1.4 -> the classifier must NOT
    absorb it: code-lead, pointing at the A/B harness."""
    mk = lambda total: {  # noqa: E731
        "value": total,
        "calibration": {"probe_ratio": 1.0, "spark_fixed_sec": 20.0,
                        "cpu_fixed_sec": 1.0, "io_fixed_sec": 0.3}}
    c = classify(mk(30.0), mk(42.0))
    assert c["verdict"].startswith("code-lead")


def test_parity_trend_io_arm():
    """parity_trend.classify_flag's new io-contention arm: a query
    whose raw wall doubled while the artifact-level fixed IO probe
    moved at least as much classifies as io-contention; with flat IO
    probes it stays unexplained (None)."""
    from parity_trend import classify_flag

    oq = {"secs": 1.0, "secs_corrected": 1.0, "seq": 100}
    nq = {"secs": 2.5, "secs_corrected": 2.5, "seq": 101}
    slow_io = classify_flag(oq, nq, {"io_fixed_sec": 0.3},
                            {"io_fixed_sec": 0.9})
    assert slow_io and slow_io.startswith("io-contention")
    assert classify_flag(oq, nq, {"io_fixed_sec": 0.3},
                         {"io_fixed_sec": 0.31}) is None
    # pre-r13 artifacts without the probe: unchanged behavior
    assert classify_flag(oq, nq) is None


def test_missing_io_probe_degrades_gracefully():
    """Pre-r12 artifacts lack io_fixed_sec: the pairwise design must
    simply drop that probe, not crash or misattribute."""
    old = load(str(ROOT / "BENCH_r09.json"))   # no probe_ratio either
    new = load(str(ROOT / "BENCH_r10.json"))
    c = classify(old, new)
    assert "fixed parquet-scan IO probe" not in c["probe_ratios"]
    assert c["verdict"] == "flat-or-improved"
