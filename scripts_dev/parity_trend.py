"""Per-query wall-time trend between two PARITY_HEAD.json artifacts.

The full oracle_parity sweep records `secs` for every registered query
(196 as of r9), so round-over-round regression attribution doesn't have
to rest on the 19 HEADLINE bench queries + tier-2 spot checks: diff the
committed artifact of the previous round against the current one and
flag the queries whose wall time jumped.

Usage:
    python scripts_dev/parity_trend.py                # previous commit of
                                                      # PARITY_HEAD.json vs
                                                      # the working-tree file
    python scripts_dev/parity_trend.py <old-ref>      # e.g. a round tag/sha
    python scripts_dev/parity_trend.py <old-ref> <new-ref-or-path>

Interpretation contract (r9 verdict #3): sf0.01 timings are noisy —
JIT warmup order, box contention, GC — so a single-round jump is a
LEAD, not a verdict. Flag persistent jumps (>FLAG_RATIO in two
consecutive rounds) for plan investigation; one-round jumps on
sub-second queries are expected noise. The ratio floor (MIN_SECS on
the slower side) keeps 0.1 s -> 0.3 s noise out of the report.
"""

from __future__ import annotations

import json
import subprocess
import sys

FLAG_RATIO = 2.0
MIN_SECS = 0.8  # slower side must reach this for a flag to mean anything
MIN_IO_PROBE_SEC = 0.5  # io-contention arm needs a probe above jitter scale


def _load(ref_or_path: str) -> dict:
    """A filesystem path, or `<git-ref>` meaning <ref>:PARITY_HEAD.json."""
    try:
        with open(ref_or_path) as f:
            return json.load(f)
    except (FileNotFoundError, IsADirectoryError):
        blob = subprocess.check_output(
            ["git", "show", f"{ref_or_path}:PARITY_HEAD.json"], text=True)
        return json.loads(blob)


def _previous_artifact_ref() -> str:
    """The most recent commit that touched PARITY_HEAD.json (the prior
    round's committed sweep, when the working tree holds the new one)."""
    out = subprocess.check_output(
        ["git", "log", "--format=%H", "-1", "--", "PARITY_HEAD.json"], text=True)
    return out.strip()


def classify_flag(oq: dict, nq: dict,
                  old_art: dict | None = None,
                  new_art: dict | None = None) -> str | None:
    """Auto-triage for a flagged query (r11 verdict #5 — the r11 round
    triaged its two residual flags as sweep-position warmup BY HAND;
    the per-query `seq` both artifacts now record lets the classifier
    do it, and r12's artifact PROVED the triage: both r11 flags
    reverted to baseline once their position left the warmup zone).

    Returns a classification string, or None = unexplained (a real
    lead worth a solo re-measure / plan diff):

    - 'warmup-position': the query moved into the sweep's first ~20
      slots (changed fingerprints rotate to the front), where it pays
      session JIT/codegen warmup the deep positions never see;
    - 'correction-asymmetry': the flag exists only in CORRECTED space —
      raw wall times are within the flag ratio, so the jump is the two
      rounds' contention corrections disagreeing (e.g. an over-
      corrected busy-box old value vs an uncorrected quiet-box new
      one), not the plan;
    - 'io-contention' (r12 verdict #2 — the CPU probe's acknowledged
      blind spot): both artifacts carry the fixed parquet-scan IO
      probe (``io_fixed_sec``, r13+) and its cross-artifact ratio
      moved at least as much as the query's raw wall time — the box's
      IO side was contended, which the scheduler+CPU probe (and thus
      secs_corrected) cannot see.
    """
    if "seq" in oq and "seq" in nq and nq["seq"] < min(20, oq["seq"] // 2):
        return (f"warmup-position: moved to sweep position {nq['seq']}"
                f" (was {oq['seq']})")
    raw_o = float(oq.get("secs", 0.0))
    raw_n = float(nq.get("secs", 0.0))
    if raw_o > 0 and raw_n / raw_o <= FLAG_RATIO:
        return (f"correction-asymmetry: raw {raw_o:.2f}s -> {raw_n:.2f}s"
                f" (x{raw_n / raw_o:.2f}) is inside the flag ratio")
    oio = (old_art or {}).get("io_fixed_sec")
    nio = (new_art or {}).get("io_fixed_sec")
    # the probe is ~0.2s; below MIN_IO_PROBE_SEC its ratio is jitter
    # and must not explain away a genuine regression (ADVICE r13)
    if (oio and nio and raw_o > 0
            and max(oio, nio) >= MIN_IO_PROBE_SEC
            and nio / oio >= raw_n / raw_o):
        return (f"io-contention: fixed IO probe x{nio / oio:.2f} >= "
                f"query raw x{raw_n / raw_o:.2f}")
    return None


def trend(old: dict, new: dict) -> dict:
    """Comparison dict: {rows: [(name, old_s, new_s, ratio)], added,
    removed, flagged, unexplained} — flagged = ratio > FLAG_RATIO with
    the slower side above MIN_SECS, sorted worst first; unexplained =
    the flagged subset classify_flag could not attribute to sweep
    position or correction asymmetry."""
    o, n = old["results"], new["results"]
    common = sorted(set(o) & set(n))

    def secs(rec: dict) -> float:
        # contention-corrected when the artifact carries it (r11+);
        # raw otherwise — mixing the two across artifacts is fine
        # (correction only ever DEFLATES an inflated number)
        return float(rec.get("secs_corrected", rec.get("secs", 0.0)))

    rows = []
    for q in common:
        os_, ns_ = secs(o[q]), secs(n[q])
        ratio = ns_ / os_ if os_ > 0 else float("inf")
        rows.append((q, os_, ns_, ratio))
    flagged = sorted(
        (r for r in rows if r[3] > FLAG_RATIO and max(r[1], r[2]) >= MIN_SECS),
        key=lambda r: -r[3])
    unexplained = [r for r in flagged
                   if classify_flag(o[r[0]], n[r[0]], old, new) is None]
    return {
        "rows": rows,
        "added": sorted(set(n) - set(o)),
        "removed": sorted(set(o) - set(n)),
        "flagged": flagged,
        "unexplained": unexplained,
    }


def main(argv: list[str]) -> int:
    old_ref = argv[1] if len(argv) > 1 else _previous_artifact_ref()
    new_ref = argv[2] if len(argv) > 2 else "PARITY_HEAD.json"
    old, new = _load(old_ref), _load(new_ref)
    t = trend(old, new)
    tot_o = sum(r[1] for r in t["rows"])
    tot_n = sum(r[2] for r in t["rows"])
    print(f"old: {old_ref} ({old.get('git_head', '?')[:9]}, {len(old['results'])} queries)")
    print(f"new: {new_ref} ({new.get('git_head', '?')[:9]}, {len(new['results'])} queries)")
    print(f"common {len(t['rows'])}: total {tot_o:.1f}s -> {tot_n:.1f}s "
          f"(x{tot_n / tot_o:.2f})" if tot_o else "no common queries")
    if t["added"]:
        print(f"added ({len(t['added'])}): {', '.join(t['added'])}")
    if t["removed"]:
        print(f"removed ({len(t['removed'])}): {', '.join(t['removed'])}")
    slowest = sorted(t["rows"], key=lambda r: -r[2])[:10]
    print("\nslowest now:")
    for q, os_, ns_, ratio in slowest:
        print(f"  {q:42s} {os_:7.2f}s -> {ns_:7.2f}s  x{ratio:5.2f}")
    if t["flagged"]:
        print(f"\nFLAG (> x{FLAG_RATIO}, slower side >= {MIN_SECS}s):")
        o, n = old["results"], new["results"]
        for q, os_, ns_, ratio in t["flagged"]:
            cls = classify_flag(o[q], n[q], old, new)
            note = f"  [{cls}]" if cls else "  [UNEXPLAINED]"
            print(f"  {q:42s} {os_:7.2f}s -> {ns_:7.2f}s  x{ratio:5.2f}{note}")
        print(f"\nunexplained flags: {len(t['unexplained'])}"
              + (" — solo re-measure / plan diff these"
                 if t["unexplained"] else
                 " — every flag classified (warmup position or"
                 " correction asymmetry)"))
    else:
        print(f"\nno flags (> x{FLAG_RATIO} with slower side >= {MIN_SECS}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
