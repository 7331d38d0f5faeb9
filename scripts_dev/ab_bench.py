"""Alternating same-box A/B of two checkouts' bench.py (r11 verdict #1).

The corrected legacy15 gate metric drifted 19.38 -> 20.23 -> 21.57 s
across r9 -> r11 while the three tick_pipeline_* headliners (and the
whole legacy15 surface) were byte-unchanged — so either HEAD regressed
somewhere subtle, or the correction model misses a host-side factor the
CPU/scheduler probe cannot see (I/O, JVM heap layout, page cache).
Per-round driver numbers cannot distinguish these; an ALTERNATING
same-session A/B can: run checkout A's bench, then B's, repeated, solo.
Host drift hits both sides of each adjacent pair equally; a code
regression shows up as a one-sided per-query ratio that survives the
alternation.

Usage:
    python scripts_dev/ab_bench.py A_DIR B_DIR [rounds=3] [out.json]

Each round runs A then B (one bench.py subprocess each, sequential —
NEVER concurrent: two local[32] sessions inflate timings 10-100x).
Emits per-query MIN-across-rounds for both sides, the per-query B/A
ratio, each run's probe_ratio, and a verdict line per query:
  CODE  — B/A ratio >= FLAG on min-vs-min (host noise cancelled by min)
  ok    — within the noise band
Exit 0 always (this is a measurement, not a gate).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

FLAG = 1.15  # min-vs-min per-query ratio that warrants a code diff read


def run_bench(checkout: str, env: dict) -> dict:
    """One solo bench.py run in ``checkout``; returns the parsed JSON."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=checkout, env=env,
        capture_output=True, text=True, timeout=1800)
    wall = round(time.time() - t0, 1)
    line = None
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith('{"metric"'):
            line = ln
    if line is None:
        raise RuntimeError(
            f"bench in {checkout} emitted no JSON line (rc={proc.returncode})\n"
            f"stderr tail: {proc.stderr[-2000:]}")
    out = json.loads(line)
    out["_wall"] = wall
    return out


def main() -> None:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "AB_BENCH.json"
    env = dict(os.environ)
    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for r in range(rounds):
        for side, d in (("A", a_dir), ("B", b_dir)):
            res = run_bench(d, env)
            runs[side].append(res)
            print(f"round {r + 1} side {side}: total={res['value']} "
                  f"legacy15={res.get('legacy15_total')} "
                  f"corrected15={res.get('corrected_legacy15')} "
                  f"probe_ratio={res.get('calibration', {}).get('probe_ratio')} "
                  f"wall={res['_wall']}s", flush=True)

    names = sorted(set().union(*[set(x["queries"]) for x in runs["A"] + runs["B"]]))
    report = {"rounds": rounds, "a_dir": a_dir, "b_dir": b_dir,
              "a_runs": runs["A"], "b_runs": runs["B"], "queries": {}}
    print(f"\n{'query':34s} {'A_min':>7s} {'B_min':>7s} {'B/A':>6s}  verdict")
    for n in names:
        a = [x["queries"][n] for x in runs["A"] if n in x["queries"]]
        b = [x["queries"][n] for x in runs["B"] if n in x["queries"]]
        if not a or not b:
            continue
        am, bm = min(a), min(b)
        ratio = round(bm / am, 3) if am else float("inf")
        verdict = "CODE?" if ratio >= FLAG else (
            "B-faster" if ratio <= 1 / FLAG else "ok")
        report["queries"][n] = {"a_min": am, "b_min": bm, "ratio": ratio,
                                "a_all": a, "b_all": b, "verdict": verdict}
        print(f"{n:34s} {am:7.3f} {bm:7.3f} {ratio:6.3f}  {verdict}")

    def tot(side: str, keys) -> float:
        mins = {n: min(x["queries"][n] for x in runs[side] if n in x["queries"])
                for n in keys}
        return round(sum(mins.values()), 3)

    # legacy15 is positional in bench.py; recompute from the A side's order
    l15 = list(runs["A"][0]["queries"])[:15]
    report["legacy15_a_min"] = tot("A", l15)
    report["legacy15_b_min"] = tot("B", [n for n in l15 if any(
        n in x["queries"] for x in runs["B"])])
    report["total_a_min"] = tot("A", names)
    report["total_b_min"] = tot("B", names)
    print(f"\nlegacy15 min-of-runs: A={report['legacy15_a_min']} "
          f"B={report['legacy15_b_min']}")
    print(f"all-query min-of-runs: A={report['total_a_min']} "
          f"B={report['total_b_min']}")
    Path(out_path).write_text(json.dumps(report, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
