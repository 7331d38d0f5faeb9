"""Refresh FINGERPRINTS.json — the changed-lineage registry anchor.

For every gated query with a green row in ANY committed
CORRECTNESS_r*.json, record the fingerprint of its CURRENT
implementation (plan-fn source + oracle SQL, `__spark_entry__._fingerprint`)
together with its latest green round. `__spark_entry__._registry` promotes a
query to the head of the driver's 50-entry window when its live
fingerprint drifts from this recording (and no newer green row exists),
so an edited query is driver-hash-checked the very next round.

Run this at SESSION START, before editing any plan code: at that point
HEAD is the driver-verified snapshot (the driver's results commit sits
directly on the code it verified, and the previous session's full
`scripts_dev/oracle_parity.py` sweep covered the queries outside the
driver window), so "current implementation" == "verified
implementation" for every green query. Running it mid-session after
editing a not-yet-reverified query would instead LAUNDER the edit past
the promotion — don't.

Usage: python scripts_dev/update_fingerprints.py  (idempotent; prints a diff summary)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as E  # noqa: E402


def main() -> None:
    reg = E._registry()
    last = E._last_green_round()
    out_path = REPO / "FINGERPRINTS.json"
    prev = E._recorded_fingerprints()

    out: dict[str, dict] = {}
    for name, (fn, sql) in reg.items():
        if sql is None or name not in last:
            continue  # rows-only / never driver-green: nothing to anchor
        out[name] = {"fp": E._fingerprint(fn, sql), "round": last[name]}

    changed = [n for n in out if prev.get(n) != out[n]]
    dropped = [n for n in prev if n not in out]
    out_path.write_text(json.dumps(dict(sorted(out.items())), indent=1) + "\n")
    print(f"recorded {len(out)} fingerprints -> {out_path}")
    print(f"changed/new: {len(changed)}; dropped (no longer registered): {len(dropped)}")
    if changed:
        print("  " + ", ".join(sorted(changed)[:20]) + (" ..." if len(changed) > 20 else ""))


if __name__ == "__main__":
    main()
