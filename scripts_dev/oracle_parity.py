"""Dev harness mimicking the driver's correctness gate: run every
__spark_entry__ query at a given sf and diff against its DuckDB oracle
(row count + column-sorted value compare). Not part of tests/.

A FULL sweep (no name filters) also writes PARITY_HEAD.json at the repo
root — the diffable artifact behind the "every gated query verified at
HEAD" claim the registry rotation depends on; commit it with the sweep.
Filtered runs never touch the artifact (a partial run must not
masquerade as full coverage).

Timing hygiene (r10 verdict #3): the r10 artifact committed
contention-inflated `secs` for a few queries (events_key_skew 6.94 s
vs 0.59 s solo) and parity_trend.py false-flagged them. bench.py's
fixed interleaved probe now runs after EVERY query here too, so each
entry carries `probe_sec` (the contention the adjacent timing saw) and
`secs_corrected` = secs / max(1, probe_sec / PROBE_REF_SEC) — the
box-invariant number parity_trend.py prefers. Raw `secs` stays for
continuity with pre-r11 artifacts.

Usage: python scripts_dev/oracle_parity.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def equal(a: pd.Series, b: pd.Series) -> tuple[bool, str]:
    """Dtype-STRICT compare. The driver's value-hash is dtype-sensitive,
    so int64-vs-float64 (e.g. DuckDB sum(int)→HUGEINT→float64 vs Spark
    int64) must FAIL here even when values match — this blind spot
    shipped red rows in rounds 1 and 2."""
    if a.dtype.kind in "iuf" or b.dtype.kind in "iuf":
        if a.dtype != b.dtype:
            return False, f"DTYPE spark={a.dtype} duckdb={b.dtype}"
        if a.dtype.kind == "f":
            av, bv = a.to_numpy(), b.to_numpy()
            same = bool(np.all((av == bv) | (np.isnan(av) & np.isnan(bv))))
            return same, "" if same else "values"
    same = bool((a.fillna("\0").to_numpy() == b.fillna("\0").to_numpy()).all())
    return same, "" if same else "values"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    import __spark_entry__ as E
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("oracle-parity")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    ok_n = bad_n = 0
    results: dict[str, dict] = {}

    from bench import PROBE_REF_SEC  # one pin, shared with bench.py

    def probe() -> float:
        """bench.py's fixed scheduler+CPU-bound probe (~0.065 s quiet,
        warmed): run after each query so the recorded timing carries
        its own contention estimate."""
        t0 = time.time()
        spark.range(20_000_000, numPartitions=8).selectExpr(
            "sum(id * 3) as s").collect()
        return time.time() - t0

    probe()  # warm the probe's codegen before any recorded use
    probes: list[float] = []

    def record(name: str, status: str, rows: int, t0: float) -> None:
        secs = round(time.time() - t0, 2)
        p = probe()
        probes.append(p)
        ratio = max(1.0, p / PROBE_REF_SEC)
        # seq: position in the sweep. The rotation order puts CHANGED
        # queries first, so a query that moves to the front pays the
        # fresh session's codegen/JIT warmup — the benign flag class
        # the probe ratio cannot correct (the probe is warm by then);
        # parity_trend annotates flags whose position moved forward.
        results[name] = {"status": status, "rows": rows, "secs": secs,
                         "probe_sec": round(p, 4),
                         "secs_corrected": round(secs / ratio, 2),
                         "seq": len(results)}

    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"[{name}] SPARK ERROR: {exc}")
            bad_n += 1
            record(name, "bad", -1, t0)
            continue
        if name not in oracles:
            print(f"[{name}] rows-only: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            ok_n += 1
            record(name, "rows_only", len(sdf), t0)
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"[{name}] ORACLE ERROR: {str(exc)[:200]}")
            bad_n += 1
            record(name, "bad", len(sdf), t0)
            continue
        s, d = canon(sdf), canon(ddf)
        if len(s) != len(d):
            print(f"[{name}] ROWCOUNT spark={len(s)} duckdb={len(d)}")
            bad_n += 1
            record(name, "bad", len(s), t0)
            continue
        if list(s.columns) != list(d.columns):
            print(f"[{name}] COLUMNS spark={list(s.columns)} duckdb={list(d.columns)}")
            bad_n += 1
            record(name, "bad", len(s), t0)
            continue
        bad_cols = []
        for c in s.columns:
            same, why = equal(s[c], d[c])
            if not same:
                bad_cols.append((c, why))
        if bad_cols:
            print(f"[{name}] MISMATCH in {[c for c, _ in bad_cols]}")
            for c, why in bad_cols[:3]:
                if why.startswith("DTYPE"):
                    print(f"  {c}: {why}")
                else:
                    neq = ~((s[c] == d[c]) | (s[c].isna() & d[c].isna()))
                    i = int(neq.idxmax())
                    print(f"  {c}[{i}]: spark={s[c][i]!r} duckdb={d[c][i]!r}")
            bad_n += 1
            record(name, "bad", len(s), t0)
        else:
            print(f"[{name}] OK ({len(s)} rows, {len(s.columns)} cols, {time.time()-t0:.1f}s)")
            ok_n += 1
            record(name, "ok", len(s), t0)
    print(f"\n{ok_n} ok, {bad_n} bad")
    if not filters:
        import json
        import subprocess
        from pathlib import Path

        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip()
        probe_median = sorted(probes)[len(probes) // 2] if probes else None
        # fixed IO probe (bench.py's twin): warm scan of the same fixed
        # sf0.1 file — scanned twice, second timing recorded, because
        # this sweep runs at sf0.01 so the sf0.1 file may be cold in
        # the page cache (bench.py's single shot is warm by then).
        # Cross-artifact ratios of this number let parity_trend
        # attribute IO-side contention the CPU probe cannot see.
        # guarded: a host without the sf0.1 fixture must not lose the
        # whole sweep's artifact to this optional probe (ADVICE r13)
        io_fixed = None
        try:
            for _ in range(2):
                t0 = time.time()
                spark.read.parquet(
                    "/root/testdata/sf0.1/lineitem.parquet").selectExpr(
                    "count(l_orderkey)").collect()
                io_fixed = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record None, keep artifact
            print(f"io probe skipped: {e}")
            io_fixed = None
        artifact = {"sf_dir": sf_dir, "git_head": head,
                    "ok": ok_n, "bad": bad_n,
                    "probe_ref_sec": PROBE_REF_SEC,
                    "probe_median_sec": (round(probe_median, 4)
                                         if probe_median else None),
                    "io_fixed_sec": io_fixed,
                    "results": dict(sorted(results.items()))}
        out = Path(__file__).resolve().parent.parent / "PARITY_HEAD.json"
        out.write_text(json.dumps(artifact, indent=1) + "\n")
        print(f"wrote {out}")
    sys.exit(1 if bad_n else 0)


if __name__ == "__main__":
    main()
