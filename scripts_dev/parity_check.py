"""Dev harness: run the Spark pipeline and the DuckDB oracle side by side
on a testdata sf dir and diff them column by column. Not part of tests/.

Usage: python scripts_dev/parity_check.py [sf_dir] [encoder]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from tickdatapipeline_spark.config import BarProcessingConfig, SignalProcessingConfig
from tickdatapipeline_spark.operators.bars import bar_aggregate
from tickdatapipeline_spark.operators.expansion import expand_volume
from tickdatapipeline_spark.operators.hotloop import hot_loop
from tickdatapipeline_spark.oracle import bars_ctes, pipeline_ctes
from tickdatapipeline_spark.session import get_spark
from tickdatapipeline_spark.sources.tickfile import ticks_from_events


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame, keys: list[str]) -> bool:
    sdf = sdf.sort_values(keys).reset_index(drop=True)
    ddf = ddf.sort_values(keys).reset_index(drop=True)
    ok = True
    if len(sdf) != len(ddf):
        print(f"[{name}] ROWCOUNT spark={len(sdf)} duckdb={len(ddf)}")
        return False
    for col in sdf.columns:
        if col not in ddf.columns:
            print(f"[{name}] missing col in oracle: {col}")
            ok = False
            continue
        a, b = sdf[col], ddf[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            bad = ~((a == b) | (a.isna() & b.isna()))
        else:
            bad = ~((a.astype("object") == b.astype("object")) | (a.isna() & b.isna()))
        nbad = int(bad.sum())
        if nbad:
            ok = False
            i = bad.idxmax()
            print(f"[{name}] col {col}: {nbad} mismatches; first at row {i}: spark={a[i]!r} duckdb={b[i]!r}")
            print(sdf.loc[max(0, i - 1) : i + 1])
            print(ddf.loc[max(0, i - 1) : i + 1])
    if ok:
        print(f"[{name}] OK ({len(sdf)} rows, {len(sdf.columns)} cols exact)")
    return ok


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    encoders = [sys.argv[2]] if len(sys.argv) > 2 else ["derivative", "hexad16", "cpm", "amc"]

    spark = get_spark("parity-check")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")

    all_ok = True
    for enc in encoders:
        sp = SignalProcessingConfig(encoder_type=enc, cpm_modulation_index=0.2,
                                    tick_derivative_imag_scale=2.0)
        ticks = ticks_from_events(spark, sf_dir)
        expanded = expand_volume(ticks)
        out = hot_loop(expanded, sp, keep_internals=True)
        sdf = out.toPandas()
        ddf = con.sql(f"WITH {pipeline_ctes(sp)} SELECT * FROM ticks_out").df()
        all_ok &= compare(f"hotloop/{enc}", sdf, ddf, ["tick_idx"])

    # bars (boxcar + FIR), on the derivative pipeline output
    sp = SignalProcessingConfig(encoder_type="derivative", tick_derivative_imag_scale=2.0)
    for method, tpb, wbars in [("boxcar", 21, 24), ("FIR", 5, 40)]:
        bp = BarProcessingConfig(enabled=True, ticks_per_bar=tpb, bar_method=method,
                                 normalization_window_bars=wbars)
        ticks = ticks_from_events(spark, sf_dir)
        expanded = expand_volume(ticks)
        processed = hot_loop(expanded, sp)
        bars = bar_aggregate(processed, bp)
        sdf = bars.toPandas()
        ddf = con.sql(
            f"WITH {pipeline_ctes(sp)}, {bars_ctes(sp, bp)} SELECT * FROM bars_out"
        ).df()
        all_ok &= compare(f"bars/{method}", sdf, ddf, ["bar_idx"])

    print("ALL OK" if all_ok else "FAILURES")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
