"""Zero-denominator / degenerate-source audit (r10 verdict #7).

The f170a14 bug (a source whose every doc tokenizes to nothing crashed
the pooled permille under ANSI division) is a CLASS: any pooled
ratio/share/permille query can meet a denominator that is only zero on
degenerate input the sf fixtures never produce. This script builds two
adversarial fixture dirs and runs EVERY registry query against each:

- ``empty``: all ten tables present but zero rows — the empty-partition
  day a 100 TB pipeline absolutely hits.
- ``degenerate``: minimal rows chosen to zero every denominator class
  at once — empty/NULL/whitespace-only texts, a source with ONLY empty
  texts, a ZERO embedding vector and an all-identical pair (zero
  norm / zero variance), events all at ONE timestamp with value 0.0
  and a single user+type (zero spans, zero sums, MAD 0), zero-price /
   100%-discount lineitems.

Usage: python scripts_dev/degenerate_sweep.py [out_dir]
Prints one line per crashing query and a summary; exit 1 on crashers.
The pinned regression twin is tests/test_degenerate_sources.py (slow
marker), which runs the same sweep and fails on any crash.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def _write(d, name, schema, rows):
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    pq.write_table(
        pa.table({f.name: pa.array(list(c), type=f.type)
                  for f, c in zip(schema, cols)}, schema=pa.schema(schema)),
        f"{d}/{name}.parquet")


def build_fixture(d: str, empty: bool) -> None:
    """Write the ten-table fixture into ``d`` (must exist)."""
    import datetime as dt

    TS = dt.datetime(2024, 1, 1, 0, 0, 0)
    f = pa.field
    S = {
        "customer": [f("c_custkey", pa.int64()), f("c_name", pa.string()),
                     f("c_nationkey", pa.int32()), f("c_acctbal", pa.float64()),
                     f("c_mktsegment", pa.string())],
        "documents": [f("doc_id", pa.int64()), f("text", pa.string()),
                      f("lang", pa.string()), f("source", pa.string()),
                      f("n_chars", pa.int64())],
        "embeddings": [f("vec_id", pa.int64()),
                       f("embedding", pa.list_(pa.float32())),
                       f("label", pa.int32())],
        "events": [f("event_id", pa.int64()), f("ts", pa.timestamp("us")),
                   f("user_id", pa.int64()), f("event_type", pa.string()),
                   f("value", pa.float64()), f("props", pa.string())],
        "lineitem": [f("l_orderkey", pa.int64()), f("l_partkey", pa.int64()),
                     f("l_suppkey", pa.int64()), f("l_linenumber", pa.int32()),
                     f("l_quantity", pa.float64()),
                     f("l_extendedprice", pa.float64()),
                     f("l_discount", pa.float64()), f("l_tax", pa.float64()),
                     f("l_returnflag", pa.string()),
                     f("l_linestatus", pa.string()),
                     f("l_shipdate", pa.timestamp("us"))],
        "nation": [f("n_nationkey", pa.int32()), f("n_name", pa.string()),
                   f("n_regionkey", pa.int32())],
        "orders": [f("o_orderkey", pa.int64()), f("o_custkey", pa.int64()),
                   f("o_orderstatus", pa.string()),
                   f("o_totalprice", pa.float64()),
                   f("o_orderdate", pa.timestamp("us")),
                   f("o_orderpriority", pa.string())],
        "part": [f("p_partkey", pa.int64()), f("p_name", pa.string()),
                 f("p_brand", pa.string()), f("p_type", pa.string()),
                 f("p_size", pa.int32()), f("p_retailprice", pa.float64())],
        "region": [f("r_regionkey", pa.int32()), f("r_name", pa.string())],
        "supplier": [f("s_suppkey", pa.int64()), f("s_name", pa.string()),
                     f("s_nationkey", pa.int32()),
                     f("s_acctbal", pa.float64())],
    }
    R = {name: [] for name in S}
    if not empty:
        R["region"] = [(0, "R")]
        R["nation"] = [(0, "N", 0)]
        R["customer"] = [(1, "C1", 0, 0.0, "SEG")]
        R["supplier"] = [(1, "S1", 0, 0.0)]
        R["part"] = [(1, "P", "B", "T", 0, 0.0)]
        R["orders"] = [(1, 1, "O", 0.0, TS, "1-URGENT")]
        # zero price, 100% discount, zero tax/quantity
        R["lineitem"] = [(1, 1, 1, 1, 0.0, 0.0, 1.0, 0.0, "N", "O", TS)]
        # empty / NULL / whitespace texts; source 'void' is ALL-empty
        R["documents"] = [
            (1, "", "en", "void", 0),
            (2, None, "en", "void", 0),
            (3, "   ", "en", "void", 3),
            (4, "x", "en", "tiny", 1),
        ]
        # a zero vector and an identical pair (zero norm, zero spread);
        # DIM=64 — the operators' pinned contract (shorter vectors are
        # REJECTED loudly by design, that's a different guard)
        R["embeddings"] = [
            (1, [0.0] * 64, 0),
            (2, [1.0] + [0.0] * 63, 0),
            (3, [1.0] + [0.0] * 63, 0),
        ]
        # one instant, one user, one type, value 0, NULL/empty props
        R["events"] = [
            (1, TS, 7, "view", 0.0, None),
            (2, TS, 7, "view", 0.0, "{}"),
        ]
    for name, schema in S.items():
        _write(d, name, schema, R[name])


def sweep(spark, sf_dir: str, names=None) -> dict[str, str]:
    """Run registry queries against ``sf_dir``; return {name: error}."""
    import __spark_entry__ as E

    errs = {}
    for name, fn in E.queries().items():
        if names is not None and name not in names:
            continue
        try:
            fn(spark, sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — audit, record everything
            errs[name] = f"{type(exc).__name__}: {str(exc)[:160]}"
    return errs


def main() -> None:
    import os
    import tempfile

    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="degen_")
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("degenerate-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for kind, empty in (("empty", True), ("degenerate", False)):
        d = os.path.join(out, kind)
        os.makedirs(d, exist_ok=True)
        build_fixture(d, empty)
        errs = sweep(spark, d)
        print(f"--- {kind}: {len(errs)} crashers")
        for n, e in sorted(errs.items()):
            print(f"[{kind}] {n}: {e}")
        bad += len(errs)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
