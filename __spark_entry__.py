"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query registry lives in tickdatapipeline_spark/plans/{analytics,
beyond,relational}.py as (spark_fn, duckdb_sql) pairs; this module just
flattens them into the driver's two-dict shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tickdatapipeline_spark.plans import analytics, beyond, relational  # noqa: E402


def _last_green_round() -> dict[str, int]:
    """Map query name -> most recent PAST round whose committed
    CORRECTNESS_r{N}.json holds a fully-green row (rows+schema+hash, no
    err) for it. Names never green in any committed file are absent.
    Drives the registry ordering below; any deterministic map works."""
    import glob
    import json
    import re

    here = Path(__file__).resolve().parent
    last: dict[str, int] = {}
    for p in sorted(glob.glob(str(here / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(Path(p).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):  # corrupt/partial file: skip, don't crash
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _registry() -> dict[str, tuple]:
    reg: dict[str, tuple] = {}
    for mod in (analytics, beyond, relational):
        for name, pair in mod.queries().items():
            assert name not in reg, f"duplicate query name: {name}"
            reg[name] = pair
    # Oracle-gated queries register first (rows-only entries — no oracle
    # SQL → weaker rows-only check regardless of position — go last), but
    # there are more gated queries (107 as of round 6) than the driver's
    # 50-entry correctness window. Gated ordering is least-recently-
    # verified first, computed from the committed CORRECTNESS_r*.json
    # files: never-green queries lead, then ascending by the round of
    # their latest green row (ties keep registry order, so the ordering
    # is deterministic). With a 50-entry window over n gated queries
    # this covers every query within ceil(n/50) rounds from ANY starting
    # state and self-heals if the driver ever skips a round (pinned by
    # test_registry_rotation_covers_every_gated_query);
    # scripts_dev/oracle_parity.py (and the marked-slow pytest sweep
    # wrapping it) still verifies ALL gated queries in-repo every round.
    last = _last_green_round()
    gated_names = [n for n, p in reg.items() if p[1] is not None]
    order = {n: i for i, n in enumerate(gated_names)}
    gated_names.sort(key=lambda n: (last.get(n, 0), order[n]))
    gated = {n: reg[n] for n in gated_names}
    rows_only = {n: p for n, p in reg.items() if p[1] is None}
    return {**gated, **rows_only}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full tick pipeline (expand → hot loop → derivative
    encode) on /root/testdata/sf0.001."""
    from tickdatapipeline_spark.plans.common import SP_DERIV, processed_ticks

    return processed_ticks(spark, "/root/testdata/sf0.001", SP_DERIV)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
