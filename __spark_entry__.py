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


def _round_number() -> int:
    """Current build round, inferred from the CORRECTNESS_r{N}.json files
    the driver has committed for PAST rounds (when round N's verify runs,
    r01..r{N-1} exist). Used only to rotate the registry ordering; any
    deterministic integer works."""
    import glob
    import re

    here = Path(__file__).resolve().parent
    rounds = [
        int(m.group(1))
        for p in glob.glob(str(here / "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds) + 1 if rounds else 1


def _registry() -> dict[str, tuple]:
    reg: dict[str, tuple] = {}
    for mod in (analytics, beyond, relational):
        for name, pair in mod.queries().items():
            assert name not in reg, f"duplicate query name: {name}"
            reg[name] = pair
    # Oracle-gated queries register first (rows-only entries — no oracle
    # SQL → weaker rows-only check regardless of position — go last), but
    # there are more gated queries (68 as of round 5) than the driver's
    # 50-entry correctness window. The gated ordering rotates per round
    # by the smallest step >= 9 that is coprime with the gated count, so
    # the rotation is a full cycle whatever the registry size: every
    # gated query enters the window within a few rounds (pinned by
    # test_registry_rotation_covers_every_gated_query);
    # scripts_dev/oracle_parity.py (and the marked-slow pytest sweep
    # wrapping it) still verifies ALL gated queries in-repo every round.
    import math

    gated_names = [n for n, p in reg.items() if p[1] is not None]
    step = 9
    while math.gcd(step, len(gated_names)) != 1:
        step += 1
    offset = (step * _round_number()) % len(gated_names)
    rotated = gated_names[offset:] + gated_names[:offset]
    gated = {n: reg[n] for n in rotated}
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
