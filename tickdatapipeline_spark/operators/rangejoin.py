"""Binned range join: point-in-interval joins that scale.

Spark plans a naive ``l.t BETWEEN r.lo AND r.hi`` join (even with an
equi-key) as a single inequality join whose per-key cost is |L|x|R| —
the classic range-join gap (Databricks ships a dedicated RANGE_JOIN hint
for it; open-source Spark has none). The standard fix, implemented here:
quantize time into fixed-width bins, explode each interval into the bins
it covers, equi-join points to intervals on (key, bin), then apply the
exact bounds as a post-filter.

Cost: each interval duplicates into ceil(span / bin) + 1 rows, each
point lands in exactly one bin, and the join is a plain shuffle/equi
join on (key, bin) — Catalyst/AQE pick hash vs sort-merge vs broadcast
from observed sizes. Choose ``bin_size`` near the typical interval span
so the blow-up factor stays O(1).

Reference scope note: the reference engine has no range join at all
(the as-of join in operators/asof.py covers its nearest-predecessor
semantics); this operator is part of the beyond-reference surface for
event-analytics workloads (attribution, downtime windows, exposure
joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys) with
    ``lo_col <= point_col <= hi_col``. All three columns must be integers
    on the same scale (epoch micros/nanos). Output: points columns +
    intervals columns (minus the duplicated keys).

    ``how='inner'`` only — the bin explosion makes outer semantics
    ambiguous; anti/semi variants compose from this one.
    """
    if how != "inner":
        raise ValueError("binned_range_join supports how='inner' only")
    # Integer DIV, not float `/`: epoch-nanos exceed 2^53, where double
    # division silently rounds and bin ids drift from exact integer math.
    p = points.withColumn("_bin", F.expr(f"`{point_col}` DIV {bin_size}"))
    iv = intervals.where(F.col(hi_col) >= F.col(lo_col)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"`{lo_col}` DIV {bin_size}"),
                F.expr(f"`{hi_col}` DIV {bin_size}"),
            )
        ),
    )
    joined = p.join(iv, on=[*on, "_bin"], how="inner").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    # a point meets a given interval in exactly one bin (its own), so no
    # dedup pass is needed — the bin explosion only duplicates intervals
    return joined.drop("_bin")
