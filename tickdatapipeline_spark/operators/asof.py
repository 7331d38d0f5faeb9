"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as the scalable union-merge pattern rather than a range
join: tag left/right rows, union, and take `last(right_value) ignore
nulls` over (key, time) order. One shuffle on (key), no quadratic
candidate explosion, skew-safe under AQE — this is the formulation that
survives 100 TB, unlike per-row subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach value_cols from the latest right row of
    the same `on` key with right_time <= left_time (ties: right wins —
    right rows sort before left rows at equal times).

    When several right rows share the same (on, right_time), the one with
    the largest value_cols tuple wins — a deterministic tiebreak, so the
    result is stable across runs and partitionings even on non-unique
    right keys (callers that need a different policy should pre-aggregate
    the right side to one row per (on, right_time))."""
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = lt.unionByName(rt)
    # _tb orders duplicate-(key, time) right rows deterministically; left
    # rows all carry null _tb but _side=1 already sorts them after every
    # right row at the same time, so the null never decides anything.
    tiebreak = F.struct(*[F.col(f"_r_{c}") for c in value_cols]).alias("_tb")
    u = u.withColumn("_tb", tiebreak)
    w = Window.partitionBy("_k").orderBy("_t", "_side", "_tb").rowsBetween(Window.unboundedPreceding, 0)
    for c in value_cols:
        u = u.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    return out.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(f"asof_{c}") for c in value_cols],
    )
