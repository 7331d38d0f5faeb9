"""Cross-engine float rounding policy.

Every float column that crosses the Spark/DuckDB oracle boundary is
rounded with ``rnd`` — floor(x*10^d + 0.5)/10^d — pure IEEE double
arithmetic that evaluates identically in both engines (unlike round(),
whose tie-handling routes differ: Spark rounds the shortest decimal
repr via BigDecimal HALF_UP, DuckDB multiplies then nearbyints).
Columns produced purely by +,-,*,/ on identical inputs are already
bit-identical and may skip rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(c: Column, digits: int = 6) -> Column:
    s = float(10**digits)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def sql_rnd(expr: str, digits: int = 6) -> str:
    s = float(10**digits)
    return f"(floor(({expr}) * {s!r} + 0.5) / {s!r})"
