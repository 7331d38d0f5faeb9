"""Shared in-plan exactness guards.

The correlation/regression family computes Pearson-style five-sum
algebra — n*Sxy - Sx*Sy over sqrt(n*Sxx - Sx^2)*sqrt(n*Syy - Sy^2) —
whose products are exact only inside int64. ``corr_budget_guard``
returns the consumed count column wrapped so Catalyst cannot prune the
check: every listed sum must satisfy |S| <= (2^62-1) DIV n (division
form — the guard's own product could otherwise overflow first), else
the plan raises the documented re-bin/re-scale message instead of a
silent wraparound (ANSI off) or an opaque arithmetic error (ANSI on).
Cauchy-Schwarz bounds the cross terms: Sx^2 <= n*Sxx and |Sx*Sy| <=
max(n*Sxx, n*Syy), so guarding the quadratic sums suffices.

Extracted from plans/beyond.py's _corr_budget_guard (round 9) when the
market family grew its own copies (round 10) — one safety-critical
pattern, one implementation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

BUDGET = 2**62 - 1


def corr_budget_guard(
    msg: str,
    n_col: str = "n",
    abs_cols: Sequence[str] = ("sxy",),
    pos_cols: Sequence[str] = ("sxx", "syy"),
    return_col: str | None = None,
) -> Column:
    """The guarded count column: ``return_col`` (default ``n_col``)
    when every |abs_col| and every pos_col fits the per-row budget
    (2^62-1) DIV n_col, else raise_error(msg). ``n_col`` must be >= 1
    by construction (a count over a non-empty group) — a zero would
    make the DIV null and trip the raise; aggregate counts of grouped
    rows satisfy this. A conservative ``n_col`` (any count >= the
    sums' true row count, e.g. n_ticks for per-pair sums) is sound —
    it only tightens the budget."""
    budget = F.expr(f"{BUDGET} DIV {n_col}")
    cond = F.lit(True)
    for c in abs_cols:
        cond = cond & (F.abs(F.col(c)) <= budget)
    for c in pos_cols:
        cond = cond & (F.col(c) <= budget)
    return F.when(cond, F.col(return_col or n_col)).otherwise(
        F.raise_error(F.lit(msg)))
