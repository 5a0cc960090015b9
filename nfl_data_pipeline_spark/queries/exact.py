"""Cross-engine numeric determinism helpers.

A plain ``SUM(double)`` is order-dependent: Spark merges partial
aggregates per shuffle partition, DuckDB per its own morsels, and at
60k+ rows the accumulated float error (~1e-4 absolute on money-scale
sums) exceeds any rounding step a hash-comparator can safely use.

Fix: accumulate in DECIMAL (exact, associative, order-independent)
and cast the final result back to DOUBLE. Both engines round the same
double to the same decimal (exact decimal midpoints are not
representable in binary, so rounding-mode differences can never
fire), so the result is bit-identical.

``avg``/``corr``/``percentile`` don't need the detour: their absolute
error is ~1e-12 at this scale, far below any rounding step.
"""

from __future__ import annotations


def dsum(expr: str, alias: str) -> str:
    """Exact order-independent sum of a double expression.

    Same SQL text works in Spark SQL and DuckDB; returns DOUBLE.
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str) -> str:
    """Exact-sum-based average (order-independent), returns DOUBLE."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
