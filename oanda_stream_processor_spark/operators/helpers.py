"""Cross-engine determinism helpers.

The driver's correctness gate hashes values, so every aggregate must be
BIT-identical between Spark and DuckDB. Double addition is not
associative: a parallel partial-agg (Spark) and a sequential scan
(DuckDB) can differ in the last ulp. Fix: accumulate in exact
DECIMAL(30,10) (order-insensitive), cast the final sum back to double.
Per-row double arithmetic (same op order) IS deterministic across
engines and needs no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"


def dsum(expr: Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum of a double expression, as double."""
    return F.round(F.sum(expr.cast(DEC)).cast("double"), scale)


def davg(expr: Column, scale: int = 6) -> Column:
    """avg = exact-decimal sum cast double / count — deterministic."""
    return F.round(F.sum(expr.cast(DEC)).cast("double") / F.count(expr), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,10))) AS DOUBLE), {scale})"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,10))) AS DOUBLE)"
            f" / COUNT({expr}), {scale})")


# DuckDB reads events.ts as TIMESTAMP_NS; Spark truncates to μs (io.py).
# Oracle queries over events must go through this CTE body so both engines
# see identical μs-truncated timestamps.
SQL_EVENTS_US = "SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events"
