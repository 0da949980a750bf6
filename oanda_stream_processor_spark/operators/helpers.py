"""Cross-engine determinism helpers.

The driver's correctness gate hashes values, so every aggregate must be
BIT-identical between Spark and DuckDB. Double addition is not
associative: a parallel partial-agg (Spark) and a sequential scan
(DuckDB) can differ in the last ulp.

Fix: fixed-point accumulation. Each row's double expression is scaled by
10^4 and rounded to a BIGINT; the sum is exact 64-bit integer math —
order-insensitive, identical in both engines, and fast (codegen'd long
sums; wide-DECIMAL accumulators were measured to trigger multi-10s
JIT/C2 compile storms on the generated aggregate code, while long sums
stay in the fast path).

Precision: the fixed-point sum differs from the true double sum by at
most n·5e-5; outputs are rounded to >= 2 decimals so both engines agree
exactly. Overflow: row terms are bounded by |expr|·1e4; int64 holds
9.2e18 — safe to ~1e9 rows of 1e5-magnitude values per aggregation
group. At larger per-group magnitudes, raise to DECIMAL accumulation
(exact, slower) — the choice is per-query, not global.

Per-row double arithmetic (same op order) IS deterministic across
engines and needs no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000  # fixed-point scale (4 decimal digits)


def dsum(expr: Column, scale: int = 2) -> Column:
    """Order-insensitive fixed-point sum of a double expression, as double."""
    cents = F.round(expr * SCALE, 0).cast("bigint")
    return F.round(F.sum(cents) / float(SCALE), scale)


def davg(expr: Column, scale: int = 6) -> Column:
    """avg = exact fixed-point sum / non-null count — deterministic."""
    cents = F.round(expr * SCALE, 0).cast("bigint")
    return F.round((F.sum(cents) / float(SCALE)) / F.count(expr), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return (f"ROUND(SUM(CAST(ROUND(({expr}) * {SCALE}, 0) AS BIGINT))"
            f" / {SCALE}.0, {scale})")


def sql_davg(expr: str, scale: int = 6) -> str:
    return (f"ROUND(SUM(CAST(ROUND(({expr}) * {SCALE}, 0) AS BIGINT))"
            f" / {SCALE}.0 / COUNT({expr}), {scale})")


def exact_tdiv(num: Column, den: Column) -> Column:
    """Exact trunc-division of two integral columns, as bigint.

    The mod-identity spelling ``((n - n % d) / d).cast("bigint")`` on
    BIGINT columns divides as DOUBLE: for numerators above 2^53 the
    quotient can land one ulp BELOW the exact integer, and Spark's
    truncating double->BIGINT cast then loses a full unit — while
    DuckDB's rounding cast recovers it, so the two engines diverge by
    one (the round-7/8 advice class, first seen in q146/q151/q144).
    Casting to DECIMAL(38,0) first makes the %, the subtraction, and
    the division exact (Spark decimal division is BigDecimal with
    HALF_UP to scale 6 — exact when the numerator is exactly
    divisible, which the mod identity guarantees).  Values are
    identical to the double path everywhere below 2^53, so oracle
    hashes are unaffected at bench SFs; above it, this side stays
    right at 100 TB counts.  The DuckDB twins keep the plain
    mod-identity spelling: their ROUNDING cast is exact whenever the
    quotient < 2^51 (see similarity._sql_tdiv), which every ppm/avg
    quotient in this codebase satisfies.
    """
    n = num.cast("decimal(38,0)")
    d = den.cast("decimal(38,0)")
    return ((n - n % d) / d).cast("bigint")


# DuckDB reads events.ts as TIMESTAMP_NS; Spark truncates to μs (io.py).
# Oracle queries over events must go through this CTE body so both engines
# see identical μs-truncated timestamps.
SQL_EVENTS_US = "SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events"
