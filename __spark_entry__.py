"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` enumerate every implemented operator (SURVEY.md §2) with
DuckDB oracle twins where SQL-expressible. Implementations live in
``oanda_stream_processor_spark.operators.*``; this module only aggregates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Unconditional imports: a broken module must fail loudly here, not silently
# drop its whole query family from the driver's correctness run.
from oanda_stream_processor_spark.operators import (
    asof,
    behavior,
    curation,
    dedup,
    extras,
    increment,
    llmprep,
    multimodal,
    relational,
    retrieval,
    scalar,
    similarity,
    stats,
    textops,
    udfs,
)
from oanda_stream_processor_spark.operators import ticks as tick_queries

_MODULES = [
    relational,
    scalar,
    asof,
    dedup,
    similarity,
    textops,
    multimodal,
    tick_queries,
    udfs,
    extras,
    increment,
    stats,
    llmprep,
    curation,
    behavior,
    retrieval,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return relational.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
