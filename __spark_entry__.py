"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` enumerate every implemented operator (SURVEY.md §2) with
DuckDB oracle twins where SQL-expressible. Implementations live in
``oanda_stream_processor_spark.operators.*``; this module only aggregates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oanda_stream_processor_spark.operators import asof, relational, scalar

_MODULES = [relational, scalar, asof]

try:  # widened incrementally; keep entry importable even mid-build
    from oanda_stream_processor_spark.operators import dedup
    _MODULES.append(dedup)
except ImportError:
    pass
try:
    from oanda_stream_processor_spark.operators import similarity
    _MODULES.append(similarity)
except ImportError:
    pass
try:
    from oanda_stream_processor_spark.operators import textops
    _MODULES.append(textops)
except ImportError:
    pass
try:
    from oanda_stream_processor_spark.operators import multimodal
    _MODULES.append(multimodal)
except ImportError:
    pass
try:
    from oanda_stream_processor_spark.operators import ticks as tick_queries
    _MODULES.append(tick_queries)
except ImportError:
    pass
try:
    from oanda_stream_processor_spark.operators import udfs
    _MODULES.append(udfs)
except ImportError:
    pass
try:
    from oanda_stream_processor_spark.operators import extras
    _MODULES.append(extras)
except ImportError:
    pass
try:
    from oanda_stream_processor_spark.operators import stats
    _MODULES.append(stats)
except ImportError:
    pass


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
