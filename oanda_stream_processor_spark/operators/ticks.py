"""Tick-pipeline queries over the NDJSON capture fixture (rows-only:
the capture file is not among the driver's DuckDB views, so these are
checked for rows/schema stability; the per-invariant value checks live
in tests/test_tick_pipeline.py).

These run the reference's whole batch-expressible pipeline
(oanda_client.rs S2-S5 + main.rs P1-P4) end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ticks import format_display_time, format_spread, publishable
from ..sources.ndjson import read_ticks

QUERIES: dict = {}
ORACLES: dict = {}

CAPTURE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "tests", "data", "ticks.ndjson")


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


@query("q60_tick_pipeline")  # rows-only
def q60_tick_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse → route → derive → format, publishable rows only (Unknown
    retained upstream but excluded at the sink boundary, main.rs:117-119)."""
    df = read_ticks(spark, CAPTURE)
    return publishable(df).select(
        "message_type",
        F.col("price_tick.instrument").alias("instrument"),
        F.col("spread"),
        format_spread(F.col("spread")).alias("spread_display"),
        format_display_time(F.col("event_ts")).alias("time_display"),
    )


@query("q61_tick_spread_stats")  # rows-only
def q61_tick_spread_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-instrument spread analytics — the minimum end-to-end slice of
    SURVEY.md §7 (source→parse→validate→derive→aggregate)."""
    df = read_ticks(spark, CAPTURE)
    ticks = df.where(F.col("message_type") == "price_tick")
    return (ticks.groupBy(F.col("price_tick.instrument").alias("instrument"))
                 .agg(F.count("*").alias("n_ticks"),
                      F.round(F.avg("spread"), 6).alias("avg_spread"),
                      F.round(F.min("spread"), 6).alias("min_spread"),
                      F.round(F.max("spread"), 6).alias("max_spread")))
