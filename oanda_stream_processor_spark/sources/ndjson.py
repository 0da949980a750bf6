"""NDJSON tick source — batch and streaming file replay.

The reference's source is a long-lived HTTP GET yielding newline-delimited
JSON (oanda_client.rs:10-39) framed into lines (oanda_client.rs:34-53).
Lines are exactly the record unit of ``spark.read.text`` /
``spark.readStream.text``, so the Spark-native replay source is a text
scan + the routing chain from functions.ticks. At cluster scale the same
chain runs over a Kafka source (``readStream.format("kafka")``) with the
line in ``value`` — the code below is source-agnostic past the first
``select``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..functions.ticks import derive_tick_columns, nonblank_lines, route


def read_tick_lines(spark: SparkSession, path: str, streaming: bool = False,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """Raw lines (column ``value``) from NDJSON capture files.

    The streaming file source wants a directory; a single-file path is
    rewritten to (parent dir + pathGlobFilter) so batch and streaming
    accept the same argument. ``max_files_per_trigger`` bounds each
    micro-batch (backpressure — the reference's channel(100) analog)."""
    if streaming:
        reader = spark.readStream
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        if os.path.isfile(path):
            reader = reader.option("pathGlobFilter", os.path.basename(path))
            path = os.path.dirname(path)
        return reader.text(path)
    return spark.read.text(path)


def read_ticks(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """Full S2→S5 + P1→P2 chain: lines → routed wide frame with
    spread/event_ts. Works identically for batch and streaming input."""
    lines = read_tick_lines(spark, path, streaming=streaming)
    return derive_tick_columns(route(nonblank_lines(lines)))
