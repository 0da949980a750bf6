"""The reference pipeline as a Structured Streaming program.

main() parity (/root/reference/src/main.rs:24-138): source → parse/route
→ derive → [console] → encode → publish, with the channel boundary
replaced by micro-batches and graceful shutdown by query.stop().

The reference's fault-tolerance gap (stream error ends the loop, no
replay — oanda_client.rs:89-93) is closed for free: checkpointing + WAL
restart the query from the last committed offset.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..functions.ticks import derive_tick_columns, nonblank_lines, route
from . import sinks


@dataclass
class PipelineHandles:
    queries: list = field(default_factory=list)

    def await_any(self, timeout: int | None = None) -> None:
        for q in self.queries:
            q.awaitTermination(timeout)

    def process_all_available(self) -> None:
        for q in self.queries:
            q.processAllAvailable()

    def stop(self) -> None:
        """C2 graceful shutdown (main.rs:122-133): stop every query; the
        micro-batch in flight completes, offsets commit."""
        for q in self.queries:
            q.stop()


def build_stream(spark: SparkSession, source_path: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """S1-S5 + P1-P2 as one unbounded DataFrame. Source here is file
    replay (NDJSON captures); swap for Kafka by replacing the reader —
    the chain is source-agnostic (sources/ndjson.py).

    ``max_files_per_trigger`` is the backpressure bound — the micro-batch
    analog of the reference's bounded channel(100) (main.rs:52); with
    Kafka the same knob is maxOffsetsPerTrigger."""
    from ..sources.ndjson import read_tick_lines
    lines = read_tick_lines(spark, source_path, streaming=True,
                            max_files_per_trigger=max_files_per_trigger)
    return derive_tick_columns(route(nonblank_lines(lines)))


def install_shutdown_handlers(handles: "PipelineHandles") -> None:
    """C2 parity (main.rs:62-134): SIGINT/SIGTERM stop every query
    gracefully — the in-flight micro-batch completes and offsets commit,
    then the process exits instead of dying mid-batch."""
    import signal

    def _stop(signum, frame):  # noqa: ARG001
        handles.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)


def run_pipeline(spark: SparkSession, source_path: str, *,
                 checkpoint_dir: str,
                 publisher=None,
                 publisher_factory=None,
                 verbose: bool = False,
                 parquet_out: str | None = None) -> PipelineHandles:
    """Assemble and start the sink set (each sink is its own query, its
    own checkpoint — independent progress, one bad sink never stops the
    stream: invariant 4 generalized).

    ``publisher`` drives the single-socket reference-parity edge;
    ``publisher_factory`` the partition-parallel one (a publisher per
    partition, opened executor-side). Either or both may run."""
    stream = build_stream(spark, source_path)
    handles = PipelineHandles()
    if verbose:  # K1 is conditional on -v (main.rs:46-47)
        handles.queries.append(sinks.start_console_stream(stream, checkpoint_dir))
    if publisher is not None:
        handles.queries.append(
            sinks.start_publish_stream(stream, publisher, checkpoint_dir))
    if publisher_factory is not None:
        handles.queries.append(sinks.start_publish_stream_partitioned(
            stream, publisher_factory, checkpoint_dir))
    if parquet_out is not None:
        handles.queries.append(sinks.start_parquet_stream(
            stream, parquet_out, os.path.join(checkpoint_dir)))
    return handles
