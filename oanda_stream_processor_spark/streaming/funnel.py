"""Streaming sessionized funnel: per-user ordered stage progression.

The batch twin is ``operators/behavior.q83_funnel`` (first view, first
click strictly after it, first purchase strictly after that). Here the
same semantics run incrementally over a stream with
``applyInPandasWithState``: state is the user's highest reached stage
and its event time, and a row is emitted the moment a user advances a
stage — the streaming shape a product-analytics pipeline actually runs.

Equivalence: processing each user's events in event-time order, the
greedy "advance on the first qualifying event" rule reaches exactly the
batch fixpoint (min ts per stage with strictly-increasing constraint).
Events arriving out of event-time order across micro-batches can
diverge from the batch answer — inherent to incremental funnels; feed
through a watermarked sort upstream when ordering matters.

Scale: state is (int, long) per user, partitioned by user_id — RocksDB
state store territory at 100 TB; the grouping shuffle is the only wide
edge and its key is the natural user partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL = ("view", "click", "purchase")   # ordered stages (= behavior.FUNNEL)

OUTPUT_SCHEMA = "user_id long, stage_n int, stage string, stage_ts timestamp"
STATE_SCHEMA = "stage int, stage_us long"


_OUT_COLS = ["user_id", "stage_n", "stage", "stage_ts"]


def _advance_rows(user_id, stage, stage_us, pdfs: Iterator[pd.DataFrame]):
    """Greedy stage advance over a batch of (event_type, ts) frames:
    the single source of funnel semantics, shared by the
    applyInPandasWithState functions and the transformWithState
    processor. Returns (stage, stage_us, out_rows)."""
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for row in pdf.itertuples(index=False):
            if stage >= len(FUNNEL):
                break
            ts_us = int(row.ts.value // 1000)   # pandas ns -> us
            # strictly after the previous stage's time, matching the
            # batch funnel's `ts > t_prev`
            if (row.event_type == FUNNEL[stage]
                    and (stage_us is None or ts_us > stage_us)):
                stage += 1
                stage_us = ts_us
                out.append((user_id, stage, FUNNEL[stage - 1], row.ts))
    return stage, stage_us, out


def _advance(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    stage, stage_us = state.get if state.exists else (0, None)
    stage, stage_us, out = _advance_rows(user_id, stage, stage_us, pdfs)
    state.update((stage, stage_us))
    if out:
        yield pd.DataFrame(out, columns=_OUT_COLS)


def _advance_with_ttl(ttl_ms: int):
    """Variant of :func:`_advance` that evicts a user's funnel state
    after ``ttl_ms`` of processing-time inactivity: when the timeout
    fires, the user's journey is emitted as an ``expired`` row
    (stage_n = -stage so downstream can count abandonment per stage)
    and the state is dropped — the memory-bounding pattern every
    long-running stateful pipeline needs (state stores grow without
    bound under NoTimeout)."""
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            stage, stage_us = state.get
            state.remove()
            if stage > 0:
                yield pd.DataFrame(
                    [(user_id, -stage, "expired",
                      pd.Timestamp(stage_us * 1000))],
                    columns=["user_id", "stage_n", "stage", "stage_ts"])
            return
        stage, stage_us = state.get if state.exists else (0, None)
        stage, stage_us, out = _advance_rows(user_id, stage, stage_us, pdfs)
        state.update((stage, stage_us))
        state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)
    return fn


def funnel_progress(events: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """(user_id, event_type, ts) stream -> one row per stage advance.

    With ``ttl_ms``, idle users' state is evicted on a processing-time
    timeout and surfaced as an ``expired`` row (negative stage_n);
    without it, state is unbounded (NoTimeout) — fine for tests, not
    for production.
    """
    if ttl_ms is None:
        fn, conf = _advance, GroupStateTimeout.NoTimeout
    else:
        fn, conf = _advance_with_ttl(ttl_ms), GroupStateTimeout.ProcessingTimeTimeout
    return (events
            .select("user_id", "event_type", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=conf))


# ---------------------------------------------------------------------------
# transformWithStateInPandas port (Spark 4 arbitrary state API v2,
# SURVEY.md §2.2): identical funnel semantics, with the TTL as a
# FIRST-CLASS timer (handle.registerTimer + handleExpiredTimer) instead
# of applyInPandasWithState's per-call setTimeoutDuration — timers
# survive independently of input arrival, and state variables are named
# and individually evolvable.
#
# Env gate: EXECUTING this operator needs the google.protobuf wheel
# (the Python worker speaks protobuf to the JVM state server —
# pyspark/sql/streaming/stateful_processor_api_client.py imports the
# generated StateMessage_pb2), which this container does not ship: the
# same class of gap as pyzmq (K2) and protoc (B1). The processor logic
# is therefore exercised two ways: directly against fake handles (runs
# everywhere, asserts parity with the applyInPandasWithState path), and
# end-to-end behind `tws_runtime_available()` (skips with the precise
# reason when the wheel is absent).
# ---------------------------------------------------------------------------
def tws_runtime_available() -> bool:
    """True when the transformWithState Python worker can actually run
    (generated protobuf modules importable)."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
        return True
    except Exception:
        return False


try:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except Exception:                                    # pragma: no cover
    StatefulProcessor = object                       # type: ignore[assignment]


class FunnelProcessor(StatefulProcessor):
    """Stateful processor: one ValueState (stage, stage_us) per user,
    optional processing-time eviction timer re-armed on every input."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self.ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState("funnel", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        stage, stage_us = (self.state.get() if self.state.exists()
                           else (0, None))
        stage, stage_us, out = _advance_rows(user_id, stage, stage_us, rows)
        self.state.update((stage, stage_us))
        if self.ttl_ms is not None:
            # re-arm: exactly one live eviction timer per user
            for t in list(self.handle.listTimers()):
                self.handle.deleteTimer(t)
            self.handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self.ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if self.state.exists():
            stage, stage_us = self.state.get()
            self.state.clear()
            if stage > 0:
                yield pd.DataFrame(
                    [(user_id, -stage, "expired",
                      pd.Timestamp(stage_us * 1000))],
                    columns=_OUT_COLS)

    def close(self) -> None:
        pass


def funnel_progress_tws(events: DataFrame, *,
                        ttl_ms: int | None = None) -> DataFrame:
    """`funnel_progress` on the transformWithStateInPandas API — same
    output contract; see the block comment for the runtime env gate."""
    return (events
            .select("user_id", "event_type", "ts")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=FunnelProcessor(ttl_ms),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Append",
                timeMode="ProcessingTime" if ttl_ms is not None else "None"))


def funnel_counts(spark, progress_table: str) -> DataFrame:
    """Stage counts + conversion over an accumulated progress sink
    (memory/Delta table fed by :func:`funnel_progress`)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    prog = spark.table(progress_table)
    counts = prog.groupBy("stage_n", "stage").agg(
        F.countDistinct("user_id").alias("n_users"))
    # global window over one row per funnel stage (bounded, tiny) —
    # the single-partition WindowExec WARN is benign here
    w = W.orderBy("stage_n").rowsBetween(W.unboundedPreceding, W.currentRow)
    entry = F.first("n_users").over(w)
    return counts.select(
        "stage_n", "stage", "n_users",
        F.round(F.col("n_users") / entry.cast("double"), 4)
         .alias("pct_of_entry"))
