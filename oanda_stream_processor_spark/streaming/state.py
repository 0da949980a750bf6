"""Custom stateful streaming: stale-quote detection.

The reference treats heartbeats as liveness-bearing data rows
(main.rs:95-116) but never acts on them; the natural stateful extension
(SURVEY.md §2.2 'Stateful ops') is a per-instrument monitor: remember
the last tick time, and when the stream advances (any message) past
`stale_after` without a fresh tick, flag the instrument as stale.

Implemented with applyInPandasWithState — per-group pandas batches +
explicit GroupState, the PySpark analog of flatMapGroupsWithState. At
100 TB/cluster scale state lives in the state store (RocksDB provider),
partitioned by instrument — instrument cardinality is tiny, but the
same pattern holds for high-cardinality keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("instrument string, last_tick_ts timestamp, "
                 "observed_ts timestamp, gap_seconds double, stale boolean")
STATE_SCHEMA = "last_tick_us long"


def _detect(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (instrument,) = key
    last_us = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("event_ts")
        for row in pdf.itertuples(index=False):
            obs_us = int(row.event_ts.value // 1000)  # pandas ns -> us
            # gap is measured against the clock BEFORE this message: a
            # heartbeat observes staleness, and a late tick reveals the
            # gap it just ended.
            gap = (obs_us - last_us) / 1e6 if last_us is not None else None
            stale = bool(gap is not None and gap > row.stale_after_sec)
            if row.is_tick:
                last_us = obs_us
            out.append((instrument,
                        pd.Timestamp(last_us * 1000) if last_us is not None else None,
                        pd.Timestamp(obs_us * 1000),
                        gap,
                        stale))
    if last_us is not None:
        state.update((last_us,))
    if out:
        yield pd.DataFrame(out, columns=["instrument", "last_tick_ts",
                                         "observed_ts", "gap_seconds", "stale"])


def _keyed_observations(stream: DataFrame, stale_after_sec: float,
                        instruments: list[str] | None) -> DataFrame:
    """Ticks keyed by their own instrument, heartbeats replicated into
    EVERY monitored instrument's group (a heartbeat is a stream-global
    liveness signal; state is per-instrument, so each group must see it).

    ``instruments`` is the monitored set — in production the subscription
    list from :class:`~oanda_stream_processor_spark.config.Config`
    (config.rs:14-40). For batch frames it may be None (derived from the
    observed ticks); a streaming frame requires it explicitly, since a
    streaming distinct-cross-join is not expressible.
    """
    ticks = (stream
             .where(F.col("message_type") == "price_tick")
             .select(F.col("price_tick.instrument").alias("instrument"),
                     "event_ts",
                     F.lit(True).alias("is_tick")))
    heartbeats = (stream
                  .where(F.col("message_type") == "heartbeat")
                  .select("event_ts"))
    if instruments is not None:
        fanned = heartbeats.select(
            F.explode(F.array(*[F.lit(i) for i in instruments])).alias("instrument"),
            "event_ts", F.lit(False).alias("is_tick"))
    elif not stream.isStreaming:
        fanned = (heartbeats
                  .crossJoin(F.broadcast(ticks.select("instrument").distinct()))
                  .select("instrument", "event_ts", F.lit(False).alias("is_tick")))
    else:
        raise ValueError(
            "stale_quotes on a streaming frame needs the monitored "
            "instrument list (e.g. Config.from_env().instruments)")
    return (ticks.unionByName(fanned)
            .withColumn("stale_after_sec", F.lit(stale_after_sec))
            .where(F.col("event_ts").isNotNull()))


def stale_quotes(stream: DataFrame, *, stale_after_sec: float = 10.0,
                 watermark: str = "1 minute",
                 instruments: list[str] | None = None) -> DataFrame:
    """Routed stream -> per-message staleness assessment rows.

    Heartbeats advance observation time without refreshing the tick
    clock — exactly the liveness signal the reference carries but drops.
    Each output row assesses one observation: ``gap_seconds`` is the time
    since the last tick *before* the observation is applied, ``stale``
    is gap > stale_after_sec, ``last_tick_ts`` is the tick clock after.
    """
    keyed = _keyed_observations(stream, stale_after_sec, instruments)
    if keyed.isStreaming:
        keyed = keyed.withWatermark("event_ts", watermark)
        return (keyed.groupBy("instrument")
                .applyInPandasWithState(_detect, OUTPUT_SCHEMA, STATE_SCHEMA,
                                        "append", GroupStateTimeout.NoTimeout))

    # applyInPandasWithState is streaming-only; in batch the whole group
    # arrives in one pass, so the tick clock is plain local state.
    def _detect_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        instrument = pdf["instrument"].iloc[0]
        last_us = None
        out = []
        for row in pdf.sort_values("event_ts").itertuples(index=False):
            obs_us = int(row.event_ts.value // 1000)
            gap = (obs_us - last_us) / 1e6 if last_us is not None else None
            stale = bool(gap is not None and gap > row.stale_after_sec)
            if row.is_tick:
                last_us = obs_us
            out.append((instrument,
                        pd.Timestamp(last_us * 1000) if last_us is not None else None,
                        pd.Timestamp(obs_us * 1000), gap, stale))
        return pd.DataFrame(out, columns=["instrument", "last_tick_ts",
                                          "observed_ts", "gap_seconds", "stale"])

    return keyed.groupBy("instrument").applyInPandas(_detect_batch, OUTPUT_SCHEMA)


# ---------------------------------------------------------------------------
# transformWithStateInPandas variant (Spark 4's successor API): the same
# stale-quote monitor with an explicit StatefulProcessor — typed
# ValueState handle, init/close lifecycle, ready for timers/TTL.
# ---------------------------------------------------------------------------
try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class StaleQuoteProcessor(StatefulProcessor):
        """Per-instrument last-tick clock in a ValueState; emits one
        assessment row per message (same output contract as
        stale_quotes)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last_tick_us", "v long")

        def handleInputRows(self, key, rows, timerValues):
            (instrument,) = key
            last_us = self._last.get()[0] if self._last.exists() else None
            out = []
            for pdf in rows:
                pdf = pdf.sort_values("event_ts")
                for row in pdf.itertuples(index=False):
                    obs_us = int(row.event_ts.value // 1000)
                    gap = (obs_us - last_us) / 1e6 if last_us is not None else None
                    stale = bool(gap is not None and gap > row.stale_after_sec)
                    if row.is_tick:
                        last_us = obs_us
                    out.append((instrument,
                                pd.Timestamp(last_us * 1000) if last_us is not None else None,
                                pd.Timestamp(obs_us * 1000),
                                gap,
                                stale))
            if last_us is not None:
                self._last.update((last_us,))
            if out:
                yield pd.DataFrame(out, columns=["instrument", "last_tick_ts",
                                                 "observed_ts", "gap_seconds",
                                                 "stale"])

        def close(self) -> None:
            pass

    HAVE_TWS = True
except ImportError:  # pragma: no cover — older Spark
    HAVE_TWS = False


def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def stale_quotes_tws(stream: DataFrame, *, stale_after_sec: float = 10.0,
                     watermark: str = "1 minute",
                     instruments: list[str] | None = None) -> DataFrame:
    """stale_quotes on the transformWithStateInPandas API (state store
    ready for RocksDB provider, timers, and state TTL at cluster scale).

    Gated: the TWS python<->JVM state protocol itself needs the
    ``google.protobuf`` package (absent in this container); the
    applyInPandasWithState implementation above is the tested path here.
    """
    if not HAVE_TWS:
        raise ImportError("transformWithStateInPandas requires Spark 4")
    if not _have_protobuf():
        raise ImportError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(its state-server protocol); use stale_quotes() instead")
    keyed = _keyed_observations(stream, stale_after_sec, instruments)
    if keyed.isStreaming:
        keyed = keyed.withWatermark("event_ts", watermark)
    return (keyed.groupBy("instrument")
            .transformWithStateInPandas(StaleQuoteProcessor(),
                                        OUTPUT_SCHEMA, "append", "none"))
