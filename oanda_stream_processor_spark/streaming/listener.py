"""Structured logging for streaming queries (C3 parity:
/root/reference/src/main.rs:26-29 tracing setup + call sites).

A StreamingQueryListener that logs progress/termination at INFO with the
reference's '%Y-%m-%d %H:%M:%S%.3f' timestamp format; errors logged,
never raised (one bad sink never stops the stream — invariant 4).
"""

from __future__ import annotations

import logging

from pyspark.sql.streaming import StreamingQueryListener

_FMT = "%(asctime)s.%(msecs)03d %(levelname)s %(name)s: %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def configure_logging(level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger("oanda_stream_processor_spark")
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_FMT, datefmt=_DATEFMT))
        logger.addHandler(h)
    logger.setLevel(level)
    return logger


class PipelineListener(StreamingQueryListener):
    """Counts lifecycle events and logs per-batch progress."""

    def __init__(self):
        self.started = 0
        self.progressed = 0
        self.terminated = 0
        self.errors: list[str] = []
        self._log = configure_logging()

    def onQueryStarted(self, event):
        self.started += 1
        self._log.info("query started: %s run=%s", event.name or event.id,
                       event.runId)

    def onQueryProgress(self, event):
        self.progressed += 1
        p = event.progress
        self._log.info("progress %s: batch=%s rows=%s", p.name or p.id,
                       p.batchId, p.numInputRows)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated += 1
        if event.exception:
            self.errors.append(str(event.exception))
            self._log.error("query terminated with error: %s", event.exception)
        else:
            self._log.info("query terminated cleanly: %s", event.id)
