"""OANDA HTTP chunked-stream source — PySpark Python data source API
(S1 parity: /root/reference/src/oanda_client.rs:10-39).

The reference holds one long-lived GET against
``/v3/accounts/{id}/pricing/stream`` and frames NDJSON lines. Spark has
no built-in HTTP-stream source, so this declares one with the public
Spark 4 Python data source API: ``DataSource`` +
``DataSourceStreamReader`` with real offset/partition plumbing.

Two modes:
* live   — a driver-side thread holds the long-lived chunked GET
  (requests; Authorization: Bearer like oanda_client.rs:26-29) and
  frames NDJSON lines into a local spool file — a write-ahead log, so
  offsets are replayable and the normal offset/partition machinery
  serves micro-batches from the spool. A stream error is logged and
  ends intake (the reference's loop-exit, oanda_client.rs:89-93) while
  already-spooled lines keep draining. At cluster scale the same shape
  is "ingest to Kafka, read with maxOffsetsPerTrigger".
* replay — reads an NDJSON capture file as if it were the wire,
  advancing a line-number offset per micro-batch; identical wire
  format, no network.

Register and use::

    spark.dataSource.register(OandaStreamDataSource)
    df = (spark.readStream.format("oanda_stream")
          .option("mode", "replay").option("path", capture)
          .option("batch_lines", "100").load())
    # live: .option("mode", "live").option("url", cfg.stream_url())
    #       .option("auth_token", cfg.auth_token)
    #       .option("spool_dir", "/tmp/oanda-spool")

The emitted rows are raw lines (``value`` string) — the same record
unit as the file/Kafka sources, so functions.ticks.route() composes
unchanged downstream.
"""

from __future__ import annotations

import logging
import os
import threading
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StringType, StructField, StructType

log = logging.getLogger(__name__)

SCHEMA = StructType([StructField("value", StringType())])

try:
    import requests
    HAVE_REQUESTS = True
except ImportError:  # pragma: no cover
    requests = None
    HAVE_REQUESTS = False


class _LiveSpool:
    """Driver-side intake thread: one long-lived chunked GET, each
    received line appended to the spool file (blank keep-alives
    included — the framing layer downstream skips them, S2)."""

    def __init__(self, url: str, spool_path: str,
                 auth_token: str | None = None, timeout_sec: float = 30.0):
        self.url = url
        self.spool_path = spool_path
        self.error: Exception | None = None
        self._headers = (
            {"Authorization": f"Bearer {auth_token}"} if auth_token else {})
        self._timeout = timeout_sec
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="oanda-live-spool")
        self._thread.start()

    def _run(self) -> None:
        try:
            with requests.get(self.url, headers=self._headers, stream=True,
                              timeout=self._timeout) as resp:
                resp.raise_for_status()  # oanda_client.rs:31 error_for_status
                with open(self.spool_path, "ab") as f:
                    for line in resp.iter_lines(delimiter=b"\n"):
                        if self._stop.is_set():
                            return
                        f.write(line.rstrip(b"\r") + b"\n")
                        f.flush()
        except Exception as exc:  # noqa: BLE001 — reference exits its loop
            log.error("live stream ended: %s", exc)
            self.error = exc

    def stop(self) -> None:
        self._stop.set()


# live spools are driver-process state; the reader instance is pickled to
# executors for read(), so it must carry only the spool PATH, never the
# thread — the registry keeps the unpicklable half here on the driver.
_SPOOLS: dict[str, _LiveSpool] = {}


@dataclass
class _LineRange(InputPartition):
    path: str
    start: int
    end: int


class OandaStreamReader(DataSourceStreamReader):
    """Offset = number of lines consumed from the (replayed) wire."""

    def __init__(self, options: dict):
        self.mode = options.get("mode", "replay")
        self.path = options.get("path")
        self.batch_lines = int(options.get("batch_lines", "1000"))
        self.max_lines_per_trigger = int(
            options.get("max_lines_per_trigger", "10000"))
        self._cursor = 0  # highest offset handed to the engine so far
        self._spool_key: str | None = None
        if self.mode == "live":
            if not HAVE_REQUESTS:
                raise ImportError(
                    "live HTTP mode needs the 'requests' package; "
                    "use mode=replay (identical NDJSON wire format)")
            url = options.get("url")
            if not url:
                raise ValueError(
                    "live mode needs a 'url' option "
                    "(e.g. Config.from_env().stream_url())")
            spool_dir = options.get("spool_dir") or os.path.join(
                os.environ.get("TMPDIR", "/tmp"), "oanda_stream_spool")
            os.makedirs(spool_dir, exist_ok=True)
            self.path = os.path.join(spool_dir, f"spool-{uuid.uuid4().hex}.ndjson")
            open(self.path, "ab").close()  # offsets valid before first byte
            self._spool_key = self.path
            _SPOOLS[self._spool_key] = _LiveSpool(
                url, self.path, auth_token=options.get("auth_token"),
                timeout_sec=float(options.get("timeout_sec", "30")))
        elif not self.path or not os.path.exists(self.path):
            raise ValueError(f"replay path not found: {self.path!r}")

    def _line_count(self) -> int:
        with open(self.path, "rb") as f:
            return sum(1 for _ in f)

    def initialOffset(self) -> dict:
        return {"line": 0}

    def latestOffset(self) -> dict:
        # bounded-channel backpressure (reference main.rs:52): a large
        # backlog drains max_lines_per_trigger lines per micro-batch
        # instead of all at once. The cursor tracks the highest offset
        # already handed out (commit() re-syncs it after a checkpoint
        # restart, when this reader starts fresh at 0).
        total = self._line_count()
        self._cursor = min(total, self._cursor + self.max_lines_per_trigger)
        return {"line": self._cursor}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["line"], end["line"]
        if hi <= lo:
            return [_LineRange(self.path, lo, lo)]
        out = []
        step = max(1, self.batch_lines)
        for s in range(lo, hi, step):
            out.append(_LineRange(self.path, s, min(s + step, hi)))
        return out

    def read(self, partition: _LineRange):
        with open(partition.path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i >= partition.end:
                    break
                if i >= partition.start:
                    yield (line.rstrip("\n"),)

    def commit(self, end: dict) -> None:
        # the spool is the ack log (live) / nothing to ack (replay); keep
        # the backpressure cursor at least at the committed offset so a
        # checkpoint-restarted reader doesn't re-ration already-consumed
        # lines
        self._cursor = max(self._cursor, end["line"])

    def stop(self) -> None:
        if self._spool_key is not None:
            spool = _SPOOLS.pop(self._spool_key, None)
            if spool is not None:
                spool.stop()


class OandaStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "oanda_stream"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> "OandaBatchReader":
        return OandaBatchReader(self.options)

    def streamReader(self, schema) -> OandaStreamReader:
        return OandaStreamReader(self.options)


class OandaBatchReader(DataSourceReader):
    """Batch reader for NDJSON captures through the same data source —
    line-range partitions so a large capture splits across executors."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        self.batch_lines = int(options.get("batch_lines", "10000"))
        if not self.path or not os.path.exists(self.path):
            raise ValueError(f"path not found: {self.path!r}")

    def partitions(self):
        with open(self.path, "rb") as f:
            n = sum(1 for _ in f)
        step = max(1, self.batch_lines)
        return [_LineRange(self.path, s, min(s + step, n))
                for s in range(0, n, step)] or [_LineRange(self.path, 0, 0)]

    def read(self, partition: _LineRange):
        with open(partition.path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i >= partition.end:
                    break
                if i >= partition.start:
                    yield (line.rstrip("\n"),)
