"""Proto frame-file replay source — the decode direction of the wire
contract.

``FilePublisher`` / ``PartitionedFilePublisherFactory`` (streaming/
sinks.py) append 4-byte-length-prefixed ``StreamMessageProto`` frames;
this source reads those files back into a typed DataFrame, closing the
loop encoder → sink → source → DataFrame with two independent
implementations of the proto3 wire rules (proto/wire.py encodes,
proto/wire_decode.py decodes).

Spark shape: ``spark.read.format("binaryFile")`` scans the frame files
(one row per file, content as binary — distributed, no driver I/O),
then an Arrow-batched ``mapInPandas`` explodes each file into decoded
message rows executor-side. Frame files are append-per-partition and
typically MBs, so file-granular parallelism matches how they were
written; at cluster scale the same decode body runs over a Kafka
source's binary ``value`` column (one message per record, no frame
prefix — pass ``framed=False``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..proto import wire_decode as wd

DECODED_SCHEMA = (
    "message_type string, instrument string, status string, "
    "closeout_ask string, closeout_bid string, "
    "asks array<struct<price: string, liquidity: long>>, "
    "bids array<struct<price: string, liquidity: long>>, "
    "heartbeat_type string, ts_seconds long, ts_nanos int"
)

_COLS = ("message_type instrument status closeout_ask closeout_bid "
         "asks bids heartbeat_type ts_seconds ts_nanos").split()


def _decoded_row(msg: bytes) -> tuple:
    kind, p = wd.decode_stream_message(msg)
    if kind == "price_tick":
        return (kind, p["instrument"], p["status"],
                p["closeout_ask"], p["closeout_bid"],
                [{"price": pr, "liquidity": lq} for pr, lq in p["asks"]],
                [{"price": pr, "liquidity": lq} for pr, lq in p["bids"]],
                None, p["ts_seconds"], p["ts_nanos"])
    if kind == "heartbeat":
        return (kind, None, None, None, None, None, None,
                p["type"], p["ts_seconds"], p["ts_nanos"])
    # unknown envelope branch: surfaced, not dropped (S5 retention parity)
    return (kind, None, None, None, None, None, None, None, None, None)


def _decode_batches(framed: bool):
    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                if framed:
                    rows.extend(_decoded_row(m) for m in wd.iter_frames(bytes(blob)))
                else:
                    rows.append(_decoded_row(bytes(blob)))
            yield pd.DataFrame(rows, columns=_COLS)
    return body


def read_proto_frames(spark: SparkSession, path_glob: str,
                      framed: bool = True) -> DataFrame:
    """Decode published frame files at ``path_glob`` into typed rows.

    ``framed=True`` for FilePublisher files (length-prefixed frames,
    many messages per file); ``framed=False`` when each binary record
    is one message (Kafka ``value`` replay dumped to files)."""
    raw = (spark.read.format("binaryFile").load(path_glob)
           .select("content"))
    return raw.mapInPandas(_decode_batches(framed), schema=DECODED_SCHEMA)
