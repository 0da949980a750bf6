"""Multimodal column plumbing (north-star extension; SURVEY.md §2.2).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct riding alongside. The container has no image/audio codecs, so the
DECODE step is a clearly-marked deterministic fake (bytes -> md5-derived
"pixel stats"), but everything Spark-side is real and tested: the binary
schema, the metadata struct, partition-preserving ``mapInPandas`` with
Arrow batches, and the batch shape contract a real decoder would slot
into.

q53 (oracle-checked) exercises the JVM-side binary path: synthesize
bytes, measure them, checksum them. q54 (rows-only) exercises the
Python/Arrow path: mapInPandas over binary batches — swap `_fake_decode`
for PIL/libav and the operator is production-shaped.

Scale: mapInPandas streams Arrow record batches executor-side — no
driver involvement, no per-row pickling; batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _with_fake_media(d: DataFrame) -> DataFrame:
    """documents -> rows with an opaque binary 'media' column + metadata
    struct, standing in for an image lake table."""
    return d.select(
        "doc_id",
        F.unhex(F.md5(F.col("text").cast("binary"))).alias("media"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
            F.lit("fake/rgb8").alias("format"),
        ).alias("meta"),
    )


@query("q53_multimodal_meta", """
SELECT doc_id,
       OCTET_LENGTH(UNHEX(MD5(text))) AS n_bytes,
       SHA256(MD5(text)) AS checksum,
       CAST(n_chars % 640 + 1 AS INTEGER) AS width,
       CAST(doc_id % 480 + 1 AS INTEGER) AS height,
       CAST((n_chars % 640 + 1) * (doc_id % 480 + 1) * 3 AS BIGINT) AS rgb_bytes
FROM documents
""")
def q53_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-pass projection: media synthesis + measurement in one scan
    # (a join back to documents for `text` cost a needless shuffle)
    d = load_table(spark, sf_dir, "documents")
    media = F.unhex(F.md5(F.col("text").cast("binary")))
    width = (F.col("n_chars") % 640 + 1).cast("int")
    height = (F.col("doc_id") % 480 + 1).cast("int")
    return d.select(
        "doc_id",
        F.octet_length(media).alias("n_bytes"),
        # checksum over the hex digest string (DuckDB's sha256 takes
        # VARCHAR, not BLOB — hash the same lowercase-hex bytes on both sides)
        F.sha2(F.md5(F.col("text").cast("binary")), 256).alias("checksum"),
        width.alias("width"),
        height.alias("height"),
        (width.cast("bigint") * height * 3).alias("rgb_bytes"),
    )


# --- the Python/Arrow decode path (rows-only; fake decode is stubbed) ------

DECODE_SCHEMA = ("doc_id bigint, width int, height int, "
                 "mean_r double, mean_g double, mean_b double, decode_ok boolean")


def _fake_decode(media: bytes) -> tuple[float, float, float]:
    """STUB for an image decoder. Deterministic md5-derived channel means;
    replace with PIL/torchvision decode when codecs are available.
    Raises on empty payloads the way a real decoder raises on truncated
    files."""
    if not media:
        raise ValueError("empty media payload")
    dig = hashlib.md5(media).digest()
    return (dig[0] / 255.0, dig[1] / 255.0, dig[2] / 255.0)


def decode_media(m: DataFrame) -> DataFrame:
    """mapInPandas media decode: Arrow-batched, partition-preserving.
    Decode failures are captured per-row (decode_ok=False), not task
    failures — the schema-mismatch-degrades-not-drops policy of the
    reference's Unknown branch (oanda_client.rs:74-78) applied to bytes."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": pdf["width"],
                   "height": pdf["height"]}
            means, ok = [], []
            for media in pdf["media"]:
                try:
                    means.append(_fake_decode(media))
                    ok.append(True)
                except (ValueError, TypeError):
                    means.append((float("nan"),) * 3)
                    ok.append(False)
            out["mean_r"] = [m[0] for m in means]
            out["mean_g"] = [m[1] for m in means]
            out["mean_b"] = [m[2] for m in means]
            out["decode_ok"] = ok
            yield pd.DataFrame(out)

    flat = m.select("doc_id", "media", "meta.width", "meta.height")
    return flat.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


@query("q54_media_decode")  # rows-only: Python-side stub, not SQL-expressible
def q54_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _with_fake_media(load_table(spark, sf_dir, "documents"))
    return decode_media(m)
