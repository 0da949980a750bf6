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


# ---------------------------------------------------------------------------
# q54b — the SAME Python/Arrow decode path, but emitting an INTEGER
# digest table the oracle can reproduce: the decode digests the
# lowercase-hex string of the media bytes (hex(media) == MD5(text), so
# DuckDB computes the identical digest as MD5(MD5(text)) — VARCHAR-only
# md5 is version-proof; BLOB md5 is not). This converts the mapInPandas
# decode plumbing from a rows-only check to a full hash-gated one: any
# batching bug, schema drift, or byte-order mistake in the Arrow path
# now fails the value gate, not just the row count.
# ---------------------------------------------------------------------------
DIGEST_SCHEMA = ("doc_id bigint, width int, height int, "
                 "chan_r int, chan_g int, chan_b int, decode_ok boolean")


def digest_media(m: DataFrame) -> DataFrame:
    """mapInPandas media digest: Arrow-batched, partition-preserving,
    per-row failure capture (decode_ok=False) like decode_media."""

    def digest_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": pdf["width"],
                   "height": pdf["height"]}
            chans, ok = [], []
            for media in pdf["media"]:
                try:
                    if not media:
                        raise ValueError("empty media payload")
                    dig = hashlib.md5(bytes(media).hex().encode()).digest()
                    chans.append((dig[0], dig[1], dig[2]))
                    ok.append(True)
                except (ValueError, TypeError):
                    chans.append((None, None, None))
                    ok.append(False)
            out["chan_r"] = pd.array([c[0] for c in chans], dtype="Int32")
            out["chan_g"] = pd.array([c[1] for c in chans], dtype="Int32")
            out["chan_b"] = pd.array([c[2] for c in chans], dtype="Int32")
            out["decode_ok"] = ok
            yield pd.DataFrame(out)

    flat = m.select("doc_id", "media", "meta.width", "meta.height")
    return flat.mapInPandas(digest_batches, schema=DIGEST_SCHEMA)


@query("q54b_media_digest", """
WITH m AS (
  SELECT doc_id, MD5(MD5(text)) AS dig,
         CAST(n_chars % 640 + 1 AS INTEGER) AS width,
         CAST(doc_id % 480 + 1 AS INTEGER) AS height
  FROM documents)
SELECT doc_id, width, height,
       CAST('0x' || SUBSTR(dig, 1, 2) AS INTEGER) AS chan_r,
       CAST('0x' || SUBSTR(dig, 3, 2) AS INTEGER) AS chan_g,
       CAST('0x' || SUBSTR(dig, 5, 2) AS INTEGER) AS chan_b,
       TRUE AS decode_ok
FROM m
""")
def q54b_media_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _with_fake_media(load_table(spark, sf_dir, "documents"))
    return digest_media(m)


# ---------------------------------------------------------------------------
# Resize planning: aspect-preserving fit to MAX_SIDE, pure integer math
# (exact on both engines). The pixel resample itself is the q54-style
# Arrow/mapInPandas path; planning the geometry is where Spark does the
# corpus-scale work (deciding what to decode at what size BEFORE paying
# for bytes).
# ---------------------------------------------------------------------------
MAX_SIDE = 224

@query("q85_resize_plan", f"""
WITH m AS (
  SELECT doc_id,
         CAST(n_chars % 640 + 1 AS INTEGER) AS width,
         CAST(doc_id % 480 + 1 AS INTEGER) AS height
  FROM documents)
SELECT doc_id, width, height,
       CAST(CASE WHEN GREATEST(width, height) <= {MAX_SIDE} THEN width
            ELSE GREATEST(1, (width * {MAX_SIDE}
                              - (width * {MAX_SIDE})
                                % GREATEST(width, height))
                             / GREATEST(width, height))
            END AS INTEGER) AS out_w,
       CAST(CASE WHEN GREATEST(width, height) <= {MAX_SIDE} THEN height
            ELSE GREATEST(1, (height * {MAX_SIDE}
                              - (height * {MAX_SIDE})
                                % GREATEST(width, height))
                             / GREATEST(width, height))
            END AS INTEGER) AS out_h,
       GREATEST(width, height) > {MAX_SIDE} AS is_downscale
FROM m
""")
def q85_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    width = (F.col("n_chars") % 640 + 1).cast("int")
    height = (F.col("doc_id") % 480 + 1).cast("int")
    m = d.select("doc_id", width.alias("width"), height.alias("height"))
    side = F.greatest("width", "height")
    fit = lambda c: F.when(side <= MAX_SIDE, F.col(c)).otherwise(
        F.greatest(F.lit(1),
                   F.floor(F.col(c) * MAX_SIDE / side))).cast("int")
    return m.select(
        "doc_id", "width", "height",
        fit("width").alias("out_w"), fit("height").alias("out_h"),
        (side > MAX_SIDE).alias("is_downscale"))


# ---------------------------------------------------------------------------
# Frame-sampling schedule: pick <= MAX_FRAMES timestamps per synthetic
# video (duration/fps derived deterministically from metadata), emit the
# (sample_n, ts_ms, frame_idx) schedule. The schedule explodes ~8 rows
# per video regardless of duration — bounded output, and the downstream
# decoder touches only scheduled frames.
# ---------------------------------------------------------------------------
MAX_FRAMES = 8
MIN_STEP_MS = 1000

# ---------------------------------------------------------------------------
# q119 — image-text pair manifest (the CLIP-style training-pair build):
# join the image lake (q53's synthetic media + geometry riding on
# documents) with the caption/text side and the per-item embedding
# (doc_id <-> vec_id across modality tables), gate on caption token
# count and minimum pixel area, and emit the pair manifest a contrastive
# trainer consumes. Token counting uses the corpus-canonical
# split-and-drop-empties (textops q51); embedding norm is the
# order-fixed sequential fold (similarity._sqnorm).
#
# Scale: the pairing equi-join on the shared id is THE shuffle of a
# multimodal lake build — both sides hash-partition on the id (at 100 TB
# you bucket both lake tables by this id so the join is Exchange-free,
# plans/layout.py pattern); everything else is per-row projection that
# pushes down to the scans.
# ---------------------------------------------------------------------------
MIN_CAPTION_TOKENS = 3
MAX_CAPTION_TOKENS = 64
MIN_PIXELS = 1024

@query("q119_image_text_pairs", f"""
WITH cap AS (
  SELECT doc_id, lang,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS n_tokens,
         OCTET_LENGTH(UNHEX(MD5(text))) AS n_bytes,
         CAST(n_chars % 640 + 1 AS INTEGER) AS width,
         CAST(doc_id % 480 + 1 AS INTEGER) AS height
  FROM documents),
emb AS (
  SELECT vec_id,
         ROUND(SQRT(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS emb_norm
  FROM embeddings)
SELECT c.doc_id AS pair_id, c.lang, c.n_tokens, c.n_bytes,
       c.width, c.height, e.emb_norm,
       (c.n_tokens BETWEEN {MIN_CAPTION_TOKENS} AND {MAX_CAPTION_TOKENS})
         AND c.width * c.height >= {MIN_PIXELS} AS keep
FROM cap c JOIN emb e ON c.doc_id = e.vec_id
""")
def q119_image_text_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    cap = d.select(
        "doc_id", "lang",
        F.size(toks).alias("n_tokens"),
        F.octet_length(F.unhex(F.md5(F.col("text").cast("binary"))))
         .alias("n_bytes"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"))
    sqnorm = F.aggregate(
        F.col("embedding"), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"))
    emb = e.select(F.col("vec_id").alias("pair_id"),
                   F.round(F.sqrt(sqnorm), 6).alias("emb_norm"))
    keep = (F.col("n_tokens").between(MIN_CAPTION_TOKENS, MAX_CAPTION_TOKENS)
            & (F.col("width") * F.col("height") >= MIN_PIXELS))
    return (cap.withColumnRenamed("doc_id", "pair_id")
               .join(emb, "pair_id")
               .select("pair_id", "lang", "n_tokens", "n_bytes",
                       "width", "height", "emb_norm", keep.alias("keep")))


@query("q86_frame_sample", f"""
WITH v AS (
  SELECT doc_id,
         CAST((n_chars * 37) % 120000 + 1000 AS BIGINT) AS duration_ms,
         CAST(24 + doc_id % 6 AS INTEGER) AS fps
  FROM documents),
s AS (
  SELECT doc_id, duration_ms, fps,
         GREATEST({MIN_STEP_MS},
                  CAST((duration_ms - duration_ms % {MAX_FRAMES})
                       / {MAX_FRAMES} AS BIGINT)) AS step_ms
  FROM v)
SELECT doc_id,
       CAST((ts_ms - ts_ms % step_ms) / step_ms AS INTEGER) AS sample_n,
       CAST(ts_ms AS BIGINT) AS ts_ms,
       CAST((ts_ms * fps - (ts_ms * fps) % 1000) / 1000 AS BIGINT)
         AS frame_idx
FROM s, UNNEST(RANGE(0, duration_ms, step_ms)) AS t(ts_ms)
""")
def q86_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    v = d.select(
        "doc_id",
        ((F.col("n_chars") * 37) % 120000 + 1000).cast("bigint")
         .alias("duration_ms"),
        (24 + F.col("doc_id") % 6).cast("int").alias("fps"))
    s = v.withColumn(
        "step_ms", F.greatest(F.lit(MIN_STEP_MS),
                              F.floor(F.col("duration_ms") / MAX_FRAMES)))
    ts = F.explode(F.sequence(
        F.lit(0).cast("bigint"),
        F.col("duration_ms") - 1,
        F.col("step_ms"))).alias("ts_ms")
    return (s.select("doc_id", "fps", "step_ms", ts)
            .select("doc_id",
                    F.floor(F.col("ts_ms") / F.col("step_ms")).cast("int")
                     .alias("sample_n"),
                    F.col("ts_ms").cast("bigint").alias("ts_ms"),
                    F.floor(F.col("ts_ms") * F.col("fps") / 1000)
                     .cast("bigint").alias("frame_idx")))
