"""Scalar-function batteries (SURVEY.md §2.2 'Scalar functions').

The reference's only scalar work is timestamp parse/format and number
format (P2-P4, /root/reference/src/main.rs:74-84,140-151); the engine
exposes the full pyspark.sql.functions surface. All expressions are
JVM-side built-ins inside whole-stage codegen.

Cross-engine notes: libm functions (ln/exp/sqrt/pow) may differ in the
last ulp between engines → rounded to 6; day-of-week conventions differ
(Spark weekday()=0-Monday vs DuckDB isodow=1-Monday) → normalized to ISO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .helpers import dsum, sql_dsum

QUERIES: dict = {}
ORACLES: dict = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query("q22_string_funcs", """
SELECT doc_id,
       UPPER(source) AS src_upper,
       SUBSTR(text, 1, 12) AS head12,
       LENGTH(text) AS n_len,
       CONCAT(lang, ':', source) AS lang_src,
       REPLACE(lang, 'e', 'E') AS lang_repl,
       LPAD(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
       REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_word,
       CONTAINS(text, 'join') AS has_join,
       TRIM(SUBSTR(text, 1, 20)) AS head_trim
FROM documents
""")
def q22_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.substring("text", 1, 12).alias("head12"),
        F.length("text").alias("n_len"),
        F.concat_ws(":", "lang", "source").alias("lang_src"),
        F.regexp_replace("lang", "e", "E").alias("lang_repl"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.col("text").contains("join").alias("has_join"),
        F.trim(F.substring("text", 1, 20)).alias("head_trim"),
    )


@query("q23_date_funcs", """
SELECT o_orderkey,
       YEAR(o_orderdate) AS yr,
       MONTH(o_orderdate) AS mo,
       DAY(o_orderdate) AS dom,
       ISODOW(o_orderdate) AS iso_dow,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) + 7 AS ship_by,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
       DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch0
FROM orders WHERE o_orderkey % 10 = 0
""")
def q23_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(d, 7).alias("ship_by"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch0"),
    )


@query("q24_math_funcs", """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_r1,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
       ROUND(POW(1 + l_tax, 2), 6) AS tax_sq,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       l_orderkey % 7 AS key_mod
FROM lineitem WHERE l_orderkey % 25 = 0
""")
def q24_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 25 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query("q25_array_funcs", """
SELECT vec_id,
       LEN(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       CAST(LIST_MIN(embedding) AS DOUBLE) AS vec_min,
       CAST(LIST_MAX(embedding) AS DOUBLE) AS vec_max,
       ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_norm
FROM embeddings
""")
def q25_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    x_sq = lambda x: x.cast("double") * x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.array_min("embedding").cast("double").alias("vec_min"),
        F.array_max("embedding").cast("double").alias("vec_max"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x_sq(x)), 4
        ).alias("sq_norm"),
    )


@query("q26_explode_tokens", """
SELECT token, COUNT(*) AS n
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token HAVING COUNT(*) >= 5
""")
def q26_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
         .where(F.col("token") != "")
         .groupBy("token").agg(F.count("*").alias("n"))
         .where(F.col("n") >= 5)
    )


@query("q27_json_funcs", f"""
WITH kv AS (
  SELECT TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k, value
  FROM events)
SELECT CAST(FLOOR(k / 10.0) AS BIGINT) AS k_bucket,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total_value
FROM kv
WHERE k IS NOT NULL
GROUP BY 1
""")  # no ts use — raw events view is fine here
def q27_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    # one typed from_json parse beats get_json_object's per-call path
    # evaluation (~20% at sf0.1); malformed JSON -> null struct -> null k,
    # same as the oracle's JSON_EXTRACT_STRING(...) IS NULL filter
    from pyspark.sql.types import LongType, StructField, StructType
    k = F.from_json("props", StructType([StructField("k", LongType())]))["k"]
    return (
        e.where(k.isNotNull())
         .groupBy(F.floor(k / 10).alias("k_bucket"))
         .agg(F.count("*").alias("n"),
              dsum(F.col("value")).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# OHLC candles — batch analog of the streaming candle pipeline
# (streaming/candles.py); open/close resolved by deterministic
# row_number over (ts, event_id).
# ---------------------------------------------------------------------------
@query("q30_ohlc_candles", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket, event_type,
       (MIN({'ts': ts, 'id': event_id, 'v': value})).v AS open,
       (MAX({'ts': ts, 'id': event_id, 'v': value})).v AS close,
       MAX(value) AS high, MIN(value) AS low, COUNT(*) AS n_events
FROM ev GROUP BY 1, 2
""")
def q30_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-shuffle OHLC: open/close via lexicographic min/max over
    (ts, event_id, value) structs — map-side combinable aggregates, no
    window sorts (rewritten from a 2×row_number plan; both engines
    compare structs field-lexicographically, and (ts, event_id) is
    unique, so open/close are deterministic)."""
    e = t(spark, sf_dir, "events").withColumn("bucket", F.date_trunc("hour", "ts"))
    key = F.struct(F.col("ts"), F.col("event_id").alias("id"),
                   F.col("value").alias("v"))
    return (e.groupBy("bucket", "event_type")
             .agg(F.min(key)["v"].alias("open"),
                  F.max(key)["v"].alias("close"),
                  F.max("value").alias("high"),
                  F.min("value").alias("low"),
                  F.count("*").alias("n_events")))


# ---------------------------------------------------------------------------
# Gap-based sessionization (batch analog of session_window in streaming):
# lag → gap flag → running sum = session id. One shuffle on user_id; both
# windows share the same partitioning so Spark sorts once.
# ---------------------------------------------------------------------------
@query("q31_sessionize", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, event_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       CAST(EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS BIGINT) AS duration_us
FROM sessions GROUP BY user_id, session_id
""")
def q31_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
              <= 30 * 60 * 1_000_000)
    return (
        e.withColumn("new_sess", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)))
         .withColumn("session_id",
                     F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)))
         .groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
         .agg(F.count("*").alias("n_events"),
              (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
              .alias("duration_us"))
    )


# ---------------------------------------------------------------------------
# Top-of-book: latest event per (user, event_type) — the batch analog of
# the streaming keep-latest operator (streaming/candles.py dedup /
# state.py). Single shuffle: max over (ts, event_id, value) structs.
# ---------------------------------------------------------------------------
@query("q62_top_of_book", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT user_id, event_type,
       (MAX({'ts': ts, 'id': event_id, 'v': value})).ts AS last_ts,
       (MAX({'ts': ts, 'id': event_id, 'v': value})).id AS last_event_id,
       (MAX({'ts': ts, 'id': event_id, 'v': value})).v AS last_value,
       COUNT(*) AS n_events
FROM ev GROUP BY user_id, event_type
""")
def q62_top_of_book(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id").alias("id"),
                   F.col("value").alias("v"))
    return (e.groupBy("user_id", "event_type")
             .agg(F.max(key)["ts"].alias("last_ts"),
                  F.max(key)["id"].alias("last_event_id"),
                  F.max(key)["v"].alias("last_value"),
                  F.count("*").alias("n_events")))


# ---------------------------------------------------------------------------
# q102 — hopping windows, batch analog of the streaming sliding candle:
# width 1 hour, slide 30 minutes, so every event lands in exactly two
# windows. Spark's native window() generator expands the assignment
# inside codegen (epoch-aligned grid, same as the streaming operator);
# the oracle reconstructs the identical grid with time_bucket and an
# explicit 2-window unnest. One map-side-combinable groupBy on
# (window_start, event_type).
# ---------------------------------------------------------------------------
@query("q102_hopping_windows", f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
assigned AS (
  SELECT event_type, value, ts,
         UNNEST([TIME_BUCKET(INTERVAL 30 MINUTE, ts),
                 TIME_BUCKET(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
           AS window_start
  FROM ev)
SELECT window_start,
       window_start + INTERVAL 60 MINUTE AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM assigned
WHERE ts >= window_start AND ts < window_start + INTERVAL 60 MINUTE
GROUP BY window_start, event_type
""")
def q102_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (e.groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 dsum(F.col("value")).alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


# ---------------------------------------------------------------------------
# q134 — gap-filled OHLC: the hourly candle series per event_type made
# DENSE — silent hours appear with n_events=0 and the last known close
# carried forward (what every charting/feature pipeline consumes; the
# reference emits ticks only when the stream produces them,
# /root/reference/src/main.rs:65-135 — downstream gap handling is
# implicit there, explicit here).
#
# Shape: q30's single-shuffle candles, a per-type sequence() hour grid
# (generated from each type's own [min, max] — no global scan of time),
# a left join onto the grid, and ONE last-ignorenulls carry window per
# type. Values pass through untouched (struct-min/max picks) — no
# float arithmetic, so cross-engine parity needs no rounding.
#
# Scale: the grid is O(types x hours) — tiny relative to the event log;
# the only corpus-sized shuffle is q30's candle groupBy. The carry
# window partitions by event_type — bounded cardinality, each
# partition a few thousand hours even for years of data.
# ---------------------------------------------------------------------------
@query("q134_ohlc_gap_fill", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
candles AS (
  SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS bucket, event_type,
         (MAX({'ts': ts, 'id': event_id, 'v': value})).v AS close,
         COUNT(*) AS n_events
  FROM ev GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1
  FROM candles GROUP BY event_type),
grid AS (
  SELECT event_type,
         UNNEST(GENERATE_SERIES(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM bounds)
SELECT g.event_type, g.bucket,
       c.close AS close,
       LAST_VALUE(c.close IGNORE NULLS)
         OVER (PARTITION BY g.event_type ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_close,
       COALESCE(c.n_events, 0) AS n_events,
       (c.bucket IS NULL) AS is_gap
FROM grid g LEFT JOIN candles c
  ON c.event_type = g.event_type AND c.bucket = g.bucket
""")
def q134_ohlc_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn(
        "bucket", F.date_trunc("hour", "ts"))
    key = F.struct(F.col("ts"), F.col("event_id").alias("id"),
                   F.col("value").alias("v"))
    candles = (e.groupBy("bucket", "event_type")
               .agg(F.max(key)["v"].alias("close"),
                    F.count("*").alias("n_events")))
    grid = (candles.groupBy("event_type")
            .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
            .select("event_type",
                    F.explode(F.expr(
                        "sequence(b0, b1, interval 1 hour)")).alias("bucket")))
    j = (grid.join(candles.select(F.col("event_type").alias("ct"),
                                  F.col("bucket").alias("cb"),
                                  "close", "n_events"),
                   (F.col("event_type") == F.col("ct"))
                   & (F.col("bucket") == F.col("cb")), "left"))
    w = (W.partitionBy("event_type").orderBy("bucket")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return j.select(
        "event_type", "bucket", "close",
        F.last("close", ignorenulls=True).over(w).alias("filled_close"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("cb").isNull().alias("is_gap"))


# ---------------------------------------------------------------------------
# q149 — VARIANT semi-structured path (Spark 4 parse_json/variant_get):
# event props parse ONCE into the binary Variant encoding and every
# extraction afterwards is a typed path read — no per-access JSON
# re-parse. At 100 TB this is the difference between storing raw JSON
# strings (q27's get_json_object re-parses per expression) and an
# open-format shredded column: parse cost is paid at ingest, reads are
# offset lookups, and the column stays schema-flexible. One
# map-side-combinable groupBy; integer outputs, no rounding hazards.
# ---------------------------------------------------------------------------
# Version-proofing (round 7): the driver's DuckDB materializes results via
# pandas, where SUM(BIGINT) -> HUGEINT -> float64 ("3.0" vs Spark's "3":
# hash mismatch even though fetchall() returns int locally). Outer
# CAST(... AS BIGINT) pins the dtype on every DuckDB version. Extraction
# goes through json_extract_string + TRY_CAST (stable across DuckDB's
# json CAST semantics changes) mirrored by variant_get(...,'string') +
# try_cast on the Spark side — the q90 _idiv discipline applied to JSON.
@query("q149_variant_props", """
WITH ev AS (SELECT event_type,
              TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
              AS k FROM events)
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(k) AS n_with_k,
       CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(DISTINCT k) AS n_distinct_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM ev GROUP BY event_type
""")
def q149_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr(
        "try_cast(variant_get(parse_json(props), '$.k', 'string') as int)")
    return (ev.select("event_type", k.alias("k"))
              .groupBy("event_type")
              .agg(F.count("*").alias("n_events"),
                   F.count("k").alias("n_with_k"),
                   F.sum(F.col("k").cast("bigint")).alias("sum_k"),
                   F.countDistinct("k").alias("n_distinct_k"),
                   F.min("k").alias("min_k"),
                   F.max("k").alias("max_k")))
