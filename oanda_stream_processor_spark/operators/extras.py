"""Operator-surface extras (SURVEY.md §2.2 long tail): null semantics,
exact percentiles, multiset ops, unpivot, map/JSON access, timezone
conversion, approximate sketches, and SCD2/CDC emulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# ---------------------------------------------------------------------------
# Null semantics: null-safe equality, IS DISTINCT FROM, coalesce chains,
# CASE with nulls — exercised on a derived column that is null for some
# rows (props '$.missing' never exists).
# ---------------------------------------------------------------------------
@query("q32_null_semantics", """
WITH e AS (
  SELECT event_id,
         CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k,
         CASE WHEN event_id % 3 = 0 THEN NULL
              ELSE CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) END AS k_sparse
  FROM events)
SELECT event_id, k, k_sparse,
       (k IS NOT DISTINCT FROM k_sparse) AS null_safe_eq,
       (k IS DISTINCT FROM k_sparse) AS is_distinct,
       COALESCE(k_sparse, k, -1) AS first_non_null,
       (k_sparse IS NULL) AS sparse_missing,
       CASE WHEN k_sparse IS NULL THEN 'missing'
            WHEN k_sparse >= 50 THEN 'high' ELSE 'low' END AS bucket
FROM e WHERE event_id % 10 = 0
""")
def q32_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    e = ev.select(
        "event_id", k.alias("k"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("bigint"))
         .otherwise(k).alias("k_sparse"))
    return (e.where(F.col("event_id") % 10 == 0)
             .select("event_id", "k", "k_sparse",
                     F.col("k").eqNullSafe(F.col("k_sparse")).alias("null_safe_eq"),
                     (~F.col("k").eqNullSafe(F.col("k_sparse"))).alias("is_distinct"),
                     F.coalesce("k_sparse", "k", F.lit(-1)).alias("first_non_null"),
                     F.col("k_sparse").isNull().alias("sparse_missing"),
                     F.when(F.col("k_sparse").isNull(), "missing")
                      .when(F.col("k_sparse") >= 50, "high")
                      .otherwise("low").alias("bucket")))


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated) — Spark `percentile`, DuckDB
# `quantile_cont`: same definition.
# ---------------------------------------------------------------------------
@query("q33_percentiles", """
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS p99,
       ROUND(MEDIAN(l_quantity), 4) AS median_qty
FROM lineitem GROUP BY l_returnflag
""")
def q33_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one percentile() buffer+sort serves all three quantiles (the agg
    # accepts an array of percentages); three separate calls tripled the
    # per-group value buffering and final sort
    pcts = F.percentile("l_extendedprice",
                        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (li.groupBy("l_returnflag")
            .agg(pcts.alias("pcts"),
                 F.round(F.median("l_quantity"), 4).alias("median_qty"))
            .select("l_returnflag",
                    F.round(F.col("pcts")[0], 4).alias("p50"),
                    F.round(F.col("pcts")[1], 4).alias("p90"),
                    F.round(F.col("pcts")[2], 4).alias("p99"),
                    "median_qty"))


# ---------------------------------------------------------------------------
# Approximate percentiles — the scale path next to q33's exact ones.
# Spark's approx_percentile is a Greenwald-Khanna sketch: one pass, fixed
# memory per group, map-side-combinable — no per-group full sort/buffer
# like exact percentile(), so it stays cheap at 100 TB. GK guarantees
# rank error <= n/accuracy; at accuracy 10_000 that's 0.01% of rows per
# group. No DuckDB oracle: DuckDB's approx_quantile is a t-digest and
# cannot reproduce GK outputs bit-for-bit (rows-only driver check;
# tests/test_cross_engine.py asserts the GK rank-error bound against the
# exact quantiles instead).
# ---------------------------------------------------------------------------
@query("q108_approx_percentiles")
def q108_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.expr(
        "approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)")
    return (li.groupBy("l_returnflag")
            .agg(pcts.alias("pcts"),
                 F.expr("approx_percentile(l_quantity, 0.5D, 10000)")
                  .alias("median_qty_approx"))
            .select("l_returnflag",
                    F.col("pcts")[0].alias("p50_approx"),
                    F.col("pcts")[1].alias("p90_approx"),
                    F.col("pcts")[2].alias("p99_approx"),
                    "median_qty_approx"))


# ---------------------------------------------------------------------------
# Multiset set-ops: INTERSECT ALL / EXCEPT ALL keep duplicates.
# ---------------------------------------------------------------------------
@query("q34_multiset_ops", """
SELECT custkey, 'both' AS src FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT custkey, 'only_p' AS src FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
  EXCEPT ALL
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
""")
def q34_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def side(status: str) -> DataFrame:
        return (o.where(F.col("o_orderstatus") == status)
                 .select(F.col("o_custkey").alias("custkey")))

    both = (side("O").intersectAll(side("F"))
            .select("custkey", F.lit("both").alias("src")))
    only_p = (side("P").exceptAll(side("O"))
              .select("custkey", F.lit("only_p").alias("src")))
    return both.unionByName(only_p)


# ---------------------------------------------------------------------------
# Unpivot (wide -> long): Spark unpivot / stack, oracle via UNION ALL.
# ---------------------------------------------------------------------------
@query("q35_unpivot", """
SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part
UNION ALL
SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
""")
def q35_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    wide = p.select("p_partkey", F.col("p_retailprice").alias("retail"),
                    F.col("p_size").cast("double").alias("size"))
    return wide.unpivot("p_partkey", ["retail", "size"], "metric", "value")


# ---------------------------------------------------------------------------
# Map columns: from_json to MapType, map_keys/element_at/map_entries.
# ---------------------------------------------------------------------------
@query("q36_map_funcs", """
SELECT event_id,
       CAST(LEN(JSON_KEYS(props)) AS INTEGER) AS n_keys,
       JSON_KEYS(props)[1] AS first_key,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_value,
       LIST_CONTAINS(JSON_KEYS(props), 'k') AS has_k
FROM events WHERE event_id % 20 = 0
""")
def q36_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (ev.where(F.col("event_id") % 20 == 0)
              .select("event_id",
                      F.size(F.map_keys(m)).alias("n_keys"),
                      F.element_at(F.map_keys(m), 1).alias("first_key"),
                      F.element_at(m, "k").alias("k_value"),
                      F.map_contains_key(m, "k").alias("has_k")))


# ---------------------------------------------------------------------------
# Timezone conversion (P2 display-path parity: UTC -> local tz,
# main.rs:74-79): from_utc_timestamp == DuckDB timezone().
# ---------------------------------------------------------------------------
@query("q37_tz_convert", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT event_id,
       STRFTIME(TIMEZONE('America/New_York', ts AT TIME ZONE 'UTC'),
                '%Y-%m-%d %H:%M:%S') AS ny_display,
       STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS utc_display
FROM ev WHERE event_id % 50 = 0
""")
def q37_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.where(F.col("event_id") % 50 == 0)
              .select("event_id",
                      F.date_format(F.from_utc_timestamp("ts", "America/New_York"),
                                    "yyyy-MM-dd HH:mm:ss").alias("ny_display"),
                      F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("utc_display")))


# ---------------------------------------------------------------------------
# Approximate sketches — rows-only: HLL/quantile-sketch internals differ
# across engines by design; the driver records the weaker check.
# ---------------------------------------------------------------------------
@query("q38_approx_sketches")
def q38_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
                 F.approx_count_distinct("l_suppkey", rsd=0.01).alias("approx_supps"),
                 F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx"),
                 F.count("*").alias("n")))


# ---------------------------------------------------------------------------
# SCD2 / CDC emulation without a lakehouse MERGE: snapshot vs updates ->
# anti-join (unchanged) + union (new versions) + window (valid_to).
# ---------------------------------------------------------------------------
@query("q39_scd2_versions", """
WITH updates AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 5 = 0),
versioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders
  UNION ALL
  SELECT o_orderkey, 'F', FLOOR(o_totalprice * 1.1 * 100) / 100.0, 2 FROM updates)
SELECT o_orderkey, o_orderstatus, o_totalprice, version,
       (version = MAX(version) OVER (PARTITION BY o_orderkey)) AS is_current
FROM versioned
""")
def q39_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    updates = o.where((F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 5 == 0))
    v1 = o.select("o_orderkey", "o_orderstatus", "o_totalprice",
                  F.lit(1).alias("version"))
    v2 = updates.select("o_orderkey", F.lit("F").alias("o_orderstatus"),
                        (F.floor(F.col("o_totalprice") * 1.1 * 100) / 100.0).alias("o_totalprice"),
                        F.lit(2).alias("version"))
    versioned = v1.unionByName(v2)
    w = W.partitionBy("o_orderkey")
    return versioned.withColumn(
        "is_current", F.col("version") == F.max("version").over(w))


# ---------------------------------------------------------------------------
# Correlated subqueries — Catalyst decorrelates both the scalar subquery
# and the EXISTS into joins (SURVEY.md §4: subquery decorrelation comes
# free); oracle runs the identical SQL.
# ---------------------------------------------------------------------------
_Q63_SQL = """
SELECT p_partkey, p_brand, p_retailprice,
       ROUND(p_retailprice - (SELECT AVG(p2.p_retailprice) FROM part p2
                              WHERE p2.p_brand = part.p_brand), 4) AS vs_brand_avg
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity >= 45)
  AND p_retailprice > (SELECT AVG(p3.p_retailprice) FROM part p3
                       WHERE p3.p_brand = part.p_brand)
"""

@query("q63_correlated_subquery", _Q63_SQL)
def q63_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AVG over doubles: per-brand groups are ~80 rows — both engines'
    # summation differences sit far below the 4-dp rounding. The Spark
    # side IS the SQL (same text) — the point is the decorrelated plan.
    for name in ("part", "lineitem"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q63_SQL)


# ---------------------------------------------------------------------------
# VariantType (Spark 4): schema-on-read semi-structured column —
# parse_json + variant_get; the oracle uses DuckDB's JSON functions.
# ---------------------------------------------------------------------------
@query("q64_variant_json", """
SELECT event_id,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_typed,
       JSON_EXTRACT_STRING(props, '$.k') AS k_string,
       (JSON_EXTRACT(props, '$.missing') IS NULL) AS missing_is_null
FROM events WHERE event_id % 25 = 0
""")
def q64_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (ev.where(F.col("event_id") % 25 == 0)
              .select("event_id",
                      F.try_variant_get(v, "$.k", "bigint").alias("k_typed"),
                      F.try_variant_get(v, "$.k", "string").alias("k_string"),
                      F.try_variant_get(v, "$.missing", "string").isNull()
                       .alias("missing_is_null")))


# ---------------------------------------------------------------------------
# RANGE window frames (value-based, vs the ROWS frames elsewhere) +
# first/last/nth_value: 7-day trailing spend per customer ordered by
# epoch-days — a numeric range frame identical in both engines.
# ---------------------------------------------------------------------------
@query("q73_range_frame", """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS day_num
  FROM orders)
SELECT o_orderkey, o_custkey, day_num,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN 7 PRECEDING AND CURRENT ROW), 2) AS spend_7d,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS n_7d,
       ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
       ROUND(LAST_VALUE(o_totalprice) OVER w, 2) AS latest_price,
       ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""")
def q73_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day_num = F.datediff(F.to_date("o_orderdate"),
                         F.lit("1970-01-01").cast("date")).cast("bigint")
    df = o.select("o_orderkey", "o_custkey", "o_totalprice",
                  day_num.alias("day_num"))
    # RANGE frame: all peers within 7 day-units of the current ORDER BY
    # value (ties included) — value-based, unlike ROWS frames. The
    # trailing-sum is computed over the same value window in both
    # engines; ROWS frame with a full tiebreak for the positional funcs.
    wr = (W.partitionBy("o_custkey").orderBy("day_num")
           .rangeBetween(-7, 0))
    wp = (W.partitionBy("o_custkey").orderBy("day_num", "o_orderkey")
           .rowsBetween(W.unboundedPreceding, 0))
    return df.select(
        "o_orderkey", "o_custkey", "day_num",
        F.round(F.sum("o_totalprice").over(wr), 2).alias("spend_7d"),
        F.count("*").over(wr).alias("n_7d"),
        F.round(F.first("o_totalprice").over(wp), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wp), 2).alias("latest_price"),
        F.round(F.nth_value("o_totalprice", 2).over(wp), 2).alias("second_price"))


# ---------------------------------------------------------------------------
# q91 — Z-order (Morton) clustering profile: min-max-normalize two
# correlated scan dimensions (customer, order day) to Z_BITS-bit ranks,
# interleave their bits into the Morton code, derive the file/bucket
# assignment a Z-ordered writer would produce (top Z_BUCKETS_LOG2 bits),
# and report each bucket's per-dimension min/max envelope — the
# data-skipping statistics that decide whether a multi-dimensional
# predicate can prune the bucket. This is the OPTIMIZE ZORDER BY loop
# from lakehouse table formats; normalization and interleave are pure
# integer arithmetic, so the DuckDB twin is bit-exact.
#
# Scale: normalization needs one tiny min/max aggregate (broadcast back
# as a one-row frame); the z-value is then a per-row projection and the
# envelope one map-side-combinable groupBy on a 6-bit key. A real writer
# range-partitions on z before writing — repartitionByRange(z) + write,
# with this query as its audit.
# ---------------------------------------------------------------------------
Z_BITS = 8          # bits per dimension after rank normalization
Z_BUCKETS_LOG2 = 6  # 64 buckets = top 6 bits of the 16-bit z-value

_Z_TOP = (1 << Z_BITS) - 1

@query("q91_zorder_profile", f"""
WITH dims AS (
  SELECT o_orderkey, o_custkey AS ck,
         DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dd
  FROM orders),
stats AS (
  SELECT MIN(ck) AS ck_lo, MAX(ck) AS ck_hi,
         MIN(dd) AS dd_lo, MAX(dd) AS dd_hi
  FROM dims),
norm AS (
  SELECT o_orderkey, ck, dd,
         CASE WHEN ck_hi = ck_lo THEN 0
              ELSE CAST(((ck - ck_lo) * {_Z_TOP}
                         - ((ck - ck_lo) * {_Z_TOP}) % (ck_hi - ck_lo))
                        / (ck_hi - ck_lo) AS BIGINT) END AS nck,
         CASE WHEN dd_hi = dd_lo THEN 0
              ELSE CAST(((dd - dd_lo) * {_Z_TOP}
                         - ((dd - dd_lo) * {_Z_TOP}) % (dd_hi - dd_lo))
                        / (dd_hi - dd_lo) AS BIGINT) END AS ndd
  FROM dims CROSS JOIN stats),
zvals AS (
  SELECT ck, dd,
         LIST_AGGREGATE(LIST_TRANSFORM(RANGE({Z_BITS}), i ->
           (((nck >> i) & 1) << (2 * i + 1)) + (((ndd >> i) & 1) << (2 * i))),
           'sum') AS z
  FROM norm)
SELECT CAST(z >> {2 * Z_BITS - Z_BUCKETS_LOG2} AS BIGINT) AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(ck) AS ck_min, MAX(ck) AS ck_max,
       MIN(dd) AS dd_min, MAX(dd) AS dd_max
FROM zvals
GROUP BY 1
""")
def q91_zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dd = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    dims = o.select("o_orderkey", F.col("o_custkey").cast("long").alias("ck"),
                    dd.cast("long").alias("dd"))
    stats = dims.agg(F.min("ck").alias("ck_lo"), F.max("ck").alias("ck_hi"),
                     F.min("dd").alias("dd_lo"), F.max("dd").alias("dd_hi"))
    norm = (dims.crossJoin(F.broadcast(stats))
            .select("ck", "dd",
                    F.expr(f"IF(ck_hi = ck_lo, 0L, "
                           f"((ck - ck_lo) * {_Z_TOP}) div (ck_hi - ck_lo))")
                     .alias("nck"),
                    F.expr(f"IF(dd_hi = dd_lo, 0L, "
                           f"((dd - dd_lo) * {_Z_TOP}) div (dd_hi - dd_lo))")
                     .alias("ndd")))
    # UNROLLED bit interleave (16 flat shift/mask terms at Z_BITS=8):
    # the aggregate(sequence(...)) HOF form computes the same value but
    # is interpreted outside whole-stage codegen — measured ~2x on the
    # corpus-wide projection. Flat arithmetic stays inside codegen.
    z = F.expr("(" + " + ".join(
        [f"(((nck >> {i}) & 1) << {2 * i + 1})" for i in range(Z_BITS)]
        + [f"(((ndd >> {i}) & 1) << {2 * i})" for i in range(Z_BITS)])
        + ")")
    return (norm.select("ck", "dd", z.alias("z"))
            .groupBy(F.shiftright("z", 2 * Z_BITS - Z_BUCKETS_LOG2)
                      .alias("z_bucket"))
            .agg(F.count("*").alias("n_rows"),
                 F.min("ck").alias("ck_min"), F.max("ck").alias("ck_max"),
                 F.min("dd").alias("dd_min"), F.max("dd").alias("dd_max")))


# ---------------------------------------------------------------------------
# q96 — temporal (point-in-time) join: each lineitem resolves its
# order's SCD2 dimension version valid AT SHIP TIME — the Flink
# "temporal table join" / warehouse AS OF join. Versions extend q39:
# v1 valid from the order date, v2 (the status flip) valid from
# order date + 30 days; valid_to = next version's valid_from via LEAD,
# open intervals capped at 9999-12-31.
#
# Scale: the join carries the equi key (orderkey), so it hash-partitions
# both sides on a uniform key and applies the interval predicate inside
# the matched bucket — never a broadcast-nested-loop over time ranges.
# Version chains are short (2 here; bounded in practice), so the
# per-key interval scan is O(1).
# ---------------------------------------------------------------------------
@query("q96_temporal_join", """
WITH updates AS (
  SELECT o_orderkey, o_totalprice, o_orderdate
  FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 5 = 0),
versioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version,
         CAST(o_orderdate AS DATE) AS valid_from
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'F', FLOOR(o_totalprice * 1.1 * 100) / 100.0, 2,
         CAST(o_orderdate AS DATE) + 30
  FROM updates),
intervals AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, version, valid_from,
         COALESCE(LEAD(valid_from) OVER (PARTITION BY o_orderkey
                                         ORDER BY version),
                  DATE '9999-12-31') AS valid_to
  FROM versioned)
SELECT l.l_orderkey, l.l_linenumber, CAST(l.l_shipdate AS DATE) AS ship_date,
       v.o_orderstatus AS status_at_ship,
       v.o_totalprice AS price_at_ship,
       v.version
FROM lineitem l
JOIN intervals v
  ON v.o_orderkey = l.l_orderkey
 AND CAST(l.l_shipdate AS DATE) >= v.valid_from
 AND CAST(l.l_shipdate AS DATE) < v.valid_to
""")
def q96_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The generic SCD2 interval build uses LEAD over the version chain
    # (the oracle's spelling).  HERE the successor is derivable from
    # the SAME row — an order has a v2 iff it satisfies the update
    # predicate, and v2 starts exactly 30 days after v1 — so valid_to
    # is a CASE projection and the whole interval table is a union of
    # two PROJECTIONS of orders: zero shuffles before the equi-join
    # (the window spelling paid one full orderkey exchange + sort of
    # the 10x-growing orders side; measured 4.5x wall at x10).
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    has_v2 = ((F.col("o_orderstatus") == "O")
              & (F.col("o_orderkey") % 5 == 0))
    open_end = F.lit("9999-12-31").cast("date")
    v1 = o.select("o_orderkey", "o_orderstatus", "o_totalprice",
                  F.lit(1).alias("version"),
                  F.to_date("o_orderdate").alias("valid_from"),
                  F.when(has_v2, F.date_add(F.to_date("o_orderdate"), 30))
                   .otherwise(open_end).alias("valid_to"))
    v2 = (o.where(has_v2)
          .select("o_orderkey", F.lit("F").alias("o_orderstatus"),
                  (F.floor(F.col("o_totalprice") * 1.1 * 100) / 100.0)
                    .alias("o_totalprice"),
                  F.lit(2).alias("version"),
                  F.date_add(F.to_date("o_orderdate"), 30)
                   .alias("valid_from"),
                  open_end.alias("valid_to")))
    # SHUFFLE_HASH (not broadcast — both sides are fact-sized): the
    # equi-join on orderkey needs no ordering, so hashing the interval
    # side beats two full sorts of 10x-growing inputs
    intervals = v1.unionByName(v2).hint("shuffle_hash")
    ship = F.to_date("l_shipdate")
    return (li.select("l_orderkey", "l_linenumber", ship.alias("ship_date"))
            .join(intervals,
                  (F.col("o_orderkey") == F.col("l_orderkey"))
                  & (F.col("ship_date") >= F.col("valid_from"))
                  & (F.col("ship_date") < F.col("valid_to")))
            .select("l_orderkey", "l_linenumber", "ship_date",
                    F.col("o_orderstatus").alias("status_at_ship"),
                    F.col("o_totalprice").alias("price_at_ship"),
                    "version"))


# ---------------------------------------------------------------------------
# q98 — data-skipping effectiveness: closes the q91 loop by measuring
# what the Z-order layout buys. For a fixed two-dimensional predicate,
# a bucket must be read iff its (min, max) envelope intersects the
# predicate box; the query reports buckets/rows read vs rows actually
# matching — the file-skipping audit a lakehouse OPTIMIZE job emits.
# All integer arithmetic; same bucket assignment as q91.
# ---------------------------------------------------------------------------
SKIP_CK = (200, 500)       # predicate: ck BETWEEN 200 AND 500
SKIP_DD = (9500, 9900)     # AND dd BETWEEN 9500 AND 9900 (1996-1997)

@query("q98_skipping_effectiveness", f"""
WITH dims AS (
  SELECT o_orderkey, o_custkey AS ck,
         DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dd
  FROM orders),
stats AS (
  SELECT MIN(ck) AS ck_lo, MAX(ck) AS ck_hi,
         MIN(dd) AS dd_lo, MAX(dd) AS dd_hi
  FROM dims),
norm AS (
  SELECT ck, dd,
         CASE WHEN ck_hi = ck_lo THEN 0
              ELSE CAST(((ck - ck_lo) * {_Z_TOP}
                         - ((ck - ck_lo) * {_Z_TOP}) % (ck_hi - ck_lo))
                        / (ck_hi - ck_lo) AS BIGINT) END AS nck,
         CASE WHEN dd_hi = dd_lo THEN 0
              ELSE CAST(((dd - dd_lo) * {_Z_TOP}
                         - ((dd - dd_lo) * {_Z_TOP}) % (dd_hi - dd_lo))
                        / (dd_hi - dd_lo) AS BIGINT) END AS ndd
  FROM dims CROSS JOIN stats),
zvals AS (
  SELECT ck, dd,
         CAST(LIST_AGGREGATE(LIST_TRANSFORM(RANGE({Z_BITS}), i ->
           (((nck >> i) & 1) << (2 * i + 1)) + (((ndd >> i) & 1) << (2 * i))),
           'sum') >> {2 * Z_BITS - Z_BUCKETS_LOG2} AS BIGINT) AS z_bucket
  FROM norm),
env AS (
  SELECT z_bucket, COUNT(*) AS n_rows,
         MIN(ck) AS ck_min, MAX(ck) AS ck_max,
         MIN(dd) AS dd_min, MAX(dd) AS dd_max
  FROM zvals GROUP BY z_bucket),
flagged AS (
  SELECT *,
         (ck_max >= {SKIP_CK[0]} AND ck_min <= {SKIP_CK[1]}
          AND dd_max >= {SKIP_DD[0]} AND dd_min <= {SKIP_DD[1]}) AS must_read
  FROM env),
matches AS (
  SELECT COUNT(*) AS n_match FROM zvals
  WHERE ck BETWEEN {SKIP_CK[0]} AND {SKIP_CK[1]}
    AND dd BETWEEN {SKIP_DD[0]} AND {SKIP_DD[1]})
SELECT COUNT(*) AS n_buckets,
       CAST(SUM(CASE WHEN must_read THEN 1 ELSE 0 END) AS BIGINT)
         AS n_read_buckets,
       CAST(SUM(n_rows) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN must_read THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_read,
       (SELECT n_match FROM matches) AS rows_match,
       ROUND(1.0 - SUM(CASE WHEN must_read THEN n_rows ELSE 0 END)
             / CAST(SUM(n_rows) AS DOUBLE), 6) AS skip_frac
FROM flagged
""")
def q98_skipping_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dd = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    dims = o.select(F.col("o_custkey").cast("long").alias("ck"),
                    dd.cast("long").alias("dd"))
    stats = dims.agg(F.min("ck").alias("ck_lo"), F.max("ck").alias("ck_hi"),
                     F.min("dd").alias("dd_lo"), F.max("dd").alias("dd_hi"))
    norm = (dims.crossJoin(F.broadcast(stats))
            .select("ck", "dd",
                    F.expr(f"IF(ck_hi = ck_lo, 0L, "
                           f"((ck - ck_lo) * {_Z_TOP}) div (ck_hi - ck_lo))")
                     .alias("nck"),
                    F.expr(f"IF(dd_hi = dd_lo, 0L, "
                           f"((dd - dd_lo) * {_Z_TOP}) div (dd_hi - dd_lo))")
                     .alias("ndd")))
    # UNROLLED bit interleave (16 flat shift/mask terms at Z_BITS=8):
    # the aggregate(sequence(...)) HOF form computes the same value but
    # is interpreted outside whole-stage codegen — measured ~2x on the
    # corpus-wide projection. Flat arithmetic stays inside codegen.
    z = F.expr("(" + " + ".join(
        [f"(((nck >> {i}) & 1) << {2 * i + 1})" for i in range(Z_BITS)]
        + [f"(((ndd >> {i}) & 1) << {2 * i})" for i in range(Z_BITS)])
        + ")")
    zvals = norm.select(
        "ck", "dd",
        F.shiftright(z, 2 * Z_BITS - Z_BUCKETS_LOG2).alias("z_bucket")) \
        .localCheckpoint(eager=True)   # envelope + match branches share it
    env = (zvals.groupBy("z_bucket")
           .agg(F.count("*").alias("n_rows"),
                F.min("ck").alias("ck_min"), F.max("ck").alias("ck_max"),
                F.min("dd").alias("dd_min"), F.max("dd").alias("dd_max")))
    must_read = ((F.col("ck_max") >= SKIP_CK[0]) & (F.col("ck_min") <= SKIP_CK[1])
                 & (F.col("dd_max") >= SKIP_DD[0]) & (F.col("dd_min") <= SKIP_DD[1]))
    flagged = env.withColumn("must_read", must_read)
    matches = (zvals.where(F.col("ck").between(*SKIP_CK)
                           & F.col("dd").between(*SKIP_DD))
               .agg(F.count("*").alias("rows_match")))
    agg = flagged.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("must_read"), 1).otherwise(0)).alias("n_read_buckets"),
        F.sum("n_rows").alias("rows_total"),
        F.sum(F.when(F.col("must_read"), F.col("n_rows")).otherwise(0))
         .alias("rows_read"))
    skip_frac = F.round(
        1.0 - F.col("rows_read") / F.col("rows_total").cast("double"), 6)
    return (agg.crossJoin(matches)
            .select("n_buckets", "n_read_buckets", "rows_total", "rows_read",
                    F.col("rows_match").alias("rows_match"),
                    skip_frac.alias("skip_frac")))


# ---------------------------------------------------------------------------
# q105 — mode / most-frequent value per group with a DETERMINISTIC
# tiebreak (highest count, then smallest value). Built from count +
# row_number instead of the engines' mode() aggregates, whose tie
# behavior is implementation-defined — the construction both engines
# agree on bit-for-bit. Two map-side-combinable aggregations + one
# window over the (tiny) per-group distinct-value frame.
# ---------------------------------------------------------------------------
@query("q105_mode_per_group", """
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS c
  FROM lineitem GROUP BY l_returnflag, l_quantity),
ranked AS (
  SELECT l_returnflag, l_quantity, c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY c DESC, l_quantity) AS rn
  FROM counts)
SELECT l_returnflag, l_quantity AS mode_qty, c AS n_occurrences
FROM ranked WHERE rn = 1
""")
def q105_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = (li.groupBy("l_returnflag", "l_quantity")
              .agg(F.count("*").alias("c")))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("c"), F.asc("l_quantity"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("l_returnflag", F.col("l_quantity").alias("mode_qty"),
                    F.col("c").alias("n_occurrences")))


# ---------------------------------------------------------------------------
# q106 — referential-integrity audit: orphan counts across the schema's
# relationships (the dbt-test / data-contract check a pipeline runs
# before publishing). Each relationship is one anti-join, all
# broadcast-or-shuffle on the key; output is one row per relationship.
# ---------------------------------------------------------------------------
@query("q106_integrity_audit", """
SELECT 'orders_without_customer' AS relationship,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem_without_order',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem_without_part',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'customer_without_nation',
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
""")
def q106_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def orphans(name: str, child: DataFrame, ck: str,
                parent: DataFrame, pk: str) -> DataFrame:
        n = (child.join(parent.select(F.col(pk).alias(ck)), ck, "left_anti")
             .agg(F.count("*").alias("n_orphans")))
        return n.select(F.lit(name).alias("relationship"), "n_orphans")

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    na = load_table(spark, sf_dir, "nation")
    out = orphans("orders_without_customer", o, "o_custkey", c, "c_custkey")
    for args in (("lineitem_without_order", li, "l_orderkey", o, "o_orderkey"),
                 ("lineitem_without_part", li, "l_partkey", p, "p_partkey"),
                 ("customer_without_nation", c, "c_nationkey", na, "n_nationkey")):
        out = out.unionByName(orphans(*args))
    return out


# ---------------------------------------------------------------------------
# q107 — column profile: per-column null count, distinct count, and
# min/max length for the documents table — the schema-drift /
# data-profiling pass (dbt tests, Deequ) a pipeline runs on arrival.
# One aggregate job computes every column's profile (no per-column
# scans); distincts are exact.
# ---------------------------------------------------------------------------
@query("q107_column_profile", """
SELECT 'text' AS col, COUNT(*) - COUNT(text) AS n_null,
       COUNT(DISTINCT text) AS n_distinct,
       MIN(LENGTH(text)) AS min_len, MAX(LENGTH(text)) AS max_len
FROM documents
UNION ALL
SELECT 'lang', COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
       MIN(LENGTH(lang)), MAX(LENGTH(lang)) FROM documents
UNION ALL
SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source),
       MIN(LENGTH(source)), MAX(LENGTH(source)) FROM documents
""")
def q107_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rows = None
    for col in ("text", "lang", "source"):
        r = d.agg(
            (F.count("*") - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(F.length(col)).alias("min_len"),
            F.max(F.length(col)).alias("max_len"),
        ).select(F.lit(col).alias("col"), "n_null", "n_distinct",
                 "min_len", "max_len")
        rows = r if rows is None else rows.unionByName(r)
    return rows


# ---------------------------------------------------------------------------
# q123 — salted two-phase aggregation: THE skew lever for hot keys. The
# events table has 5 event_type values over 600k rows — a groupBy would
# hash 5 keys onto 5 tasks (27 cores idle, one straggler per hot key at
# 100 TB). Phase 1 salts the key with hash(event_id) % N_SALTS and
# aggregates (key, salt) — 5 x 32 cells, every core busy; phase 2
# combines the per-salt partials on the bare key — 160 tiny rows. Sums
# are exact fixed-point bigints (helpers.py pattern), so the two-phase
# result is bit-identical to the one-phase oracle regardless of how
# rows split across salts; min/max/count combine trivially.
#
# Scale: the wide shuffle carries keys x salts cells (map-side
# combined), never row volume; raise N_SALTS to ~2-4x cores for bigger
# clusters. The oracle is the PLAIN one-phase aggregate — salting is a
# physical rewrite with identical semantics, and the gate proves it.
# ---------------------------------------------------------------------------
N_SALTS = 32

@query("q123_salted_skew_agg", """
SELECT event_type, COUNT(*) AS n,
       ROUND(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) / 1000000.0, 4)
         AS value_sum,
       ROUND(MIN(value), 6) AS value_min,
       ROUND(MAX(value), 6) AS value_max
FROM events GROUP BY event_type
""")
def q123_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 1_000_000, 0).cast("bigint")
    salted = e.select("event_type", "value", cents.alias("cents"),
                      F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS))
                       .alias("salt"))
    partial = (salted.groupBy("event_type", "salt")
               .agg(F.count("*").alias("pn"), F.sum("cents").alias("psum"),
                    F.min("value").alias("pmin"), F.max("value").alias("pmax")))
    return (partial.groupBy("event_type")
            .agg(F.sum("pn").alias("n"),
                 F.round(F.sum("psum") / 1_000_000.0, 4).alias("value_sum"),
                 F.round(F.min("pmin"), 6).alias("value_min"),
                 F.round(F.max("pmax"), 6).alias("value_max")))


# ---------------------------------------------------------------------------
# q140 — small-file compaction planner: given the table's fragment
# manifest (here modeled as per-(event_type, day) byte totals of the
# events table), assign time-ordered fragments to target-size output
# files with the streaming first-fit rule file_id = floor(cumulative
# bytes before this fragment / TARGET). The output is the compaction
# PLAN — per planned output file: fragment count, byte total, covered
# time range — which a maintenance job executes as one read-shuffle-
# write per file.
#
# Scale (100 TB): this is a metadata-only query — at scale the input is
# the table manifest (one row per parquet fragment, ~1e6 rows for 100 TB
# at 128 MB files), not the data; building the manifest from raw rows
# here stands in for reading it. The plan itself is one window
# (cumulative sum per event_type, ordered by day — short, independent
# partitions) + one keyed agg. Oversized fragments (> TARGET) take a
# file_id range of their own and never block neighbors; ordering within
# a partition key is preserved so compacted files keep time locality
# (the property Z-order/skipping audits q91/q98 measure).
# ---------------------------------------------------------------------------
COMPACT_TARGET = 8192   # target output-file bytes (toy scale; 128 MB real)

@query("q140_compaction_plan", f"""
WITH frags AS (
  SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
         SUM(LENGTH(props) + 32) AS frag_bytes
  FROM events GROUP BY 1, 2),
placed AS (
  SELECT event_type, day, frag_bytes,
         COALESCE(SUM(frag_bytes) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM frags)
SELECT event_type,
       {{idiv}} AS file_id,
       COUNT(*) AS n_frags,
       CAST(SUM(frag_bytes) AS BIGINT) AS file_bytes,
       MIN(day) AS min_day, MAX(day) AS max_day
FROM placed
GROUP BY event_type, {{idiv}}
""".format(idiv=f"CAST((cum_before - cum_before % {COMPACT_TARGET})"
                 f" / {COMPACT_TARGET} AS BIGINT)"))
def q140_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    frags = (ev.groupBy("event_type",
                        F.to_date(F.date_trunc("day", "ts")).alias("day"))
               .agg(F.sum(F.length("props") + 32).alias("frag_bytes")))
    w = (W.partitionBy("event_type").orderBy("day")
          .rowsBetween(W.unboundedPreceding, -1))
    placed = frags.withColumn(
        "cum_before", F.coalesce(F.sum("frag_bytes").over(w), F.lit(0)))
    file_id = ((F.col("cum_before") - F.col("cum_before") % COMPACT_TARGET)
               / COMPACT_TARGET).cast("bigint")
    return (placed.groupBy("event_type", file_id.alias("file_id"))
                  .agg(F.count("*").alias("n_frags"),
                       F.sum("frag_bytes").alias("file_bytes"),
                       F.min("day").alias("min_day"),
                       F.max("day").alias("max_day")))
