"""As-of join and range join — operators Spark lacks natively
(SURVEY.md §2.2 'Joins': "range/as-of: non-equi join condition or Window
lag over union").

Both are implemented as compositions of built-in ops (preference order (a)
from the north star), NOT as naive non-equi joins:

* as-of: a naive `t2.ts <= t1.ts` theta-join is O(n·m) BroadcastNestedLoop
  — unusable at 100 TB. The union-merge pattern used here is one shuffle
  on the key + one sort: union both sides tagged, sort by (key, ts), carry
  the last right-side payload forward with last(ignorenulls) — linear work
  per partition, the same algorithm a native as-of join (pandas
  merge_asof, QuestDB ASOF) runs, expressed as a Catalyst window plan.

* range join: bucketize the time axis to the range width, equi-join on
  (key, bucket) with the left side exploded to the two candidate buckets,
  then re-filter exactly. Turns an O(n·m) theta join into a co-located
  hash join — the standard interval-bucketing trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
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


# For each 'error' event: the most recent 'purchase' by the same user at or
# before the error (classic as-of). Tie-break: latest event_id.
@query("q28_asof_join", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT e.user_id, e.event_id AS error_id, e.ts AS error_ts,
       (SELECT p.event_id FROM ev p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.ts <= e.ts
        ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS last_purchase_id,
       (SELECT p.value FROM ev p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.ts <= e.ts
        ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS last_purchase_value
FROM ev e WHERE e.event_type = 'error'
""")
def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error")
    purchases = e.where(F.col("event_type") == "purchase")

    # Tag and union: purchases sort before errors at equal ts (side=0 < 1)
    # so an equal-timestamp purchase is visible to the error row (ts <= ts).
    left = errors.select("user_id", "ts", "event_id",
                         F.lit(1).alias("side"),
                         F.lit(None).cast("struct<event_id:bigint,value:double>")
                          .alias("r_payload"))
    right = purchases.select("user_id", "ts", "event_id",
                             F.lit(0).alias("side"),
                             F.struct(F.col("event_id"), F.col("value"))
                              .alias("r_payload"))
    merged = left.unionByName(right)

    w = (W.partitionBy("user_id")
          .orderBy("ts", "side", "event_id")
          .rowsBetween(W.unboundedPreceding, 0))
    carried = merged.withColumn(
        "last_purchase", F.last("r_payload", ignorenulls=True).over(w))
    return (
        carried.where(F.col("side") == 1)
               .select("user_id",
                       F.col("event_id").alias("error_id"),
                       F.col("ts").alias("error_ts"),
                       F.col("last_purchase.event_id").alias("last_purchase_id"),
                       F.col("last_purchase.value").alias("last_purchase_value"))
    )


# Pairs of events by the same user within (0, 10 min] of each other,
# aggregated per user. DuckDB plans the oracle as an IEJoin; Spark gets the
# bucket-join rewrite.
@query("q29_range_join", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT a.user_id, COUNT(*) AS n_pairs,
       MIN(b.event_id - a.event_id) AS min_id_gap
FROM ev a JOIN ev b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.user_id
""")
def q29_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    width_us = 10 * 60 * 1_000_000
    a = e.select("user_id", F.col("ts").alias("a_ts"), F.col("event_id").alias("a_id"),
                 F.floor(F.unix_micros("ts") / width_us).alias("bucket"))
    # left row can match right rows in its own bucket or the next one
    a = a.withColumn("jb", F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)))
    b = e.select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"),
                 F.col("event_id").alias("b_id"),
                 F.floor(F.unix_micros("ts") / width_us).alias("b_jb"))
    # equi-join on BOTH (user, bucket) so the shuffle co-locates by user and
    # time neighborhood — no single-bucket hot partition.
    pairs = (
        a.join(b, (F.col("user_id") == F.col("b_user")) & (F.col("jb") == F.col("b_jb")),
               "inner")
         .where((F.col("b_ts") > F.col("a_ts"))
                & (F.unix_micros("b_ts") - F.unix_micros("a_ts") <= width_us))
    )
    return (pairs.groupBy("user_id")
                 .agg(F.count("*").alias("n_pairs"),
                      F.min(F.col("b_id") - F.col("a_id")).alias("min_id_gap")))


# ---------------------------------------------------------------------------
# q103 — interval overlap join: two interval sets (order fulfilment
# windows), all pairs that overlap in time. A naive a.start < b.end AND
# b.start < a.end theta join is O(n·m); the rewrite explodes each
# interval to the W-day buckets it covers and equi-joins on the bucket,
# so only time-co-located intervals meet — the q29 trick generalized
# from points to intervals. Pairs found in several shared buckets
# dedup with one DISTINCT on the pair key.
# ---------------------------------------------------------------------------
IV_W = 10   # bucket width (days) >= max interval width -> <=2 buckets/interval

@query("q103_interval_overlap", """
WITH a AS (
  SELECT o_orderkey AS a_key, CAST(o_orderdate AS DATE) AS a_start,
         CAST(o_orderdate AS DATE) + 7 AS a_end
  FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 20 = 0),
b AS (
  SELECT o_orderkey AS b_key, CAST(o_orderdate AS DATE) AS b_start,
         CAST(o_orderdate AS DATE) + 10 AS b_end
  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 30 = 0)
SELECT a_key, b_key,
       DATE_DIFF('day', GREATEST(a_start, b_start),
                 LEAST(a_end, b_end)) AS overlap_days
FROM a JOIN b ON a_start < b_end AND b_start < a_end
""")
def q103_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    a = (o.where((F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 20 == 0))
         .select(F.col("o_orderkey").alias("a_key"),
                 day.alias("a_start"), (day + 7).alias("a_end")))
    b = (o.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 30 == 0))
         .select(F.col("o_orderkey").alias("b_key"),
                 day.alias("b_start"), (day + 10).alias("b_end")))

    def buckets(start, end):
        return F.sequence(F.floor(start / IV_W), F.floor((end - 1) / IV_W))

    ab = a.withColumn("bk", F.explode(buckets(F.col("a_start"), F.col("a_end"))))
    bb = b.withColumn("bk", F.explode(buckets(F.col("b_start"), F.col("b_end"))))
    pairs = (ab.join(bb, "bk")
             .where((F.col("a_start") < F.col("b_end"))
                    & (F.col("b_start") < F.col("a_end")))
             .select("a_key", "b_key", "a_start", "a_end", "b_start", "b_end")
             .distinct())
    return pairs.select(
        "a_key", "b_key",
        (F.least("a_end", "b_end") - F.greatest("a_start", "b_start"))
          .alias("overlap_days"))


# ---------------------------------------------------------------------------
# q104 — forward as-of: for each error, the NEXT purchase at-or-after
# it (merge_asof direction='forward'). Same union-merge shape as q28
# with the carry reversed: first(ignorenulls) over the FOLLOWING frame;
# at equal ts the error sorts before the purchase (side 0 < 1) so an
# equal-timestamp purchase is visible, and (ts, side, event_id) makes
# the earliest qualifying purchase the deterministic winner.
# ---------------------------------------------------------------------------
@query("q104_asof_forward", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT e.user_id, e.event_id AS error_id, e.ts AS error_ts,
       (SELECT p.event_id FROM ev p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.ts >= e.ts
        ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_purchase_id,
       (SELECT p.value FROM ev p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.ts >= e.ts
        ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_purchase_value
FROM ev e WHERE e.event_type = 'error'
""")
def q104_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error")
    purchases = e.where(F.col("event_type") == "purchase")
    left = errors.select("user_id", "ts", "event_id",
                         F.lit(0).alias("side"),
                         F.lit(None).cast("struct<event_id:bigint,value:double>")
                          .alias("r_payload"))
    right = purchases.select("user_id", "ts", "event_id",
                             F.lit(1).alias("side"),
                             F.struct(F.col("event_id"), F.col("value"))
                              .alias("r_payload"))
    merged = left.unionByName(right)
    w = (W.partitionBy("user_id")
          .orderBy("ts", "side", "event_id")
          .rowsBetween(0, W.unboundedFollowing))
    carried = merged.withColumn(
        "next_purchase", F.first("r_payload", ignorenulls=True).over(w))
    return (carried.where(F.col("side") == 0)
            .select("user_id",
                    F.col("event_id").alias("error_id"),
                    F.col("ts").alias("error_ts"),
                    F.col("next_purchase.event_id").alias("next_purchase_id"),
                    F.col("next_purchase.value").alias("next_purchase_value")))


# ---------------------------------------------------------------------------
# q113 — nearest as-of with tolerance (merge_asof direction='nearest',
# tolerance=5min): for each error, the purchase minimizing |Δt| within
# ±5 minutes; ties at equal distance resolve backward (then q28/q104's
# per-side id tie-breaks). ONE union-merge shuffle serves both
# directions: with sort (ts, side=purchase:0|error:1, event_id), the
# backward carry is last(ignorenulls) over the preceding frame (equal-
# ts purchases sort before the error, so Δt=0 lands backward) and the
# forward carry is first(ignorenulls) over the following frame (which
# therefore sees strictly-later purchases only) — two window passes
# over one sorted partition, no second shuffle, no theta join.
# ---------------------------------------------------------------------------
ASOF_TOL_US = 5 * 60 * 1_000_000


@query("q113_asof_nearest", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
cand AS (
  SELECT e.user_id, e.event_id AS error_id, e.ts AS error_ts,
    (SELECT p.event_id FROM ev p
     WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 5 MINUTE
     ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS back_id,
    (SELECT p.ts FROM ev p
     WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 5 MINUTE
     ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS back_ts,
    (SELECT p.event_id FROM ev p
     WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 5 MINUTE
     ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS fwd_id,
    (SELECT p.ts FROM ev p
     WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
       AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 5 MINUTE
     ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS fwd_ts
  FROM ev e WHERE e.event_type = 'error')
SELECT user_id, error_id, error_ts,
  CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL
            OR EPOCH_US(error_ts) - EPOCH_US(back_ts)
               <= EPOCH_US(fwd_ts) - EPOCH_US(error_ts))
       THEN back_id ELSE fwd_id END AS nearest_purchase_id,
  CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL
            OR EPOCH_US(error_ts) - EPOCH_US(back_ts)
               <= EPOCH_US(fwd_ts) - EPOCH_US(error_ts))
       THEN EPOCH_US(back_ts) - EPOCH_US(error_ts)
       WHEN fwd_id IS NOT NULL
       THEN EPOCH_US(fwd_ts) - EPOCH_US(error_ts)
       ELSE NULL END AS dt_us,
  CASE WHEN back_id IS NOT NULL AND (fwd_id IS NULL
            OR EPOCH_US(error_ts) - EPOCH_US(back_ts)
               <= EPOCH_US(fwd_ts) - EPOCH_US(error_ts))
       THEN 'back' WHEN fwd_id IS NOT NULL THEN 'fwd'
       ELSE NULL END AS direction
FROM cand
""")
def q113_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error")
    purchases = e.where(F.col("event_type") == "purchase")
    payload = F.struct(F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
    left = errors.select("user_id", "ts", "event_id",
                         F.lit(1).alias("side"),
                         F.lit(None).cast("struct<p_ts:timestamp,p_id:bigint>")
                          .alias("r_payload"))
    right = purchases.select("user_id", "ts", "event_id",
                             F.lit(0).alias("side"),
                             payload.alias("r_payload"))
    merged = left.unionByName(right)
    order = [F.col("ts"), F.col("side"), F.col("event_id")]
    wb = (W.partitionBy("user_id").orderBy(*order)
           .rowsBetween(W.unboundedPreceding, 0))
    wf = (W.partitionBy("user_id").orderBy(*order)
           .rowsBetween(0, W.unboundedFollowing))
    carried = (merged
               .withColumn("back", F.last("r_payload", ignorenulls=True).over(wb))
               .withColumn("fwd", F.first("r_payload", ignorenulls=True).over(wf))
               .where(F.col("side") == 1))
    e_us = F.unix_micros("ts")
    back_dt = e_us - F.unix_micros("back.p_ts")
    fwd_dt = F.unix_micros("fwd.p_ts") - e_us
    back_ok = F.col("back").isNotNull() & (back_dt <= ASOF_TOL_US)
    fwd_ok = F.col("fwd").isNotNull() & (fwd_dt <= ASOF_TOL_US)
    pick_back = back_ok & (~fwd_ok | (back_dt <= fwd_dt))
    return carried.select(
        "user_id", F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        F.when(pick_back, F.col("back.p_id"))
         .when(fwd_ok, F.col("fwd.p_id")).alias("nearest_purchase_id"),
        F.when(pick_back, -back_dt).when(fwd_ok, fwd_dt)
         .cast("bigint").alias("dt_us"),
        F.when(pick_back, "back").when(fwd_ok, "fwd").alias("direction"))
