"""Behavioral analytics over the events stream: ordered funnels and
cohort retention (north-star extension; the warehouse queries every
event pipeline ends up needing).

Scale notes (100 TB):
* funnel — three map-side-combinable conditional-min groupBys on
  user_id (uniform key), each stage joined back per user. The stage
  frames shrink monotonically (stage N+1 joins stage N's survivors),
  and per-user aggregates are tiny relative to the event log — Spark
  broadcasts them when small enough, AQE decides. No window over the
  full log, no per-event state.
* cohort retention — first-touch groupBy on user_id, then a distinct
  (user, week) projection joined to the cohort map; the final
  (cohort, offset) matrix is O(weeks²) rows. The distinct is the only
  big shuffle, keyed uniformly.

Both oracled against DuckDB on identical SQL semantics (week
truncation is Monday-start in both engines; offsets are exact
multiples of 7 days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .helpers import exact_tdiv

QUERIES: dict = {}
ORACLES: dict = {}

FUNNEL = ("view", "click", "purchase")   # ordered stages


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


SQL_EV = "SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events"


# ---------------------------------------------------------------------------
# q83 — ordered funnel: users progressing view -> click -> purchase in
# strict timestamp order (each stage's first event must follow the
# previous stage's first event). Output: one row per stage with the
# surviving user count and conversion from the previous stage.
# ---------------------------------------------------------------------------
@query("q83_funnel", f"""
WITH ev AS ({SQL_EV}),
s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
       WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e JOIN s1 USING (user_id)
       WHERE e.event_type = '{FUNNEL[1]}' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e JOIN s2 USING (user_id)
       WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > s2.t2 GROUP BY e.user_id),
counts AS (
  SELECT 1 AS stage_n, '{FUNNEL[0]}' AS stage, COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, '{FUNNEL[1]}', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, '{FUNNEL[2]}', COUNT(*) FROM s3)
SELECT stage_n, stage, n_users,
       ROUND(n_users / CAST(FIRST_VALUE(n_users) OVER (ORDER BY stage_n) AS DOUBLE), 4)
         AS pct_of_entry
FROM counts
""")
def q83_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (ev.where(F.col("event_type") == FUNNEL[0])
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.where(F.col("event_type") == FUNNEL[1])
          .join(s1, "user_id")
          .where(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.where(F.col("event_type") == FUNNEL[2])
          .join(s2, "user_id")
          .where(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    counts = None
    for n, (stage, frame) in enumerate(zip(FUNNEL, (s1, s2, s3)), start=1):
        row = frame.agg(F.count("*").alias("n_users")).select(
            F.lit(n).alias("stage_n"), F.lit(stage).alias("stage"), "n_users")
        counts = row if counts is None else counts.unionByName(row)
    from pyspark.sql import Window as W
    # global window is safe here: `counts` is exactly len(FUNNEL) rows
    # by construction (one per stage), so the single-partition WindowExec
    # the WARN flags holds 3 rows at any corpus size
    w = W.orderBy("stage_n").rowsBetween(W.unboundedPreceding, W.currentRow)
    entry = F.first("n_users").over(w)
    return counts.select(
        "stage_n", "stage", "n_users",
        F.round(F.col("n_users") / entry.cast("double"), 4)
         .alias("pct_of_entry"))


# ---------------------------------------------------------------------------
# q84 — cohort retention: users grouped by first-event week; for each
# (cohort, week-offset), the share of the cohort active that week.
# ---------------------------------------------------------------------------
@query("q84_cohort_retention", f"""
WITH ev AS ({SQL_EV}),
first_touch AS (
  SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
  FROM ev GROUP BY user_id),
cohort_sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size
  FROM first_touch GROUP BY cohort_week),
activity AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS active_week
  FROM ev),
ret AS (
  SELECT f.cohort_week,
         CAST((DATE_DIFF('day', f.cohort_week, a.active_week)
               - DATE_DIFF('day', f.cohort_week, a.active_week) % 7) / 7
              AS BIGINT) AS week_offset,
         COUNT(*) AS n_active
  FROM activity a JOIN first_touch f USING (user_id)
  GROUP BY f.cohort_week, week_offset)
SELECT r.cohort_week, r.week_offset, r.n_active,
       ROUND(r.n_active / CAST(c.cohort_size AS DOUBLE), 4) AS retention
FROM ret r JOIN cohort_sizes c USING (cohort_week)
""")
def q84_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_touch = (ev.groupBy("user_id")
                   .agg(F.date_trunc("week", F.min("ts")).cast("date")
                        .alias("cohort_week")))
    cohort_sizes = (first_touch.groupBy("cohort_week")
                    .agg(F.count("*").alias("cohort_size")))
    activity = (ev.select("user_id",
                          F.date_trunc("week", "ts").cast("date")
                           .alias("active_week"))
                .distinct())
    ret = (activity.join(first_touch, "user_id")
           .select("cohort_week",
                   F.floor(F.datediff("active_week", "cohort_week") / 7)
                    .alias("week_offset"))
           .groupBy("cohort_week", "week_offset")
           .agg(F.count("*").alias("n_active")))
    return (ret.join(F.broadcast(cohort_sizes), "cohort_week")
            .select("cohort_week", "week_offset", "n_active",
                    F.round(F.col("n_active")
                            / F.col("cohort_size").cast("double"), 4)
                     .alias("retention")))


# ---------------------------------------------------------------------------
# q118 — event transition matrix: per (prev_event_type, event_type)
# bigram counts over each user's time-ordered event sequence, with the
# row-conditional probability in integer ppm — the first-order Markov
# view of user behavior (feeds next-event prediction and funnel
# diagnostics). Deterministic ordering: (ts, event_id) is unique.
#
# Scale: one shuffle on user_id for the lag window (sequences are
# per-user, so the sort is partition-local), then a map-side-
# combinable count on the bounded (type x type) key space; the ppm
# join-back broadcasts row totals sized |event types|.
# ---------------------------------------------------------------------------
@query("q118_transition_matrix", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM ev),
pairs AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
rowtot AS (SELECT prev_type, SUM(n) AS tot FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.event_type, p.n,
       CAST((p.n * 1000000 - (p.n * 1000000) % r.tot) / r.tot AS BIGINT)
         AS p_ppm
FROM pairs p JOIN rowtot r ON p.prev_type = r.prev_type
""")
def q118_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lag("event_type").over(w).alias("prev_type"))
    pairs = (seq.where(F.col("prev_type").isNotNull())
             .groupBy("prev_type", "event_type")
             .agg(F.count("*").alias("n")))
    rowtot = pairs.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    # DECIMAL(38,0) BEFORE the *1e6: a bigint product wraps past
    # n ~ 9.2e12 transitions per prev_type (the q110 lesson)
    num = F.col("n").cast("decimal(38,0)") * 1_000_000
    return (pairs.join(F.broadcast(rowtot), "prev_type")
            .select("prev_type", "event_type", "n",
                    exact_tdiv(num, F.col("tot")).alias("p_ppm")))


# ---------------------------------------------------------------------------
# q131 — event dedup within a time window: keep an event only if the
# PREVIOUS event of the same (user_id, event_type) is more than
# DEDUP_GAP_S seconds older (or absent) — the batch twin of streaming
# dropDuplicatesWithinWatermark (streaming/candles.py:77), expressed as
# one LAG over the (user, type) sequence. Reports per-type kept/dropped
# so the result is a compact audit, not a re-emitted event log.
#
# Note the semantic: the fence is against the previous RAW event (a
# sliding window), not the previous KEPT one — the iterative "reset on
# keep" variant is inherently sequential; this formulation is the one
# that parallelizes (pure window function, no cross-row recursion) and
# matches what dropDuplicatesWithinWatermark does with state TTL.
#
# Scale: one shuffle on (user_id, event_type) for the lag window —
# uniform keys; the final per-type agg is map-side combinable over a
# bounded key space.
# ---------------------------------------------------------------------------
DEDUP_GAP_S = 300

@query("q131_event_dedup_window", f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
seq AS (
  SELECT event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM ev),
flagged AS (
  SELECT event_type,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > {DEDUP_GAP_S}
              THEN 1 ELSE 0 END AS keep
  FROM seq)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_dropped
FROM flagged GROUP BY event_type
""")
def q131_event_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select("event_type", "ts", F.lag("ts").over(w).alias("prev_ts"))
    keep = F.when(
        F.col("prev_ts").isNull()
        | (F.col("ts").cast("long") - F.col("prev_ts").cast("long")
           > DEDUP_GAP_S), 1).otherwise(0)
    return (seq.select("event_type", keep.alias("keep"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("keep").alias("n_kept"),
                 (F.count("*") - F.sum("keep")).alias("n_dropped")))


# ---------------------------------------------------------------------------
# q133 — k-anonymity audit over event quasi-identifiers: bucket every
# event into its QI class (event_type, hour-of-day, coarse value
# bucket) and report, per event_type, how many QI classes and events
# fall below the k=5 anonymity floor — the release-gate number for
# exporting behavioral data into a training corpus. Integer-only
# (counts + a ppm via the q110 DECIMAL pattern) — no rounding hazards.
#
# Scale: one map-side-combinable groupBy on the bounded QI space
# (types x 24 hours x value buckets), then a per-type rollup over that
# tiny frame. No joins against the raw log; no per-user state.
# ---------------------------------------------------------------------------
K_ANON = 5

@query("q133_k_anonymity", f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
qi AS (
  SELECT event_type,
         EXTRACT(hour FROM ts) AS hour_of_day,
         CAST(FLOOR(value / 50) AS BIGINT) AS value_bucket,
         COUNT(*) AS class_size
  FROM ev GROUP BY 1, 2, 3),
per_type AS (
  SELECT event_type,
         COUNT(*) AS n_classes,
         CAST(SUM(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_small_classes,
         CAST(SUM(class_size) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN class_size < {K_ANON} THEN class_size ELSE 0 END)
           AS BIGINT) AS n_risky_events
  FROM qi GROUP BY event_type)
SELECT event_type, n_classes, n_small_classes, n_events, n_risky_events,
       CAST((CAST(n_risky_events AS DECIMAL(38,0)) * 1000000
             - (CAST(n_risky_events AS DECIMAL(38,0)) * 1000000) % n_events)
            / n_events AS BIGINT) AS risky_ppm
FROM per_type
""")
def q133_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    qi = (ev.select("event_type",
                    F.hour("ts").alias("hour_of_day"),
                    F.floor(F.col("value") / 50).cast("bigint")
                        .alias("value_bucket"))
          .groupBy("event_type", "hour_of_day", "value_bucket")
          .agg(F.count("*").alias("class_size")))
    small = F.when(F.col("class_size") < K_ANON, 1).otherwise(0)
    risky = F.when(F.col("class_size") < K_ANON,
                   F.col("class_size")).otherwise(0)
    per_type = (qi.groupBy("event_type")
                .agg(F.count("*").alias("n_classes"),
                     F.sum(small).alias("n_small_classes"),
                     F.sum("class_size").alias("n_events"),
                     F.sum(risky).alias("n_risky_events")))
    num = F.col("n_risky_events").cast("decimal(38,0)") * 1_000_000
    return per_type.select(
        "event_type", "n_classes", "n_small_classes", "n_events",
        "n_risky_events",
        ((num - num % F.col("n_events")) / F.col("n_events"))
            .cast("bigint").alias("risky_ppm"))


# ---------------------------------------------------------------------------
# q137 — event-time lateness audit: how out-of-order does each event
# stream actually arrive? Arrival order = event_id (the ingest
# sequence); an event is LATE by (running-max event time seen before
# it) - (its own event time). Reports, per type, the late count at the
# 5-minute threshold and the max/avg observed lateness — exactly the
# numbers that size `withWatermark` for the streaming candle/session
# queries (too small drops data, too large bloats state).
#
# Integer seconds end-to-end: Spark's timestamp->long cast TRUNCATES
# while DuckDB's double->bigint cast ROUNDS, so the oracle wraps
# EPOCH in an explicit FLOOR — sub-second timestamps would otherwise
# skew lateness by +-1 s between engines. The avg uses integer
# ppm-style floor division.
#
# Scale: one window per type ordered by arrival (uniform bounded key),
# then a map-side-combinable rollup. No joins.
# ---------------------------------------------------------------------------
LATE_THRESHOLD_S = 300

@query("q137_lateness_audit", f"""
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
seq AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t,
         MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS seen_max
  FROM ev),
lat AS (
  SELECT event_type,
         CASE WHEN seen_max IS NULL OR seen_max <= t THEN 0
              ELSE seen_max - t END AS late_s
  FROM seq)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_out_of_order,
       CAST(SUM(CASE WHEN late_s > {LATE_THRESHOLD_S} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_beyond_watermark,
       MAX(late_s) AS max_late_s,
       CAST((SUM(late_s) - SUM(late_s) % COUNT(*)) / COUNT(*) AS BIGINT)
         AS avg_late_s_floor
FROM lat GROUP BY event_type
""")
def q137_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("event_type").orderBy("event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    t = F.col("ts").cast("long")
    seq = ev.select("event_type", t.alias("t"),
                    F.max(t).over(w).alias("seen_max"))
    late = F.when(F.col("seen_max").isNull()
                  | (F.col("seen_max") <= F.col("t")), 0) \
            .otherwise(F.col("seen_max") - F.col("t"))
    lat = seq.select("event_type", late.alias("late_s"))
    n = F.count("*")
    tot = F.sum("late_s")
    return (lat.groupBy("event_type")
            .agg(n.alias("n_events"),
                 F.sum(F.when(F.col("late_s") > 0, 1).otherwise(0))
                    .alias("n_out_of_order"),
                 F.sum(F.when(F.col("late_s") > LATE_THRESHOLD_S, 1)
                       .otherwise(0)).alias("n_beyond_watermark"),
                 F.max("late_s").alias("max_late_s"),
                 exact_tdiv(tot, n).alias("avg_late_s_floor")))


# ---------------------------------------------------------------------------
# q153 — turn-alternation audit (SFT/dialogue data validation): treat a
# user's event stream as a conversation transcript and audit the
# structural rules instruction-tuning pipelines enforce before
# training: no two consecutive turns by the same role (event_type),
# which role opens and closes, and a per-dialogue validity flag. The
# standard multi-turn SFT ingest gate, expressed as one LAG pass.
#
# Determinism: turns are ordered by (ts, event_id) — a total order —
# so LAG sees identical predecessors in both engines.
#
# Scale: one shuffle keyed on user_id (the dialogue id; uniform), a
# single window pass, then a map-side-combinable per-user aggregate.
# No joins, no second corpus pass.
# ---------------------------------------------------------------------------
@query("q153_turn_alternation", f"""
WITH ev AS ({SQL_EV}),
seq AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_turns
  FROM ev)
SELECT user_id,
       CAST(MAX(n_turns) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN prev_type IS NOT NULL
                      AND prev_type = event_type
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       MAX(CASE WHEN rn = 1 THEN event_type END) AS opening_role,
       MAX(CASE WHEN rn = n_turns THEN event_type END) AS closing_role,
       SUM(CASE WHEN prev_type IS NOT NULL
                 AND prev_type = event_type
                THEN 1 ELSE 0 END) = 0 AS valid
FROM seq GROUP BY user_id
""")
def q153_turn_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wall = W.partitionBy("user_id")
    seq = ev.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wall).alias("n_turns"))
    viol = F.when(F.col("prev_type").isNotNull()
                  & (F.col("prev_type") == F.col("event_type")), 1) \
            .otherwise(0)
    return (seq.groupBy("user_id")
            .agg(F.max("n_turns").cast("bigint").alias("n_turns"),
                 F.sum(viol).cast("bigint").alias("n_violations"),
                 F.max(F.when(F.col("rn") == 1, F.col("event_type")))
                  .alias("opening_role"),
                 F.max(F.when(F.col("rn") == F.col("n_turns"),
                              F.col("event_type"))).alias("closing_role"),
                 (F.sum(viol) == 0).alias("valid")))
