"""Relational operator surface (SURVEY.md §2.2).

The reference implements none of these (it is a stateless streaming ETL,
/root/reference/src/main.rs:65-135); this module declares each category as
an idiomatic Catalyst plan over the fixture tables, one named query per
operator family, with a DuckDB oracle twin.

Scale notes (100 TB): every query here is a declarative plan — predicate
pushdown, column pruning, partial aggregation and join selection are left
to Catalyst/AQE. Dimension tables (region/nation/customer/supplier/part)
are explicitly broadcast where joined against fact tables so the fact side
never shuffles for the join; fact-fact joins shuffle on their join key
once. No collects, no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import load_table
from .helpers import davg, dsum, sql_davg, sql_dsum

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


# ---------------------------------------------------------------------------
# Aggregation: full hash-agg battery (TPC-H Q1 shape) — the flagship query.
# Map-side partial agg + 6-group final agg; scan reads only 7 of 11 columns
# and the shipdate predicate is pushed to parquet.
# ---------------------------------------------------------------------------
@query("q01_pricing_summary", f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(dsum(F.col("l_quantity")).alias("sum_qty"),
               dsum(F.col("l_extendedprice")).alias("sum_base_price"),
               dsum(disc_price).alias("sum_disc_price"),
               dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
               davg(F.col("l_quantity")).alias("avg_qty"),
               davg(F.col("l_extendedprice")).alias("avg_price"),
               davg(F.col("l_discount")).alias("avg_disc"),
               F.count("*").alias("count_order"))
    )


# ---------------------------------------------------------------------------
# Projection + filter + derived column (reference P1/S4 analog on fixtures).
# Row-level double arithmetic is deterministic; no rounding games needed.
# ---------------------------------------------------------------------------
@query("q02_filter_project", """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_quantity > 40 AS bulk
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
  AND l_shipdate >= TIMESTAMP '1996-01-01'
""")
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_discount").between(0.05, 0.07))
                 & (F.col("l_quantity") < 24)
                 & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")))
          .select("l_orderkey", "l_linenumber",
                  (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
                  (F.col("l_quantity") > 40).alias("bulk"))
    )


# ---------------------------------------------------------------------------
# Star join: fact ⋈ 3 broadcast dims. At 100 TB the orders fact never
# shuffles: region/nation/customer all ship to executors as broadcast
# hash tables (customer is the largest dim; still MBs at sf and GB-scale
# at 100 TB — below the 64 MB threshold it would auto-broadcast; the
# explicit hint documents intent).
# ---------------------------------------------------------------------------
@query("q03_star_join", f"""
SELECT r_name, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY r_name, o_orderpriority
""")
def q03_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .groupBy("r_name", "o_orderpriority")
         .agg(F.count("*").alias("n_orders"),
              dsum(F.col("o_totalprice")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Outer joins.
# ---------------------------------------------------------------------------
@query("q04_left_join", f"""
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
GROUP BY c_custkey, c_name
""")
def q04_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left")
         .groupBy("c_custkey", "c_name")
         .agg(F.count("o_orderkey").alias("n_orders"),
              dsum(F.col("o_totalprice")).alias("total_spend"))
    )


@query("q05_semi_join", """
SELECT p_partkey, p_brand, p_retailprice
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity >= 49)
""")
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
         .select("p_partkey", "p_brand", "p_retailprice")
    )


@query("q06_anti_join", """
SELECT p_partkey, p_name
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey
                    AND l_shipdate >= TIMESTAMP '2001-01-01')
""")
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp"))
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


@query("q07_full_outer_join", """
SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
      FROM supplier GROUP BY s_nationkey) s
ON c.nk = s.nk
""")
def q07_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
         .groupBy(F.col("c_nationkey").alias("nk"))
         .agg(F.count("*").alias("n_cust")))
    s = (t(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("nk"))
         .agg(F.count("*").alias("n_supp")))
    return (
        c.join(s, c.nk == s.nk, "full_outer")
         .select(F.coalesce(c.nk, s.nk).alias("nationkey"), "n_cust", "n_supp")
    )


@query("q08_cross_join", """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""")
def q08_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").select("r_name")
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


# ---------------------------------------------------------------------------
# Distinct aggregation (expand + two-phase agg in Spark).
# ---------------------------------------------------------------------------
@query("q09_distinct_agg", """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""")
def q09_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
         .agg(F.countDistinct("o_custkey").alias("n_customers"),
              F.countDistinct("o_orderstatus").alias("n_statuses"),
              F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Multi-dimensional aggregates: rollup / cube / grouping sets.
# Spark plans these as a single Expand + hash-agg — one shuffle, not one
# per grouping set.
# ---------------------------------------------------------------------------
@query("q10_rollup", f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS gid,
       {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
          .agg(F.grouping_id().alias("gid"),
               dsum(F.col("l_quantity")).alias("sum_qty"),
               F.count("*").alias("n"))
          .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@query("q11_cube", """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS gid,
       COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def q11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
         .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"))
         .select("o_orderstatus", "o_orderpriority", "gid", "n")
    )


@query("q12_grouping_sets", f"""
SELECT c_mktsegment, o_orderpriority,
       {sql_dsum('o_totalprice')} AS revenue, COUNT(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority))
""")
def q12_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        j.groupingSets([["c_mktsegment"], ["o_orderpriority"]],
                       "c_mktsegment", "o_orderpriority")
         .agg(dsum(F.col("o_totalprice")).alias("revenue"),
              F.count("*").alias("n"))
         .select("c_mktsegment", "o_orderpriority", "revenue", "n")
    )


# ---------------------------------------------------------------------------
# Window functions. Running sums are computed in frame order in BOTH
# engines, so plain double arithmetic is deterministic here; ties are
# broken by orderkey so frames are total-ordered.
# ---------------------------------------------------------------------------
@query("q13_window_running", """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""")
def q13_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2)
         .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@query("q14_topk_per_group", """
SELECT p_brand, p_partkey, p_retailprice, rk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part) WHERE rk <= 3
""")
def q14_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (p.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= 3)
             .select("p_brand", "p_partkey", "p_retailprice", "rk"))


@query("q15_lag_lead", """
WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT user_id, event_id, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       ROUND(value - COALESCE(LAG(value) OVER w, value), 2) AS delta
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q15_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagv = F.lag("value").over(w)
    return e.select(
        "user_id", "event_id", "value",
        lagv.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.coalesce(lagv, F.col("value")), 2).alias("delta"),
    )


@query("q16_rank_ntile", """
SELECT c_custkey, c_mktsegment,
       RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
       NTILE(4)     OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
""")
def q16_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    wv = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    wt = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_mktsegment",
        F.rank().over(wv).alias("rnk"),
        F.dense_rank().over(wv).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sort / limit (global top-k: Spark uses TakeOrderedAndProject — no full
# sort of the fact table even at 100 TB).
# ---------------------------------------------------------------------------
@query("q17_sort_limit", """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""")
def q17_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
             .select("o_orderkey", "o_totalprice", "o_orderdate").limit(10))


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------
@query("q18_union", """
SELECT c_custkey AS custkey, 'open' AS bucket
FROM customer JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
UNION ALL
SELECT c_custkey AS custkey, 'done' AS bucket
FROM customer JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
""")
def q18_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")

    def side(status: str, tag: str) -> DataFrame:
        return (c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == status))
                 .select(F.col("c_custkey").alias("custkey"), F.lit(tag).alias("bucket")))

    return side("O", "open").unionByName(side("F", "done"))


@query("q19_intersect", """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""")
def q19_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query("q20_except", """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
""")
def q20_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)  # EXCEPT (distinct set semantics), matching the oracle


# ---------------------------------------------------------------------------
# Pivot (Spark .pivot with explicit value list — no extra pass to discover
# values; oracle is the CASE-WHEN expansion).
# ---------------------------------------------------------------------------
@query("q21_pivot", f"""
SELECT l_returnflag,
       {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
       {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
FROM lineitem GROUP BY l_returnflag
""")
def q21_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .pivot("l_linestatus", ["O", "F"])
          .agg(dsum(F.col("l_quantity")))
          .withColumnRenamed("O", "qty_O")
          .withColumnRenamed("F", "qty_F")
    )
