"""Partitioning & skew utilities for cluster-scale layouts (SCALE.md).

These are thin, testable wrappers that make the 100 TB layout decisions
explicit at call sites instead of buried in configs:

* co_partition     — hash-partition two frames identically before a
                     repeated join key is used across stages
* salted_join      — the classic hot-key mitigation: salt the skewed
                     side N ways, explode the small side N ways
* write_partitioned— date/key-partitioned parquet lake layout
* write_bucketed   — bucketed table so later equi-joins on the key
                     co-locate without a shuffle
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_partition(a: DataFrame, b: DataFrame, key: str,
                 num_partitions: int) -> tuple[DataFrame, DataFrame]:
    """Identically hash-partition both sides on `key` so every later
    join/agg on that key reuses one shuffle."""
    return (a.repartition(num_partitions, key),
            b.repartition(num_partitions, key))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join with a salted key: the skewed big side gets a random salt in
    [0, n_salts), the small side is exploded across all salts, and the
    join key becomes (key, salt) — a hot key spreads over n_salts
    partitions. AQE's skew-join split handles moderate skew
    automatically; salting is for the pathological single-key case.

    The salt is data-independent randomness — it changes physical
    placement, never results.
    """
    salted_big = big.withColumn("__salt", (F.rand() * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


# Storage-layout writers live in sources/layout.py (partition pruning,
# bucketed joins, compaction, interchange formats — plan-asserted in
# tests/test_layout.py); re-exported here for callers thinking in
# partitioning terms.
from ..sources.layout import write_bucketed, write_partitioned  # noqa: E402,F401


def partition_histogram(df: DataFrame) -> DataFrame:
    """Skew instrumentation: rows per physical partition. Returns a tiny
    (partition_id, n_rows) frame — run it on a keyed repartition to see
    whether a hot key concentrated rows before committing to salting."""
    return (df.withColumn("__pid", F.spark_partition_id())
              .groupBy("__pid").count()
              .select(F.col("__pid").alias("partition_id"),
                      F.col("count").alias("n_rows")))


def skew_ratio(df: DataFrame) -> float:
    """max/mean rows-per-partition — 1.0 is perfectly even; >> 1 means a
    hot partition (salt the key or let AQE split it)."""
    rows = [r.n_rows for r in partition_histogram(df).collect()]
    if not rows:
        return 1.0
    return max(rows) / (sum(rows) / len(rows))
