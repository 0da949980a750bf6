"""Storage-layout plan assertions: partition pruning actually prunes,
bucketed joins actually skip the exchange, compaction actually merges
files, and text formats round-trip values exactly."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.sources import layout

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_partition_pruning(spark, tmp_path):
    lake = str(tmp_path / "events_lake")
    ev = load_table(spark, SF, "events")
    layout.write_partitioned(ev, lake, "event_type")
    back = layout.read_partitioned(spark, lake)

    one_type = back.select("event_type").distinct().limit(1).collect()[0][0]
    q = back.where(F.col("event_type") == one_type)
    p = plan_of(q)
    assert "PartitionFilters" in p and "event_type" in p.split(
        "PartitionFilters")[1].split("]")[0]
    # pruned scan must match a plain filtered read, row for row
    want = ev.where(F.col("event_type") == one_type).count()
    assert q.count() == want
    # partition column values survive the directory round-trip
    got_types = {r[0] for r in back.select("event_type").distinct().collect()}
    want_types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert got_types == want_types


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    layout.write_bucketed(orders, "bkt_orders", "o_orderkey", 4)
    layout.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem", "o_orderkey", 4)
    # disable broadcast so the plan must rely on the bucketing (a
    # broadcast join would hide the shuffle question entirely)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_orders").join(spark.table("bkt_lineitem"),
                                           "o_orderkey")
        p = plan_of(j)
        assert "SortMergeJoin" in p, p
        assert "Exchange hashpartitioning" not in p, p
        # same cardinality as the unbucketed join
        want = orders.join(li.withColumnRenamed("l_orderkey", "o_orderkey"),
                           "o_orderkey").count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("bkt_orders", "bkt_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compaction_merges_files(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    nation = load_table(spark, SF, "nation")
    nation.repartition(16).write.parquet(src)
    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_before > 2
    layout.compact(spark, src, 2)
    out = src + "__compacted"
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after == 2
    assert (spark.read.parquet(out).count() == nation.count())


@pytest.mark.parametrize("fmt", layout.TEXT_FORMATS)
def test_format_round_trip(spark, tmp_path, fmt):
    path = str(tmp_path / f"nation_{fmt}")
    nation = load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    layout.write_as(nation, fmt, path)
    schema = None if fmt == "orc" else \
        "n_nationkey bigint, n_name string, n_regionkey bigint"
    back = layout.read_as(spark, fmt, path, schema)
    want = sorted(map(tuple, nation.collect()))
    got = sorted(map(tuple, back.select(*nation.columns).collect()))
    assert got == want


def test_schema_on_read_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError):
        layout.read_as(spark, "csv", str(tmp_path))


def test_query_registry_names_match_keys():
    """The @query decorator registers whatever function it directly
    precedes — a helper inserted between decorator and def silently
    REPLACES the query (bit three times across r7/r8). Every registered
    callable's __name__ must equal its registry key, and every oracle
    key must have a query."""
    import __spark_entry__ as ent

    qs = ent.queries()
    mismatched = [(k, fn.__name__) for k, fn in qs.items()
                  if fn.__name__ != k]
    assert mismatched == []
    assert set(ent.oracle_sql()) <= set(qs)
