"""Streaming histogram gate (streaming/histgate.py): bucket partials
summed over an arbitrary 3-way batching must equal the one-shot
bucket vector, hence quantile reads equal batch q172's sketch columns
row-for-row; replaying a partial must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.stats import (
    hist_buckets,
    hist_quantiles,
)
from oanda_stream_processor_spark.streaming.histgate import (
    batch_buckets,
    read_buckets,
    read_quantiles,
    start_hist_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_way_batching_matches_one_shot_buckets(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    one_shot = _table(hist_buckets(li))
    parts = [batch_buckets(li.where(F.col("l_orderkey") % 3 == i))
             for i in range(3)]
    merged = (parts[0].unionByName(parts[1]).unionByName(parts[2])
              .groupBy("bucket").agg(F.sum("n").alias("n")))
    assert _table(merged) == one_shot
    assert len(one_shot) > 0


def test_quantile_reads_match_batch_sketch(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem")
    state = str(tmp_path / "state")
    for i in range(3):
        (batch_buckets(li.where(F.col("l_orderkey") % 3 == i))
         .write.mode("overwrite").parquet(f"{state}/batch_id={i}"))
    streamed = _table(read_quantiles(spark, state))
    batch = _table(hist_quantiles(hist_buckets(li)))
    assert streamed == batch
    assert len(batch) == 3  # one row per target percentile

    # replay batch 1: overwrite-by-partition never double-counts
    (batch_buckets(li.where(F.col("l_orderkey") % 3 == 1))
     .write.mode("overwrite").parquet(f"{state}/batch_id=1"))
    assert _table(read_quantiles(spark, state)) == batch


def test_stream_end_to_end(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice")
    src = tmp_path / "li"
    src.mkdir()
    li.where("l_orderkey % 2 = 0").coalesce(1).write.json(str(src / "f1"))
    li.where("l_orderkey % 2 = 1").coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream
              .schema("l_orderkey bigint, l_extendedprice double")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))

    state = str(tmp_path / "state")
    q = start_hist_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    streamed = _table(read_quantiles(spark, state))
    assert streamed == _table(hist_quantiles(hist_buckets(li)))
    # bucket totals account for every row
    total = read_buckets(spark, state).agg(F.sum("n").alias("t")).collect()
    assert total[0].t == li.count()


def test_exact_kth_skew_refinement_and_point_mass(spark, monkeypatch):
    """r11 ADVICE: out-of-domain values clamp into the edge buckets, so
    the exact-kth reducer used to see a near-global candidate set.  The
    sub-histogram refinement and the constant-extent short-circuit must
    both return the true order statistics anyway.  KTH_REFINE_CUT is
    patched below the fixture size so the REFINED path (not the direct
    window) is what's exercised; the direct path is covered by the
    q172/q173 oracles and the final assertion here."""
    from oanda_stream_processor_spark.operators import stats as S

    monkeypatch.setattr(S, "KTH_REFINE_CUT", 50)

    # all values far above HIST_HI -> everything clamps into the top
    # bucket; exact kth must still be the true sorted[k-1]
    skew = [S.HIST_HI * 10 + ((i * 7919) % 1000) for i in range(500)]
    vals = spark.createDataFrame([(v,) for v in skew], "cents long")
    hits = S.hist_quantiles(S.hist_buckets_of(vals, "cents"))
    got = {r.pct: r.exact_v
           for r in S.exact_kth_by_bucket(vals, "cents", hits).collect()}
    s = sorted(skew)
    for r in hits.collect():
        assert got[r.pct] == s[r.target_rank - 1]

    # point mass: constant column exercises the min==max short-circuit
    const = spark.createDataFrame([(42,)] * 100, "cents long")
    hits_c = S.hist_quantiles(S.hist_buckets_of(const, "cents"))
    out = S.exact_kth_by_bucket(const, "cents", hits_c).collect()
    assert len(out) == hits_c.count() and all(r.exact_v == 42 for r in out)

    # direct path (cut restored): same answers on the skewed fixture
    monkeypatch.setattr(S, "KTH_REFINE_CUT", 262_144)
    got2 = {r.pct: r.exact_v
            for r in S.exact_kth_by_bucket(vals, "cents", hits).collect()}
    assert got2 == got
