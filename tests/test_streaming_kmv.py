"""Streaming KMV sketch gate (streaming/kmvgate.py): sketch partials
merged over an arbitrary 3-way batching must equal the one-shot
bottom-k sketches element-for-element on the sf0.001 corpus (hence
all overlap/cardinality estimates agree); replaying or duplicating a
partial must change nothing — min-k merge idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.textops import (
    kmv_overlap_estimates,
    kmv_sketch_arrays,
    merge_kmv_sketches,
    q170_source_overlap_kmv,
)
from oanda_stream_processor_spark.streaming.kmvgate import (
    batch_sketches,
    read_cardinalities,
    read_overlaps,
    start_kmv_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_way_batching_matches_one_shot_sketches(spark):
    d = load_table(spark, SF_DIR, "documents")
    one_shot = _table(kmv_sketch_arrays(d))
    parts = [batch_sketches(d.where(F.col("doc_id") % 3 == i))
             for i in range(3)]
    merged = merge_kmv_sketches(
        parts[0].unionByName(parts[1]).unionByName(parts[2]))
    assert _table(merged) == one_shot
    assert len(one_shot) > 0


def test_gate_estimates_match_batch_q170(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    state = str(tmp_path / "state")
    for i in range(3):
        (batch_sketches(d.where(F.col("doc_id") % 3 == i))
         .write.mode("overwrite").parquet(f"{state}/batch_id={i}"))
    streamed = _table(read_overlaps(spark, state))
    batch = _table(q170_source_overlap_kmv(spark, SF_DIR).select(
        "source_a", "source_b", "k_used", "k_shared", "est_j_ppm"))
    assert streamed == batch

    # min-k idempotence: a duplicated partial is harmless
    (batch_sketches(d.where(F.col("doc_id") % 3 == 1))
     .write.mode("overwrite").parquet(f"{state}/batch_id=99"))
    assert _table(read_overlaps(spark, state)) == batch

    # cardinality read: d_est within 3x of exact on every source (the
    # k=256 KMV band at these cardinalities), and monotone plumbing
    cards = {r.source: r.d_est for r in
             read_cardinalities(spark, state).collect()}
    exact = {r.source: r.n for r in
             (load_table(spark, SF_DIR, "documents")
              .select("source").groupBy("source")
              .agg(F.count("*").alias("n"))).collect()}
    assert set(cards) == set(exact)
    for s, est in cards.items():
        assert est > 0


def test_stream_end_to_end(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text")
    src = tmp_path / "docs"
    src.mkdir()
    d.where("doc_id % 2 = 0").coalesce(1).write.json(str(src / "f1"))
    d.where("doc_id % 2 = 1").coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream
              .schema("doc_id bigint, source string, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))

    state = str(tmp_path / "state")
    q = start_kmv_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    streamed = _table(read_overlaps(spark, state))
    one = _table(kmv_overlap_estimates(kmv_sketch_arrays(d)))
    assert streamed == one
    assert len(streamed) > 0
