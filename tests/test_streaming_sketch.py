"""Streaming CMS: micro-batch partial sketches merged cellwise must
equal the one-shot batch sketch (mergeability), estimates must carry
the overestimate guarantee, and replaying a batch partial must not
double-count (idempotent state writes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.streaming.sketch import (
    batch_sketch,
    estimate,
    read_sketch,
    start_cms_stream,
)

ROWS = [
    (1, "spark spark spark duck duck goose"),
    (2, "spark duck heron heron heron heron"),
    (3, "goose goose goose goose spark"),
    (4, "single appearance words here only"),
]
SCHEMA = "doc_id bigint, text string"


def _truth() -> dict:
    counts: dict = {}
    for _, text in ROWS:
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
    return counts


def test_stream_sketch_equals_batch_sketch(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(ROWS[:2], SCHEMA).coalesce(1) \
        .write.json(str(src / "f1"))
    spark.createDataFrame(ROWS[2:], SCHEMA).coalesce(1) \
        .write.json(str(src / "f2"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))
    state = str(tmp_path / "state")
    q = start_cms_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    streamed = {(r.d, r.bucket): r.cell
                for r in read_sketch(spark, state).collect()}
    oneshot = {(r.d, r.bucket): r.cell
               for r in batch_sketch(
                   spark.createDataFrame(ROWS, SCHEMA)).collect()}
    assert streamed == oneshot  # cellwise merge == one-shot (mergeable)


def test_estimates_overestimate_and_hit_heavy(spark, tmp_path):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    sk = batch_sketch(docs)
    truth = _truth()
    probes = spark.createDataFrame([(t,) for t in truth], "token string")
    est = {r.token: r.est_n for r in estimate(sk, probes).collect()}
    for t, c in truth.items():
        assert est[t] >= c  # CMS never underestimates
    # tiny vocabulary, 2048 cells: no collisions — estimates are exact
    assert est == truth


def test_replayed_batch_partial_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    docs = spark.createDataFrame(ROWS, SCHEMA)
    part = batch_sketch(docs)
    part.write.mode("overwrite").parquet(state + "/batch_id=0")
    before = {(r.d, r.bucket): r.cell
              for r in read_sketch(spark, state).collect()}
    # recovery re-runs the same batch: overwrite of its own partition
    part.write.mode("overwrite").parquet(state + "/batch_id=0")
    after = {(r.d, r.bucket): r.cell
             for r in read_sketch(spark, state).collect()}
    assert after == before  # no double counting on replay
