"""Streaming BM25 stats gate (streaming/bm25gate.py): the global BM25
statistics (per-term df, n_docs, sum_dl) merged over an arbitrary
batching must equal the one-shot corpus frames EXACTLY (integer sums),
and BM25 pools scored from gate-merged stats must equal the one-shot
q175 pools row-for-row — the SUM-decomposition parity theorem."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.retrieval import (
    N_QUERIES,
    bm25_pool_from,
    corpus_term_frames,
    q175_bm25_topk,
)
from oanda_stream_processor_spark.streaming.bm25gate import (
    batch_corpus_partial,
    batch_df_partial,
    read_corpus_stats,
    read_term_df,
    start_bm25_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def _write_partials(d, state, batches):
    for i, cond in enumerate(batches):
        part = d.where(cond)
        (batch_df_partial(part).write.mode("overwrite")
         .parquet(f"{state}/df/batch_id={i}"))
        (batch_corpus_partial(part).write.mode("overwrite")
         .parquet(f"{state}/corpus/batch_id={i}"))


def test_merged_stats_equal_one_shot(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    state = str(tmp_path / "state")
    _write_partials(d, state, [F.col("doc_id") % 3 == i for i in range(3)])

    _, dfq, _, stats = corpus_term_frames(d)
    assert _table(read_term_df(spark, state)) == _table(dfq)
    assert _table(read_corpus_stats(spark, state)) == _table(stats)

    # idempotent replay: re-overwriting one batch partition is a no-op
    part = d.where(F.col("doc_id") % 3 == 1)
    (batch_df_partial(part).write.mode("overwrite")
     .parquet(f"{state}/df/batch_id=1"))
    assert _table(read_term_df(spark, state)) == _table(dfq)


def test_gate_fed_pool_equals_q175(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    state = str(tmp_path / "state")
    _write_partials(d, state, [F.col("doc_id") % 4 == i for i in range(4)])

    tf, _, dl, _ = corpus_term_frames(d)   # per-doc LOCAL side
    qterms = (tf.where(F.col("cand_id") < N_QUERIES)
              .select(F.col("cand_id").alias("query_id"), "term"))
    pool = bm25_pool_from(tf, read_term_df(spark, state), dl,
                          read_corpus_stats(spark, state), qterms)
    gate_top = pool.where(F.col("rank") <= 10).select(
        "query_id", "cand_id",
        (F.col("fp_sum") / F.lit(1_000_000.0)).alias("score"), "rank")
    assert _table(gate_top) == _table(q175_bm25_topk(spark, SF_DIR))


def test_stream_end_to_end(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = tmp_path / "docs"
    src.mkdir()
    d.where("doc_id % 2 = 0").coalesce(1).write.json(str(src / "f1"))
    d.where("doc_id % 2 = 1").coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))

    state = str(tmp_path / "state")
    q = start_bm25_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    _, dfq, _, stats = corpus_term_frames(d)
    assert _table(read_term_df(spark, state)) == _table(dfq)
    assert _table(read_corpus_stats(spark, state)) == _table(stats)
