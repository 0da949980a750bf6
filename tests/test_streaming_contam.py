"""Streaming fuzzy-decontamination gate (streaming/contamgate.py):
per-doc verdicts under an arbitrary 3-way batching must equal batch
q165 row-for-row on the sf0.001 corpus, the micro-batch ledger merged
columnwise must equal the one-shot summary, and replaying a batch
partial must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.curation import (
    BENCH_MOD,
    benchmark_gram_set,
    gram_array,
)
from oanda_stream_processor_spark.operators.curation import (
    q165_fuzzy_contamination,
)
from oanda_stream_processor_spark.streaming.contamgate import (
    _COUNTS,
    batch_partial,
    read_ledger,
    score_batch,
    start_contamination_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def _corpus(spark):
    d = load_table(spark, SF_DIR, "documents")
    return d.where(F.col("doc_id") % BENCH_MOD != 0)


def test_three_way_batching_matches_batch_q165(spark):
    d = load_table(spark, SF_DIR, "documents")
    bench = benchmark_gram_set(d).localCheckpoint(eager=True)
    batch = _table(q165_fuzzy_contamination(spark, SF_DIR))
    parts = [score_batch(_corpus(spark).where(F.col("doc_id") % 3 == i),
                         bench) for i in range(3)]
    streamed = _table(parts[0].unionByName(parts[1]).unionByName(parts[2]))
    assert streamed == batch
    assert len(batch) > 0


def test_ledger_merge_and_idempotent_replay(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    bench = benchmark_gram_set(d).localCheckpoint(eager=True)
    corpus = _corpus(spark)

    state = str(tmp_path / "state")
    for i in range(3):
        (batch_partial(corpus.where(F.col("doc_id") % 3 == i), bench)
         .write.mode("overwrite").parquet(f"{state}/batch_id={i}"))
    merged = _table(read_ledger(spark, state))

    one = str(tmp_path / "one")
    batch_partial(corpus, bench).write.parquet(f"{one}/batch_id=0")
    assert merged == _table(read_ledger(spark, one))

    # replaying batch 1's partial overwrites, never double-counts
    (batch_partial(corpus.where(F.col("doc_id") % 3 == 1), bench)
     .write.mode("overwrite").parquet(f"{state}/batch_id=1"))
    assert _table(read_ledger(spark, state)) == merged


def test_stream_end_to_end_gates_and_ledgers(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    bench = benchmark_gram_set(d).localCheckpoint(eager=True)
    corpus = _corpus(spark).select("doc_id", "text")

    src = tmp_path / "docs"
    src.mkdir()
    corpus.where("doc_id % 2 = 0").coalesce(1).write.json(str(src / "f1"))
    corpus.where("doc_id % 2 = 1").coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))

    state = str(tmp_path / "state")
    clean = str(tmp_path / "clean")
    q = start_contamination_stream(stream, bench, state,
                                   str(tmp_path / "ckpt"), clean)
    q.awaitTermination(120)

    streamed = _table(read_ledger(spark, state))
    one = str(tmp_path / "one")
    batch_partial(corpus, bench).write.parquet(f"{one}/batch_id=0")
    assert streamed == _table(read_ledger(spark, one))

    clean_ids = sorted(r.doc_id for r in spark.read.parquet(clean).collect())
    batch_clean = sorted(
        r.doc_id for r in q165_fuzzy_contamination(spark, SF_DIR)
        .where(~F.col("contaminated")).collect())
    assert clean_ids == batch_clean
    # counts are consistent: every scored doc is either flagged or clean
    row = read_ledger(spark, state).collect()[0]
    assert row.n_docs == score_batch(corpus, bench).count()
    assert row.n_docs == row.n_contaminated + len(clean_ids)
