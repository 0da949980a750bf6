"""Streaming phrase gate (streaming/phrasegate.py): per-batch match
partials unioned over ANY doc-disjoint batching must equal one-shot
q179 row-for-row (the row-disjoint decomposition — a candidate's
matches are a pure function of that document and the static phrase
frame), and replaying a batch partition must be a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.retrieval import (
    q179_phrase_match,
)
from oanda_stream_processor_spark.streaming.phrasegate import (
    batch_phrase_matches,
    build_phrase_frame,
    read_phrase_matches,
    start_phrase_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def test_gate_partials_union_to_one_shot_q179(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    phrases = build_phrase_frame(d)
    state = str(tmp_path / "state")
    for i in range(3):
        (batch_phrase_matches(d.where(F.col("doc_id") % 3 == i), phrases)
         .write.mode("overwrite")
         .parquet(f"{state}/matches/batch_id={i}"))
    want = _table(q179_phrase_match(spark, SF_DIR))
    assert _table(read_phrase_matches(spark, state)) == want
    assert len(want) > 0
    # idempotent replay: re-overwriting one batch partition is a no-op
    (batch_phrase_matches(d.where(F.col("doc_id") % 3 == 1), phrases)
     .write.mode("overwrite").parquet(f"{state}/matches/batch_id=1"))
    assert _table(read_phrase_matches(spark, state)) == want


def test_phrase_stream_end_to_end(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    phrases = build_phrase_frame(d)
    src = tmp_path / "docs"
    src.mkdir()
    d.where("doc_id % 2 = 0").coalesce(1).write.json(str(src / "f1"))
    d.where("doc_id % 2 = 1").coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream
              .schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))
    state = str(tmp_path / "state")
    q = start_phrase_stream(stream, phrases, state,
                            str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _table(read_phrase_matches(spark, state)) == \
        _table(q179_phrase_match(spark, SF_DIR))


def test_postings_store_serves_adhoc_phrases(spark, tmp_path):
    """The postings store must answer phrases the stream never saw:
    (a) the corpus phrase set reproduces one-shot q179 after every
    append prefix; (b) an ad-hoc phrase built after ingest finds its
    known occurrences."""
    from oanda_stream_processor_spark.operators.dedup import (
        _spark_shingle_hashes,
    )
    from oanda_stream_processor_spark.streaming.phrasegate import (
        serve_phrase_matches,
        write_batch_postings,
    )

    d = load_table(spark, SF_DIR, "documents")
    phrases = build_phrase_frame(d)
    state = str(tmp_path / "pstate")
    seen = None
    for i in range(3):
        part = d.where(F.col("doc_id") % 3 == i)
        write_batch_postings(part, state, i)
        seen = part if seen is None else seen.unionByName(part)
        # one-shot q179 on the ingested prefix = probe of its postings
        want = sorted(tuple(r) for r in
                      (_spark_shingle_hashes(seen.select("doc_id", "text"),
                                             with_pos=True)
                       .join(F.broadcast(phrases), F.col("sh") == F.col("qsh"))
                       .where(F.col("doc_id") != F.col("query_id"))
                       .groupBy("query_id", F.col("doc_id").alias("cand_id"))
                       .agg(F.count("*").alias("n_hits"),
                            F.min("pos").alias("first_pos"))).collect())
        got = sorted(tuple(r) for r in
                     serve_phrase_matches(spark, state, phrases).collect())
        assert got == want, f"diverged after batch {i}"
    # full corpus ingested -> equals one-shot q179
    assert sorted(tuple(r) for r in
                  serve_phrase_matches(spark, state, phrases).collect()) == \
        _table(q179_phrase_match(spark, SF_DIR))
    # ad-hoc phrase composed AFTER ingest: take doc 42's tokens 5..7 as
    # a never-streamed phrase and check doc 42 is among its matches
    row = d.where("doc_id = 42").select("text").first()
    toks = [t for t in row.text.split(" ") if t][4:7]
    adhoc_doc = spark.createDataFrame([(999999, " ".join(toks))],
                                      "doc_id long, text string")
    adhoc = (_spark_shingle_hashes(adhoc_doc, with_pos=True)
             .where(F.col("pos") == 1)
             .select(F.col("doc_id").alias("query_id"),
                     F.col("sh").alias("qsh")))
    hits = {r.cand_id for r in
            serve_phrase_matches(spark, state, adhoc).collect()}
    assert 42 in hits
