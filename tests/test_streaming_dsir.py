"""Streaming DSIR gate (streaming/dsirgate.py): micro-batched document
scoring against the static trained model must equal the q152 batch
computation on the same rows, independent of trigger splits."""

from __future__ import annotations

import json

import pytest

from oanda_stream_processor_spark.operators.llmprep import (
    q152_dsir_importance,
)
from oanda_stream_processor_spark.streaming.dsirgate import (
    dsir_train,
    run_dsir_stream,
    score_docs_batch,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def trained(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "source", "text")
    return dsir_train(d)


@pytest.fixture(scope="module")
def doc_files(spark, tmp_path_factory):
    """12 corpus documents replayed as 3 NDJSON files of 4 — forcing
    multiple micro-batches."""
    rows = (spark.read.parquet(f"{SF}/documents.parquet")
            .orderBy("doc_id").limit(12).collect())
    d = tmp_path_factory.mktemp("dsirq")
    for i in range(3):
        with open(d / f"b{i}.json", "w") as fh:
            for r in rows[4 * i:4 * i + 4]:
                fh.write(json.dumps({"doc_id": r.doc_id,
                                     "source": r.source,
                                     "text": r.text}) + "\n")
    return str(d), [r.doc_id for r in rows]


def test_stream_scores_match_batch_and_q152(spark, trained, doc_files,
                                            tmp_path):
    lr, avg, dflt = trained
    qdir, doc_ids = doc_files
    schema = "doc_id bigint, source string, text string"

    batch_docs = spark.read.schema(schema).json(qdir)
    expected = sorted(map(tuple,
                          score_docs_batch(batch_docs, lr, avg,
                                           dflt).collect()))

    def replay(max_files):
        got = []
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files).json(qdir))
        q = run_dsir_stream(
            stream, lr, avg, dflt,
            lambda df, bid: got.extend(map(tuple, df.collect())),
            checkpoint=str(tmp_path / f"ck{max_files}"))
        q.processAllAvailable()
        q.stop()
        return sorted(got)

    assert replay(3) == expected
    assert replay(1) == expected           # trigger-split invariance
    assert len(expected) == len(doc_ids)

    # scoring the training corpus itself through the stream gate equals
    # the q152 batch operator row-for-row (same lr, same avg gate)
    q152 = {r.doc_id: r for r in
            q152_dsir_importance(spark, SF).collect()}
    for t in expected:
        ref = q152[t[0]]
        assert (ref.source, ref.n_tokens, ref.importance_fp,
                ref.keep) == t[1:]


def _bucket_of(token: str) -> int:
    """Python replica of dsir_bucket_col(): polynomial char hash mod
    1e9+7, folded into DSIR_BUCKETS."""
    h = 0
    for ch in token:
        h = (h * 131 + ord(ch)) % 1_000_000_007
    return h % 1024


def test_unseen_buckets_get_smoothed_default(spark):
    """Arriving documents whose tokens hash to buckets the training
    corpus never produced must still emit exactly one scored row, with
    every unseen token contributing the smoothed default log-ratio —
    not silently vanish from the keep/drop gate (round-7 advice)."""
    train = spark.createDataFrame(
        [(0, "src0", "aa bb aa"), (1, "src1", "aa cc")],
        "doc_id bigint, source string, text string")
    lr, avg, dflt = dsir_train(train)
    trained = {r.bucket for r in lr.collect()}
    default_fp = dflt.collect()[0].default_fp
    assert default_fp != 0          # smoothed default is a real signal

    # generate tokens guaranteed to hash outside the trained buckets
    unseen = []
    i = 0
    while len(unseen) < 3:
        tok = f"zz{i}"
        if _bucket_of(tok) not in trained:
            unseen.append(tok)
        i += 1

    batch = spark.createDataFrame(
        [(100, "srcX", " ".join(unseen)),          # ALL tokens unseen
         (101, "srcX", f"aa {unseen[0]}")],        # mixed seen/unseen
        "doc_id bigint, source string, text string")
    got = {r.doc_id: r for r in
           score_docs_batch(batch, lr, avg, dflt).collect()}

    assert set(got) == {100, 101}   # no document vanished
    assert got[100].n_tokens == 3
    assert got[100].importance_fp == 3 * default_fp
    lr_aa = {r.bucket: r.lr_fp for r in lr.collect()}[_bucket_of("aa")]
    assert got[101].n_tokens == 2
    assert got[101].importance_fp == lr_aa + default_fp
