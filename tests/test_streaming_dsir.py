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
    lr, avg = trained
    qdir, doc_ids = doc_files
    schema = "doc_id bigint, source string, text string"

    batch_docs = spark.read.schema(schema).json(qdir)
    expected = sorted(map(tuple,
                          score_docs_batch(batch_docs, lr, avg).collect()))

    def replay(max_files):
        got = []
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files).json(qdir))
        q = run_dsir_stream(
            stream, lr, avg,
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
