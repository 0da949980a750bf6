"""Streaming incremental substring-dedup (streaming/winnowgate.py):
micro-batched documents linked against the static winnowed hub index
must equal the one-shot batch computation, independent of trigger
splits, and carry q157's detection guarantee for arriving docs."""

from __future__ import annotations

import json

import pytest

from oanda_stream_processor_spark.streaming.winnowgate import (
    batch_winnow_links,
    build_winnow_index,
    run_winnow_stream,
)

DUP = ("the quick brown fox jumps over the lazy dog while the "
       "band plays on and the river runs to the sea forever")
RUN = "shared-verbatim-segment-that-both-documents-quote-exactly"


@pytest.fixture(scope="module")
def corpus_index(spark):
    """Static index over 102 docs: doc 0 = DUP text, doc 2 embeds RUN,
    100 unique fillers. df-cut threshold = ceil(0.01*102) = 2, so the
    pairable fingerprints (df = 1 in the index) all survive."""
    texts = [DUP, "nothing in common with anything else here 999",
             f"alpha opening words {RUN} first unique tail 0123"]
    for i in range(99):
        texts.append(" ".join(f"f{i}w{j}x{i * 7 + j}" for j in range(12)))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")
    return build_winnow_index(docs)


@pytest.fixture(scope="module")
def batch_files(tmp_path_factory):
    """3 arriving docs as 3 NDJSON files (multiple micro-batches):
    500 = exact copy of index doc 0; 501 = NEW text embedding RUN
    (indexed only in doc 2); 502 = novel."""
    rows = [
        (500, DUP),
        (501, f"totally different preamble {RUN} and another ending 4567"),
        (502, " ".join(f"novel{j}z{j * 13}" for j in range(12))),
    ]
    d = tmp_path_factory.mktemp("winq")
    for i, (doc_id, text) in enumerate(rows):
        with open(d / f"b{i}.json", "w") as fh:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    return str(d)


def test_stream_links_match_batch_and_guarantee(spark, corpus_index,
                                                batch_files, tmp_path):
    schema = "doc_id bigint, text string"
    batch_docs = spark.read.schema(schema).json(batch_files)
    expected = sorted(map(tuple,
                          batch_winnow_links(batch_docs,
                                             corpus_index).collect()))

    def replay(max_files):
        got = []
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files)
                  .json(batch_files))
        q = run_winnow_stream(
            stream, corpus_index,
            lambda df, bid: got.extend(map(tuple, df.collect())),
            checkpoint=str(tmp_path / f"ck{max_files}"))
        q.processAllAvailable()
        q.stop()
        return sorted(got)

    assert replay(3) == expected
    assert replay(1) == expected          # trigger-split invariance

    links = {}
    for doc_id, hub, n_fps in expected:
        links.setdefault(doc_id, {})[hub] = n_fps
    # exact copy of doc 0: every fingerprint matches -> hub 0, strong
    assert 0 in links[500] and links[500][0] >= 2
    # RUN >= GRAM+WINNOW-1 chars, indexed only in doc 2 -> detection
    # GUARANTEED: doc 501 links to hub 2
    assert 2 in links[501]
    # novel doc emits no rows at all
    assert 502 not in links
    # no spurious links to filler hubs from the copy of DUP
    assert set(links[500]) == {0}
