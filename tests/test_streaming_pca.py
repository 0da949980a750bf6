"""Streaming PCA moment accumulation (streaming/pcastream.py): the
eigenvector computed from stream-accumulated moment state must be
bit-identical to the batch q151 over the same vectors, independent of
how the stream was batched."""

from __future__ import annotations

import json

import pytest

from oanda_stream_processor_spark.operators.similarity import (
    q151_pca_power,
)
from oanda_stream_processor_spark.streaming.pcastream import (
    pca_top_component,
    start_pca_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_files(spark, tmp_path_factory):
    """The full sf0.001 embeddings replayed as 4 NDJSON files —
    forcing multiple micro-batches over the whole corpus."""
    rows = (spark.read.parquet(f"{SF}/embeddings.parquet")
            .orderBy("vec_id").collect())
    d = tmp_path_factory.mktemp("pcastream")
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        with open(d / f"b{i}.json", "w") as fh:
            for r in rows[i * chunk:(i + 1) * chunk]:
                fh.write(json.dumps(
                    {"vec_id": r.vec_id,
                     "embedding": [float(x) for x in r.embedding]}) + "\n")
    return str(d)


def _run(spark, qdir, tmp_path, tag, max_files):
    schema = "vec_id bigint, embedding array<float>"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files).json(qdir))
    state = str(tmp_path / f"state{tag}")
    q = start_pca_stream(stream, state,
                         str(tmp_path / f"ck{tag}"))
    q.processAllAvailable()
    q.stop()
    return sorted(map(tuple,
                      pca_top_component(spark, state).collect()))


def test_streamed_moments_equal_batch_pca(spark, emb_files, tmp_path):
    batch = sorted(map(tuple, q151_pca_power(spark, SF).collect()))
    one = _run(spark, emb_files, tmp_path, "one", 4)
    four = _run(spark, emb_files, tmp_path, "four", 1)
    assert one == batch          # stream state == single-pass matrix
    assert four == one           # batch boundaries cannot matter
    assert len(batch) == 64
