"""Streaming incremental ANN (streaming/annsearch.py): micro-batched
query vectors against a static IVF index must produce exactly the
batch-path answer, independent of how the queries are split into
triggers."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from oanda_stream_processor_spark.operators.similarity import (
    _ivf_cells,
    _ivf_centroids,
)
from oanda_stream_processor_spark.streaming.annsearch import (
    batch_topk_against_index,
    build_ann_index,
    run_ann_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")
    return _ivf_cells(e), _ivf_centroids(e)


@pytest.fixture(scope="module")
def query_files(spark, tmp_path_factory):
    """6 query vectors (copies of corpus vectors under fresh ids) as 3
    NDJSON files of 2 — forcing multiple micro-batches."""
    rows = (spark.read.parquet(f"{SF}/embeddings.parquet")
            .orderBy("vec_id").limit(6).collect())
    d = tmp_path_factory.mktemp("annq")
    for i in range(3):
        with open(d / f"q{i}.json", "w") as fh:
            for j, r in enumerate(rows[2 * i:2 * i + 2]):
                fh.write(json.dumps(
                    {"vec_id": 100_000 + 2 * i + j,
                     "embedding": [float(x) for x in r.embedding]}) + "\n")
    return str(d), rows


def test_stream_ann_matches_batch(spark, index, query_files, tmp_path):
    index_cells, cent_one = index
    qdir, rows = query_files
    schema = "vec_id bigint, embedding array<float>"

    batch_q = spark.read.schema(schema).json(qdir)
    expected = sorted(map(tuple, batch_topk_against_index(
        batch_q, index_cells, cent_one).collect()))

    got = []
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(qdir))
    q = run_ann_stream(
        stream, index_cells, cent_one,
        lambda df, bid: got.extend(map(tuple, df.collect())),
        checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    assert sorted(got) == expected
    assert len(expected) > 0
    # a query that IS a corpus vector must rank that vector first
    # (cosine 1.0 with the smallest cand_id tiebreak)
    by_query = {}
    for t in expected:
        by_query.setdefault(t[0], []).append(t)
    first_query = 100_000
    top = min(by_query[first_query], key=lambda t: t[3])
    assert top[2] == 1.0                 # cosine with its own copy
    assert top[1] == rows[0].vec_id      # the original corpus vector


def test_stream_ann_multiprobe_batch_split_invariant(
        spark, index, query_files, tmp_path):
    """nprobe=2: one-batch vs three-batch replays of the same queries
    must produce identical result sets (the q148 lever on the streaming
    surface), and multiprobe results must be a superset-or-equal
    improvement over single-probe (more candidates, never fewer)."""
    index_cells, cent_one = index
    qdir, rows = query_files
    schema = "vec_id bigint, embedding array<float>"

    def replay(max_files):
        got = []
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files).json(qdir))
        q = run_ann_stream(
            stream, index_cells, cent_one,
            lambda df, bid: got.extend(map(tuple, df.collect())),
            nprobe=2,
            checkpoint=str(tmp_path / f"ckpt{max_files}"))
        q.processAllAvailable()
        q.stop()
        return sorted(got)

    one_batch, three_batches = replay(3), replay(1)
    assert one_batch == three_batches
    assert len(one_batch) > 0

    # matches the batch-path computation exactly
    batch_q = spark.read.schema(schema).json(qdir)
    expected = sorted(map(tuple, batch_topk_against_index(
        batch_q, index_cells, cent_one, nprobe=2).collect()))
    assert one_batch == expected

    # nprobe=2 candidates per query >= nprobe=1 candidates per query
    single = batch_topk_against_index(
        batch_q, index_cells, cent_one, nprobe=1)
    n1 = {r["query_id"]: r["n"] for r in
          single.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    n2 = {r["query_id"]: r["n"] for r in
          batch_topk_against_index(batch_q, index_cells, cent_one, nprobe=2)
          .groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert all(n2[qid] >= n for qid, n in n1.items())


def test_stream_ann_subdivided_index(spark, query_files, tmp_path):
    """A growth-rule-subdivided index (split_planes > 0) must be probed
    with the SAME subdivision: build_ann_index returns the triple, the
    stream reproduces the batch answer, and a corpus-copy query still
    ranks its original first (the sub-bucket of an identical vector is
    identical, so the copy lands in the original's cell)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")
    split = 2
    index_cells = _ivf_cells(e, split_planes=split)
    cent_one = _ivf_centroids(e)
    qdir, rows = query_files
    schema = "vec_id bigint, embedding array<float>"

    batch_q = spark.read.schema(schema).json(qdir)
    expected = sorted(map(tuple, batch_topk_against_index(
        batch_q, index_cells, cent_one, split_planes=split).collect()))

    got = []
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(qdir))
    q = run_ann_stream(
        stream, index_cells, cent_one,
        lambda df, bid: got.extend(map(tuple, df.collect())),
        split_planes=split,
        checkpoint=str(tmp_path / "ckpt_split"))
    q.processAllAvailable()
    q.stop()

    assert sorted(got) == expected
    assert len(expected) > 0
    by_query = {}
    for t in expected:
        by_query.setdefault(t[0], []).append(t)
    top = min(by_query[100_000], key=lambda t: t[3])
    assert top[2] == 1.0
    assert top[1] == rows[0].vec_id

    # build_ann_index wires the three pieces consistently (tiny corpus
    # -> growth rule derives 0 splits and the plain path is identical)
    idx, cent, sp = build_ann_index(e)
    auto = sorted(map(tuple, batch_topk_against_index(
        batch_q, idx, cent, split_planes=sp).collect()))
    plain = sorted(map(tuple, batch_topk_against_index(
        batch_q, _ivf_cells(e), _ivf_centroids(e)).collect()))
    assert auto == plain


def test_index_stamp_carries_subdivision(spark, query_files):
    """An index built directly with `_ivf_cells` carries its applied
    subdivision on the frame, so default-argument queries probe with
    the matching layout instead of silently defaulting to coarse cell
    ids (round-7 advice); a frame without the stamp is refused."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("vec_id", "embedding")
    split = 2
    index_cells = _ivf_cells(e, split_planes=split)
    cent_one = _ivf_centroids(e)
    qdir, _ = query_files
    batch_q = spark.read.schema(
        "vec_id bigint, embedding array<float>").json(qdir)

    explicit = sorted(map(tuple, batch_topk_against_index(
        batch_q, index_cells, cent_one, split_planes=split).collect()))
    stamped = sorted(map(tuple, batch_topk_against_index(
        batch_q, index_cells, cent_one).collect()))   # defaults
    assert stamped == explicit
    assert len(stamped) > 0

    # a derived frame loses the stamp -> defaults must refuse, not
    # silently probe with split_planes=0
    unstamped = index_cells.select("vec_id", "embedding", "cell")
    with pytest.raises(ValueError, match="ann_split_planes"):
        batch_topk_against_index(batch_q, unstamped, cent_one)
