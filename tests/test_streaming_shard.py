"""Streaming shard gate (streaming/shardgate.py): the served shard
assignment must equal one-shot q180 (curation.shard_assignment) on the
corpus ingested so far after EVERY prefix of a doc-appending batch
sequence and for ANY epoch (membership provably fixed across epochs),
and the manifest served from the per-batch SUM/MAX_BY count partials
must equal the manifest write_training_shards emits — the r12
verdict's Next-round #1 contract, completing the served-twin map."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.curation import (
    shard_assignment,
    write_training_shards,
)
from oanda_stream_processor_spark.streaming.shardgate import (
    serve_shard_assignment,
    serve_shard_manifest,
    start_shard_stream,
    write_batch_shard_keys,
)

SF_DIR = "/root/testdata/sf0.001"

_MAN_COLS = ["shard_id", "n_docs", "shard_tokens", "n_packs", "max_seq"]


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def test_prefix_parity_and_epoch_rekey(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    seen = None
    for i in range(3):
        part = d.where(F.col("doc_id") % 3 == i)
        write_batch_shard_keys(part, state, i)
        seen = part if seen is None else seen.unionByName(part)
        # new docs INTERLEAVE in permutation order (seq renumbers
        # behind them) — the served window over merged keys must
        # reproduce the one-shot assignment on docs-so-far exactly
        assert _table(serve_shard_assignment(spark, state)) == \
            _table(shard_assignment(seen)), f"diverged after batch {i}"

    # epoch re-key at read time: parity with the one-shot epoch arg,
    # and shard MEMBERSHIP identical across epochs (order-only change)
    e2 = serve_shard_assignment(spark, state, epoch=2)
    assert _table(e2) == _table(shard_assignment(d, epoch=2))
    m0 = {r.doc_id: r.shard_id
          for r in serve_shard_assignment(spark, state).collect()}
    m2 = {r.doc_id: r.shard_id for r in e2.collect()}
    assert m0 == m2


def test_manifest_from_count_partials(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    for i in range(2):
        write_batch_shard_keys(d.where(F.col("doc_id") % 2 == i),
                               state, i)
    out = str(tmp_path / "out")
    write_training_shards(d, out)
    one_shot = spark.read.parquet(out + "/manifest").select(*_MAN_COLS)
    served = serve_shard_manifest(spark, state).select(*_MAN_COLS)
    assert _table(served) == _table(one_shot)

    # idempotent replay: re-overwriting one batch partition is a no-op
    write_batch_shard_keys(d.where(F.col("doc_id") % 2 == 1), state, 1)
    assert _table(serve_shard_manifest(spark, state)
                  .select(*_MAN_COLS)) == _table(one_shot)


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
    q = start_shard_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _table(serve_shard_assignment(spark, state)) == \
        _table(shard_assignment(d))


def test_empty_and_custom_param_batches(spark, tmp_path):
    """Edge coverage: a batch of only empty-text docs contributes
    nothing (shard_keys drops empty docs — the q81 convention) and
    must not corrupt the stores; non-default (n_shards, seed) flow
    through the gate and reproduce the one-shot assignment."""
    from oanda_stream_processor_spark.streaming.shardgate import (
        serve_shard_manifest,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    state = str(tmp_path / "state")
    write_batch_shard_keys(d, state, 0, n_shards=5, seed=777)
    before = _table(serve_shard_assignment(spark, state, seed=777))
    # an all-empty batch (doc_ids far outside the corpus)
    empt = spark.createDataFrame(
        [(10_000_001, ""), (10_000_002, "   ")],
        "doc_id long, text string")
    write_batch_shard_keys(empt, state, 1, n_shards=5, seed=777)
    after = _table(serve_shard_assignment(spark, state, seed=777))
    assert after == before
    assert after == _table(shard_assignment(d, n_shards=5, seed=777))
    # manifest read tolerates the empty partial too
    man = {r.shard_id: r for r in
           serve_shard_manifest(spark, state).collect()}
    assert set(man) == {r[1] for r in after}  # shard ids present
    assert sum(r.n_docs for r in man.values()) == len(after)

    # (seed, n_shards) meta (r13 ADVICE): the serve defaults to the
    # seed the store was WRITTEN with, and an explicit mismatched seed
    # raises instead of silently re-keying against a layout computed
    # under a different seed
    from oanda_stream_processor_spark.streaming.shardgate import (
        read_shard_meta,
    )
    assert read_shard_meta(spark, state) == (777, 5)
    assert _table(serve_shard_assignment(spark, state)) == after
    import pytest as _pytest
    with _pytest.raises(ValueError, match="seed=777"):
        serve_shard_assignment(spark, state, seed=12345)
