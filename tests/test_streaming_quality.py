"""Streaming quality gate (streaming/qualitygate.py): micro-batch
attribution partials merged columnwise must equal batch q163 exactly
(on a crafted fixture AND on the real sf0.001 corpus under an
arbitrary 3-way batching), per-doc gate verdicts must match the batch
flags, and replaying a batch partial must not double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.curation import (
    attribution_flags,
    attribution_partial,
    attribution_rows,
)
from oanda_stream_processor_spark.streaming.qualitygate import (
    _COUNTS,
    batch_partial,
    gate_docs,
    read_ledger,
    start_quality_stream,
)

# one doc per rule (sole-fail), one multi-fail, one clean
ROWS = [
    (1, "too short"),                                           # f1 only
    (2, "1234 5678 9999 8888 7777 6666 5555 4444 3333 2222"),   # f2 only
    (3, "dup dup dup dup dup dup dup dup dup dup dup dup"),     # f3 only
    (4, " ".join(["extraordinarilyoverlongtoken%d" % i
                  for i in range(10)])),                        # f4 only
    (5, "a b"),                                                 # f1 + f4
    (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # clean
]
SCHEMA = "doc_id bigint, text string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows], SCHEMA)


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def test_fixture_rules_fire_as_designed(spark):
    d = _docs(spark, ROWS)
    flags = {r.doc_id: (r.f1, r.f2, r.f3, r.f4)
             for r in attribution_flags(d).collect()}
    assert flags[1] == (1, 0, 0, 0)
    assert flags[2] == (0, 1, 0, 0)
    assert flags[3] == (0, 0, 1, 0)
    assert flags[4] == (0, 0, 0, 1)
    assert flags[5] == (1, 0, 0, 1)
    assert flags[6] == (0, 0, 0, 0)

    verdicts = {r.doc_id: (r.keep, r.first_fail)
                for r in gate_docs(d).collect()}
    assert verdicts[6] == (True, 0)
    assert verdicts[5] == (False, 1)   # waterfall: lowest rule wins
    assert verdicts[4] == (False, 4)


def test_stream_ledger_equals_batch_q163(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    _docs(spark, ROWS[:3]).coalesce(1).write.json(str(src / "f1"))
    _docs(spark, ROWS[3:]).coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))
    state = str(tmp_path / "state")
    kept = str(tmp_path / "kept")
    q = start_quality_stream(stream, state, str(tmp_path / "ckpt"), kept)
    q.awaitTermination(120)

    streamed = _table(read_ledger(spark, state))
    oneshot = _table(attribution_rows(attribution_partial(
        attribution_flags(_docs(spark, ROWS)))))
    assert streamed == oneshot

    kept_ids = sorted(r.doc_id
                      for r in spark.read.parquet(kept).collect())
    assert kept_ids == [6]


def test_three_way_batching_matches_q163_on_corpus(spark):
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = _table(attribution_rows(attribution_partial(
        attribution_flags(d))))
    parts = [attribution_partial(
        attribution_flags(d.where(F.col("doc_id") % 3 == i)))
        for i in range(3)]
    merged = (parts[0].unionByName(parts[1]).unionByName(parts[2])
              .agg(*[F.sum(c).alias(c) for c in _COUNTS]))
    assert _table(attribution_rows(merged)) == full


def test_replayed_partial_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    part = batch_partial(_docs(spark, ROWS))
    part.write.mode("overwrite").parquet(state + "/batch_id=0")
    before = _table(read_ledger(spark, state))
    part.write.mode("overwrite").parquet(state + "/batch_id=0")
    after = _table(read_ledger(spark, state))
    assert after == before
