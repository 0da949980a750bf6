"""Streaming HLL register gate (streaming/hllgate.py): register
partials merged over an arbitrary 3-way batching must equal batch
q169's register table and estimates row-for-row on the sf0.001
corpus; replaying (and even duplicating) a batch partial must not
change any estimate — the MAX-merge idempotence property."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.io import load_table
from oanda_stream_processor_spark.operators.textops import (
    hll_estimates,
    hll_probes,
    hll_registers,
    merge_hll_registers,
    q169_hll_distinct,
)
from oanda_stream_processor_spark.streaming.hllgate import (
    batch_registers,
    read_estimates,
    start_hll_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _table(df):
    return sorted(tuple(r) for r in df.collect())


def test_three_way_batching_matches_batch_registers(spark):
    d = load_table(spark, SF_DIR, "documents")
    one_shot = _table(hll_registers(hll_probes(d)))
    parts = [batch_registers(d.where(F.col("doc_id") % 3 == i))
             for i in range(3)]
    merged = merge_hll_registers(
        parts[0].unionByName(parts[1]).unionByName(parts[2]))
    assert _table(merged) == one_shot
    assert len(one_shot) > 0


def test_estimates_match_batch_q169(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents")
    state = str(tmp_path / "state")
    for i in range(3):
        (batch_registers(d.where(F.col("doc_id") % 3 == i))
         .write.mode("overwrite").parquet(f"{state}/batch_id={i}"))
    streamed = _table(read_estimates(spark, state))
    batch = _table(q169_hll_distinct(spark, SF_DIR).select(
        "source", "m", "n_present", "n_zero", "reg_sum",
        "raw_est", "hll_est", "method"))
    assert streamed == batch

    # replay batch 1: overwrite-by-partition keeps estimates identical
    (batch_registers(d.where(F.col("doc_id") % 3 == 1))
     .write.mode("overwrite").parquet(f"{state}/batch_id=1"))
    assert _table(read_estimates(spark, state)) == batch

    # MAX-merge idempotence: even a DUPLICATED partial is harmless
    (batch_registers(d.where(F.col("doc_id") % 3 == 1))
     .write.mode("overwrite").parquet(f"{state}/batch_id=99"))
    assert _table(read_estimates(spark, state)) == batch


def test_stream_end_to_end(spark, tmp_path):
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text")
    src = tmp_path / "docs"
    src.mkdir()
    d.where("doc_id % 2 = 0").coalesce(1).write.json(str(src / "f1"))
    d.where("doc_id % 2 = 1").coalesce(1).write.json(str(src / "f2"))
    stream = (spark.readStream
              .schema("doc_id bigint, source string, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src / "*")))

    state = str(tmp_path / "state")
    q = start_hll_stream(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    streamed = _table(read_estimates(spark, state))
    one = str(tmp_path / "one")
    batch_registers(d).write.parquet(f"{one}/batch_id=0")
    assert streamed == _table(read_estimates(spark, one))
    assert len(streamed) > 0
