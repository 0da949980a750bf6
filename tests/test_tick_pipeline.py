"""Reference-invariant tests (SURVEY.md §2.1 'Semantic invariants'):
each test is tied to a cited behavior of the reference pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from oanda_stream_processor_spark.functions.ticks import publishable
from oanda_stream_processor_spark.sources.ndjson import read_ticks

# tests/data/ticks.ndjson: 7 lines — 3 ticks, 1 heartbeat, 1 blank,
# 1 malformed, 1 unknown (plus one tick with unparseable closeoutAsk).


def test_blank_lines_skipped_and_malformed_dropped(spark, tick_capture):
    # oanda_client.rs:51-53 (blank skip) and :57-60 (corrupt drop)
    df = read_ticks(spark, tick_capture)
    assert df.count() == 5  # 7 lines - blank - malformed


def test_routing_counts(spark, tick_capture):
    # oanda_client.rs:63-82 3-way dispatch
    counts = dict(read_ticks(spark, tick_capture)
                  .groupBy("message_type").count().collect())
    assert counts == {"price_tick": 3, "heartbeat": 1, "unknown": 1}


def test_unknown_retained_but_never_published(spark, tick_capture):
    # oanda_client.rs:79-82 (retain) + main.rs:117-119 (never publish)
    df = read_ticks(spark, tick_capture)
    assert df.where(F.col("message_type") == "unknown").count() == 1
    pub = publishable(df)
    assert pub.count() == 4
    assert pub.where(F.col("message_type") == "unknown").count() == 0


def test_spread_unparseable_price_is_zero_not_null(spark, tick_capture):
    # main.rs:70-72 unwrap_or(0.0): "N/A" ask -> 0.0 - 157.301 = -157.301
    row = (read_ticks(spark, tick_capture)
           .where(F.col("price_tick.instrument") == "USD_JPY")
           .select("spread").collect()[0])
    assert row.spread is not None
    assert abs(row.spread - (-157.301)) < 1e-9


def test_spread_normal(spark, tick_capture):
    rows = (read_ticks(spark, tick_capture)
            .where(F.col("price_tick.instrument") == "EUR_USD")
            .select("spread").collect())
    for r in rows:
        assert 0 < r.spread < 0.001


def test_dual_format_timestamps(spark, tick_capture):
    # main.rs:140-151: RFC3339 preferred; fractional-or-not both parse
    df = read_ticks(spark, tick_capture)
    with_ts = df.where(F.col("message_type") != "unknown")
    assert with_ts.where(F.col("event_ts").isNull()).count() == 0
    # ns input truncates to μs (documented)
    t = (df.where(F.col("price_tick.time") == "2026-08-13T09:15:01.123456789Z")
           .select(F.date_format("event_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                   .alias("s")).collect()[0].s)
    assert t == "2026-08-13 09:15:01.123456"


def test_heartbeats_are_data_rows(spark, tick_capture):
    # main.rs:95-116: heartbeats flow to the sink like ticks
    hb = (read_ticks(spark, tick_capture)
          .where(F.col("message_type") == "heartbeat"))
    assert hb.count() == 1
    assert hb.select("event_ts").collect()[0].event_ts is not None


def test_schema_mismatch_demoted_to_unknown(spark, tmp_path):
    # oanda_client.rs:66-78: a discriminator match whose payload fails
    # serde (required field missing) falls back to Unknown — and Unknown
    # is never published (main.rs:117-119)
    src = tmp_path / "mismatch.ndjson"
    src.write_text("\n".join([
        # has "instrument" but no closeoutBid/closeoutAsk/time -> Unknown
        '{"instrument":"EUR_USD","status":"tradeable","bids":[],"asks":[]}',
        # heartbeat without time -> Unknown
        '{"type":"HEARTBEAT"}',
        # complete tick -> price_tick
        '{"type":"PRICE","time":"2026-08-13T09:15:01Z","instrument":"EUR_USD",'
        '"status":"tradeable","closeoutBid":"1.0","closeoutAsk":"1.1",'
        '"bids":[],"asks":[]}',
    ]) + "\n")
    df = read_ticks(spark, str(src))
    counts = dict(df.groupBy("message_type").count().collect())
    assert counts == {"unknown": 2, "price_tick": 1}
    assert publishable(df).count() == 1


def test_nested_ladders_parsed(spark, tick_capture):
    df = read_ticks(spark, tick_capture)
    r = (df.where(F.col("price_tick.instrument") == "EUR_USD")
           .select(F.size("price_tick.bids").alias("nb"),
                   F.col("price_tick.bids")[0]["liquidity"].alias("liq"))
           .orderBy(F.desc("nb")).collect()[0])
    assert r.nb == 2 and r.liq == 1000000
