"""Custom data source (Python data source API) + partitioning utils."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from oanda_stream_processor_spark.functions.ticks import (
    derive_tick_columns, nonblank_lines, route)
from oanda_stream_processor_spark.plans.partitioning import (
    salted_join, write_partitioned)
from oanda_stream_processor_spark.sources.http_stream import (
    OandaStreamDataSource, OandaStreamReader)


def test_oanda_stream_source_replay(spark, tick_capture):
    spark.dataSource.register(OandaStreamDataSource)
    lines = (spark.readStream.format("oanda_stream")
             .option("mode", "replay").option("path", tick_capture)
             .option("batch_lines", "3").load())
    parsed = derive_tick_columns(route(nonblank_lines(lines)))
    name = f"t{uuid.uuid4().hex[:8]}"
    q = (parsed.writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    counts = dict(spark.sql(f"SELECT message_type, count(*) c FROM {name} "
                            "GROUP BY 1").collect())
    assert counts == {"price_tick": 3, "heartbeat": 1, "unknown": 1}


def test_oanda_stream_source_live_mode_requires_url(tick_capture):
    with pytest.raises(ValueError, match="url"):
        OandaStreamReader({"mode": "live"})


def _serve_capture_chunked(capture: str, expect_token: str):
    """Local stand-in for the OANDA pricing stream: one chunked GET
    response framing the capture's lines (the reference's exact wire
    shape, oanda_client.rs:34-39)."""
    import http.server
    import threading

    data = open(capture, "rb").read()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.headers.get("Authorization") != f"Bearer {expect_token}":
                self.send_response(401)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            for line in data.splitlines(keepends=True):
                self.wfile.write(f"{len(line):x}\r\n".encode() + line + b"\r\n")
            self.wfile.write(b"0\r\n\r\n")

        def log_message(self, *a):  # noqa: D102
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/stream"


def test_oanda_stream_source_live_http(spark, tick_capture, tmp_path):
    """The real wire path: chunked GET -> spool -> micro-batches."""
    import time

    srv, url = _serve_capture_chunked(tick_capture, expect_token="tok")
    try:
        spark.dataSource.register(OandaStreamDataSource)
        lines = (spark.readStream.format("oanda_stream")
                 .option("mode", "live").option("url", url)
                 .option("auth_token", "tok")
                 .option("spool_dir", str(tmp_path / "spool")).load())
        parsed = derive_tick_columns(route(nonblank_lines(lines)))
        name = f"t{uuid.uuid4().hex[:8]}"
        q = (parsed.writeStream.format("memory").queryName(name).start())
        try:
            deadline = time.time() + 30
            want = {"price_tick": 3, "heartbeat": 1, "unknown": 1}
            while time.time() < deadline:
                got = dict(spark.sql(
                    f"SELECT message_type, count(*) c FROM {name} "
                    "GROUP BY 1").collect())
                if got == want:
                    break
                time.sleep(0.5)
            assert got == want
        finally:
            q.stop()
    finally:
        srv.shutdown()


def test_oanda_stream_source_live_bad_token_spools_nothing(tick_capture, tmp_path):
    # 401 -> error_for_status -> intake ends with the error recorded
    # (reference loop-exit, oanda_client.rs:89-93); no lines spool
    import time

    from oanda_stream_processor_spark.sources.http_stream import _SPOOLS

    srv, url = _serve_capture_chunked(tick_capture, expect_token="tok")
    try:
        r = OandaStreamReader({"mode": "live", "url": url,
                               "auth_token": "wrong",
                               "spool_dir": str(tmp_path / "spool")})
        spool = _SPOOLS[r.path]
        deadline = time.time() + 10
        while time.time() < deadline and spool.error is None:
            time.sleep(0.1)
        assert spool.error is not None
        assert r.latestOffset() == {"line": 0}
        r.stop()
    finally:
        srv.shutdown()


def test_oanda_stream_source_partition_ranges(tick_capture):
    r = OandaStreamReader({"mode": "replay", "path": tick_capture,
                           "batch_lines": "2"})
    assert r.initialOffset() == {"line": 0}
    end = r.latestOffset()
    assert end["line"] == 7  # all capture lines incl. blank/corrupt
    parts = r.partitions({"line": 0}, end)
    assert [(p.start, p.end) for p in parts] == [(0, 2), (2, 4), (4, 6), (6, 7)]
    got = [row[0] for p in parts for row in r.read(p)]
    assert len(got) == 7 and got[0].startswith('{"type":"PRICE"')


def test_oanda_stream_backpressure_caps_trigger(tick_capture):
    # a backlog larger than max_lines_per_trigger is rationed across
    # triggers rather than consumed in one
    r = OandaStreamReader({"mode": "replay", "path": tick_capture,
                           "max_lines_per_trigger": "3"})
    assert r.latestOffset() == {"line": 3}
    assert r.latestOffset() == {"line": 6}
    assert r.latestOffset() == {"line": 7}   # clamped at EOF
    assert r.latestOffset() == {"line": 7}
    # checkpoint-restart: a fresh reader whose commit() saw offset 6
    # resumes rationing from there, not from zero
    r2 = OandaStreamReader({"mode": "replay", "path": tick_capture,
                            "max_lines_per_trigger": "3"})
    r2.commit({"line": 6})
    assert r2.latestOffset() == {"line": 7}


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 1000).select((F.col("id") % 3).alias("k"), "id")
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "tag"])
    plain = big.join(small, "k").groupBy("tag").count()
    salted = salted_join(big, small, "k", n_salts=8).groupBy("tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02") for i in range(10)],
        ["dt", "id", "v"])
    out = str(tmp_path / "lake")
    write_partitioned(df, out, "dt")
    back = spark.read.parquet(out).where(F.col("dt") == "2024-01-01")
    assert back.count() == 10
    # partition pruning: only one dt directory is scanned
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan


def test_oanda_batch_reader(spark, tick_capture):
    spark.dataSource.register(OandaStreamDataSource)
    df = (spark.read.format("oanda_stream")
          .option("path", tick_capture).option("batch_lines", "2").load())
    parsed = derive_tick_columns(route(nonblank_lines(df)))
    counts = dict(parsed.groupBy("message_type").count().collect())
    assert counts == {"price_tick": 3, "heartbeat": 1, "unknown": 1}
    assert df.rdd.getNumPartitions() == 4  # 7 lines / 2 per partition


def test_skew_instrumentation(spark):
    from oanda_stream_processor_spark.plans.partitioning import (
        partition_histogram, skew_ratio)
    import pyspark.sql.functions as SF
    even = spark.range(0, 10000).repartition(8, "id")
    assert skew_ratio(even) < 2.0
    # hot key: 90% of rows share one key
    skewed = (spark.range(0, 10000)
              .select(SF.when(SF.col("id") % 10 != 0, 0)
                        .otherwise(SF.col("id")).alias("k"))
              .repartition(8, "k"))
    assert skew_ratio(skewed) > 4.0
    hist = partition_histogram(skewed).collect()
    assert sum(r.n_rows for r in hist) == 10000


def test_aqe_splits_skewed_join(spark):
    """The runtime re-plan path SCALE.md leans on for moderate skew:
    AQE detects the hot post-shuffle partition and splits it
    (SortMergeJoin(skew=true) + skewed AQEShuffleRead) — salting
    (`salted_join`) stays reserved for the pathological single-key case."""
    import pyspark.sql.functions as SF
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # tiny thresholds so the local fixture-scale join exercises the
        # same decision a multi-GB hot partition triggers on a cluster
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 200_000).select(
            SF.when(SF.col("id") % 5 != 0, 0).otherwise(SF.col("id"))
              .alias("k"),
            SF.sha2(SF.col("id").cast("string").cast("binary"), 256)
              .alias("pad"))
        small = spark.range(0, 1000).select(
            SF.col("id").alias("k"), (SF.col("id") * 2).alias("v"))
        j = big.join(small, "k")
        n = len(j.collect())
        assert n == 160_200  # 160k hot-key rows x k=0 + 200 distinct-key
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
