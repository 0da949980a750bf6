"""Decoder-side wire tests: proto/wire_decode.py is an independent
implementation of the proto3 wire rules, so encoder→decoder round-trips
exercise two implementations of the contract
(/root/reference/proto/oanda_stream.proto) against each other — plus
the full loop pipeline → FilePublisher frames → proto_replay source."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oanda_stream_processor_spark.proto import wire
from oanda_stream_processor_spark.proto import wire_decode as wd

prices = st.text(
    alphabet="0123456789.", min_size=0, max_size=12)
liqs = st.integers(min_value=0, max_value=2**63 - 1)
levels = st.lists(st.tuples(prices, liqs), max_size=4)
texts = st.text(max_size=20)
# full signed ranges: Timestamp.seconds is int64, .nanos int32 — protoc
# encodes negatives as 10-byte sign-extended varints, which the decoder
# must mask to 64 bits and two's-complement-fold back
secs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
nanos = st.integers(min_value=-999_999_999, max_value=999_999_999)


@given(asks=levels, bids=levels, ca=texts, cb=texts, inst=texts,
       status=texts, s=secs, n=nanos)
@settings(max_examples=200, deadline=None)
def test_price_tick_roundtrip(asks, bids, ca, cb, inst, status, s, n):
    body = wire.encode_price_tick(asks, bids, ca, cb, inst, status, s, n)
    kind, p = wd.decode_stream_message(
        wire.encode_stream_message("price_tick", body))
    assert kind == "price_tick"
    # proto3: defaults ("" / 0) are omitted on the wire and restored by
    # the decoder — identical values either way
    assert p["asks"] == asks
    assert p["bids"] == bids
    assert (p["closeout_ask"], p["closeout_bid"]) == (ca, cb)
    assert (p["instrument"], p["status"]) == (inst, status)
    assert (p["ts_seconds"], p["ts_nanos"]) == (s, n)


@given(s=secs, n=nanos, t=texts)
@settings(max_examples=100, deadline=None)
def test_heartbeat_roundtrip(s, n, t):
    env = wire.encode_stream_message(
        "heartbeat", wire.encode_heartbeat(s, n, t))
    kind, p = wd.decode_stream_message(env)
    assert kind == "heartbeat"
    assert (p["ts_seconds"], p["ts_nanos"], p["type"]) == (s, n, t)


@given(msgs=st.lists(st.binary(max_size=64), max_size=10))
@settings(max_examples=100, deadline=None)
def test_frame_iteration_roundtrip(msgs):
    blob = b"".join(len(m).to_bytes(4, "big") + m for m in msgs)
    assert list(wd.iter_frames(blob)) == msgs


def test_truncated_inputs_raise():
    with pytest.raises(ValueError):
        list(wd.iter_frames(b"\x00\x00\x00\x05abc"))
    with pytest.raises(ValueError):
        wd.read_varint(b"\xff", 0)
    with pytest.raises(ValueError):
        list(wd.iter_fields(b"\x0a\x05ab"))  # len field longer than buf


def test_unknown_fields_skipped():
    # a future field 15 (varint) must not break decoding: forward compat
    extra = wd._WT_VARINT | (15 << 3)
    body = wire.encode_heartbeat(7, 0, "HEARTBEAT")
    env = wire.encode_stream_message("heartbeat", body + bytes([extra, 42]))
    kind, p = wd.decode_stream_message(env)
    assert kind == "heartbeat"
    assert p["ts_seconds"] == 7


def test_replay_source_closes_publish_loop(spark, tick_capture, tmp_path):
    """pipeline → encode → FilePublisher frames → read_proto_frames:
    the decoded DataFrame must carry exactly the publishable messages
    with their instruments and timestamps intact."""
    from oanda_stream_processor_spark.sources.proto_replay import (
        read_proto_frames)
    from oanda_stream_processor_spark.streaming.pipeline import run_pipeline
    from oanda_stream_processor_spark.streaming.sinks import FilePublisher

    sink_file = tmp_path / f"pub_{uuid.uuid4().hex[:8]}.bin"
    pub = FilePublisher(str(sink_file))
    handles = run_pipeline(spark, tick_capture,
                           checkpoint_dir=str(tmp_path / "ckpt"),
                           publisher=pub)
    handles.process_all_available()
    handles.stop()

    out = read_proto_frames(spark, str(sink_file)).collect()
    kinds = sorted(r.message_type for r in out)
    assert kinds == ["heartbeat", "price_tick", "price_tick", "price_tick"]
    ticks = [r for r in out if r.message_type == "price_tick"]
    assert all(r.instrument for r in ticks)
    assert all(r.ts_seconds and r.ts_seconds > 0 for r in out)
    assert all(r.asks and r.asks[0].price for r in ticks)
    hb = next(r for r in out if r.message_type == "heartbeat")
    assert hb.heartbeat_type == "HEARTBEAT"


def test_negative_varint_sign_fold():
    """Explicit protoc-parity check: a negative int64/int32 arrives as a
    10-byte sign-extended varint and must decode back to the negative
    value (not a huge positive one)."""
    for s_, n_ in ((-1, -1), (-(2**62), -999_999_999), (2**63 - 1, 0)):
        enc = wire.encode_stream_message(
            "heartbeat", wire.encode_heartbeat(s_, n_, "hb"))
        _, p = wd.decode_stream_message(enc)
        assert (p["ts_seconds"], p["ts_nanos"]) == (s_, n_)
    # raw layer: the unsigned payload is masked to [0, 2^64)
    val, _ = wd.read_varint(wire._varint(-1), 0)
    assert val == 2**64 - 1
    assert wd.fold_signed(val) == -1
