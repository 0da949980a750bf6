"""Minimal proto3 wire decoder for the stream output contract.

Independent counterpart to ``wire.py``: a generic proto3 wire-format
parser (public encoding rules — varint, 64-bit, length-delimited,
32-bit) plus typed views for the reference wire schema
(/root/reference/proto/oanda_stream.proto). It shares no code with the
encoder, so the hypothesis round-trip tests exercise two independent
implementations of the spec — the closest available substitute for
parsing with protoc-generated classes (no protobuf wheel in this
environment; if one appears, these bytes parse with the generated
classes unchanged).

Decoding semantics honored:
* unknown fields are skipped by wire type (forward compatibility);
* repeated message fields accumulate in order;
* `oneof`: last branch seen wins (proto3 merge rule);
* absent scalar fields read back as proto3 defaults ("" / 0).
"""

from __future__ import annotations

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Return (value, next_pos); raises ValueError on truncation.

    The result is masked to 64 bits (protoc semantics: a 10-byte
    sign-extended varint carries exactly 64 payload bits; bits above
    that are discarded), so the unsigned value always lies in
    [0, 2^64). Signed int32/int64 fields additionally need
    :func:`fold_signed` — protoc encodes negatives as 64-bit two's
    complement."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & 0xFFFF_FFFF_FFFF_FFFF, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def fold_signed(value: int) -> int:
    """Two's-complement fold of a 64-bit unsigned varint payload into a
    signed int — what protoc-generated classes return for int32/int64
    fields (negative values arrive as 10-byte sign-extended varints)."""
    return value - (1 << 64) if value >= (1 << 63) else value


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields.

    value is an int for VARINT and the raw bytes for LEN; I64/I32 are
    returned as raw little-endian bytes (unused by this schema but
    skipped correctly for forward compatibility).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == _WT_VARINT:
            val, pos = read_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == _WT_I64:
            if pos + 8 > n:
                raise ValueError("truncated i64")
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == _WT_I32:
            if pos + 4 > n:
                raise ValueError("truncated i32")
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def decode_timestamp(buf: bytes) -> tuple[int, int]:
    # Timestamp.seconds is int64, .nanos is int32 — both signed, so a
    # pre-epoch timestamp's 10-byte varint folds back to a negative int
    seconds = nanos = 0
    for field, _wt, val in iter_fields(buf):
        if field == 1:
            seconds = fold_signed(val)
        elif field == 2:
            nanos = fold_signed(val)
    return seconds, nanos


def decode_price_level(buf: bytes) -> tuple[str, int]:
    price, liquidity = "", 0
    for field, _wt, val in iter_fields(buf):
        if field == 1:
            price = val.decode("utf-8")
        elif field == 2:
            liquidity = val
    return price, liquidity


def decode_price_tick(buf: bytes) -> dict:
    out = {"asks": [], "bids": [], "closeout_ask": "", "closeout_bid": "",
           "instrument": "", "status": "", "ts_seconds": None,
           "ts_nanos": None}
    for field, _wt, val in iter_fields(buf):
        if field == 1:
            out["asks"].append(decode_price_level(val))
        elif field == 2:
            out["bids"].append(decode_price_level(val))
        elif field == 3:
            out["closeout_ask"] = val.decode("utf-8")
        elif field == 4:
            out["closeout_bid"] = val.decode("utf-8")
        elif field == 5:
            out["instrument"] = val.decode("utf-8")
        elif field == 6:
            out["status"] = val.decode("utf-8")
        elif field == 7:
            out["ts_seconds"], out["ts_nanos"] = decode_timestamp(val)
    return out


def decode_heartbeat(buf: bytes) -> dict:
    out = {"ts_seconds": None, "ts_nanos": None, "type": ""}
    for field, _wt, val in iter_fields(buf):
        if field == 1:
            out["ts_seconds"], out["ts_nanos"] = decode_timestamp(val)
        elif field == 2:
            out["type"] = val.decode("utf-8")
    return out


def decode_stream_message(buf: bytes) -> tuple[str, dict]:
    """Decode the oneof envelope -> (message_type, payload_dict)."""
    kind, payload = "unknown", {}
    for field, _wt, val in iter_fields(buf):
        if field == 1:
            kind, payload = "price_tick", decode_price_tick(val)
        elif field == 2:
            kind, payload = "heartbeat", decode_heartbeat(val)
    return kind, payload


def iter_frames(blob: bytes):
    """Yield message bytes from a FilePublisher frame file (4-byte
    big-endian length prefix per message)."""
    pos = 0
    n = len(blob)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated frame header")
        ln = int.from_bytes(blob[pos:pos + 4], "big")
        pos += 4
        if pos + ln > n:
            raise ValueError("truncated frame body")
        yield blob[pos:pos + ln]
        pos += ln
