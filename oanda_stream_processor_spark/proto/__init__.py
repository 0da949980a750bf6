"""Wire-format output contract (protobuf).

The schema is re-declared from the reference's wire contract
(/root/reference/proto/oanda_stream.proto:1-32): a closed oneof envelope
``StreamMessageProto{price_tick=1 | heartbeat=2}`` over
``PriceTickProto`` (repeated ask/bid ladders, decimal-string closeouts,
instrument/status, google.protobuf.Timestamp time) and
``HeartbeatProto``. ``wire.py`` implements proto3 encoding for exactly
these messages in pure Python (no protoc / spark-protobuf jar in this
environment; the encoding rules are the public proto3 wire spec).
"""
